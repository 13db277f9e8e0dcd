"""Scalar/column function library: string distances, text analysis, hashing."""

from .distances import distance_column, normalized_levenshtein_column, py_distance

__all__ = ["distance_column", "normalized_levenshtein_column", "py_distance"]
