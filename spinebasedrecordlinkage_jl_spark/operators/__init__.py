"""Relational operators: records aggregation, blocking, linkage passes,
connected-components spine construction, dedup, similarity search,
reporting, multimodal plumbing."""
