"""Text-analysis column functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything here is pure Catalyst expressions (JVM-side, codegen) — no
Python UDFs — so the hot path over a 100 TB documents table never leaves
the executor JVM. Each builder has an ANSI-SQL twin in entry_queries.py
used for the DuckDB correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small stopword marker sets per language for the n-gram/stopword-voting
#: language-ID heuristic. Deliberately tiny — the point is the Spark
#: plumbing (vectorized scoring over a text column), not NLP accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of spaces). NULL text
    counts 0 — guarded explicitly, because Spark's ``size()`` over the
    NULL split returns -1, not NULL."""
    return F.when(
        text.isNull() | (F.length(F.trim(text)) == 0), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(text), r"\s+"))).cast("long")


def alnum_token_count(text: Column) -> Column:
    """BPE-ish token count: alphanumeric runs (the pre-tokenizer split
    most BPE vocabularies start from). NULL text counts 0 (same
    size(NULL) = -1 guard as ws_token_count)."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    npunct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        npunct.cast("double") / F.length(text).cast("double")
    )


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Occurrences of the language's marker stopwords as whole tokens.

    Uses plain string replace + length arithmetic over a space-doubled
    copy (so adjacent tokens each keep their own delimiters) — pure
    codegen expressions with an exact ANSI-SQL twin (no regex lookaround,
    which RE2-based engines lack).
    """
    doubled = F.concat(
        F.lit(" "), F.replace(F.lower(text), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    total = F.lit(0).cast("long")
    for w in LANG_MARKERS[lang]:
        pat = f" {w} "
        hits = (F.length(doubled) - F.length(F.replace(doubled, F.lit(pat), F.lit("")))) / len(pat)
        total = total + hits.cast("long")
    return total


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_token_count(text)
    return F.when(toks == 0, F.lit(0.0)).otherwise(
        stopword_count(text, lang).cast("double") / toks.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards moderate
    length, low punctuation noise, and natural stopword density —
    the standard cheap pre-filter in web-scale corpus cleaning."""
    toks = ws_token_count(text).cast("double")
    len_score = F.least(toks / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Stopword-voting language ID: the language whose markers appear
    most often; 'und' (undetermined) when nothing matches. Ties break
    alphabetically for determinism."""
    scores = [(lang, stopword_count(text, lang)) for lang in sorted(LANG_MARKERS)]
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earliest alphabetical wins on tie
        expr = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def char_shingles(text: Column, n: int = 8, max_chars: int = 100) -> Column:
    """Array of distinct character n-gram shingles over the first
    ``max_chars`` characters (JVM-side: sequence + transform)."""
    prefix = F.substring(text, 1, max_chars)
    idx = F.sequence(F.lit(1), F.greatest(F.length(prefix) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: prefix.substr(i, F.lit(n))))


def rolling_fingerprint(text: Column, n: int = 8, max_chars: int = 100) -> tuple[Column, Column]:
    """Document fingerprint: (min, max) md5 over the distinct character
    n-gram shingles — a winnowing-style content fingerprint that is
    stable under reordering-free edits past the prefix."""
    prefix = F.substring(text, 1, max_chars)
    idx = F.sequence(F.lit(1), F.greatest(F.length(prefix) - (n - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: F.md5(prefix.substr(i, F.lit(n))))
    return F.array_min(hashes), F.array_max(hashes)
