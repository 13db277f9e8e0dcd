"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, PII scrubbing, deterministic stratified sampling, and
composite quality filtering.

Everything is pure Catalyst expressions (JVM, codegen) — no Python in
the hot path — and every operator has an ANSI-SQL twin in
entry_queries.py so the DuckDB oracle verifies it value-for-value:

- ``decontaminate``: flag documents sharing any word n-gram with a
  benchmark/eval set — the standard pre-training hygiene pass (the
  GPT-3/C4 13-gram rule). The benchmark side is tiny by construction
  and broadcast; the document side is explode + broadcast-hash
  semi-join, so the corpus never shuffles on content and the one
  shuffle is the per-doc hit count.
- ``pii_scrub``: redact emails and long digit runs via sequential
  ``regexp_replace`` (patterns kept to the Java-regex ∩ RE2 common
  subset so engine and oracle agree byte-for-byte).
- ``stratified_sample``: reproducible per-stratum sampling — keep iff
  a portable md5-derived uniform in [0,1) falls under the stratum's
  rate. Pure map-side filter: no shuffle, no RNG state, identical
  output at any parallelism — the property training-data mixing needs
  that ``df.sample`` (partition-seeded, repartition-sensitive) lacks.
- ``quality_filter``: C4-style composite gate over the text-quality
  kernels in functions/text.py, returning keep + a deterministic
  comma-joined reasons string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_ratio, stopword_ratio, ws_token_count


def word_ngrams(text: Column, n: int = 5, max_tokens: int | None = None) -> Column:
    """Distinct lowercase word n-grams (whitespace tokenization),
    optionally capped at the first ``max_tokens`` tokens."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    count = F.size(toks) - (n - 1)
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark — guard short docs
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Per-document benchmark-overlap flags: (id, n_contaminated_grams,
    contaminated). A document is contaminated when it shares >=1 word
    n-gram with any benchmark document.

    The benchmark gram set is distinct-ed and broadcast (eval sets are
    MBs against a 100 TB corpus); the document side streams through an
    explode + broadcast semi-join with no corpus shuffle — the only
    shuffle is the per-document hit-count aggregation, keyed on the
    document id (already unique, no skew)."""
    bt = benchmark_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(bt), n)).alias("gram")
    ).distinct()
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_contaminated_grams"), F.lit(0)).alias("n_contaminated_grams"),
        (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias("contaminated"),
    )


#: Conservative PII patterns valid in BOTH Java regex (Spark) and RE2
#: (DuckDB): emails, then long digit/phone runs on the email-scrubbed
#: text (sequential application keeps the two engines byte-identical).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_PATTERN = r"[0-9][0-9 ()\-]{7,}[0-9]"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and long digit runs: (id, text_scrubbed,
    n_redactions). Pure codegen regexp work — linear scan per document,
    embarrassingly parallel, no shuffle."""
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(no_email, F.lit(LONG_NUMBER_PATTERN), 0))
    scrubbed = F.regexp_replace(no_email, LONG_NUMBER_PATTERN, "<NUMBER>")
    return docs.select(
        F.col(id_col),
        scrubbed.alias("text_scrubbed"),
        (n_emails + n_nums).cast("long").alias("n_redactions"),
    )


def uniform_hash01(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform in [0,1) from a key: first 8 hex chars of
    md5(salt:key) as a 32-bit integer over 2^32. md5 exists verbatim in
    ANSI SQL, so the oracle replays the identical stream — and the same
    record keeps the same draw at any partitioning or cluster size."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Reproducible stratified sampling: keep a row iff its md5-uniform
    draw falls under its stratum's rate. Map-side only — no shuffle, no
    RNG state; the sample is a pure function of (key, salt, rates), so
    re-runs, resumes and different cluster sizes all see the same rows
    (unlike ``DataFrame.sample``, which seeds per partition)."""
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(uniform_hash01(F.col(key_col), salt) < rate)


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 25,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.05,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4-style composite quality gate: (id, keep, reasons) where
    ``reasons`` is a deterministic comma-joined list of failed checks
    (empty when the document passes). Built on the codegen text kernels;
    concat_ws drops the NULL branches of untriggered checks."""
    text = F.col(text_col)
    checks: list[tuple[str, Column]] = [
        ("short", ws_token_count(text) < min_tokens),
        ("punct", punct_ratio(text) > max_punct_ratio),
        ("stopword", stopword_ratio(text) < min_stopword_ratio),
    ]
    if require_terminal_punct:
        checks.append(
            ("no_terminal_punct", ~F.trim(text).rlike(r"[.!?]$"))
        )
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in checks]
    )
    return docs.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )
