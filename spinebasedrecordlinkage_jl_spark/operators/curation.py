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
- ``repetition_stats``: Gopher-style repetition signals (duplicate-line
  fraction/char-fraction, top n-gram char fraction, duplicated n-gram
  occurrence fraction). Line stats are shuffle-free higher-order-function
  expressions; n-gram stats shuffle only on (doc_id, gram) — a key that
  cannot be hot because it embeds the document id.
- ``line_dedup``: corpus-level exact line dedup (CCNet/Dolma-style,
  first global occurrence wins). The global-first computation is a
  partial-aggregatable min-struct groupBy — deliberately NOT a window
  over the line key, which could not map-side combine and would
  serialize a line duplicated a billion times into one partition.
- ``vocab_topk``: corpus-wide token frequencies, top k — map-side
  combinable count + two-level distinct, then TakeOrdered (no full
  sort materialization).
- ``corpus_report``: per-source dataset datasheet (docs, tokens,
  exact-dup mass, quality pass rate via the SHARED ``quality_reasons``
  expression, English share) in one groupBy — the diff target after
  any curation-knob change.
- ``corpus_mix``: token-budget data mixing — per-source sampling rate
  min(1, budget*w/avail) from a one-row-per-source in-plan aggregate,
  broadcast back and applied as the same md5-uniform map-side filter;
  the corpus never shuffles and the rates never leave the plan.
- ``pack_sequences``: GPT-style concatenate-and-chunk packing — each
  document's global token offset and training-window span via a
  two-level distributed prefix sum (per-id-range-bucket cumsum, then a
  sequential scan over only the n_buckets bucket totals). The naive
  single ``Window.orderBy`` would serialize the corpus through one
  task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_ratio, stopword_ratio, ws_token_count


def tokenize_words(text: Column, max_tokens: int | None = None) -> Column:
    """Lowercase whitespace tokenization (the shared gram tokenizer)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    return toks


def word_ngrams_from_tokens(toks: Column, n: int = 5, distinct: bool = True) -> Column:
    """Word n-grams over an ALREADY-TOKENIZED array column.

    r6 perf note (guide §2 "per-task work"): callers that EXPLODE grams
    should materialize the token array as its own projected column first
    and pass that column here. Inside a Generate the full expression tree
    is evaluated without common-subexpression elimination, so inlining
    the tokenizer re-runs the regex split 3-4x per row (size guard,
    sequence bound, every slice) — measured 2.5s vs 0.4s for the 5-gram
    explode over the sf0.1 documents table."""
    count = F.size(toks) - (n - 1)
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark — guard short docs
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams) if distinct else grams


def word_ngrams(
    text: Column, n: int = 5, max_tokens: int | None = None, distinct: bool = True
) -> Column:
    """Lowercase word n-grams (whitespace tokenization), optionally
    capped at the first ``max_tokens`` tokens; ``distinct=False`` keeps
    every occurrence (repetition statistics need multiplicity)."""
    return word_ngrams_from_tokens(tokenize_words(text, max_tokens), n, distinct)


def _exploded_ngrams(
    df: DataFrame,
    text_col: str,
    n: int,
    out_name: str,
    id_cols: tuple[str, ...] = (),
    distinct: bool = True,
    max_tokens: int | None = None,
) -> DataFrame:
    """(id_cols..., gram) rows with the token array projected BEFORE the
    Generate — the evaluate-the-split-once shape every gram-exploding
    operator here shares (see word_ngrams_from_tokens)."""
    pre = df.select(
        *[F.col(c) for c in id_cols],
        tokenize_words(F.col(text_col), max_tokens).alias("_toks"),
    )
    return pre.select(
        *[F.col(c) for c in id_cols],
        F.explode(word_ngrams_from_tokens(F.col("_toks"), n, distinct)).alias(out_name),
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
    bench_grams = _exploded_ngrams(benchmark, bt, n, "gram").distinct()
    doc_grams = _exploded_ngrams(docs, text_col, n, "gram", id_cols=(id_col,))
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
        # size(NULL) is -1 in Spark, not NULL: a NULL-text document must
        # count 0 redactions, not -2
        F.when(text.isNull(), F.lit(0))
        .otherwise(n_emails + n_nums)
        .cast("long")
        .alias("n_redactions"),
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
    reasons = quality_reasons(
        F.col(text_col),
        min_tokens,
        max_punct_ratio,
        min_stopword_ratio,
        require_terminal_punct,
    )
    return docs.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def quality_reasons(
    text: Column,
    min_tokens: int = 25,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.05,
    require_terminal_punct: bool = False,
) -> Column:
    """The quality gate as a reusable COLUMN: the comma-joined failed
    checks ('' = pass). Shared by :func:`quality_filter` and
    :func:`corpus_report` so the gate cannot drift between them."""
    checks: list[tuple[str, Column]] = [
        ("short", ws_token_count(text) < min_tokens),
        ("punct", punct_ratio(text) > max_punct_ratio),
        ("stopword", stopword_ratio(text) < min_stopword_ratio),
    ]
    if require_terminal_punct:
        checks.append(("no_terminal_punct", ~F.trim(text).rlike(r"[.!?]$")))
    return F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in checks])


def _nonempty_lines(text: Column, line_sep: str) -> Column:
    """Split on the ``line_sep`` regex, dropping empty segments (leading/
    trailing separators and blank lines)."""
    return F.filter(F.split(text, line_sep), lambda x: F.length(x) > 0)


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = r"\n",
    top_ngram_n: int = 2,
    dup_ngram_n: int = 3,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    table A1): (id, dup_line_frac, dup_line_char_frac,
    top_ngram_char_frac, dup_ngram_frac).

    - ``dup_line_frac``: fraction of non-empty line occurrences whose
      line appears more than once in the document (every copy of a
      duplicated line counts, matching Gopher).
    - ``dup_line_char_frac``: fraction of line characters belonging to
      lines that occur more than once.
    - ``top_ngram_char_frac``: occurrences of the most frequent word
      ``top_ngram_n``-gram times its length, over the document's total
      characters (ties broken by lexicographically-last gram, so engine
      and oracle agree bit-for-bit).
    - ``dup_ngram_frac``: fraction of word ``dup_ngram_n``-gram
      occurrences whose gram occurs more than once (count-based variant
      of Gopher's duplicated-n-gram character fraction).

    Line stats are pure higher-order-function expressions — shuffle-free,
    O(lines^2) per document in codegen (documents have tens-to-hundreds
    of lines; no corpus-size term). The two n-gram aggregations shuffle
    on (id, gram), a key that embeds the unique document id and therefore
    cannot be hot no matter how duplicate-heavy the corpus is."""
    text = F.col(text_col)
    lines = _nonempty_lines(text, line_sep)
    n_lines = F.size(lines)
    # every occurrence of a line that appears more than once counts as
    # duplicated (Gopher's definition — NOT occurrences-beyond-first),
    # consistent with the char-fraction and n-gram stats below
    dup_lines = F.filter(
        lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1
    )
    dup_line_frac = F.when(
        n_lines > 0, F.size(dup_lines).cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        dup_lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_line_char_frac = F.when(
        total_chars > 0, dup_chars.cast("double") / total_chars
    ).otherwise(F.lit(0.0))
    base = docs.select(
        F.col(id_col),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 6).alias("dup_line_char_frac"),
        F.length(text).alias("_n_chars"),
    )

    def _gram_counts(n: int) -> DataFrame:
        return (
            _exploded_ngrams(docs, text_col, n, "gram", id_cols=(id_col,), distinct=False)
            .groupBy(id_col, "gram")
            .agg(F.count("*").alias("cnt"))
        )

    top = (
        _gram_counts(top_ngram_n)
        .groupBy(id_col)
        .agg(F.max(F.struct("cnt", "gram")).alias("top"))
        .select(
            id_col,
            (F.col("top.cnt") * F.length("top.gram")).alias("_top_chars"),
        )
    )
    dup = (
        _gram_counts(dup_ngram_n)
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("_n_grams"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "_dup_occ"
            ),
        )
    )
    return (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            "dup_line_frac",
            "dup_line_char_frac",
            F.round(
                F.coalesce(
                    F.col("_top_chars").cast("double") / F.col("_n_chars"),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_ngram_char_frac"),
            F.round(
                F.coalesce(
                    F.col("_dup_occ").cast("double") / F.col("_n_grams"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_ngram_frac"),
        )
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = r"\n",
    join_sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact line deduplication, first global occurrence
    wins (the CCNet/Dolma pre-training hygiene pass): every non-empty
    line that already appeared earlier in the corpus — ordered by
    (id, line position) — is dropped, and each document's text is
    reassembled from its surviving lines. Returns (id, text_deduped,
    n_lines_kept, n_lines_dropped); documents losing every line come
    back with empty text, never missing.

    Scale shape: the global-first computation is a min-struct groupBy on
    the line content — partial-aggregatable, so a line duplicated a
    billion times collapses map-side instead of serializing into one
    window partition (a row_number window over the line key could not
    combine map-side). The join back on the line key is big-to-distinct
    and AQE's skew-join split handles residual hot lines; reassembly
    shuffles on the unique document id."""
    lines = _nonempty_lines(F.col(text_col), line_sep)
    exploded = docs.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )
    firsts = exploded.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "first"
        )
    )
    kept = exploded.join(firsts, "line").filter(
        (F.col(id_col) == F.col("first.i")) & (F.col("pos") == F.col("first.p"))
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            join_sep,
        ).alias("text_deduped"),
        F.count("*").alias("n_lines_kept"),
    )
    # NULL text has no lines (size(NULL) would count -1 and push
    # n_lines_dropped negative)
    n_lines = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.size(lines))
    return (
        docs.select(F.col(id_col), n_lines.cast("long").alias("_n_lines"))
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("_n_lines") - F.coalesce("n_lines_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def vocab_topk(
    docs: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide token vocabulary, top ``k`` by occurrence count
    (ties broken by token, so the cut is deterministic): (token,
    n_occurrences, n_docs). Tokens are lowercase alphanumeric runs — the
    pre-tokenizer split BPE vocabularies start from.

    One shuffle on the token key with map-side combine for the counts;
    ``n_docs`` is the standard two-level distinct aggregation. The final
    top-k is orderBy+limit, which Spark executes as TakeOrdered — no
    full-sort materialization of the vocabulary."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def pack_sequences(
    df: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 256,
) -> DataFrame:
    """GPT-style sequence packing (concatenate-and-chunk): lay every
    document's tokens end-to-end in ``id_col`` order and cut the stream
    into ``context_len``-token training windows. Output per document:
    (``id_col``, ``tokens_col``, tok_offset, bin_first, bin_last) —
    its exclusive global token offset and the first/last window it
    lands in (a document may straddle windows; bin_last - bin_first
    is how many boundaries it crosses). Zero-token documents are
    dropped (they occupy no window). Ids must be unique and integral —
    they ARE the deterministic packing order.

    100 TB shape: the global running sum is a two-level scan, the
    distributed-prefix-sum pattern. Level 1 partitions the corpus into
    order-preserving id-range buckets and cumsums WITHIN each bucket (a
    window partitioned by bucket — parallel across buckets, one shuffle).
    Level 2 prefix-sums the per-bucket totals — ``n_buckets`` rows, so
    the only inherently sequential window runs over a frame the size of
    the parallelism knob, not the corpus. A naive
    ``Window.orderBy(id)`` with no partition would serialize the whole
    corpus through one task. One tiny scalar agg (max id) runs at
    plan-build time to size the range buckets, the same
    plan-build-time-collect contract as ``ivf_topk``'s quantizer.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if not isinstance(
        df.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise ValueError(
            f"pack_sequences: {id_col} must be integral (it is the packing order)"
        )
    docs = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(tokens_col).cast("long").alias("_tok"),
    ).filter(F.col("_tok") > 0)

    bounds = docs.agg(F.min("_id"), F.max("_id")).first()
    if bounds[0] is None:
        zero = F.lit(0).cast("long")
        return docs.select(
            F.col("_id").alias(id_col),
            F.col("_tok").alias(tokens_col),
            zero.alias("tok_offset"),
            zero.alias("bin_first"),
            zero.alias("bin_last"),
        )
    lo, hi = int(bounds[0]), int(bounds[1])
    span = hi - lo + 1
    n_buckets = max(1, min(n_buckets, span))
    # order-preserving equal-width id-range bucket; ids need not be dense
    # (skew across buckets only skews level-1 parallelism, not results).
    # Bucket by DIVISION with a Python-computed width: the multiply form
    # ((_id - lo) * n_buckets) overflows long for 63-bit id spans (e.g.
    # xxhash64-derived ids), silently breaking bucket monotonicity.
    width = (span + n_buckets - 1) // n_buckets
    # `div` = integer division (Column `/` is double division, which
    # loses exactness past 2^53 — same silent-corruption class)
    bucket = F.expr(
        f"(_id - CAST({lo} AS BIGINT)) div CAST({width} AS BIGINT)"
    ).cast("long")
    docs = docs.withColumn("_bucket", bucket)

    w_intra = (
        Window.partitionBy("_bucket")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = docs.withColumn("_cum", F.sum("_tok").over(w_intra))

    totals = docs.groupBy("_bucket").agg(F.sum("_tok").alias("_btot"))
    w_prefix = (
        # n_buckets rows: the one sequential scan runs over a tiny frame
        Window.partitionBy(F.lit(0))
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "_bucket", F.coalesce(F.sum("_btot").over(w_prefix), F.lit(0)).alias("_pre")
    )

    offset = F.col("_pre") + F.col("_cum") - F.col("_tok")
    return (
        intra.join(F.broadcast(prefixes), "_bucket")
        .select(
            F.col("_id").alias(id_col),
            F.col("_tok").alias(tokens_col),
            offset.alias("tok_offset"),
            F.floor(offset / context_len).cast("long").alias("bin_first"),
            F.floor((offset + F.col("_tok") - 1) / context_len)
            .cast("long")
            .alias("bin_last"),
        )
    )


def corpus_mix(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    salt: str = "mix",
    return_plan: bool = False,
):
    """Data mixing: sample each source so the result approximates the
    target mixture ``weights`` within ``token_budget`` total tokens —
    the corpus-composition step of a pretraining pipeline (web 60%,
    code 20%, ... at N tokens).

    Per source s: rate_s = min(1, budget * w_s / available_tokens_s)
    (weights are normalized over the dict; sources absent from it are
    excluded). Each row then keeps iff its deterministic md5-uniform
    draw (:func:`uniform_hash01` — partitioning-independent,
    resume-stable) falls under its source's rate, so the expected
    sampled token mass per source is min(budget * w_s, available_s).
    An UNDERSUPPLIED source caps at rate 1 — every row kept, target
    shortfall reported, upsampling (epochs > 1) left to the caller.

    100 TB shape: one partial-aggregatable groupBy over (source) for
    the availability totals — a frame with one row per source — then a
    broadcast join and a map-side filter. The corpus itself never
    shuffles, and the rates stay INSIDE the plan (no driver-side
    collect), so the whole mix is one lazy DataFrame.

    Returns the sampled rows (all input columns); with
    ``return_plan=True`` also the per-source audit frame
    (source, available_tokens, target_tokens, rate).
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if not weights:
        raise ValueError("corpus_mix: weights is empty")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("corpus_mix: weights must sum to a positive value")
    norm = {s: float(w) / wsum for s, w in weights.items()}

    weight_col: Column = F.lit(None).cast("double")
    for s, w in sorted(norm.items()):
        weight_col = F.when(F.col(source_col) == s, F.lit(w)).otherwise(weight_col)

    # aggregate ALL sources (tiny frame either way): sources absent from
    # ``weights`` surface in the plan with NULL target/rate instead of
    # vanishing silently — and a NULL rate fails the sampling filter, so
    # the output still contains only weighted sources
    avail = docs.groupBy(source_col).agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_avail")
    )
    plan = avail.select(
        F.col(source_col),
        F.col("_avail").alias("available_tokens"),
        (F.lit(int(token_budget)) * weight_col).alias("target_tokens"),
        # guard on the weight: least() SKIPS nulls, so a bare
        # least(1.0, NULL/avail) would give excluded sources rate 1.0
        F.when(
            weight_col.isNotNull(),
            F.least(
                F.lit(1.0),
                (F.lit(int(token_budget)) * weight_col)
                / F.col("_avail").cast("double"),
            ),
        ).alias("rate"),
    )
    sampled = docs.join(
        F.broadcast(plan.select(source_col, "rate")), source_col
    ).filter(uniform_hash01(F.col(key_col), salt) < F.col("rate"))
    out = sampled.select(*docs.columns)
    if return_plan:
        return out, plan
    return out


def corpus_report(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    **quality_kwargs,
) -> DataFrame:
    """Per-source corpus datasheet in ONE aggregation pass: document and
    token counts, exact-duplicate mass, quality-gate pass rate and
    English share — the summary table a dataset card starts from, and
    the first thing to diff after changing any upstream curation knob.

    Output per source: (source, n_docs, total_tokens, distinct_contents,
    dup_fraction, quality_pass_rate, n_english). The quality gate is the
    SAME expression as :func:`quality_filter` (``quality_reasons`` —
    pass its kwargs through), so the report's pass rate is exactly the
    fraction that operator would keep.

    100 TB shape: a per-doc projection (md5, token count, gate, lang ID
    — all codegen) followed by one groupBy(source). count/sum/avg
    partial-aggregate map-side; count(DISTINCT md5) is Spark's standard
    two-level expand — the only data-sized shuffle, keyed on (source,
    hash), which cannot run hot. Source cardinality is tiny, so the
    final reduce is trivial."""
    from ..functions.text import lang_id

    reasons = quality_reasons(F.col(text_col), **quality_kwargs)
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_h"),
        ws_token_count(F.col(text_col)).alias("_tok"),
        (reasons == "").cast("int").alias("_keep"),
        lang_id(F.col(text_col)).alias("_lang"),
    )
    n = F.count("*")
    nd = F.countDistinct("_h")
    return (
        per_doc.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("total_tokens"),
            nd.cast("long").alias("distinct_contents"),
            F.round(
                F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
            ).alias("dup_fraction"),
            F.round(F.avg("_keep"), 6).alias("quality_pass_rate"),
            F.sum((F.col("_lang") == "en").cast("int")).cast("long").alias("n_english"),
        )
    )


def compact_latest(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot compaction: one row per key — the LATEST version wins
    (highest ``version_col``; ties broken by ``tiebreak_cols`` then by
    the remaining columns, so the result is deterministic even for
    byte-identical duplicates). The CDC/upsert-log pattern: a corpus
    re-crawled daily compacts to its current state before any dedup or
    curation pass.

    100 TB shape: a single partial-aggregatable ``max(struct(version,
    tiebreaks, payload))`` groupBy — NOT a row_number window over the
    key, which cannot combine map-side and serializes a key updated a
    billion times into one partition (the same design decision as
    ``line_dedup``'s min-struct).
    """
    missing = [c for c in [*key_cols, version_col] if c not in df.columns]
    if missing:
        raise ValueError(f"compact_latest: missing columns {missing}")
    tiebreak_cols = list(tiebreak_cols or [])
    payload = [
        c for c in df.columns
        if c not in key_cols and c != version_col and c not in tiebreak_cols
    ]
    ordered = [version_col, *tiebreak_cols, *payload]
    packed = df.groupBy(*key_cols).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("_latest")
    )
    return packed.select(
        *key_cols, *[F.col(f"_latest.{c}").alias(c) for c in ordered]
    ).select(*df.columns)


def dup_span_stats(
    docs: DataFrame,
    n: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level exact duplicate-SPAN statistics — the substring-dedup
    family (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): for each document, how many of its word n-gram
    positions carry a span occurring >= ``min_count`` times in the WHOLE
    corpus, multiplicity counted (within-document repeats included).
    Complements ``repetition_stats`` (within-doc only) and the whole-doc
    dedup family: a doc that pastes one boilerplate paragraph into
    otherwise-unique text is invisible to both, and this is the signal
    that catches it.

    Output: ``(id_col, n_spans, n_dup_spans, dup_span_frac,
    has_dup_span)``, one row per input document.

    100 TB shape: span occurrences are contracted per (doc, span-hash)
    FIRST — a map-side-combinable groupBy whose key embeds the doc id,
    so it cannot be hot — bounding every later relation by distinct
    (doc, span) pairs. The global occurrence count then aggregates that
    contracted relation on the fixed-width md5 key (never the raw
    n-token string), and the duplicated-hash set joins back under AQE
    (broadcast when small). Three linear shuffles; no window over the
    corpus, no all-pairs anywhere.
    """
    spans = _exploded_ngrams(
        docs, text_col, n, "_span", id_cols=(id_col,), distinct=False
    ).select(id_col, F.md5(F.col("_span")).alias("_h"))
    per_doc = spans.groupBy(id_col, "_h").agg(F.count("*").alias("_cnt"))
    dup_hashes = (
        per_doc.groupBy("_h")
        .agg(F.sum("_cnt").alias("_occ"))
        .filter(F.col("_occ") >= min_count)
        .select("_h")
    )
    dup_per_doc = (
        per_doc.join(dup_hashes, "_h")
        .groupBy(id_col)
        .agg(F.sum("_cnt").cast("bigint").alias("_n_dup"))
    )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_spans = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
        .cast("bigint")
    )
    return (
        docs.select(F.col(id_col), n_spans.alias("n_spans"))
        .join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce(F.col("_n_dup"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                F.coalesce(F.col("_n_dup"), F.lit(0)).cast("double") / F.col("n_spans"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_frac"),
            (F.coalesce(F.col("_n_dup"), F.lit(0)) > 0).alias("has_dup_span"),
        )
    )


def dup_spans_topk(
    docs: DataFrame,
    n: int = 20,
    k: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The k most-duplicated exact word n-gram spans corpus-wide —
    the datasheet twin of ``dup_span_stats`` (what IS the boilerplate?).
    Output: ``(span, n_occ, n_docs)``, ordered by occurrences desc then
    span asc (a total order, so the top-k cut is deterministic).

    100 TB shape: one map-side-combinable groupBy over the span relation
    (raw span strings here, not hashes — the span text IS the payload a
    datasheet reader wants), then TakeOrdered for the k rows; the
    ``>= min_count`` filter drops the unique-span long tail before the
    ordering ever sees it.
    """
    spans = _exploded_ngrams(docs, text_col, n, "span", id_cols=(id_col,), distinct=False)
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").cast("bigint").alias("n_occ"),
            F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= min_count)
        .orderBy(F.col("n_occ").desc(), F.col("span").asc())
        .limit(k)
    )


def strip_dup_spans(
    docs: DataFrame,
    n: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-duplicated exact word n-gram spans from every
    document — the ACTION the ``dup_span_stats`` diagnostic points at
    (Lee et al. substring dedup): any token covered by a span occurring
    >= ``min_count`` times corpus-wide is dropped, and the document is
    rebuilt from the surviving tokens in order.

    Output: ``(id_col, text_stripped, n_tokens, n_tokens_removed)``,
    one row per input document. ``text_stripped`` is in normalized
    token space (trim/lower/single-space — the same normalization every
    member of the span family matches in); NULL text stays NULL, a
    fully-boilerplate document becomes the empty string.

    100 TB shape: span occurrences contract per (doc, span-hash) first
    (map-side-combinable, doc-keyed — cannot run hot), the global
    occurrence count aggregates the contracted relation on the
    fixed-width md5 key, and duplicated hashes join back under AQE.
    Coverage then explodes to (doc, token-position) rows — bounded by
    n x duplicated-span occurrences, and de-duplicated on a
    (doc, pos) key that embeds the doc id. The rebuild is one doc-keyed
    groupBy (sort_array over collected (pos, token) structs — a
    within-group array sort, never a corpus-wide window). Token-level
    rewriting is inherently O(total tokens); every relation here is
    keyed by doc id or a uniform hash, so no key can be skewed.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # every span occurrence with its 1-based start-token index; tokens
    # projected before the Generate (see word_ngrams_from_tokens)
    spans = docs.select(
        F.col(id_col), tokenize_words(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.posexplode(
            word_ngrams_from_tokens(F.col("_toks"), n, distinct=False)
        ).alias("_p", "_span"),
    ).select(
        id_col, (F.col("_p") + 1).alias("_start"), F.md5(F.col("_span")).alias("_h")
    )
    per_doc = spans.groupBy(id_col, "_h").agg(
        F.count("*").alias("_cnt"), F.collect_list("_start").alias("_starts")
    )
    dup_hashes = (
        per_doc.groupBy("_h")
        .agg(F.sum("_cnt").alias("_occ"))
        .filter(F.col("_occ") >= min_count)
        .select("_h")
    )
    covered = (
        per_doc.join(dup_hashes, "_h")
        .select(F.col(id_col), F.explode("_starts").alias("_start"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_start"), F.col("_start") + F.lit(n - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    tokens = docs.select(
        F.col(id_col), F.posexplode(toks).alias("_p", "_tok")
    ).select(id_col, (F.col("_p") + 1).alias("_pos"), "_tok")
    rebuilt = (
        tokens.join(covered, [id_col, "_pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("_txt"),
            F.count("*").cast("bigint").alias("_n_kept"),
        )
    )
    n_tokens = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(toks))
        .cast("bigint")
    )
    return (
        docs.select(F.col(id_col), F.col(text_col), n_tokens.alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("_txt"), F.lit("")))
            .alias("text_stripped"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_tokens_removed"),
        )
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a
    ``split`` label from its md5-uniform draw (:func:`uniform_hash01`)
    against the cumulative weight thresholds, in the dict's order.

    Map-side only — no shuffle, no RNG state: the assignment is a pure
    function of (key, salt, weights), so re-runs, resumes and different
    cluster sizes put every document in the same split (the property
    that keeps eval sets uncontaminated across pipeline re-builds —
    ``DataFrame.randomSplit`` re-deals on every partitioning change).
    The last split absorbs the full remaining interval, so weights that
    sum to 1.0 partition [0,1) exactly.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if len(weights) < 2:
        raise ValueError("split_corpus: need at least two splits")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"split_corpus: weights must be positive, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split_corpus: weights must sum to 1.0, got {total}")
    u = uniform_hash01(F.col(key_col), salt)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    assert expr is not None
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    key_col: str = "doc_id",
    salt: str = "shuffle",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for one training epoch: every row
    gets ``shuffle_key = md5(salt:epoch:key)``, and the frame comes back
    range-partitioned and sorted by it — a sequential read of the
    written shards replays the same pseudo-random document order at ANY
    cluster size or partition count, and each epoch draws a fresh
    independent order (the per-epoch reshuffle data loaders expect).

    100 TB shape: exactly one range shuffle (repartitionByRange samples
    key quantiles, so ranges balance even though md5 keys are uniform by
    construction); the sort is within-partition — there is no global
    single-task ordering step. The order is a pure function of
    (salt, epoch, key): no RNG state, reproducible under retries.
    """
    key = F.md5(
        F.concat(F.lit(f"{salt}:{int(epoch)}:"), F.col(key_col).cast("string"))
    )
    out = df.withColumn("shuffle_key", key)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, F.col("shuffle_key")).sortWithinPartitions(
        "shuffle_key"
    )


def split_leakage(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
    n: int = 13,
    train_split: str = "train",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Cross-split contamination gate: after :func:`split_corpus`
    assignment, flag every eval-split (non-train) document sharing at
    least one word n-gram with any train document — the check a
    training pipeline runs before trusting its held-out loss. Returns
    one row per eval document: (key, split, n_leaked_grams, leaked).

    100 TB shape: the train corpus is NEVER shuffled. Its gram stream
    is map-side semi-joined against the broadcast distinct gram set of
    the eval splits, producing the small leaked-gram set, which is
    broadcast back over the eval gram stream for the per-document
    count — the mirror of :func:`decontaminate` with the corpus's own
    eval splits playing the benchmark. The only shuffles move
    eval-sized data.

    The broadcast default assumes curated-eval-sized splits (MBs-GBs
    of distinct grams). A 1% slice of a 100 TB corpus is NOT that —
    its gram set is TB-scale; pass ``broadcast_eval=False`` there and
    both gram joins become ordinary hash joins on the gram key (AQE
    picks the strategy), trading one train-gram shuffle for driver/
    executor OOM safety. Leak-check such corpora at document
    granularity first (minhash/simhash tiers) and reserve the n-gram
    gate for the survivors.
    """
    assigned = split_corpus(docs, weights, key_col=key_col, salt=salt)
    grams = word_ngrams_from_tokens(F.col("_toks"), n)
    eval_docs = assigned.filter(F.col("split") != train_split)
    eval_grams = eval_docs.select(
        F.col(key_col), F.col("split"), tokenize_words(F.col(text_col)).alias("_toks")
    ).select(F.col(key_col), F.col("split"), F.explode(grams).alias("gram"))
    eval_gram_set = eval_grams.select("gram").distinct()
    train_grams = (
        assigned.filter(F.col("split") == train_split)
        .select(tokenize_words(F.col(text_col)).alias("_toks"))
        .select(F.explode(grams).alias("gram"))
    )
    small = F.broadcast if broadcast_eval else (lambda df: df)
    leaked_grams = (
        train_grams.join(small(eval_gram_set), "gram").select("gram").distinct()
    )
    hits = (
        eval_grams.join(small(leaked_grams), "gram")
        .groupBy(key_col, "split")
        .agg(F.count("*").alias("n_leaked_grams"))
    )
    return (
        eval_docs.select(key_col, "split")
        .join(hits, [key_col, "split"], "left")
        .select(
            F.col(key_col),
            F.col("split"),
            F.coalesce(F.col("n_leaked_grams"), F.lit(0)).alias("n_leaked_grams"),
            (F.coalesce(F.col("n_leaked_grams"), F.lit(0)) > 0).alias("leaked"),
        )
    )
