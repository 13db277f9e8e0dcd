"""Transcripts -> per-conversation records (stage-1 aggregation).

The reference consumes one row per *event* (/root/reference/README.md:9-19);
our payload is multi-turn transcripts, so one upstream stage aggregates
turns into a single record per conversation under **stable turn ordering**
(the per-row invariant from BASELINE.json input_hint: per-turn text
equality must hold after aggregation).

Implementation is a single shuffle: ``groupBy(conv_id)`` with
``sort_array(collect_list(struct(turn_idx, ...)))`` — the struct puts
``turn_idx`` first so ``sort_array`` yields deterministic per-turn order
without a second shuffle or a window. All derived linkage columns are
array expressions over the sorted struct array (JVM-side, no UDFs).

Scale note: this is the only full shuffle of the raw 10^12-turn table.
conv_id is a high-cardinality key, so the shuffle partitions evenly; a
conversation's turns (3-12 rows) always fit in one aggregation buffer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Surrogate EventId (operator O5): 64-bit content hash of table name +
#: primary key, the analogue of /root/reference/src/runlinkage.jl:131-142
#: (hash(tablename * join(pk values))). xxhash64 is Spark-native (JVM).
def event_id(tablename: str, *pk_cols: Column) -> Column:
    return F.xxhash64(F.lit(tablename), *pk_cols)


def _default_extractors() -> dict[str, Column]:
    """Linkage-field extractors for the synthetic identity sentence
    ``hello my name is <firstname> <lastname> <dob>`` (turn 0)."""
    toks = F.split(F.col("first_user_text"), " ")
    dob = F.element_at(toks, 7)
    return {
        "firstname": F.element_at(toks, 5),
        "lastname": F.element_at(toks, 6),
        "birthdate": F.when(dob == "unknown", F.lit(None).cast("string")).otherwise(dob),
    }


def conversation_records(
    transcripts: DataFrame,
    tablename: str = "transcripts",
    extractors: dict[str, Column] | None = None,
    norm_text_prefix: int = 256,
) -> DataFrame:
    """Aggregate a transcripts table into one record per conversation.

    Output columns (FIXTURES.md F2):
      conv_id, EventId, turns (sorted struct array), n_turns,
      first_user_text, norm_text, ts_min, + extracted linkage columns.
    """
    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")
    )
    rec = transcripts.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn_struct)).alias("turns")
    )

    texts = F.transform(F.col("turns"), lambda t: t["text"])
    user_turns = F.filter(F.col("turns"), lambda t: t["role"] == F.lit("user"))
    rec = rec.select(
        "conv_id",
        event_id(tablename, F.col("conv_id")).alias("EventId"),
        "turns",
        F.size(F.col("turns")).alias("n_turns"),
        F.element_at(F.transform(user_turns, lambda t: t["text"]), 1).alias("first_user_text"),
        # normalized text for hash blocks: lowercased concatenation,
        # truncated so the blocking key stays bounded at transcript scale
        F.substring(
            F.lower(F.concat_ws(" ", texts)), 1, norm_text_prefix
        ).alias("norm_text"),
        F.array_min(F.transform(F.col("turns"), lambda t: t["ts"])).alias("ts_min"),
    )

    ex = _default_extractors() if extractors is None else extractors
    for name, col in ex.items():
        rec = rec.withColumn(name, col)
    return rec


def linkage_records(
    transcripts: DataFrame,
    tablename: str = "transcripts",
    extractors: dict[str, Column] | None = None,
) -> DataFrame:
    """Shuffle-pruned records aggregation for the linkage hot path.

    ``conversation_records`` carries the full sorted turn array (the
    per-turn-equality contract needs it), which forces every text/tool/ts
    byte through the groupBy shuffle — Catalyst cannot prune columns
    through ``collect_list(struct(...))``. The linkage criteria only
    consume fields extracted from the FIRST USER TURN, so this variant
    aggregates exactly that: filter to user rows (pushed into the scan),
    shuffle only (conv_id, turn_idx, text), and take ``min_by(text,
    turn_idx)`` — "first" under the same stable turn ordering. At
    transcript scale this shrinks the one full shuffle of the raw table
    by the ratio of identity-turn bytes to conversation bytes (>10x).

    Conversations with no user turn are absent from the output; their
    linkage fields would be NULL and the validity filter (O6,
    runlinkage.jl:136-154) drops them anyway.

    Output: conv_id, EventId, first_user_text + extracted linkage columns
    (a column-pruned projection of ``conversation_records`` — per-row
    equal on the shared columns, enforced by tests).
    """
    # min over struct(turn_idx, text) — NOT min_by(text, turn_idx), which
    # picks arbitrarily on duplicate turn_idx: ties must break by text,
    # exactly as conversation_records' sort_array over (turn_idx, role,
    # text, ...) does for the filtered role (the per-row equal-projection
    # invariant; tool/ts never differ in ordering when text is equal
    # because first_user_text only exposes the text field).
    rec = (
        transcripts.filter(F.col("role") == "user")
        .select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .agg(F.min(F.struct("turn_idx", "text")).alias("_first"))
        .select(
            "conv_id",
            event_id(tablename, F.col("conv_id")).alias("EventId"),
            F.col("_first.text").alias("first_user_text"),
        )
    )
    ex = _default_extractors() if extractors is None else extractors
    for name, col in ex.items():
        rec = rec.withColumn(name, col)
    return rec


def explode_records(records: DataFrame) -> DataFrame:
    """Inverse of the aggregation (for the per-turn-equality invariant
    test): records -> one row per turn, original schema + conv_id."""
    t = F.explode(F.col("turns")).alias("t")
    return records.select("conv_id", t).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def transcript_checks(
    transcripts: DataFrame,
    valid_roles: tuple[str, ...] = ("user", "assistant", "tool"),
    must_start_with: str | None = "user",
) -> DataFrame:
    """Per-conversation STRUCTURAL validation of raw transcripts — the
    transcript-tier curation gate that runs BEFORE records aggregation
    (a malformed conversation caught here never pays the linkage path).

    One shuffle (the same groupBy(conv_id) shape as
    ``conversation_records``); every check is an array expression over
    the sorted turn structs — JVM, codegen, no UDFs.

    Output per conv_id (counts are longs, flags 0/1 ints):
      n_turns, n_bad_role (role NULL or outside ``valid_roles``),
      n_empty_text (NULL/blank text), n_dup_turn_idx, contiguous
      (turn_idx covers 0..k with no gap), starts_ok (first turn's role
      is ``must_start_with``; 1 when the check is disabled with None),
      n_alternation_violations (adjacent turns sharing a role —
      informational, not gating: tool loops legitimately repeat),
      n_tool_turns, keep, reasons (deterministic comma-joined flag
      list, same contract as ``curation.quality_filter``).
    """
    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")
    )
    rec = transcripts.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn_struct)).alias("_turns")
    )

    roles = F.transform(F.col("_turns"), lambda t: t["role"])
    idxs = F.transform(F.col("_turns"), lambda t: t["turn_idx"])
    n = F.size(F.col("_turns"))
    bad_role = F.size(
        F.filter(roles, lambda r: F.coalesce(~r.isin(*valid_roles), F.lit(True)))
    )
    empty_text = F.size(
        F.filter(
            F.col("_turns"),
            lambda t: t["text"].isNull() | (F.trim(t["text"]) == ""),
        )
    )
    # NULL turn_idx (reachable via malformed='null' JSONL ingest) follows
    # SQL aggregate semantics: count(DISTINCT)/min/max drop NULLs, so a
    # NULL index counts as a duplicate and can never satisfy contiguity
    idxs_nn = F.filter(idxs, lambda x: x.isNotNull())
    dup_idx = n - F.size(F.array_distinct(idxs_nn))
    contiguous = F.coalesce(
        (
            (F.array_min(idxs_nn) == 0)
            & (F.array_max(idxs_nn) == F.size(F.array_distinct(idxs_nn)) - 1)
        ).cast("int"),
        F.lit(0),
    )
    starts_ok = (
        F.lit(1)
        if must_start_with is None
        else F.coalesce(
            (F.element_at(roles, 1) == must_start_with).cast("int"), F.lit(0)
        )
    )
    # adjacent-pair role repeats, in sorted turn order: zip the array
    # against itself shifted by one (slice is 1-based; length n-1)
    altern = F.size(
        F.filter(
            F.zip_with(
                F.slice(roles, 1, n - 1),
                F.slice(roles, 2, n - 1),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    )
    tool_turns = F.size(F.filter(F.col("_turns"), lambda t: t["tool"].isNotNull()))

    out = rec.select(
        "conv_id",
        n.cast("long").alias("n_turns"),
        bad_role.cast("long").alias("n_bad_role"),
        empty_text.cast("long").alias("n_empty_text"),
        dup_idx.cast("long").alias("n_dup_turn_idx"),
        contiguous.alias("contiguous"),
        starts_ok.alias("starts_ok"),
        altern.cast("long").alias("n_alternation_violations"),
        tool_turns.cast("long").alias("n_tool_turns"),
    )
    keep = (
        (F.col("n_bad_role") == 0)
        & (F.col("n_empty_text") == 0)
        & (F.col("n_dup_turn_idx") == 0)
        & (F.col("contiguous") == 1)
        & (F.col("starts_ok") == 1)
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_bad_role") > 0, F.lit("bad_role")),
        F.when(F.col("n_empty_text") > 0, F.lit("empty_text")),
        F.when(F.col("n_dup_turn_idx") > 0, F.lit("dup_turn_idx")),
        F.when(F.col("contiguous") == 0, F.lit("not_contiguous")),
        F.when(F.col("starts_ok") == 0, F.lit("bad_start")),
    )
    return out.withColumn("keep", keep.cast("int")).withColumn("reasons", reasons)


def scrub_transcripts(
    transcripts: DataFrame, return_report: bool = False
):
    """Turn-level PII redaction over a raw transcripts table — the
    safety pass a conversation corpus takes BEFORE records aggregation,
    linkage, or training export. Applies the same conservative email /
    long-digit-run patterns as ``curation.pii_scrub`` (Java-regex ∩ RE2,
    so the SQL oracle replays them byte-for-byte) to every turn's text.

    Returns a frame with the SAME transcript schema (text replaced,
    plus an ``n_redactions`` count per turn) so it drops into any
    existing consumer; with ``return_report=True`` also a
    per-conversation audit frame (conv_id, n_redactions,
    n_turns_redacted) — the number a privacy review asks for first.

    100 TB shape: the scrub is pure codegen regexp work, map-side over
    the turn table (no shuffle); only the optional report aggregates,
    keyed on conv_id like every other per-conversation stage."""
    from .curation import EMAIL_PATTERN, LONG_NUMBER_PATTERN

    text = F.col("text")
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(no_email, F.lit(LONG_NUMBER_PATTERN), 0))
    scrubbed = F.regexp_replace(no_email, LONG_NUMBER_PATTERN, "<NUMBER>")
    # size(NULL) is -1 in Spark (not NULL) — a NULL-text turn must count
    # 0 redactions, not -2
    n_red = F.when(text.isNull(), F.lit(0)).otherwise(n_emails + n_nums).cast("long")

    out = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        scrubbed.alias("text"),
        "tool",
        "ts",
        n_red.alias("n_redactions"),
    )
    if not return_report:
        return out
    report = out.groupBy("conv_id").agg(
        F.sum("n_redactions").cast("long").alias("n_redactions"),
        F.sum((F.col("n_redactions") > 0).cast("int")).cast("long").alias(
            "n_turns_redacted"
        ),
    )
    return out, report


def truncate_conversations(
    transcripts: DataFrame,
    max_tokens: int,
    count_tokens: Column | None = None,
) -> DataFrame:
    """Context-window preparation for conversation data: keep each
    conversation's PREFIX of turns whose running token total fits
    ``max_tokens`` — the turn-granular analogue of cutting a document
    at the context length (a turn is never split; a first turn larger
    than the budget drops its whole conversation, the honest reading
    of "does not fit").

    ``count_tokens``: expression producing the per-turn token count
    (default: whitespace tokens of ``text``; NULL text counts 0).

    Output: the input columns + ``n_turn_tokens`` and ``cum_tokens``
    (the running total INCLUDING the turn), filtered to
    ``cum_tokens <= max_tokens``.

    100 TB shape: one window (partitionBy conv_id, orderBy turn_idx —
    the same key every per-conversation stage shuffles on; a
    conversation's turns always fit one partition) computing the
    cumulative sum, then a map-side filter. No second pass, no
    per-conversation collect.
    """
    from pyspark.sql import Window

    from ..functions.text import ws_token_count

    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    # NULL text counts 0 — guarded with when(), not coalesce: Spark's
    # size() over the NULL split returns -1, not NULL
    tok = (
        count_tokens
        if count_tokens is not None
        else F.when(F.col("text").isNull(), F.lit(0)).otherwise(
            ws_token_count(F.col("text"))
        )
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = transcripts.withColumn("n_turn_tokens", tok.cast("long")).withColumn(
        "cum_tokens", F.sum("n_turn_tokens").over(w)
    )
    return out.filter(F.col("cum_tokens") <= max_tokens)


def turn_boilerplate(
    transcripts: DataFrame,
    min_convs: int = 3,
) -> DataFrame:
    """Cross-conversation canned-turn detection: a turn is boilerplate
    when its normalized text appears — under the same role — in
    >= ``min_convs`` DISTINCT conversations (templated tool output,
    canned assistant responses; the transcript-tier twin of the
    corpus-level ``line_dedup``). Output: one row per input turn,
    ``(conv_id, turn_idx, role, n_convs_with_text, is_boilerplate)``.
    NULL text is never boilerplate (count 0).

    100 TB shape: the distinct-conversation count contracts per
    (role, text-hash, conv_id) first — both aggregations are
    map-side-combinable, so a canned line shared by millions of
    conversations is a hot VALUE but never a hot unsplittable task —
    and the flag frame the corpus joins back against has one row per
    distinct (role, text): the turn vocabulary, not the corpus (AQE
    broadcasts it when small). The corpus itself shuffles once, on the
    fixed-width hash key.
    """
    if min_convs < 1:
        raise ValueError(f"min_convs must be >= 1, got {min_convs}")
    key = F.md5(F.concat_ws(" ", F.col("role"), F.trim(F.lower(F.col("text")))))
    with_key = transcripts.withColumn(
        "_k", F.when(F.col("text").isNull(), F.lit(None)).otherwise(key)
    )
    counts = (
        with_key.filter(F.col("_k").isNotNull())
        .select("_k", "conv_id")
        .distinct()
        .groupBy("_k")
        .agg(F.count("*").cast("bigint").alias("_n_convs"))
    )
    return (
        with_key.join(counts, "_k", "left")
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.coalesce(F.col("_n_convs"), F.lit(0))
            .cast("bigint")
            .alias("n_convs_with_text"),
            (F.coalesce(F.col("_n_convs"), F.lit(0)) >= min_convs).alias(
                "is_boilerplate"
            ),
        )
    )
