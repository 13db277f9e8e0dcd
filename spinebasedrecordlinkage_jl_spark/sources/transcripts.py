"""Synthetic multi-turn transcript tables (the input_hint schema).

Two generators:

1. ``synthesize_transcripts`` — a fully distributed, deterministic
   generator (seeded xxhash64 pseudo-randomness, **no driver-side loops,
   no Python RNG**) producing a transcripts table plus ground-truth entity
   labels. Entities own 1-4 conversations whose first user turn carries
   the entity's identity fields with controlled corruptions mirroring the
   reference fixtures (/root/reference/test/data/influenza_cases.csv,
   README.md:160-166): exact duplicates, a single-char append (normalized
   Levenshtein 1/6 <= 0.3), a truncation (4/9 <= 0.5), missing fields, and
   a hot surname block to exercise skew handling. Because every column is
   a pure Catalyst expression over ``spark.range``, the same generator
   scales from 200 conversations (tests) to millions (bench) with linear
   partitioned parallelism.

2. ``transcripts_from_events`` — derives a transcripts-shaped table from
   the driver's ``events`` testdata so that Spark queries and the DuckDB
   oracle can run over identical input; ``EVENTS_TO_TRANSCRIPTS_SQL`` is
   the DuckDB-side twin and MUST stay in lockstep.

Transcripts schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The input_hint table shape (BASELINE.json): one row per turn. Every
#: ingest path — batch parquet, JSONL, the streaming reader — declares
#: this schema explicitly so no format ever falls back to inference
#: (JSON/CSV inference is a full pre-scan of the input at 100 TB).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# Name pools — indexed by hash, so the same id always gets the same name.
_FIRST = ["john", "jane", "robert", "elizabeth", "mary", "david", "sarah", "michael",
          "laura", "james", "emily", "thomas", "anna", "peter", "alice", "george"]
_LAST = ["jones", "taylor", "brown", "wilson", "evans", "walker", "wright", "hall",
         "green", "baker", "adams", "clarke", "lewis", "scott", "young", "king"]
_FILLER = ["can you help me with my account", "sure let me look into that",
           "what is the status of my order", "i will check the database now",
           "thanks that resolved my issue", "please hold while i verify",
           "the report shows three entries", "let me run that tool for you"]
_TOOLS = ["search", "lookup", "calculator", "db_query"]

#: Fraction-of-16 of entities forced into the hot surname block ("smith"),
#: creating the skewed blocking key the north rule requires us to handle.
_HOT_BUCKETS = 3  # 3/16 ≈ 19% of entities share lastname "smith"


def _pick(pool: list[str], col):
    """Deterministic pool pick: pool[hash % len] as a Catalyst expression."""
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (F.pmod(col, F.lit(len(pool))) + 1).cast("int"))


def synthesize_transcripts(
    spark: SparkSession,
    n_entities: int = 60,
    seed: int = 42,
    partitions: int | None = None,
    max_convs_per_entity: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(transcripts, labels)``.

    ``transcripts`` has the exact input_hint schema; ``labels`` is
    ``(conv_id:string, gt_entity:long)`` ground truth for the pairwise-F1
    harness (BASELINE.json metric).
    """
    s = F.lit(str(seed))
    ent = spark.range(n_entities, numPartitions=partitions)

    def h(tag: str, *cols):
        return F.abs(F.xxhash64(s, F.lit(tag), *cols))

    # --- entity canonical records -------------------------------------
    ent = ent.select(
        F.col("id").alias("gt_entity"),
        _pick(_FIRST, h("fn", F.col("id"))).alias("c_first"),
        # hot block: a slice of entities all share the surname "smith"
        F.when(F.pmod(h("hot", F.col("id")), F.lit(16)) < _HOT_BUCKETS, F.lit("smith"))
        .otherwise(_pick(_LAST, h("ln", F.col("id"))))
        .alias("c_last"),
        F.concat(
            F.lit("19"),
            F.lpad((F.pmod(h("yy", F.col("id")), F.lit(80))).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.pmod(h("mm", F.col("id")), F.lit(12)) + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.pmod(h("dd", F.col("id")), F.lit(28)) + 1).cast("string"), 2, "0"),
        ).alias("c_dob"),
    )

    # --- conversations: 1..max_convs_per_entity per entity ------------
    convs = ent.select(
        "*",
        F.explode(
            F.sequence(
                F.lit(0),
                F.pmod(h("nc", F.col("gt_entity")), F.lit(max_convs_per_entity)).cast("int"),
            )
        ).alias("conv_idx"),
    )
    convs = convs.withColumn(
        "conv_id",
        F.concat(F.lit("c"), F.lpad(F.col("gt_entity").cast("string"), 7, "0"),
                 F.lit("_"), F.col("conv_idx").cast("string")),
    )
    # Conversation 0 always carries the entity's canonical fields (the
    # record that seeds the spine); later conversations get corruptions
    # at ~19% (3/16) rate.
    corr = F.when(F.col("conv_idx") == 0, F.lit(0)).otherwise(
        F.pmod(h("corr", F.col("conv_id")), F.lit(16))
    )
    convs = convs.select(
        "gt_entity",
        "conv_id",
        # corruption 3: append duplicate of the final surname char
        # ("smith" -> "smithh", normalized Levenshtein 1/6) — links under a
        # fuzzy criterion with threshold 0.3, like the reference golden.
        F.when(corr == 3, F.concat(F.col("c_last"), F.substring(F.col("c_last"), -1, 1)))
        .otherwise(F.col("c_last"))
        .alias("lastname"),
        # corruption 4: truncate the firstname ("elizabeth" -> "eliz...")
        F.when(corr == 4, F.substring(F.col("c_first"), 1, 5))
        .otherwise(F.col("c_first"))
        .alias("firstname"),
        # corruption 5: missing birthdate (criteria requiring it are
        # skipped for this record — runlinkage.jl:378-385 semantics)
        F.when(corr == 5, F.lit(None).cast("string")).otherwise(F.col("c_dob")).alias("dob"),
        F.pmod(h("nt", F.col("conv_id")), F.lit(8)).cast("int").alias("extra_turns"),
    )

    labels = convs.select("conv_id", "gt_entity")

    # --- turns ----------------------------------------------------------
    turns = convs.select(
        "conv_id", "firstname", "lastname", "dob",
        F.explode(F.sequence(F.lit(0), F.col("extra_turns") + 2)).alias("turn_idx"),
    )
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(F.pmod(h("tool", F.col("conv_id"), F.col("turn_idx")), F.lit(5)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    transcripts = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        # turn 0 carries the identity sentence the linkage fields are
        # extracted from; later turns are deterministic filler.
        F.when(
            F.col("turn_idx") == 0,
            F.concat_ws(" ", F.lit("hello my name is"), F.col("firstname"),
                        F.col("lastname"), F.coalesce(F.col("dob"), F.lit("unknown"))),
        )
        .otherwise(_pick(_FILLER, h("fill", F.col("conv_id"), F.col("turn_idx"))))
        .alias("text"),
        F.when(role == "tool", _pick(_TOOLS, h("tn", F.col("conv_id"), F.col("turn_idx"))))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + F.pmod(F.xxhash64(s, F.lit("t0"), F.col("conv_id")), F.lit(86400))
            + F.col("turn_idx") * 7
        ).alias("ts"),
    )
    return transcripts, labels


# ---------------------------------------------------------------------------
# Transcripts derived from the driver's `events` testdata table.
# The SQL constant is the DuckDB twin of the Spark builder below — the
# correctness gate depends on these two staying semantically identical.
# ---------------------------------------------------------------------------

EVENTS_TO_TRANSCRIPTS_SQL = """
    SELECT concat('u', CAST(user_id AS VARCHAR)) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
           event_type AS role,
           props AS text,
           CASE WHEN event_type = 'click' THEN 'pointer' ELSE NULL END AS tool,
           ts
    FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of EVENTS_TO_TRANSCRIPTS_SQL over events.parquet."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("pointer"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )
