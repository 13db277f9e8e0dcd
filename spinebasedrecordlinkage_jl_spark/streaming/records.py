"""Streaming transcripts -> conversation records.

The reference streams its input CSV row-by-row in a single process
(/root/reference/src/runlinkage.jl:128). The Spark-native streaming
equivalent is Structured Streaming: ``readStream`` over an append-only
directory (or Kafka/Iceberg CDC in production), watermarked event-time
aggregation into per-conversation records, and ``writeStream`` into the
records table the batch linkage passes consume.

Late turns are handled by the watermark: a conversation's record is
emitted once its max event time passes ``watermark`` behind the stream's
clock; later-arriving turns for that conversation are dropped (counted
in the streaming metrics), which preserves the per-turn ordering
invariant for everything emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(
    spark: SparkSession, input_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """readStream over an append-only directory of turns.

    ``fmt="parquet"`` for compacted landing tables; ``fmt="json"`` tails
    JSONL/NDJSON log files as a shipper drops them — the same declared
    TRANSCRIPT_SCHEMA either way (streaming JSON never infers), and the
    same downstream session-window aggregation."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
        "maxFilesPerTrigger", 16
    )
    if fmt == "parquet":
        return reader.parquet(input_dir)
    if fmt in {"json", "jsonl", "ndjson"}:
        return reader.json(input_dir)
    raise ValueError(f"stream_transcripts: unsupported fmt {fmt!r}")


def stream_conversation_records(
    turns: DataFrame, watermark: str = "1 minute", session_gap: str = "2 minutes"
) -> DataFrame:
    """Watermarked per-conversation aggregation (append output mode).

    Same derivation as operators.records.conversation_records, expressed
    as a streaming aggregation with a SESSION window: a conversation's
    record is emitted once the watermark passes its last turn plus the
    session gap (the streaming definition of "the conversation ended").
    Turns arriving later than the watermark are dropped — the price of
    append-mode emission; everything emitted preserves the per-turn
    ordering invariant. State per open conversation is one aggregation
    buffer bounded by the conversation's turn count.
    """
    turn_struct = F.struct("turn_idx", "role", "text", "tool", "ts")
    agg = (
        turns.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window(F.col("ts"), session_gap).alias("_w"),
        )
        .agg(F.sort_array(F.collect_list(turn_struct)).alias("turns"))
    )
    texts = F.transform(F.col("turns"), lambda t: t["text"])
    return agg.select(
        "conv_id",
        F.xxhash64(F.lit("transcripts"), F.col("conv_id")).alias("EventId"),
        "turns",
        F.size("turns").alias("n_turns"),
        F.element_at(texts, 1).alias("first_text"),
        F.substring(F.lower(F.concat_ws(" ", texts)), 1, 256).alias("norm_text"),
    )
