"""Corpus sinks: trainer-facing sharded output.

The end of a curation pipeline is a directory of size-bounded shard
files a training loader can stream, shuffle and checkpoint against —
not one giant file per Spark partition. ``write_corpus_shards`` bounds
records per file (Spark splits a task's output at
``maxRecordsPerFile``), optionally partitions the layout by a column
(source, language, ...) and sorts rows within shards (duplicate-adjacent
layouts compress better), then builds a per-file manifest the loader
can use for deterministic sharding across trainer workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    partition_by: str | None = None,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    salt_buckets: int | None = None,
) -> None:
    """Write ``df`` as shards of at most ``max_records_per_file`` rows
    each. ``fmt``: ``"parquet"`` (training-loader default) or
    ``"json"`` (JSONL interchange — gzip-compressed, the format most
    external tooling ingests).

    100 TB shape: this is a plain distributed write — no extra shuffle
    unless ``partition_by`` is set (then one hash repartition on
    ``(partition_by, salt)`` so each directory partition is written by a
    bounded number of tasks — ``salt_buckets``, default the session's
    parallelism — instead of either one task per distinct value, which
    serializes a skewed corpus where one source dominates, or every task
    appending to every directory). The salt is ``spark_partition_id() %
    salt_buckets``: deterministic under retry, no row hashing, and each
    upstream partition lands whole in one bucket. ``sort_within`` sorts
    rows inside each task's output (sortWithinPartitions — NOT a global
    orderBy, which would be an all-to-all range shuffle the loader
    doesn't need).
    """
    if max_records_per_file <= 0:
        raise ValueError(
            f"max_records_per_file must be positive, got {max_records_per_file}"
        )
    out = df
    if partition_by is not None:
        if salt_buckets is None:
            salt_buckets = df.sparkSession.sparkContext.defaultParallelism
        if salt_buckets < 1:
            raise ValueError(f"salt_buckets must be positive, got {salt_buckets}")
        salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
        # explicit numPartitions: a column-only repartition lets AQE
        # coalesce the tiny shuffle back into one task, re-serializing
        # the write; one writer wave of the session's parallelism is the
        # right sink shape at any scale
        n_parts = max(salt_buckets, df.sparkSession.sparkContext.defaultParallelism)
        out = out.repartition(n_parts, F.col(partition_by), salt)
    if sort_within:
        # the file writer requires task ordering to START with the
        # partition columns (else it inserts its own sort by them,
        # discarding ours) — prefix them so both orderings coexist
        keys = ([partition_by] if partition_by else []) + list(sort_within)
        out = out.sortWithinPartitions(*keys)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt in {"json", "jsonl"}:
        writer.option("compression", "gzip").json(path)
    else:
        raise ValueError(f"write_corpus_shards: unsupported fmt {fmt!r}")


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard manifest of a written corpus: (shard_path, n_records).

    Computed by scanning the parquet footers' row counts via a
    metadata-only aggregation over ``_metadata.file_path`` — one job,
    no full data read needed beyond the count per file. Trainer loaders
    use it to assign shards to workers deterministically and to verify
    a resume saw every file."""
    df = spark.read.parquet(path)
    return (
        df.select(F.col("_metadata.file_path").alias("shard_path"))
        .groupBy("shard_path")
        .agg(F.count("*").alias("n_records"))
    )
