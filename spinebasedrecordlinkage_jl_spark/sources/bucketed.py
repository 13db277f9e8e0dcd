"""Bucketed tables: co-located, shuffle-free joins for the big
recurring joins (records x links, links x spine).

At 100 TB the dominant cost of the linkage re-run loop is re-shuffling
the same tables on the same keys every run. Hive-style bucketing fixes
the partitioning INTO THE STORAGE LAYOUT: both sides pre-hashed into
the same number of buckets on the join key, so Catalyst plans a
sort-merge join with NO Exchange on either side (run-over-run, the
shuffle is paid once at write time, then never again).

Spark requires ``saveAsTable`` for bucketed writes (the bucket spec
lives in the catalog, not the parquet footer); ``path`` makes it an
external table so the data outlives the catalog entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) table.

    ``n_buckets`` must MATCH across tables meant to join shuffle-free,
    and should be sized so one bucket of the largest table fits an
    executor's sort budget (at 100 TB: thousands of buckets, not 32).
    ``sort_cols`` additionally sorts within each bucket file, letting
    the sort-merge join skip its sort too.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read: the bucket spec is honored only through the
    catalog — ``spark.read.parquet(path)`` on the same files would
    plan shuffles again."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    assertion helper for co-location tests and plan audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
