"""Run reporting: summarise one linkage run, compare two runs
(operators O17-O23, /root/reference/src/reporting.jl).

The reference emulates a full outer join with two-sided sequential
iteration (reporting.jl:107-125) and has two latent bugs we deliberately
do NOT reproduce (SURVEY.md §3.3): tables only in run 2 are skipped
(reporting.jl:67) and an UndefVarError fires for tables with zero links
(reporting.jl:160). Here both paths are a true ``full_outer`` join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Status vocabulary, matching linkage_status (reporting.jl:167-173).
NONEXISTENT = "nonexistent"
UNLINKED = "unlinked"


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """O17 (get_set_of_values, reporting.jl:199-205)."""
    return df.select(col).distinct()


def compare_spines(spine1: DataFrame, spine2: DataFrame, key: str = "EntityId") -> DataFrame:
    """O18 (compare_spines!, reporting.jl:93-105): entity-set overlap.
    Output: (status1, status2, n) with statuses existent/nonexistent.

    One full-outer join + one aggregate — a single job scanning each
    spine once (three separate inner/anti-join counts would rescan both
    inputs three times)."""
    s1 = distinct_values(spine1, key).withColumn("_in1", F.lit(True))
    s2 = distinct_values(spine2, key).withColumn("_in2", F.lit(True))
    status = lambda c: F.when(c.isNotNull(), F.lit("existent")).otherwise(  # noqa: E731
        F.lit("nonexistent")
    )
    return (
        s1.join(s2, key, "full_outer")
        .select(status(F.col("_in1")).alias("status1"), status(F.col("_in2")).alias("status2"))
        .groupBy("status1", "status2")
        .agg(F.count("*").alias("n"))
        .orderBy("status1", "status2")
    )


def _status_col(linked_crit, present):
    """linkage_status (reporting.jl:167-173): nonexistent | unlinked |
    'linked with criteria ID k'."""
    return (
        F.when(~present, F.lit(NONEXISTENT))
        .when(linked_crit.isNull(), F.lit(UNLINKED))
        .otherwise(F.concat(F.lit("linked with criteria ID "), linked_crit.cast("string")))
    )


def compare_event_tables(
    events1: DataFrame,
    links1: DataFrame,
    events2: DataFrame,
    links2: DataFrame,
    tablename: str,
    event_key: str = "EventId",
) -> DataFrame:
    """O20+O21 (compare_event_tables!, reporting.jl:107-125): per-event
    status in each run via a true full outer join, then group-count.
    Output: (tablename, status1, status2, n) sorted."""
    def run_side(events: DataFrame, links: DataFrame, tag: str) -> DataFrame:
        lk = links.filter(F.col("TableName") == tablename).select(
            F.col(event_key), F.col("CriteriaId").alias(f"_crit{tag}")
        )
        return (
            events.select(event_key)
            .distinct()
            .join(lk, event_key, "left")
            .withColumn(f"_present{tag}", F.lit(True))
        )

    r1 = run_side(events1, links1, "1")
    r2 = run_side(events2, links2, "2")
    full = r1.join(r2, event_key, "full_outer")
    out = full.select(
        _status_col(F.col("_crit1"), F.coalesce(F.col("_present1"), F.lit(False))).alias("status1"),
        _status_col(F.col("_crit2"), F.coalesce(F.col("_present2"), F.lit(False))).alias("status2"),
    )
    return (
        out.groupBy("status1", "status2")
        .agg(F.count("*").alias("n"))
        .select(F.lit(tablename).alias("tablename"), "status1", "status2", "n")
        .orderBy("tablename", "status1", "status2")
    )


def summarise_run(
    events: DataFrame, links: DataFrame, tablename: str, event_key: str = "EventId"
) -> DataFrame:
    """O23 (summarise_linkage_run, reporting.jl:11-24): the degenerate
    single-run report — status counts per table. Output: (tablename,
    status, n) sorted."""
    lk = links.filter(F.col("TableName") == tablename).select(
        event_key, F.col("CriteriaId").alias("_crit")
    )
    st = (
        events.select(event_key)
        .distinct()
        .join(lk, event_key, "left")
        .select(_status_col(F.col("_crit"), F.lit(True)).alias("status"))
    )
    return (
        st.groupBy("status")
        .agg(F.count("*").alias("n"))
        .select(F.lit(tablename).alias("tablename"), "status", "n")
        .orderBy("tablename", "status")
    )
