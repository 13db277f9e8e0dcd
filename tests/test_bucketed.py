"""Bucketed co-located joins: the join on the bucket key must plan NO
shuffle Exchange on either side; a non-bucketed read of the same data
must plan one (the control)."""

import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.sources.bucketed import (
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def two_tables(spark, tmp_path):
    links = spark.range(1000).select(
        F.col("id").alias("EventId"), (F.col("id") % 37).alias("EntityId")
    )
    records = spark.range(1000).select(
        F.col("id").alias("EventId"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    write_bucketed(links, "bk_links", ["EventId"], 8, path=str(tmp_path / "links"))
    write_bucketed(
        records, "bk_records", ["EventId"], 8, path=str(tmp_path / "records"),
        sort_cols=["EventId"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bk_links")
    spark.sql("DROP TABLE IF EXISTS bk_records")


def test_bucketed_join_plans_no_shuffle(spark, two_tables):
    # force sort-merge on both joins: broadcast would hide the shuffle
    # question entirely (these tables are tiny only in the test)
    joined = read_bucketed(spark, "bk_links").hint("merge").join(
        read_bucketed(spark, "bk_records"), "EventId"
    )
    # co-located: both sides bucketed on the join key, same bucket count
    assert not plan_has_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 1000

    # control: the same files read WITHOUT the catalog shuffle again
    raw = spark.read.parquet(read_bucketed(spark, "bk_links").inputFiles()[0].rsplit("/", 1)[0])
    control = raw.hint("merge").join(read_bucketed(spark, "bk_records"), "EventId")
    assert plan_has_exchange(control)


def test_bucketed_aggregation_skips_shuffle(spark, two_tables):
    # groupBy on the bucket key rides the existing layout too
    agg = read_bucketed(spark, "bk_links").groupBy("EventId").agg(F.count("*").alias("n"))
    assert not plan_has_exchange(agg)
    assert agg.count() == 1000
