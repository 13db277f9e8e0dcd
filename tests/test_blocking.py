"""Blocking operators: hash blocks, salting, pair generation, purge."""

from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.operators.blocking import (
    add_block_key,
    candidate_pairs,
    hash_block_key,
    salt_column,
)


def _records(spark, rows):
    return spark.createDataFrame(rows, "EventId long, norm_text string, k string")


def test_hash_block_key_deterministic_and_bounded(spark):
    df = spark.range(100).select(
        F.col("id").alias("EventId"), F.concat(F.lit("t"), F.col("id") % 7).alias("norm_text")
    )
    out = df.select(hash_block_key(F.col("norm_text"), n_blocks=64).alias("b")).collect()
    vals = {r["b"] for r in out}
    assert all(0 <= v < 64 for v in vals)
    # same text -> same block
    again = {r["b"] for r in df.select(hash_block_key(F.col("norm_text"), n_blocks=64).alias("b")).collect()}
    assert vals == again


def test_salt_spreads_hot_block(spark):
    df = spark.range(1000).select(
        F.col("id").alias("EventId"), F.lit("smith").alias("k")
    )
    out = df.select(salt_column(F.col("EventId"), 8).alias("s")).groupBy("s").count().collect()
    assert len(out) == 8  # hot key split across all 8 salted sub-blocks
    assert max(r["count"] for r in out) < 1000 * 0.3


def test_add_block_key_columns(spark):
    df = _records(spark, [(1, "hello world", "x"), (2, "hello world", "y")])
    out = add_block_key(df, ["norm_text"], pk_col="EventId", salt_buckets=4)
    assert {"block_key", "block_salt"} <= set(out.columns)
    rows = out.collect()
    assert rows[0]["block_key"] == rows[1]["block_key"]  # same text same block


def test_candidate_pairs_within_block(spark):
    df = _records(spark, [(1, "a", "k1"), (2, "a", "k1"), (3, "a", "k2"), (4, "a", "k2"), (5, "a", "k3")])
    pairs, purged = candidate_pairs(df, block_on=["k"], max_block_size=10)
    got = {(r["EventId_1"], r["EventId_2"]) for r in pairs.collect()}
    assert got == {(1, 2), (3, 4)}
    assert purged.count() == 0


def test_candidate_pairs_null_keys_never_pair(spark):
    df = _records(spark, [(1, "a", None), (2, "a", None), (3, "a", "k")])
    pairs, _ = candidate_pairs(df, block_on=["k"])
    assert pairs.count() == 0


def test_block_purge_audit(spark):
    rows = [(i, "x", "hot") for i in range(20)] + [(100, "x", "cold"), (101, "x", "cold")]
    df = _records(spark, rows)
    pairs, purged = candidate_pairs(df, block_on=["k"], max_block_size=5)
    got = {(r["EventId_1"], r["EventId_2"]) for r in pairs.collect()}
    assert got == {(100, 101)}  # hot block dropped entirely
    audit = purged.collect()
    assert len(audit) == 1 and audit[0]["_bsize"] == 20  # ...and accounted for


def test_blocking_profile_buckets_and_pair_mass(spark):
    from spinebasedrecordlinkage_jl_spark.operators.blocking import blocking_profile

    # blocks: "hot"=9 records (bucket 3), "warm"=3 (bucket 1),
    # two singletons (bucket 0), one null key (excluded entirely)
    rows = (
        [(i, "x", "hot") for i in range(9)]
        + [(20 + i, "x", "warm") for i in range(3)]
        + [(30, "x", "s1"), (31, "x", "s2"), (32, "x", None)]
    )
    df = _records(spark, rows)
    prof = {r["size_bucket"]: r for r in blocking_profile(df, ["k"]).collect()}

    assert set(prof) == {0, 1, 3}
    assert prof[3]["n_blocks"] == 1
    assert prof[3]["n_records"] == 9
    assert prof[3]["n_cand_pairs"] == 36  # 9*8/2
    assert prof[3]["max_block_size"] == 9
    assert prof[1]["n_cand_pairs"] == 3
    assert prof[0]["n_blocks"] == 2 and prof[0]["n_cand_pairs"] == 0
    # total candidate mass equals what candidate_pairs would emit unpurged
    pairs, _ = candidate_pairs(df, block_on=["k"], max_block_size=None)
    assert sum(r["n_cand_pairs"] for r in prof.values()) == pairs.count()
