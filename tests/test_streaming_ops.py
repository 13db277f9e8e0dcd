"""Streaming custom stateful dedup (applyInPandasWithState) + streaming
linkage via foreachBatch — availableNow end-to-end over parquet dirs."""

from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.config import ApproxMatch, LinkageCriteria
from spinebasedrecordlinkage_jl_spark.streaming.dedup import stream_exact_dedup
from spinebasedrecordlinkage_jl_spark.streaming.linkage import stream_link_to_spine

DOC_SCHEMA = "doc_id long, text string"


def test_stream_exact_dedup_first_wins(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    # two batches of files with duplicates within and across batches
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [(5, "beta"), (6, "delta"), (7, "alpha")], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    out_dir = str(tmp_path / "out")
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["text"]: r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # one row per distinct text, lowest doc_id wins
    assert got == {"alpha": 1, "beta": 2, "gamma": 4, "delta": 6}


def test_stream_link_to_spine(spark, tmp_path):
    spine = spark.createDataFrame(
        [(100, 100, "john", "smith"), (200, 200, "mary", "jones")],
        "EntityId long, spine_seq long, firstname string, lastname string",
    )
    crits = [
        LinkageCriteria(
            id=1, tablename="t", exactmatch={"firstname": "firstname", "lastname": "lastname"}
        ),
        LinkageCriteria(
            id=2,
            tablename="t",
            exactmatch={"firstname": "firstname"},
            approxmatch=(ApproxMatch("lastname", "lastname", "levenshtein", 0.35),),
        ),
    ]
    in_dir = str(tmp_path / "records")
    spark.createDataFrame(
        [
            (1, "john", "smith"),   # exact -> crit 1
            (2, "mary", "jonez"),   # fuzzy -> crit 2
            (3, "paul", "brown"),   # no match
        ],
        "EventId long, firstname string, lastname string",
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(
        "EventId long, firstname string, lastname string"
    ).parquet(in_dir)

    batches = []

    def sink(links, epoch_id):
        batches.append((epoch_id, {tuple(r) for r in links.collect()}))

    q = stream_link_to_spine(
        stream, spine, crits, "t", sink,
        checkpoint_dir=str(tmp_path / "ck2"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    all_links = set().union(*(s for _, s in batches))
    assert all_links == {
        ("t", 1, 100, 1),
        ("t", 2, 200, 2),
    }
