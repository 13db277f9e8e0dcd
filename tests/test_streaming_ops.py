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


def test_stream_spine_refresh_links_new_entities(spark, tmp_path):
    """A record unlinked in run 1 links in run 2 after the batch
    entity-formation job grows the spine parquet — spine_refresh re-reads
    it per micro-batch, so the streaming query picks up new entities
    without being rebuilt against a new frozen frame."""
    spine_dir = str(tmp_path / "spine")
    spark.createDataFrame(
        [(100, 100, "john", "smith")],
        "EntityId long, spine_seq long, firstname string, lastname string",
    ).write.mode("overwrite").parquet(spine_dir)

    crits = [
        LinkageCriteria(
            id=1, tablename="t", exactmatch={"firstname": "firstname", "lastname": "lastname"}
        ),
    ]
    in_dir = str(tmp_path / "records")
    schema = "EventId long, firstname string, lastname string"
    spark.createDataFrame(
        [(1, "john", "smith"), (2, "ada", "lovelace")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    results: dict[int, set] = {}

    def sink(links, epoch_id):
        results.setdefault(epoch_id, set()).update(tuple(r) for r in links.collect())

    def start():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = stream_link_to_spine(
            stream, None, crits, "t", sink,
            checkpoint_dir=str(tmp_path / "ck"),
            trigger={"availableNow": True},
            spine_refresh=lambda: spark.read.parquet(spine_dir),
        )
        q.awaitTermination(120)

    start()
    linked_ids = {e for s in results.values() for (_, e, *_rest) in s}
    assert linked_ids == {1}  # ada has no entity yet

    # the periodic batch entity-formation job appends ada's entity...
    spark.createDataFrame(
        [(100, 100, "john", "smith"), (200, 200, "ada", "lovelace")],
        "EntityId long, spine_seq long, firstname string, lastname string",
    ).write.mode("overwrite").parquet(spine_dir)
    # ...and new records arrive
    spark.createDataFrame(
        [(3, "ada", "lovelace")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    results.clear()
    start()  # same checkpoint dir: only the new file is processed
    all_links = {lk for s in results.values() for lk in s}
    assert all_links == {("t", 3, 200, 1)}
