"""The correctness gate: pairwise F1 >= 0.99 between our Spark clusters
and the faithful sequential oracle (the reference algorithm) on the same
synthetic transcript corpus + golden trace on a reference-shaped fixture
(SURVEY.md §2.6 analogue)."""

import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.config import (
    ApproxMatch,
    LinkageConfig,
    LinkageCriteria,
    TableConfig,
)
from spinebasedrecordlinkage_jl_spark.operators.records import conversation_records
from spinebasedrecordlinkage_jl_spark.plans.run_linkage import run_linkage
from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

from .oracle import pairwise_f1, sequential_linkage

CRITERIA = (
    LinkageCriteria(
        id=1,
        tablename="transcripts",
        exactmatch={"firstname": "firstname", "lastname": "lastname", "birthdate": "birthdate"},
    ),
    # Like the reference's testset1 config, every fuzzy criterion still
    # blocks exactly on birthdate — fuzzy-only-on-one-field without a
    # strong block would create cross-entity chains that the sequential
    # reference breaks by insertion order (see SURVEY §7.4).
    LinkageCriteria(
        id=2,
        tablename="transcripts",
        exactmatch={"firstname": "firstname", "birthdate": "birthdate"},
        approxmatch=(ApproxMatch("lastname", "lastname", "levenshtein", 0.3),),
    ),
    LinkageCriteria(
        id=3,
        tablename="transcripts",
        exactmatch={"lastname": "lastname", "birthdate": "birthdate"},
        approxmatch=(ApproxMatch("firstname", "firstname", "jarowinkler", 0.35),),
    ),
)


def _config(tmp_path) -> LinkageConfig:
    return LinkageConfig(
        projectname="f1gate",
        output_directory=str(tmp_path / "run"),
        spine_datafile=None,
        spine_columns=("EntityId", "firstname", "lastname", "birthdate"),
        append_to_spine=True,
        construct_entityid_from=("firstname", "lastname", "birthdate"),
        tables={
            "transcripts": TableConfig(
                name="transcripts", datafile="", primarykey=("conv_id",)
            )
        },
        criteria=CRITERIA,
    )


@pytest.mark.slow
def test_pairwise_f1_vs_sequential_oracle(spark, tmp_path):
    transcripts, _ = synthesize_transcripts(spark, n_entities=120)
    rec = conversation_records(transcripts).localCheckpoint(eager=True)
    cfg = _config(tmp_path)

    run = run_linkage(spark, cfg, {"transcripts": rec})
    ours = {
        r["conv_id"]: r["EntityId"]
        for r in run.links.join(rec.select("EventId", "conv_id"), "EventId").collect()
    }

    # oracle runs the reference algorithm sequentially, in conv_id order
    # (any fixed order is "a" file order; F1 tolerance absorbs divergence)
    records = [
        r.asDict()
        for r in rec.select("conv_id", "firstname", "lastname", "birthdate")
        .orderBy("conv_id")
        .collect()
    ]
    want = sequential_linkage(
        records,
        list(CRITERIA),
        append_to_spine=True,
        construct_entityid_from=["firstname", "lastname", "birthdate"],
        spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
    )
    theirs = {k: v[0] for k, v in want.links.items()}

    f1 = pairwise_f1(theirs, ours)
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} < 0.99"
    # both must link (almost) every record
    assert len(ours) >= 0.95 * len(records)


def test_ground_truth_recovery(spark, tmp_path):
    """Secondary sanity: clusters recover the generator's entities for
    conversations whose identity fields are intact or fuzzily linkable."""
    transcripts, labels = synthesize_transcripts(spark, n_entities=60)
    rec = conversation_records(transcripts).localCheckpoint(eager=True)
    run = run_linkage(spark, _config(tmp_path), {"transcripts": rec})
    joined = (
        run.links.join(rec.select("EventId", "conv_id"), "EventId")
        .join(labels.withColumnRenamed("conv_id", "conv_id"), "conv_id")
    )
    # no predicted entity may span two ground-truth entities (precision 1.0
    # is expected: the generator never creates cross-entity collisions in
    # firstname+lastname+birthdate space at this size)
    spans = joined.groupBy("EntityId").agg(F.countDistinct("gt_entity").alias("n")).filter(
        F.col("n") > 1
    )
    assert spans.count() == 0


def test_golden_trace_reference_shape(spark, tmp_path):
    """SURVEY §2.6 analogue on a handcrafted 8-record fixture: exact
    duplicates, smith->smithh (1/6<=0.3), eliza<-elizabeth (4/9<=0.5),
    rob vs robert (0.5>0.3 under criteria 2), a never-matching singleton.
    Expected: 4 entities, mirroring testset1's 4-row spine."""
    rows = [
        # (conv_id, firstname, lastname, birthdate)
        ("e1", "john", "smith", "1950-01-01"),
        ("e2", "john", "smith", "1950-01-01"),      # exact dup -> crit 1
        ("e3", "john", "smithh", "1950-01-01"),     # lev 1/6 -> crit 2
        ("e4", "robert", "brown", "1960-02-02"),
        ("e5", "rob", "brown", "1960-02-02"),       # lev 0.5 > 0.3 crit2; crit3 jw
        ("e6", "elizabeth", "green", "1970-03-03"),
        ("e7", "eliza", "green", "1970-03-03"),     # crit 3 fuzzy firstname
        ("e8", "mary", "mcdonald", "1980-04-04"),   # singleton
    ]
    rec = spark.createDataFrame(
        rows, "conv_id string, firstname string, lastname string, birthdate string"
    ).withColumn("EventId", F.xxhash64(F.lit("transcripts"), F.col("conv_id")))
    run = run_linkage(spark, _config(tmp_path), {"transcripts": rec})

    assert run.spine.count() == 4
    links = {r["conv_id"]: (r["EntityId"], r["CriteriaId"])
             for r in run.links.join(rec.select("EventId", "conv_id"), "EventId").collect()}
    assert len(links) == 8
    ent = {k: v[0] for k, v in links.items()}
    assert ent["e1"] == ent["e2"] == ent["e3"]
    assert ent["e4"] == ent["e5"]
    assert ent["e6"] == ent["e7"]
    assert len({ent["e1"], ent["e4"], ent["e6"], ent["e8"]}) == 4

    # oracle agreement on the same fixture (exact, not just F1)
    want = sequential_linkage(
        [dict(conv_id=c, firstname=f, lastname=l, birthdate=b) for c, f, l, b in rows],
        list(CRITERIA),
        append_to_spine=True,
        construct_entityid_from=["firstname", "lastname", "birthdate"],
        spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
    )
    theirs = {k: v[0] for k, v in want.links.items()}
    assert pairwise_f1(theirs, ent) == 1.0
