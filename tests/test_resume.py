"""Checkpoint/resume: killing a run after stage k and resuming must
produce the identical final spine + links (BASELINE.md resumability
target — the reference cannot do this at all)."""

import json

from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.config import (
    ApproxMatch,
    LinkageConfig,
    LinkageCriteria,
    TableConfig,
)
from spinebasedrecordlinkage_jl_spark.plans.run_linkage import run_linkage


def _records(spark, tag):
    rows = [
        (f"{tag}1", "john", "smith", "1950-01-01"),
        (f"{tag}2", "john", "smithh", "1950-01-01"),
        (f"{tag}3", "mary", "green", "1970-03-03"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, firstname string, lastname string, birthdate string"
    ).withColumn("EventId", F.xxhash64(F.lit(tag), F.col("conv_id")))


def _config(tmp_path, tables):
    crits = []
    for i, t in enumerate(tables):
        crits.append(
            LinkageCriteria(
                id=2 * i + 1,
                tablename=t,
                exactmatch={"firstname": "firstname", "lastname": "lastname", "birthdate": "birthdate"},
            )
        )
        crits.append(
            LinkageCriteria(
                id=2 * i + 2,
                tablename=t,
                exactmatch={"firstname": "firstname"},
                approxmatch=(ApproxMatch("lastname", "lastname", "levenshtein", 0.3),),
            )
        )
    return LinkageConfig(
        projectname="resume",
        output_directory=str(tmp_path / "run"),
        spine_datafile=None,
        spine_columns=("EntityId", "firstname", "lastname", "birthdate"),
        append_to_spine=True,
        construct_entityid_from=("firstname", "lastname", "birthdate"),
        tables={t: TableConfig(name=t, datafile="", primarykey=("conv_id",)) for t in tables},
        criteria=tuple(crits),
    )


def test_resume_after_stage(spark, tmp_path):
    tables = ["ta", "tb"]
    recs = {t: _records(spark, t) for t in tables}
    cfg = _config(tmp_path, tables)

    # full run -> golden result
    full = run_linkage(spark, cfg, recs)
    want_spine = sorted(map(tuple, full.spine.select("EntityId").collect()))
    want_links = sorted(
        map(tuple, full.links.select("TableName", "EventId", "EntityId", "CriteriaId").collect())
    )

    # simulate a crash after stage 0: truncate the manifest to stage 0
    mpath = full.manifest.path
    m = json.loads(mpath.read_text())
    assert len(m["stages"]) == 2
    m["stages"] = m["stages"][:1]
    mpath.write_text(json.dumps(m))

    resumed = run_linkage(spark, cfg, recs, resume=True)
    got_spine = sorted(map(tuple, resumed.spine.select("EntityId").collect()))
    got_links = sorted(
        map(tuple, resumed.links.select("TableName", "EventId", "EntityId", "CriteriaId").collect())
    )
    assert got_spine == want_spine
    assert got_links == want_links


def test_cross_table_spine_reuse(spark, tmp_path):
    """The §3.1 cross-stage invariant: entities created while linking
    table 1 are matchable by table 2 (same names -> same entity)."""
    tables = ["ta", "tb"]
    recs = {t: _records(spark, t) for t in tables}
    cfg = _config(tmp_path, tables)
    run = run_linkage(spark, cfg, recs)
    # 2 entities total (john smith + mary green), not 4
    assert run.spine.count() == 2
    # every record of both tables is linked
    assert run.links.count() == 6
    # tb's john smith links to the SAME entity as ta's
    ents = {
        (r["TableName"], r["EntityId"])
        for r in run.links.filter(F.col("CriteriaId").isNotNull()).collect()
    }
    by_table = {}
    for t, e in ents:
        by_table.setdefault(t, set()).add(e)
    assert by_table["ta"] == by_table["tb"]


def test_manifest_carries_per_partition_lineage(spark, tmp_path):
    cfg = _config(tmp_path, ["t1"])
    run_linkage(spark, cfg, {"t1": _records(spark, "a")})
    mf = json.loads(
        (tmp_path / "run" / "checkpoints" / "manifest.json").read_text()
    )
    st = mf["stages"][-1]
    # per-partition row counts sum to the stage's link count and the
    # skew ratio is derived from them
    assert st["partition_rows_links"]
    assert sum(st["partition_rows_links"].values()) == st["n_links"]
    n = len(st["partition_rows_links"])
    mx = max(st["partition_rows_links"].values())
    assert st["links_skew_ratio"] == round(mx / (st["n_links"] / n), 3)
