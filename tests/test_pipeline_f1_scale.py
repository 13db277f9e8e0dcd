"""Scale-up of the pairwise-F1 gate: same config as test_pipeline_f1
but 400 entities (~1000 conversations) — enough corruption mass that
every criterion fires many times and entity formation builds multi-hop
transitive clusters, so the F1 comparison stresses the CC path, not
just the per-criteria passes."""

import pytest

from spinebasedrecordlinkage_jl_spark.operators.records import conversation_records
from spinebasedrecordlinkage_jl_spark.plans.run_linkage import run_linkage
from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

from .oracle import pairwise_f1, sequential_linkage
from .test_pipeline_f1 import CRITERIA, _config


@pytest.mark.slow
def test_pairwise_f1_at_400_entities(spark, tmp_path):
    transcripts, _ = synthesize_transcripts(spark, n_entities=400)
    rec = conversation_records(transcripts).localCheckpoint(eager=True)

    run = run_linkage(spark, _config(tmp_path), {"transcripts": rec})
    ours = {
        r["conv_id"]: r["EntityId"]
        for r in run.links.join(rec.select("EventId", "conv_id"), "EventId").collect()
    }

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
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} < 0.99 at n_entities=400"
    assert len(ours) >= 0.95 * len(records)
