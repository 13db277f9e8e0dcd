"""Stage-1 aggregation: stable turn ordering + the per-turn text-equality
invariant (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.operators.records import (
    conversation_records,
    explode_records,
)
from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts


def test_per_turn_text_equality_roundtrip(spark):
    """records -> explode must reproduce every turn exactly (same conv_id,
    turn_idx, role, text, tool, ts) — the per-row invariant."""
    transcripts, _ = synthesize_transcripts(spark, n_entities=30)
    rec = conversation_records(transcripts)
    back = explode_records(rec)
    orig = transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert back.count() == orig.count()
    # symmetric difference must be empty
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_turns_sorted_by_turn_idx(spark):
    transcripts, _ = synthesize_transcripts(spark, n_entities=10)
    rec = conversation_records(transcripts)
    bad = rec.filter(
        F.exists(
            F.zip_with(
                F.col("turns"),
                F.slice(F.col("turns"), 2, F.size("turns")),
                lambda a, b: a["turn_idx"] >= b["turn_idx"],
            ),
            lambda x: x,
        )
    )
    assert bad.count() == 0


def test_derived_columns(spark):
    transcripts, _ = synthesize_transcripts(spark, n_entities=10)
    rec = conversation_records(transcripts)
    row = rec.filter(F.col("conv_id") == "c0000000_0").collect()[0]
    assert row["n_turns"] == len(row["turns"])
    assert row["first_user_text"].startswith("hello my name is")
    assert row["norm_text"] == row["norm_text"].lower()
    # extractor sanity: firstname/lastname are single lowercase tokens
    assert row["firstname"].isalpha()
    assert row["lastname"].isalpha()


def test_eventid_deterministic(spark):
    t1, _ = synthesize_transcripts(spark, n_entities=5)
    r1 = conversation_records(t1).select("conv_id", "EventId").collect()
    r2 = conversation_records(t1).select("conv_id", "EventId").collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
