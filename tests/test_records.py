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


def test_linkage_records_matches_full_aggregation(spark):
    """linkage_records is a column-pruned projection of
    conversation_records: per-row equal on the shared columns."""
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records

    transcripts, _ = synthesize_transcripts(spark, n_entities=80)
    cols = ["conv_id", "EventId", "first_user_text", "firstname", "lastname", "birthdate"]
    full = {r["conv_id"]: r for r in conversation_records(transcripts).select(*cols).collect()}
    fast = {r["conv_id"]: r for r in linkage_records(transcripts).select(*cols).collect()}
    # every conversation has a user turn in the generator -> same keyset
    assert set(full) == set(fast)
    assert full == fast


def test_linkage_records_duplicate_turn_idx_ties(spark):
    """On duplicate turn_idx within a conversation both aggregation paths
    must pick the SAME first user text (ties break by text, matching
    sort_array's struct ordering) — min_by(text, turn_idx) would pick
    arbitrarily here."""
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records

    rows = [
        # conv with turn_idx 0 duplicated; 'aaa...' < 'zzz...' breaks the tie
        ("c1", 0, "user", "hello my name is zed zulu 1990-01-01", None),
        ("c1", 0, "user", "hello my name is amy adams 1990-01-01", None),
        ("c1", 1, "assistant", "hi", None),
        # duplicate turn_idx where an assistant row ties with a user row
        ("c2", 0, "assistant", "aaa first by text but wrong role", None),
        ("c2", 0, "user", "hello my name is bob brown 1991-01-01", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())

    full = {
        r["conv_id"]: r["first_user_text"]
        for r in conversation_records(t).select("conv_id", "first_user_text").collect()
    }
    fast = {
        r["conv_id"]: r["first_user_text"]
        for r in linkage_records(t).select("conv_id", "first_user_text").collect()
    }
    assert full == fast
    assert full["c1"] == "hello my name is amy adams 1990-01-01"
    assert full["c2"] == "hello my name is bob brown 1991-01-01"


def test_linkage_records_drops_userless_conversations(spark):
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records

    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello my name is a b 1990-01-01", None),
            ("c2", 0, "assistant", "no user here", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    out = linkage_records(t).select("conv_id").collect()
    assert [r["conv_id"] for r in out] == ["c1"]
