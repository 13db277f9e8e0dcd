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


def test_transcript_checks_flags_each_defect(spark):
    """One conversation per defect class; the clean one keeps."""
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    rows = [
        # clean: user/assistant alternating, contiguous from 0
        ("ok", 0, "user", "hi", None, ts),
        ("ok", 1, "assistant", "hello", None, ts),
        # bad role + a tool turn
        ("badrole", 0, "user", "hi", None, ts),
        ("badrole", 1, "robot", "beep", "hammer", ts),
        # empty text (blank and NULL)
        ("empty", 0, "user", "  ", None, ts),
        ("empty", 1, "assistant", None, None, ts),
        # duplicate turn_idx (distinct coverage 0..0 is still contiguous
        # — the dup count is the flag that fires)
        ("dup", 0, "user", "a", None, ts),
        ("dup", 0, "user", "b", None, ts),
        # gap: 0 then 2
        ("gap", 0, "user", "a", None, ts),
        ("gap", 2, "assistant", "b", None, ts),
        # wrong opening role + adjacent repeat
        ("badstart", 0, "assistant", "a", None, ts),
        ("badstart", 1, "assistant", "b", None, ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    from spinebasedrecordlinkage_jl_spark.operators.records import transcript_checks

    out = {r["conv_id"]: r for r in transcript_checks(df).collect()}
    assert out["ok"]["keep"] == 1 and out["ok"]["reasons"] == ""
    assert out["badrole"]["n_bad_role"] == 1 and out["badrole"]["n_tool_turns"] == 1
    assert out["badrole"]["reasons"] == "bad_role"
    assert out["empty"]["n_empty_text"] == 2 and out["empty"]["keep"] == 0
    assert out["dup"]["n_dup_turn_idx"] == 1 and out["dup"]["contiguous"] == 1
    assert out["dup"]["reasons"] == "dup_turn_idx"
    assert out["gap"]["contiguous"] == 0 and out["gap"]["reasons"] == "not_contiguous"
    assert out["badstart"]["starts_ok"] == 0
    assert out["badstart"]["n_alternation_violations"] == 1
    assert out["badstart"]["reasons"] == "bad_start"
    assert all(out[c]["keep"] == 0 for c in ("badrole", "empty", "dup", "gap", "badstart"))


def test_transcript_checks_null_turn_idx_matches_sql_semantics(spark):
    """NULL turn_idx (PERMISSIVE/'null' malformed ingest) follows SQL
    aggregate NULL semantics: count(DISTINCT) drops NULLs, so the NULL
    turn counts as a duplicate; an all-NULL conversation is
    non-contiguous (0, not NULL)."""
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            # 0,1 contiguous + one NULL idx -> dup=1, contiguous=1
            ("nullidx", 0, "user", "a", None, ts),
            ("nullidx", 1, "assistant", "b", None, ts),
            ("nullidx", None, "user", "c", None, ts),
            # every idx NULL -> dup=n, contiguous=0
            ("allnull", None, "user", "a", None, ts),
            ("allnull", None, "assistant", "b", None, ts),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from spinebasedrecordlinkage_jl_spark.operators.records import transcript_checks

    out = {r["conv_id"]: r for r in transcript_checks(df).collect()}
    assert out["nullidx"]["n_dup_turn_idx"] == 1
    assert out["nullidx"]["contiguous"] == 1
    assert "dup_turn_idx" in out["nullidx"]["reasons"]
    assert out["allnull"]["n_dup_turn_idx"] == 2
    assert out["allnull"]["contiguous"] == 0
    assert out["allnull"]["keep"] == 0


def test_transcript_checks_null_role_and_disabled_start(spark):
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c", 0, None, "x", None, ts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from spinebasedrecordlinkage_jl_spark.operators.records import transcript_checks

    row = transcript_checks(df, must_start_with=None).collect()[0]
    assert row["n_bad_role"] == 1  # NULL role counts as invalid
    assert row["starts_ok"] == 1  # opening-role check disabled
    assert row["reasons"] == "bad_role"


def test_scrub_transcripts_redacts_and_preserves_schema(spark):
    import datetime as dt

    from spinebasedrecordlinkage_jl_spark.operators.records import scrub_transcripts

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "mail me at jane.doe@example.com or call 0301 555 8812 ok", None, ts),
        ("c1", 1, "assistant", "sure thing", None, ts),
        ("c2", 0, "user", None, None, ts),  # NULL text stays NULL, 0 redactions
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out, report = scrub_transcripts(df, return_report=True)
    got = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    scrubbed = got[("c1", 0)]
    assert "<EMAIL>" in scrubbed["text"] and "<NUMBER>" in scrubbed["text"]
    assert "example.com" not in scrubbed["text"] and "8812" not in scrubbed["text"]
    assert scrubbed["n_redactions"] == 2
    assert got[("c1", 1)]["text"] == "sure thing" and got[("c1", 1)]["n_redactions"] == 0
    assert got[("c2", 0)]["text"] is None and got[("c2", 0)]["n_redactions"] == 0
    # same transcript columns out (plus the count) -> drop-in consumer
    assert out.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts", "n_redactions"]

    rep = {r["conv_id"]: r for r in report.collect()}
    assert rep["c1"]["n_redactions"] == 2 and rep["c1"]["n_turns_redacted"] == 1
    assert rep["c2"]["n_redactions"] == 0


def test_scrubbed_transcripts_feed_records(spark):
    """The scrub output (minus the count) flows through
    conversation_records unchanged in shape."""
    from spinebasedrecordlinkage_jl_spark.operators.records import scrub_transcripts
    from spinebasedrecordlinkage_jl_spark.sources import synthesize_transcripts

    t, _ = synthesize_transcripts(spark, n_entities=10, seed=5)
    rec = conversation_records(scrub_transcripts(t).drop("n_redactions"))
    assert rec.count() > 0 and "EntityId" not in rec.columns
    assert {"conv_id", "turns", "norm_text"} <= set(rec.columns)


def test_truncate_conversations_prefix_semantics(spark):
    import datetime as dt

    from spinebasedrecordlinkage_jl_spark.operators.records import (
        truncate_conversations,
    )

    ts = dt.datetime(2026, 1, 1)
    rows = [
        # c1: 4+4+4 tokens, budget 10 -> first two turns kept
        ("c1", 0, "user", "one two three four", None, ts),
        ("c1", 1, "assistant", "a b c d", None, ts),
        ("c1", 2, "user", "e f g h", None, ts),
        # c2: first turn alone exceeds the budget -> conversation dropped
        ("c2", 0, "user", " ".join(str(i) for i in range(20)), None, ts),
        # c3: NULL text counts zero tokens and is kept
        ("c3", 0, "user", None, None, ts),
        ("c3", 1, "assistant", "x y", None, ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = truncate_conversations(df, max_tokens=10)
    got = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    assert set(got) == {("c1", 0), ("c1", 1), ("c3", 0), ("c3", 1)}
    assert got[("c1", 1)]["cum_tokens"] == 8
    assert got[("c3", 0)]["n_turn_tokens"] == 0  # NULL text, not -1
    assert got[("c3", 1)]["cum_tokens"] == 2

    import pytest

    with pytest.raises(ValueError, match="max_tokens"):
        truncate_conversations(df, 0)


def test_turn_boilerplate_flags_cross_conv_repeats(spark):
    import pytest

    from spinebasedrecordlinkage_jl_spark.operators.records import turn_boilerplate

    rows = [
        # "OK." appears (role=assistant) in 3 conversations
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "OK."),
        ("c2", 0, "user", "different question"),
        ("c2", 1, "assistant", "ok."),            # normalization: lower
        ("c3", 0, "assistant", "  OK.  "),        # normalization: trim
        # same text, different role -> separate key
        ("c3", 1, "user", "OK."),
        # repeated within ONE conversation -> counts that conv once
        ("c4", 0, "assistant", "unique reply a"),
        ("c4", 1, "assistant", "unique reply a"),
        ("c5", 0, "user", None),                  # NULL text never flags
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r["conv_id"], r["turn_idx"]): r for r in turn_boilerplate(df, min_convs=3).collect()}
    assert len(out) == len(rows)                  # one row per input turn
    assert out[("c1", 1)]["n_convs_with_text"] == 3
    assert out[("c1", 1)]["is_boilerplate"] is True
    assert out[("c2", 1)]["is_boilerplate"] is True
    assert out[("c3", 0)]["is_boilerplate"] is True
    assert out[("c3", 1)]["n_convs_with_text"] == 1   # user "OK." distinct key
    assert out[("c4", 0)]["n_convs_with_text"] == 1   # within-conv repeat = 1 conv
    assert out[("c4", 1)]["is_boilerplate"] is False
    assert out[("c5", 0)]["n_convs_with_text"] == 0
    assert out[("c5", 0)]["is_boilerplate"] is False

    with pytest.raises(ValueError, match="min_convs"):
        turn_boilerplate(df, min_convs=0)
