"""asof_join semantics: direction, tolerance, ties, outer, null keys,
duplicate left rows."""

import pytest

from spinebasedrecordlinkage_jl_spark.operators.temporal import asof_join

L_SCHEMA = "k string, ev long, t double"
R_SCHEMA = "k string, rt double, v string"


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 25.0), ("b", 3, 10.0), ("c", 4, 10.0)], L_SCHEMA
    )
    right = spark.createDataFrame(
        [("a", 5.0, "a5"), ("a", 20.0, "a20"), ("a", 30.0, "a30"), ("b", 40.0, "b40")],
        R_SCHEMA,
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r["ev"]: (r["rt"], r["v"])
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    }
    # ev 1: latest right at-or-before t=10 is rt=5; ev 2: rt=20;
    # ev 3: b has nothing <= 10; ev 4: no right rows for c
    assert got == {1: (5.0, "a5"), 2: (20.0, "a20")}


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r["ev"]: r["rt"]
        for r in asof_join(left, right, ["k"], "t", "rt", direction="forward").collect()
    }
    assert got == {1: 20.0, 2: 30.0, 3: 40.0}
    # tolerance 10s: ev 3 (gap 30) drops out
    got = {
        r["ev"]: r["rt"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", direction="forward", tolerance_seconds=10
        ).collect()
    }
    assert got == {1: 20.0, 2: 30.0}


def test_asof_left_outer_keeps_unmatched(spark):
    left, right = _frames(spark)
    rows = asof_join(left, right, ["k"], "t", "rt", how="left").collect()
    got = {r["ev"]: r["v"] for r in rows}
    assert got == {1: "a5", 2: "a20", 3: None, 4: None}


def test_asof_exact_ts_matches_and_ties_break_deterministically(spark):
    left = spark.createDataFrame([("a", 1, 20.0)], L_SCHEMA)
    right = spark.createDataFrame(
        [("a", 20.0, "z"), ("a", 20.0, "y")], R_SCHEMA
    )
    rows = asof_join(left, right, ["k"], "t", "rt").collect()
    # at-or-before includes equality; tie on rt -> smallest remaining
    # right tuple (v='y')
    assert len(rows) == 1 and rows[0]["v"] == "y"


def test_asof_duplicate_left_rows_each_match(spark):
    left = spark.createDataFrame([("a", 1, 10.0), ("a", 1, 10.0)], L_SCHEMA)
    right = spark.createDataFrame([("a", 5.0, "a5")], R_SCHEMA)
    rows = asof_join(left, right, ["k"], "t", "rt").collect()
    assert len(rows) == 2 and all(r["v"] == "a5" for r in rows)


def test_asof_null_keys_and_ts_never_match(spark):
    left = spark.createDataFrame(
        [(None, 1, 10.0), ("a", 2, None)], L_SCHEMA
    )
    right = spark.createDataFrame([(None, 5.0, "n5"), ("a", 5.0, "a5")], R_SCHEMA)
    assert asof_join(left, right, ["k"], "t", "rt").count() == 0


def test_asof_rejects_bad_args(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "rt", direction="nearest")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "rt", how="full")


def test_sessionize_gap_boundaries(spark):
    """Events exactly AT the gap stay in-session; one microsecond past
    it starts a new one; each key numbers its own sessions from 1."""
    import datetime as dt

    from spinebasedrecordlinkage_jl_spark.operators.temporal import sessionize

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, 100, t0),
        (2, 100, t0 + dt.timedelta(seconds=60)),                    # == gap: same session
        (3, 100, t0 + dt.timedelta(seconds=120, microseconds=1)),   # gap+1us: new session
        (4, 100, t0 + dt.timedelta(seconds=130)),
        (5, 200, t0),                                               # other key: seq restarts
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: (r["session_seq"], r["session_id"])
        for r in sessionize(df, 60, order_cols=("event_id",)).collect()
    }
    assert out[1] == (1, "100#1") and out[2] == (1, "100#1")
    assert out[3] == (2, "100#2") and out[4] == (2, "100#2")
    assert out[5] == (1, "200#1")


def test_sessionize_rejects_bad_gap(spark):
    from spinebasedrecordlinkage_jl_spark.operators.temporal import sessionize

    df = spark.createDataFrame([(1, 1)], "event_id long, user_id long")
    import pytest

    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df, 0)
