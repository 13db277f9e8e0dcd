"""Temporal operators: as-of join (point-in-time correctness).

Spark has no ASOF JOIN (DuckDB/Pandas do); for a spine-based linkage
engine it is the natural way to link events against a *slowly changing*
spine — each record must match the spine version that was valid AT the
record's timestamp, not the latest one (otherwise re-running a batch
months later silently links old events against future spine rows).

Plan shape at 100 TB: one equi-join shuffle on the ``on`` keys (the
range predicate rides the join as a post-condition — Spark turns
equi+range into a sort-merge join with an inequality filter, never a
cartesian), then one window per left row to keep the latest valid
right row. Both shuffles key on user-chosen columns, so skew is
controllable with the same blocking/salting tools as the linkage path
(``blocking.salt_column``). No UDFs, pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the single right row sharing the ``on``
    keys whose ``right_ts`` is the closest at-or-before (``backward``,
    the default) or at-or-after (``forward``) ``left_ts``.

    Ties on ``right_ts`` break deterministically toward the smallest
    remaining right column tuple. ``tolerance_seconds`` bounds the time
    gap (right rows further away don't match). ``how="left"`` keeps
    unmatched left rows with nulls; null ``on`` keys or timestamps never
    match (SQL comparison semantics), mirroring the linkage path's
    missing-key-skip rule.

    Output: all left columns plus the matched right columns (right's
    ``on`` columns are dropped — they equal left's).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    right_cols = [c for c in right.columns if c not in on]
    # surrogate left-row id: the best-match window must key on the ROW,
    # not the column tuple (two identical left rows each keep a match)
    left = left.withColumn("_asof_lid", F.monotonically_increasing_id())
    l = left.alias("l")
    r = right.alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    if direction == "backward":
        cond = cond & (rts <= lts)
        if tolerance_seconds is not None:
            cond = cond & (
                lts.cast("double") - rts.cast("double") <= F.lit(float(tolerance_seconds))
            )
    else:
        cond = cond & (rts >= lts)
        if tolerance_seconds is not None:
            cond = cond & (
                rts.cast("double") - lts.cast("double") <= F.lit(float(tolerance_seconds))
            )

    joined = l.join(r, cond, "inner").select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(c) for c in right_cols],
    )
    order = [
        F.col(right_ts).desc() if direction == "backward" else F.col(right_ts).asc()
    ] + [F.col(c).asc() for c in right_cols if c != right_ts]
    w = Window.partitionBy(F.col("_asof_lid")).orderBy(*order)
    picked = (
        joined.withColumn("_asof_rn", F.row_number().over(w))
        .filter(F.col("_asof_rn") == 1)
        .drop("_asof_rn")
    )
    if how == "inner":
        return picked.drop("_asof_lid")
    return left.join(picked, on=left.columns, how="left").drop("_asof_lid")


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization: within each ``key_col``, a new session
    starts whenever the time since the previous event exceeds
    ``gap_seconds`` — the batch analogue of the streaming session
    window (``streaming.records`` uses ``F.session_window``; this is
    the same boundary rule over bounded data).

    Output: the input columns + ``session_seq`` (1-based session index
    within the key) and ``session_id`` (key + '#' + seq, globally
    unique). ``order_cols`` breaks timestamp ties deterministically
    (pass the event's unique id).

    100 TB shape: two window functions over the SAME
    (partitionBy key, orderBy ts) spec — one shuffle on the key, which
    is high-cardinality by construction (users/devices/conversations);
    Catalyst computes lag and the running sum in a single Window exec.
    No driver-side state, no iteration.
    """
    from pyspark.sql import Window

    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # microsecond-exact integer arithmetic: a seconds-granularity cast
    # would truncate fractional seconds and misplace boundaries that
    # fall inside the truncated fraction. unix_micros needs TIMESTAMP;
    # the cast is a no-op for ltz and, under this engine's pinned-UTC
    # sessions (session.get_spark), an exact reinterpretation for ntz.
    micros = lambda c: F.unix_micros(c.cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        prev_ts.isNull() | (micros(F.col(ts_col)) - micros(prev_ts) > gap_us),
        1,
    ).otherwise(0)
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_seq", seq.cast("long")).withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("session_seq")),
    )
