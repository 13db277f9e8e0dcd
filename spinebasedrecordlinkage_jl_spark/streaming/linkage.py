"""Streaming linkage: link arriving conversation records to the frozen
spine, micro-batch by micro-batch.

The steady-state production shape of the north star: the spine already
exists (entity formation is the batch bootstrap — spine.form_entities),
and new transcripts arrive continuously. Each micro-batch runs the SAME
criteria passes as the batch engine (operators/linkage.link_table — the
spine side broadcast, event side never shuffled), so streaming and batch
linkage cannot drift: one implementation, two drivers.

``foreachBatch`` rather than a stateful operator because linkage against
a FROZEN spine is stateless per record — exactly-once delivery to the
links sink comes from Structured Streaming's batch-id-keyed idempotent
writes (epoch id passed to the sink).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..config import LinkageCriteria
from ..operators.linkage import link_table


def stream_link_to_spine(
    records: DataFrame,
    spine: DataFrame,
    criteria: list[LinkageCriteria],
    tablename: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger: dict | None = None,
    spine_refresh: Callable[[], DataFrame] | None = None,
    refresh_every_n_epochs: int = 1,
) -> StreamingQuery:
    """Start a streaming query linking ``records`` (a streaming frame of
    conversation records) against the frozen ``spine``.

    ``sink(links_df, epoch_id)`` receives each micro-batch's links frame
    (TableName, EventId, EntityId, CriteriaId); write idempotently keyed
    on ``epoch_id`` for exactly-once (e.g. Iceberg overwrite-by-filter
    on a batch-id column, or a transactional append).

    ``spine_refresh``: optional zero-arg callable returning the CURRENT
    spine (e.g. ``lambda: spark.read.parquet(spine_path)`` — or the
    Iceberg table, whose snapshot isolation makes the re-read atomic).
    When set, the spine is re-read every ``refresh_every_n_epochs``
    micro-batches, so entities formed by the periodic batch
    entity-formation job (spine.form_entities) become matchable WITHOUT
    restarting the query. Records arriving between a batch append and
    the next refresh link against the previous snapshot — the same
    frozen-spine-per-pass semantics as the batch engine's table stages.
    With the default ``spine_refresh=None`` the query links against the
    one frozen ``spine`` frame forever (the round-2 behavior).
    """
    if refresh_every_n_epochs < 1:
        raise ValueError(f"refresh_every_n_epochs must be >= 1, got {refresh_every_n_epochs}")
    if spine is None and spine_refresh is None:
        # spine=None is sanctioned ONLY with a refresh callable (the
        # first micro-batch then loads the current spine); without one
        # the query would fail deep inside the first micro-batch's
        # link_table with an opaque AttributeError.
        raise ValueError("stream_link_to_spine: spine=None requires spine_refresh")
    state = {"spine": spine, "batches_seen": 0}

    def _link_batch(batch: DataFrame, epoch_id: int) -> None:
        # epoch_id is monotone across restarts but not contiguous per
        # run; count batches actually processed by THIS query instead.
        if spine_refresh is not None and state["batches_seen"] % refresh_every_n_epochs == 0:
            state["spine"] = spine_refresh()
        state["batches_seen"] += 1
        links = link_table(batch, state["spine"], criteria, tablename)
        sink(links, epoch_id)

    writer = records.writeStream.foreachBatch(_link_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
