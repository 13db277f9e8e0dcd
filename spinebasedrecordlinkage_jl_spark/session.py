"""SparkSession factory tuned for the linkage workload.

Defaults target local[N] testing but every knob that matters at cluster
scale (AQE, skew-join splitting, broadcast threshold, shuffle partitions,
Arrow batching for pandas UDFs) is set explicitly so the same code ships
unchanged via spark-submit --py-files to a multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size balances pandas-UDF overhead against executor memory;
# 64k rows/batch amortizes the JVM<->Python IPC round-trips for the
# string-distance kernels while staying well under 64 MB per batch for
# short linkage fields.
_ARROW_BATCH = "65536"


def get_spark(
    app_name: str = "spinelink",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the
    sandbox); on a real cluster pass ``None`` after configuring master
    via spark-submit and the builder will inherit it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPINELINK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPINELINK_SHUFFLE_PARTITIONS", cpus))

    b = (
        SparkSession.builder.appName(app_name)
        # Adaptive execution: runtime coalescing of small shuffle
        # partitions and skew-join splitting — the north rule requires
        # explicit skew handling; AQE is the first line of defense,
        # salted blocks (blocking.py) the second.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # The spine is small relative to events — make sure Catalyst
        # broadcasts it (we also force F.broadcast at call sites).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Joins (guide §3.1/§9): let the planner pick shuffled-hash over
        # sort-merge when the per-partition build side fits — skips two
        # sorts per join; AQE additionally rewrites SMJ->SHJ at runtime
        # when every post-shuffle partition is under the local-map
        # threshold (0 = off by default; both knobs are cluster-sane and
        # env-overridable, not local[32] tuning).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPINELINK_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPINELINK_SHJ_LOCALMAP_THRESHOLD", str(64 * 1024 * 1024)),
        )
        # Arrow for pandas UDFs (vectorized scoring path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_BATCH)
        # Deterministic timestamps across engines (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # Permissive SQL semantics: element_at past the end of an array,
        # division by zero etc. yield NULL rather than raising (Spark 4
        # flips ANSI on by default; the reference's string-only engine has
        # no failing casts to protect against).
        .config("spark.sql.ansi.enabled", "false")
        # Spark 4.1 Union.rewriteConstraints throws NoSuchElementException
        # when union branches share lineage (our edge unions in entity
        # formation trip it). Constraint propagation only feeds optional
        # filter inference; correctness is unaffected.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPINELINK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill scratch space: in local mode a single shared /tmp disk
    # serializes every Exchange (a real cluster gives each executor its
    # own NVMe). tmpfs restores the per-core shuffle bandwidth the plan
    # would see on a cluster. Override with SPINELINK_LOCAL_DIR.
    local_dir = os.environ.get("SPINELINK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spinelink-spark"
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    if master:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def widen_if_narrow(df):
    """Round a narrower-than-the-cluster DataFrame up to the session's
    default parallelism.

    Compute-heavy per-row stages (signature evaluation, media decode,
    embedding cell assignment) run wherever the scan put them: a small
    corpus arriving as one parquet split serializes the whole stage
    through one task. At real scale the input already has more splits
    than cores and this is a no-op — the partition count is plan
    metadata, no job runs to check it."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
