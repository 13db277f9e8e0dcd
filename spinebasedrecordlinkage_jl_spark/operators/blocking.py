"""Blocking: candidate-space pruning before pairwise scoring.

The reference's blocking IS its exact-match hash index — only spine rows
sharing the exact key are fuzzy-scored (/root/reference/src/
runlinkage.jl:217-227, TableIndexes.jl:13-38). In Spark that index is
simply the build side of an equi-join; on top of it we add what the north
rule requires for 10^12-turn scale:

- **normalized-text hash blocks**: ``pmod(xxhash64(norm_cols...), n)`` so
  near-duplicate transcripts land in the same block without an exact key;
- **salting**: hot blocks (common surnames / common conversation prefixes)
  are split into ``salt`` sub-blocks to break reducer skew — the salt is
  derived from the record's own primary key, so it is deterministic and
  requires no extra shuffle;
- **block purging**: blocks larger than ``max_block_size`` generate
  O(B^2) pairs and are dropped with an audit count (standard ER-at-scale
  practice; at 100 TB a single degenerate block can dominate the job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_block_key(*cols: Column, n_blocks: int = 1 << 20) -> Column:
    """Stable hash block id from normalized columns (JVM xxhash64)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_blocks))


def salt_column(pk: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from the record's own key."""
    return F.pmod(F.abs(F.xxhash64(F.lit("salt"), pk)), F.lit(buckets))


def add_block_key(
    df: DataFrame,
    block_cols: list[str],
    pk_col: str,
    n_blocks: int = 1 << 20,
    salt_buckets: int = 1,
) -> DataFrame:
    """Attach ``block_key`` (and ``block_salt`` when salting) columns."""
    out = df.withColumn(
        "block_key", hash_block_key(*[F.col(c) for c in block_cols], n_blocks=n_blocks)
    )
    if salt_buckets > 1:
        out = out.withColumn("block_salt", salt_column(F.col(pk_col), salt_buckets))
    return out


def blocking_profile(
    records: DataFrame,
    block_on: list[Column] | list[str],
) -> DataFrame:
    """Pre-join diagnostics of a blocking scheme: per log2-size bucket,
    how many blocks exist, how many records they hold, how many
    candidate pairs they would emit, and the largest block in the
    bucket.

    Cost is ONE shuffle (the groupBy on the block key) plus a tiny
    aggregate over the distinct block sizes — no pair is ever
    materialized, so profiling stays linear even when the pair space is
    quadratic. This is the step to run BEFORE ``candidate_pairs`` at
    scale: the top bucket's ``n_cand_pairs`` tells you whether the join
    is feasible and where to set ``max_block_size`` / salt_buckets,
    instead of discovering a degenerate block from a dying stage.

    Null block keys are excluded (they never pair — SQL ``=`` is
    null-rejecting, runlinkage.jl:378-385 parity with the linkage path).
    """
    block_cols = [F.col(c) if isinstance(c, str) else c for c in block_on]
    names = [f"_bk{i}" for i in range(len(block_cols))]
    base = records.select(*[c.alias(n) for c, n in zip(block_cols, names)])
    for n in names:
        base = base.filter(F.col(n).isNotNull())
    sizes = base.groupBy(*names).agg(F.count(F.lit(1)).alias("block_size"))
    return sizes.groupBy(
        F.floor(F.log2("block_size")).cast("long").alias("size_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("block_size").alias("n_records"),
        F.sum(F.expr("block_size * (block_size - 1) / 2"))
        .cast("long")
        .alias("n_cand_pairs"),
        F.max("block_size").alias("max_block_size"),
    )


def candidate_pairs(
    records: DataFrame,
    block_on: list[Column] | list[str],
    id_col: str = "EventId",
    max_block_size: int | None = 10_000,
    keep_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Within-block self-join producing unordered candidate pairs
    (``<id_col>_1 < <id_col>_2``).

    ``block_on``: equality columns defining the block (an exact-match key
    or a hash block). Null block values never pair (SQL ``=`` is
    null-rejecting), matching the reference's missing-key-skip rule
    (runlinkage.jl:378-385).

    Skew strategy: (1) AQE skew-join splitting handles moderate hot
    blocks; (2) blocks above ``max_block_size`` are purged (a 1M-record
    block would emit 5*10^11 pairs — no join strategy survives that).
    The purge is an explicit, countable decision, not silent truncation:
    returns ``(pairs, purged_blocks)`` where the second frame lists every
    purged block key + size for the run metrics (None when disabled).
    """
    block_cols = [F.col(c) if isinstance(c, str) else c for c in block_on]
    names = [f"_bk{i}" for i in range(len(block_cols))]
    keep = [id_col] + (keep_cols or [])

    base = records.select(
        *[c.alias(n) for c, n in zip(block_cols, names)],
        *[F.col(c) for c in keep],
    )
    # every block column must be non-null to form a key
    for n in names:
        base = base.filter(F.col(n).isNotNull())

    purged = None
    if max_block_size is not None:
        sizes = base.groupBy(*names).agg(F.count("*").alias("_bsize"))
        purged = sizes.filter(F.col("_bsize") > max_block_size)
        base = base.join(
            F.broadcast(purged.select(*names, F.lit(True).alias("_purge"))),
            on=names,
            how="left",
        ).filter(F.col("_purge").isNull()).drop("_purge")

    a = base.select(*names, *[F.col(c).alias(f"{c}_1") for c in keep])
    b = base.select(*names, *[F.col(c).alias(f"{c}_2") for c in keep])
    pairs = a.join(b, on=names, how="inner").filter(
        F.col(f"{id_col}_1") < F.col(f"{id_col}_2")
    ).drop(*names)

    return pairs, purged
