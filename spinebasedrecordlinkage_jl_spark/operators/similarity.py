"""Similarity search over embedding columns (array<float>).

Two tiers, the standard ANN ladder:

- ``brute_force_topk``: exact cosine top-k. The dot products run as
  pure Catalyst array expressions (zip_with + aggregate — JVM, codegen)
  so even brute force never leaves the executor; the per-query top-k is
  one window. Cost O(|queries| * |corpus|): correct baseline, and the
  verifier for the bucketed path.
- ``lsh_bucketed_topk``: random-hyperplane (sign-LSH) bucketing — an
  IVF-style scale path: candidates = vectors sharing the query's bucket
  in >=1 of the hash tables, then exact cosine only on candidates. At
  1000-executor scale the bucket join replaces the full cross product
  with per-bucket locality, and the bucket key is the shuffle key.

Hyperplanes are generated deterministically from a seed via NumPy and
shipped as literals (they are tiny: n_tables * n_bits * dim floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed in
    double precision entirely JVM-side."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Output: (query_id, neighbor_id, sim, rank). The queries side is
    broadcast (queries ≪ corpus is the normal shape); ties break on
    neighbor id for determinism.
    """
    from pyspark.sql import Window

    # Precompute L2 norms once per row — the cross join then only pays
    # for the dot product per pair, not two norm reductions.
    def _normed(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(idname),
            vd.alias(vecname),
            F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x)).alias(f"{vecname}_n"),
        )

    q = F.broadcast(_normed(queries, "query_id", "_qvec"))
    joined = _normed(corpus, "neighbor_id", "_cvec").crossJoin(q)
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with(F.col("_qvec"), F.col("_cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = joined.withColumn(
        "sim", F.round(dot / (F.col("_qvec_n") * F.col("_cvec_n")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_pandas_udf(planes: np.ndarray):
    """All tables' sign-LSH bucket ids in ONE Arrow-vectorized kernel:
    a (batch, dim) x (dim, n_tables*n_bits) matmul, sign -> packed bits.
    The production-dim path: at dim 768+ the literal-plane expression
    would embed n_tables*n_bits*dim floats in the plan (tens of
    thousands of literals — minutes of analysis/codegen and a fallback
    to interpreted eval), while here the planes ride the serialized
    function (one copy per executor, Torrent-broadcast) and the per-row
    cost is one BLAS-backed matmul row."""
    from pyspark.sql.functions import pandas_udf

    n_tables, n_bits, _dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, -1).T.copy()  # (dim, T*B)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (m @ flat) >= 0  # same >=0 sign convention as the literal path
        vals = (bits.reshape(len(m), n_tables, n_bits) * weights).sum(axis=2)
        return pd.Series(list(vals))

    return buckets


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id for one table: packed bits of sign(vec . h)."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    acc = F.lit(0).cast("long")
    for bit, h in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in h])
        dot = F.aggregate(
            F.zip_with(vd, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        acc = acc.bitwiseOR(
            F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), bit)
        )
    return acc


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
    dim: int | None = None,
    plane_strategy: str = "auto",
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join -> exact cosine on the
    candidate set. Recall grows with n_tables; each table is one shuffle
    key. Output schema identical to brute_force_topk.

    Pass ``dim`` (the embedding dimensionality) to keep plan construction
    purely lazy; when omitted, a driver-side ``first()`` reads it from
    the corpus (one tiny Spark job at build time).

    ``plane_strategy``: how the hyperplane dot products are computed.
    ``"literal"`` embeds the planes as plan literals (pure Catalyst,
    codegen, SQL-twin-friendly — right for small dim); ``"pandas"``
    computes all tables' buckets in one Arrow-vectorized matmul kernel
    (right for production dims, where literal planes mean tens of
    thousands of plan literals); ``"auto"`` (default) picks pandas once
    n_tables*n_bits*dim exceeds 8192 — i.e. dim 64 at the default
    4x8 tables stays literal, dim 768 goes vectorized.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    if plane_strategy == "auto":
        plane_strategy = "pandas" if n_tables * n_bits * dim > 8192 else "literal"
    if plane_strategy not in ("literal", "pandas"):
        raise ValueError(f"unknown plane_strategy {plane_strategy!r}")
    bucket_udf = _bucket_pandas_udf(planes) if plane_strategy == "pandas" else None

    def with_buckets(df: DataFrame, idname: str) -> DataFrame:
        if bucket_udf is not None:
            exploded = df.select(
                F.col(id_col).alias(idname),
                F.col(vec_col).alias(f"_{idname}_vec"),
                F.posexplode(bucket_udf(F.col(vec_col))).alias("table_idx", "bucket"),
            )
            return exploded.select(idname, f"_{idname}_vec", "table_idx", "bucket")
        buckets = F.array(
            *[
                F.struct(F.lit(t).alias("table_idx"), _bucket_expr(F.col(vec_col), planes[t]).alias("bucket"))
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"_{idname}_vec"),
            F.explode(buckets).alias("b"),
        ).select(idname, f"_{idname}_vec", "b.table_idx", "b.bucket")

    c = with_buckets(corpus, "neighbor_id")
    q = F.broadcast(with_buckets(queries, "query_id"))
    cand = (
        c.join(q, ["table_idx", "bucket"])
        .select("query_id", "neighbor_id", "_query_id_vec", "_neighbor_id_vec")
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn(
        "sim", F.round(cosine_similarity(F.col("_query_id_vec"), F.col("_neighbor_id_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_1 < id_2, sim >=
    threshold), optionally blocked on a partition column to bound the
    self-join (at corpus scale use lsh buckets as the block)."""
    a = df.select(
        F.col(id_col).alias("id_1"),
        F.col(vec_col).alias("_v1"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_2"),
        F.col(vec_col).alias("_v2"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    on = [F.col("id_1") < F.col("id_2")]
    joined = (
        a.join(b, (a["_blk"] == b["_blk"]) & on[0]) if block_col else a.join(b, on[0])
    )
    return (
        joined.withColumn("sim", F.round(cosine_similarity(F.col("_v1"), F.col("_v2")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_1", "id_2", "sim")
    )
