"""Similarity search over embedding columns (array<float>).

Three tiers, the standard ANN ladder:

- ``brute_force_topk``: exact cosine top-k. The dot products run as
  pure Catalyst array expressions (zip_with + aggregate — JVM, codegen)
  so even brute force never leaves the executor; the per-query top-k is
  one window. Cost O(|queries| * |corpus|): correct baseline, and the
  verifier for the bucketed paths.
- ``lsh_bucketed_topk``: random-hyperplane (sign-LSH) bucketing — a
  data-independent scale path: candidates = vectors sharing the query's
  bucket in >=1 of the hash tables, then exact cosine only on
  candidates. At 1000-executor scale the bucket join replaces the full
  cross product with per-bucket locality, and the bucket key is the
  shuffle key.
- ``ivf_topk``: inverted-file index over a coarse quantizer — the
  data-dependent scale path (the structure behind FAISS IVF): corpus
  vectors partition into centroid cells, queries probe their ``nprobe``
  nearest cells. Trainer-agnostic: consumes any (cell_id, centroid)
  frame (``sample_centroids`` for a deterministic seed, external
  k-means at production).

Hyperplanes are generated deterministically from a seed via NumPy and
shipped as literals (they are tiny: n_tables * n_bits * dim floats).
"""

from __future__ import annotations

import math

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


def sample_centroids(
    df: DataFrame,
    stride: int = 97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer "training" for :func:`ivf_topk`:
    every ``stride``-th vector becomes a cell centroid. A data sample is
    the standard cheap initializer (k-means|| seeds the same way); at
    production swap in properly trained centroids — ``ivf_topk`` is
    trainer-agnostic and only consumes the (cell_id, centroid) frame."""
    return df.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid")
    )


def _ivf_cells_pandas_udf(cents: np.ndarray, cell_ids: np.ndarray, nprobe: int):
    """Nearest-``nprobe`` IVF cells for a batch of vectors in one
    Arrow-vectorized kernel: a (batch, dim) x (dim, C) matmul on
    L2-normalized rows, round to 6, stable argsort. ``cell_ids`` must be
    ascending so the stable sort's tie-break is cell_id ASC — the same
    order the literal path and the SQL oracle use."""
    from pyspark.sql.functions import pandas_udf

    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)

    @pandas_udf("array<long>")
    def cells(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = np.round(mn @ cn.T, 6)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cell_ids[order]))

    return cells


def _cell_assigner(centroids: DataFrame, assign_strategy: str, caller: str):
    """Collect a (cell_id, centroid) frame (tiny by construction — a
    coarse quantizer) and build the shuffle-free nearest-cells assigner
    shared by :func:`ivf_topk` and :func:`semantic_dedup`. Returns
    ``(cents, probe_cells)`` where ``probe_cells(vec, n)`` yields the
    ``n`` nearest cell ids as an ``array<long>`` column — round-to-6
    cosine, cell_id-ASC tie-break, identical in both strategies (and in
    the SQL oracle twins)."""
    cents = sorted(
        ((r["cell_id"], list(r["centroid"])) for r in centroids.collect()),
        key=lambda t: t[0],
    )
    if not cents:
        raise ValueError(f"{caller}: centroids frame is empty")
    n_cells = len(cents)
    dim = len(cents[0][1])
    if assign_strategy == "auto":
        assign_strategy = "pandas" if n_cells * dim > 8192 else "literal"
    if assign_strategy not in ("literal", "pandas"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")

    if assign_strategy == "pandas":
        cmat = np.array([v for _, v in cents], dtype=np.float64)
        cids = np.array([c for c, _ in cents], dtype=np.int64)

        def probe_cells(vec: Column, n: int) -> Column:
            return _ivf_cells_pandas_udf(cmat, cids, n)(vec)

    else:
        # r6 (guide §2 "don't compute things twice"): precompute each
        # centroid's L2 norm ONCE as a literal — in Python, with the
        # exact same left-fold order as F.aggregate(acc + x*x) over
        # doubles, so the value is bit-identical to the expression the
        # old plan evaluated per (row, centroid). The row's own norm is
        # likewise hoisted out of the per-centroid transform. Per row
        # this removes C centroid-norm + (C-1) row-norm reductions;
        # only the dot products remain per centroid.
        def _norm(vec: list) -> float:
            acc = 0.0
            for x in vec:
                acc = acc + float(x) * float(x)
            return math.sqrt(acc)

        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(int(cid)).alias("cell_id"),
                    F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
                    F.lit(_norm(vec)).alias("cnorm"),
                )
                for cid, vec in cents
            ]
        )

        def probe_cells(vec: Column, n: int) -> Column:
            # per-row, zero-shuffle: score every centroid, sort by
            # (-sim, cell_id), keep the first n cell ids
            vd = F.transform(vec, lambda x: x.cast("double"))
            vnorm = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x))
            scored = F.transform(
                cent_arr,
                lambda c: F.struct(
                    (
                        -F.round(
                            F.aggregate(
                                F.zip_with(vd, c["cvec"], lambda x, y: x * y),
                                F.lit(0.0),
                                lambda a, x: a + x,
                            )
                            / (vnorm * c["cnorm"]),
                            6,
                        )
                    ).alias("negsim"),
                    c["cell_id"].alias("cell_id"),
                ),
            )
            if n == 1:
                # r6: top-1 needs no sort — array_min uses the identical
                # struct ordering (negsim ASC, cell_id ASC tie-break) as
                # array_sort's first element, in O(C) instead of
                # O(C log C) struct comparisons per row. This is the
                # corpus-assignment path (every corpus vector, every
                # ivf/semantic-dedup call); probing queries keep the sort.
                return F.array(F.array_min(scored)["cell_id"])
            return F.transform(
                F.slice(F.array_sort(scored), 1, n), lambda s: s["cell_id"]
            )

    return cents, probe_cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    assign_strategy: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: each corpus vector is
    assigned to its nearest centroid cell, each query probes its
    ``nprobe`` nearest cells, and exact cosine runs only on the probed
    cells' members. Output schema identical to ``brute_force_topk``.

    ``centroids`` is a small (cell_id, centroid) frame — from
    :func:`sample_centroids` or an external k-means trainer. It is
    collected once at plan-build time (a coarse quantizer is tiny by
    construction: even 65k cells x 1k dims is ~0.5 GB, and typical
    configs are kilobytes) and shipped to executors, so ASSIGNMENT IS
    SHUFFLE-FREE — the only shuffles in the plan are the candidate join
    on cell_id (query side broadcast) and the per-query top-k window.

    ``assign_strategy``: ``"literal"`` evaluates the centroid dot
    products as a per-row Catalyst array expression (pure JVM, codegen,
    SQL-twin-friendly — right for small C*dim); ``"pandas"`` does one
    BLAS matmul per Arrow batch (right for production cell counts);
    ``"auto"`` picks pandas once C*dim exceeds 8192. Both use the same
    round-to-6 + cell_id-ASC tie-break, so they agree exactly.
    """
    from pyspark.sql import Window

    cents, probe_cells = _cell_assigner(centroids, assign_strategy, caller="ivf_topk")
    nprobe = min(nprobe, len(cents))

    # r6: carry each row's pre-cast double vector AND its L2 norm through
    # the candidate join, so the per-pair work is one dot product instead
    # of a dot plus two norm reductions (same fold order as
    # cosine_similarity — dot/(query_norm * neighbor_norm) — so the
    # rounded sim is bit-identical).
    def with_cells(df: DataFrame, idname: str, n: int) -> DataFrame:
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(idname),
            vd.alias(f"_{idname}_vec"),
            F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x)).alias(
                f"_{idname}_n"
            ),
            F.explode(probe_cells(F.col(vec_col), n)).alias("cell_id"),
        )

    c = with_cells(corpus, "neighbor_id", 1)  # IVF: one cell per corpus vector
    q = F.broadcast(with_cells(queries, "query_id", nprobe))
    cand = c.join(q, "cell_id").select(
        "query_id", "neighbor_id", "_query_id_vec", "_neighbor_id_vec",
        "_query_id_n", "_neighbor_id_n",
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with(F.col("_query_id_vec"), F.col("_neighbor_id_vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = cand.withColumn(
        "sim", F.round(dot / (F.col("_query_id_n") * F.col("_neighbor_id_n")), 6)
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


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_strategy: str = "auto",
    max_cell_population: int | None = 100_000,
    return_purged: bool = False,
):
    """Semantic (embedding-space) deduplication, the SemDeDup shape
    (Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
    nearest coarse-quantizer cell, find cosine-similar pairs WITHIN each
    cell only, take connected components over the pair graph, keep one
    canonical member per component.

    Output: (``id_col``, cluster_id, is_canonical) — the same decision
    frame as :func:`...operators.dedup.neardup_clusters`; filter
    ``is_canonical = 1`` to materialize the semantically deduplicated
    corpus. ``cluster_id`` is the component's minimum id; every vector
    with no surviving edge is its own singleton cluster. Requires an
    integral ``id_col`` (the CC node id).

    100 TB shape: centroid assignment is SHUFFLE-FREE (the quantizer is
    collected once and shipped with the task — :func:`_cell_assigner`);
    the only data shuffles are the self-join on cell_id and the CC
    rounds, and pair cost is sum(|cell|^2) instead of |corpus|^2 — the
    quantizer's cell granularity is the knob that bounds it.

    ``max_cell_population``: a cell of d members emits d^2/2 join rows,
    and a degenerate quantizer (one centroid attracting everything) is
    the embedding-space twin of a hot LSH band. Cells above the cap are
    purged BEFORE the self-join — the same explicit, countable
    degradation contract as ``minhash_lsh_pairs``'s
    ``max_band_population``; purged members become singleton clusters.
    ``None`` disables the guard. ``return_purged=True`` returns
    ``(clusters, purged | None)`` with the audit frame
    ``(cell_id, cell_population)`` of dropped cells.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if not isinstance(
        df.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise ValueError(
            f"semantic_dedup: {id_col} must be integral (it is the CC node id); "
            "re-key or pre-hash string ids with a collision audit"
        )
    _, probe_cells = _cell_assigner(centroids, assign_strategy, caller="semantic_dedup")

    # cell assignment is embarrassingly parallel but runs where the scan
    # puts it — fan a narrow corpus out first (no-op at scale)
    from ..session import widen_if_narrow

    df = widen_if_narrow(df)

    # persist: the purge count and BOTH self-join sides consume this
    # frame, and re-deriving it re-runs the centroid-probe UDF per use.
    # r6: persist the pre-cast double vector and its L2 norm alongside —
    # the within-cell pair scoring then pays one dot product per pair
    # instead of a dot plus two per-pair norm reductions (identical fold
    # order to cosine_similarity, so the rounded sim is bit-identical).
    _vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assigned = df.select(
        F.col(id_col).cast("long").alias("_id"),
        _vd.alias("_vec"),
        F.sqrt(F.aggregate(_vd, F.lit(0.0), lambda a, x: a + x * x)).alias("_n"),
        probe_cells(F.col(vec_col), 1)[0].alias("cell_id"),
    ).persist()
    purged = None
    if max_cell_population is not None:
        sizes = assigned.groupBy("cell_id").agg(F.count("*").alias("cell_population"))
        purged = sizes.filter(F.col("cell_population") > max_cell_population)
        paired_side = assigned.join(
            F.broadcast(purged.select("cell_id")), "cell_id", "left_anti"
        )
    else:
        paired_side = assigned

    a = paired_side.select(
        F.col("cell_id").alias("_cell_1"),
        F.col("_id").alias("id_1"),
        F.col("_vec").alias("_v1"),
        F.col("_n").alias("_n1"),
    )
    b = paired_side.select(
        F.col("cell_id").alias("_cell_2"),
        F.col("_id").alias("id_2"),
        F.col("_vec").alias("_v2"),
        F.col("_n").alias("_n2"),
    )
    _dot = F.aggregate(
        F.zip_with(F.col("_v1"), F.col("_v2"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a_, x: a_ + x,
    )
    edges = (
        a.join(b, (F.col("_cell_1") == F.col("_cell_2")) & (F.col("id_1") < F.col("id_2")))
        .filter(F.round(_dot / (F.col("_n1") * F.col("_n2")), 6) >= threshold)
        .select(
            F.col("_cell_1").alias("cell_id"),
            F.col("id_1").alias("src"),
            F.col("id_2").alias("dst"),
        )
    )
    # r6: every edge lies within one quantizer cell and every vector has
    # exactly one cell, so components never span cells — per-cell
    # union-find in one Arrow stage (spine.blocked_components) replaces
    # the iterative global CC rounds; cell population is already bounded
    # by the max_cell_population purge above. Identical components.
    from .spine import blocked_components

    comp = blocked_components(edges, "cell_id").withColumnRenamed("id", "_cid")
    clusters = (
        assigned.select("_id")
        .join(comp, F.col("_id") == F.col("_cid"), "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("component"), F.col("_id")).alias("cluster_id"),
        )
        .withColumn(
            "is_canonical", (F.col(id_col) == F.col("cluster_id")).cast("int")
        )
    )
    if return_purged:
        return clusters, purged
    return clusters


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination: (id, max_bench_sim,
    contaminated) — a corpus vector is contaminated when its cosine
    against ANY benchmark/eval vector reaches ``threshold``.

    The embedding-space complement of the n-gram ``decontaminate`` gate
    (operators/curation.py): paraphrased eval leakage that shares no
    word n-gram with the benchmark still lands next to it in embedding
    space, so production pipelines run both gates before trusting
    held-out loss.

    Scale shape: the benchmark side is collected into ONE
    array-of-structs row (pre-normalized) and broadcast — eval sets are
    thousands of vectors against a 100 TB corpus, the same small-side
    contract as ``decontaminate``'s gram-set broadcast. The corpus is
    then scanned exactly once with a per-row JVM ``aggregate`` over the
    benchmark array (a broadcast nested-loop join against a single
    row). ZERO corpus shuffle: no join key, no groupBy — strictly
    map-side, so it composes under whatever partitioning the
    surrounding pipeline already chose and never becomes the shuffle
    bottleneck.

    NULL / empty corpus vectors report max_bench_sim = -1.0 (never
    contaminated); an empty benchmark flags nothing.
    """
    bd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bnorm = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda a, x: a + x * x))
    bench_row = benchmark.select(
        F.struct(bd.alias("v"), bnorm.alias("n")).alias("_b")
    ).agg(F.collect_list("_b").alias("_bench"))

    cd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cnorm = F.sqrt(F.aggregate(cd, F.lit(0.0), lambda a, x: a + x * x))

    def _best(acc, b):
        dot = F.aggregate(
            F.zip_with(cd, b["v"], lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        # greatest() skips NULLs, so a NULL vector (NULL dot) leaves the
        # accumulator at its floor instead of poisoning the max
        return F.greatest(acc, dot / (cnorm * b["n"]))

    max_sim = F.round(F.aggregate(F.col("_bench"), F.lit(-1.0), _best), 6)
    return (
        corpus.crossJoin(F.broadcast(bench_row))
        .select(
            F.col(id_col),
            max_sim.alias("max_bench_sim"),
            (max_sim >= F.lit(threshold)).alias("contaminated"),
        )
    )
