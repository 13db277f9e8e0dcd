"""Dedup + similarity operator semantics on handcrafted frames."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.operators import dedup as D
from spinebasedrecordlinkage_jl_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumped over the lazy dog"),  # near dup
        (4, "completely different content about databases"),
        (5, "totally unrelated text regarding astronomy here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["n_dups"] for r in D.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, min id kept
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r["id"]: tuple(r[f"h{k}"] for k in range(8))
            for r in D.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {(r["id_1"], r["id_2"]): r["n_shared_bands"]
             for r in D.minhash_lsh_pairs(docs).collect()}
    assert pairs[(1, 2)] == 4  # identical -> all 4 bands collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught by >=1 band
    assert (4, 5) not in pairs


def test_ngram_jaccard_values(docs):
    out = {(r["id_1"], r["id_2"]): r["jaccard"]
           for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.5 < out[(1, 3)] < 1.0
    assert (4, 5) not in out


def test_lsh_jaccard_verified_subset_of_exact(docs):
    exact = {(r["id_1"], r["id_2"]) for r in D.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    lsh = {(r["id_1"], r["id_2"]) for r in D.lsh_jaccard_verified(docs, threshold=0.2).collect()}
    assert lsh <= exact
    assert (1, 2) in lsh


def test_simhash_similar_docs_close_hamming(spark, docs):
    out = {(r["id_1"], r["id_2"]): r["hamming"]
           for r in D.simhash_dedup(docs, band_bits=8).collect()}
    assert out[(1, 2)] == 0  # identical text -> identical simhash
    assert out[(1, 3)] <= 16  # near dup -> small hamming distance


def test_simhash_numpy_reference(spark):
    """Spark simhash == a NumPy/Python reference on the same shingles."""
    import pandas as pd

    texts = ["abcdefgh", "the quick brown fox", "zzzzyyyy"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", D.simhash(F.col("text"), bits=16, shingle_n=4, max_chars=200).alias("sh")
    ).collect()}

    # reference: xxhash64 from Spark itself (per-shingle), votes in numpy
    for i, t in enumerate(texts):
        prefix = t[:200]
        n = max(len(prefix) - 3, 1)
        shingles = sorted({prefix[j:j + 4] for j in range(n)})
        hdf = spark.createDataFrame([(s,) for s in shingles], "s string")
        hvals = [r["h"] for r in hdf.select(F.xxhash64("s").alias("h")).collect()]
        bits = 0
        for b in range(16):
            votes = sum(1 for h in hvals if (h >> b) & 1)
            if votes * 2 > len(hvals):
                bits |= 1 << b
        assert got[i] == bits, f"doc {i}"


def test_simhash_pandas_matches_expr(spark):
    """The Arrow fast path (md5 family, default via impl='auto') is
    value-for-value equal to the pure-expression path — including NULL
    text, empty text, and strings shorter than the shingle width."""
    texts = [None, "", "ab", "abcd", "abcde", "the quick brown fox", "zzzz" * 80]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        D.simhash(F.col("text"), bits=32, hash_family="md5", impl="expr").alias("a"),
        D.simhash(F.col("text"), bits=32, hash_family="md5", impl="pandas").alias("b"),
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


def test_simhash_impl_validation():
    with pytest.raises(ValueError):
        D.simhash(F.lit("x"), impl="nope")
    with pytest.raises(ValueError):
        D.simhash(F.lit("x"), hash_family="xxhash64", impl="pandas")


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((4, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 10, [float(x) for x in v], i))
        # a near-duplicate of each base vector
        rows.append((i * 10 + 1, [float(x) for x in (v + 0.01 * rng.standard_normal(8))], i))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_finds_neardup(vectors):
    out = S.brute_force_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=1)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["neighbor_id"] == 1  # its jittered twin
    assert rows[0]["sim"] > 0.99


def test_lsh_topk_recall_vs_brute_force(vectors):
    queries = vectors.filter(F.col("vec_id") % 10 == 0)
    bf = {(r["query_id"], r["neighbor_id"]) for r in S.brute_force_topk(vectors, queries, k=1).collect()}
    lsh = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_bucketed_topk(vectors, queries, k=1, n_tables=6, n_bits=4).collect()}
    # near-identical vectors share all sign-LSH buckets -> full recall here
    assert bf <= lsh | bf
    assert len(lsh & bf) >= len(bf) - 1


def test_neardup_pairs_blocked(vectors):
    out = {(r["id_1"], r["id_2"]): r["sim"] for r in S.neardup_pairs(vectors, threshold=0.99).collect()}
    assert (0, 1) in out and (10, 11) in out
    assert all(v >= 0.99 for v in out.values())


def test_cosine_nan_free_on_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = S.brute_force_topk(df, df.filter(F.col("vec_id") == 2), k=1, exclude_self=True).collect()
    # zero vector gives NULL/NaN sim (0/0) — must not crash; row ranks last or drops
    assert len(out) <= 1


def test_ngram_hot_shingle_guard(spark):
    """max_doc_freq purges stop-word shingles from the inverted index
    BEFORE the self-join (the explicit, countable degradation that stops
    a hot shingle emitting d^2/2 join rows), with a purged audit frame;
    the default/None path keeps exact semantics."""
    # every doc shares the hot prefix "COMMONXX"; docs 1+2 additionally
    # share distinctive content
    rows = [
        (1, "COMMONXXalpha-beta-gamma-delta"),
        (2, "COMMONXXalpha-beta-gamma-DELTA"),
        (3, "COMMONXXzzzzzzzzzzzzzzzzzzzzzz"),
        (4, "COMMONXXqqqqqqqqqqqqqqqqqqqqqq"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap of 3: the shingle "COMMONXX" (df=4) is purged; pairs are then
    # computed over the surviving shingle universe
    pairs, purged = D.ngram_jaccard_pairs(
        docs, threshold=0.1, max_doc_freq=3, return_purged=True
    )
    purged_rows = {r["shingle"]: r["doc_freq"] for r in purged.collect()}
    assert purged_rows == {"COMMONXX": 4}
    got = {(r["id_1"], r["id_2"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) in got            # still found via distinctive shingles
    assert (3, 4) not in got        # only shared the purged hot shingle

    # guard off (None) == generous default cap on this small input
    exact_none = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.01, max_doc_freq=None).collect()
    }
    exact_default = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.01).collect()
    }
    assert exact_none == exact_default
    assert (3, 4) in exact_none     # unpurged: the hot shingle pairs them
    # and with the guard at the same low threshold, (3, 4) stays out
    guarded = {
        (r["id_1"], r["id_2"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.01, max_doc_freq=3).collect()
    }
    assert (3, 4) not in guarded


def test_neardup_clusters_string_ids(spark):
    """String doc ids take the hashed-node path: clusters form correctly
    and cluster_id is the minimum ORIGINAL id of each cluster."""
    rows = [
        ("doc-b", "the quick brown fox jumps over the lazy dog"),
        ("doc-a", "the quick brown fox jumps over the lazy dog"),
        ("doc-c", "the quick brown fox jumped over the lazy dog"),
        ("doc-z", "completely different content about databases"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in D.neardup_clusters(docs, threshold=0.2).collect()}
    # a+b+c cluster; min original id is doc-a
    assert out["doc-a"] == ("doc-a", 1)
    assert out["doc-b"] == ("doc-a", 0)
    assert out["doc-c"] == ("doc-a", 0)
    # singleton keeps itself
    assert out["doc-z"] == ("doc-z", 1)


def test_neardup_clusters_long_ids_unchanged(docs):
    """The integral-id fast path is untouched (cluster_id = min id)."""
    out = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters(docs, threshold=0.2).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[4] == 4 and out[5] == 5


def test_minhash_hot_bucket_guard(spark):
    """max_band_population purges degenerate band buckets BEFORE the
    self-join: 300 identical docs form ONE bucket per band which would
    emit 300^2/2 join rows per band; with the cap the operator completes
    with a countable purge (audit frame) instead, and cool buckets still
    pair. Cap=None keeps the unguarded semantics."""
    hot = [(i, "boilerplate page body repeated verbatim across the crawl")
           for i in range(300)]
    cool = [(1000, "a genuinely distinctive document about astronomy"),
            (1001, "a genuinely distinctive document about astronomy!")]
    docs = spark.createDataFrame(hot + cool, "doc_id long, text string")

    pairs, purged = D.minhash_lsh_pairs(
        docs, max_band_population=100, return_purged=True
    )
    purged_rows = purged.collect()
    # all 4 bands of the hot family blow the cap, each with population 300
    assert len(purged_rows) == 4
    assert all(r["band_population"] == 300 for r in purged_rows)
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    assert (1000, 1001) in got                      # cool bucket survives
    assert not any(i < 300 and j < 300 for i, j in got)  # hot family purged

    # guard off: the d^2/2 pairs come back (capped input keeps this cheap)
    unguarded = D.minhash_lsh_pairs(docs, max_band_population=None)
    assert unguarded.count() == 300 * 299 // 2 + 1


def test_simhash_hot_bucket_guard(spark):
    """Same purge contract for the Hamming-band join: identical docs
    share every (band_idx, band_val) bucket; the cap drops those buckets
    with an audit frame while near-dup pairs in cool buckets survive."""
    hot = [(i, "boilerplate page body repeated verbatim across the crawl")
           for i in range(300)]
    # the cool family is a bucket of exactly 2 (identical text != hot
    # text): guaranteed to share all its bands, population far below cap
    cool = [(1000, "a genuinely distinctive document about astronomy"),
            (1001, "a genuinely distinctive document about astronomy")]
    docs = spark.createDataFrame(hot + cool, "doc_id long, text string")

    pairs, purged = D.simhash_dedup(
        docs, max_band_population=100, return_purged=True
    )
    purged_rows = purged.collect()
    assert len(purged_rows) == 4  # 64 bits / 16-bit bands = 4 hot buckets
    assert all(r["band_population"] >= 300 for r in purged_rows)
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    assert (1000, 1001) in got
    assert not any(i < 300 and j < 300 for i, j in got)

    unguarded = D.simhash_dedup(docs, max_band_population=None)
    assert unguarded.count() == 300 * 299 // 2 + 1


def test_simhash_clusters_linear_output_on_dup_dense_corpus(spark):
    """The cluster tier's output density: on a duplicate-heavy corpus the
    RAW pair tier grows quadratically with family size while the cluster
    frame stays exactly one row per document — the scale contract that
    makes simhash_clusters the default consumer shape (r04 measured 22x
    pairs for 8x docs on raw pairs)."""
    distinct_texts = [
        f"document family {i} body with its own distinctive words {i * 17}"
        for i in range(10)
    ]

    def corpus(copies):
        rows = [
            (i * copies + c, distinct_texts[i])
            for i in range(len(distinct_texts))
            for c in range(copies)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string"), len(rows)

    small, n_small = corpus(4)
    big, n_big = corpus(16)

    # raw pairs: quadratic in family size (identical text -> hamming 0)
    raw_small = D.simhash_dedup(small, max_hamming=3).count()
    raw_big = D.simhash_dedup(big, max_hamming=3).count()
    assert raw_small >= 10 * (4 * 3 // 2)
    assert raw_big / raw_small > (n_big / n_small) * 2  # superlinear

    # cluster tier: exactly one row per document, regardless of density
    for df, n in ((small, n_small), (big, n_big)):
        cl = D.simhash_clusters(df, max_hamming=3).collect()
        assert len(cl) == n
        by_cluster = {}
        for r in cl:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        # every identical-copy family collapses to >=1 canonical each
        assert sum(r["is_canonical"] for r in cl) == len(by_cluster)
        # the 16 copies of family 0 (ids 0..copies-1) share one cluster
        copies = n // 10
        fam0 = {r["cluster_id"] for r in cl if r["doc_id"] < copies}
        assert len(fam0) == 1


def test_lsh_topk_plane_strategies_agree(spark):
    """The literal-plane Catalyst path and the Arrow-vectorized matmul
    path implement the same sign-LSH (>=0 convention, same seeded
    planes): identical top-k output on clustered data."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 16)) * 5
    rows = [
        (int(i), (centers[i % 10] + rng.standard_normal(16) * 0.05).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    lit = S.lsh_bucketed_topk(df, queries, k=3, dim=16, plane_strategy="literal")
    pan = S.lsh_bucketed_topk(df, queries, k=3, dim=16, plane_strategy="pandas")
    as_set = lambda d: {(r["query_id"], r["neighbor_id"], r["sim"], r["rank"]) for r in d.collect()}
    assert as_set(lit) == as_set(pan)


def test_lsh_topk_production_dim_768(spark):
    """dim 768 (production embedding size): auto strategy must route to
    the vectorized kernel, build its plan in bounded time (the literal
    path would embed 4*8*768 = 24576 plan literals), and recover most
    true neighbors on clustered data."""
    import time as _time

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((40, 768)).astype(np.float32) * 3
    rows = [
        (int(i), (centers[i % 40] + rng.standard_normal(768).astype(np.float32) * 0.05).tolist())
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 8)

    t0 = _time.time()
    approx = S.lsh_bucketed_topk(df, queries, k=5, dim=768)  # auto -> pandas
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    elapsed = _time.time() - t0
    assert elapsed < 120, f"dim-768 build+answer took {elapsed:.0f}s"

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(df, queries, k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    # cluster mates dominate the true top-5 and share buckets with high
    # probability; the floor is far below the observed recall so plane
    # RNG drift across numpy versions cannot flake the test
    assert recall >= 0.5, f"recall {recall:.2f}"


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """200 vectors in 10 tight clusters — the regime IVF is built for."""
    rng = np.random.default_rng(13)
    centers = rng.standard_normal((10, 16)) * 5
    rows = [
        (int(i), (centers[i % 10] + rng.standard_normal(16) * 0.05).tolist())
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_topk_recall_on_clustered_data(clustered_vectors):
    df = clustered_vectors
    queries = df.filter(F.col("vec_id") < 5)
    cents = S.sample_centroids(df, stride=19)  # 11 sampled centroids
    got = S.ivf_topk(df, queries, cents, k=5, nprobe=2)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in S.brute_force_topk(df, queries, k=5).collect()
    }
    hit = sum(1 for r in rows if (r["query_id"], r["neighbor_id"]) in exact)
    # cluster mates share a cell with their query's nearest centroid
    assert hit / len(exact) >= 0.8, f"recall {hit / len(exact):.2f}"
    # sims on shared pairs are the exact cosine, identically rounded
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["sim"] == exact[key]
    # per-query ranks are 1..n with no gaps
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_ivf_full_probe_equals_brute_force(clustered_vectors):
    """nprobe = n_cells degenerates IVF to exact search: every query
    probes every cell, so the candidate set is the whole corpus and the
    output must equal brute_force_topk row-for-row (same rounding, same
    tie-breaks)."""
    df = clustered_vectors
    queries = df.filter(F.col("vec_id") % 40 == 0)
    cents = S.sample_centroids(df, stride=19)
    n_cells = cents.count()
    ivf = S.ivf_topk(df, queries, cents, k=3, nprobe=n_cells)
    bf = S.brute_force_topk(df, queries, k=3)
    as_set = lambda d: {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"]) for r in d.collect()
    }
    assert as_set(ivf) == as_set(bf)


def test_ivf_assign_strategies_agree(clustered_vectors):
    """The literal-centroid Catalyst path and the Arrow matmul path use
    the same round-to-6 + cell_id-ASC tie-break: identical output."""
    df = clustered_vectors
    queries = df.filter(F.col("vec_id") < 5)
    cents = S.sample_centroids(df, stride=19)
    lit = S.ivf_topk(df, queries, cents, k=4, nprobe=2, assign_strategy="literal")
    pan = S.ivf_topk(df, queries, cents, k=4, nprobe=2, assign_strategy="pandas")
    as_set = lambda d: {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"]) for r in d.collect()
    }
    assert as_set(lit) == as_set(pan)


def test_ivf_empty_centroids_raises(clustered_vectors):
    df = clustered_vectors
    with pytest.raises(ValueError, match="centroids frame is empty"):
        S.ivf_topk(df, df.limit(1), S.sample_centroids(df.limit(0)), k=1)


def test_semantic_dedup_collapses_tight_clusters(clustered_vectors):
    """10 tight clusters at threshold 0.99: members connect to their
    cluster mates (cosine ~1 inside a cluster, ~0 across), never to
    another true cluster. A sampled quantizer may split one true
    cluster across two cells (two sampled centroids from the same
    cluster), so assert structure, not an exact count."""
    df = clustered_vectors
    cents = S.sample_centroids(df, stride=19)
    out = S.semantic_dedup(df, cents, threshold=0.99)
    rows = out.collect()
    assert len(rows) == 200 and len({r["vec_id"] for r in rows}) == 200
    # massive collapse, but never across true clusters
    n_clusters = len({r["cluster_id"] for r in rows})
    assert 10 <= n_clusters <= 25, n_clusters
    for r in rows:
        assert r["cluster_id"] % 10 == r["vec_id"] % 10  # same true cluster
    canon = [r for r in rows if r["is_canonical"] == 1]
    assert len(canon) == n_clusters
    assert all(r["vec_id"] == r["cluster_id"] for r in canon)


def test_semantic_dedup_hot_cell_guard(spark):
    """A degenerate quantizer (every vector in one cell) with a cap:
    the hot cell is purged BEFORE the self-join, members degrade to
    singletons, and the audit frame names the cell. Without the cap the
    same input collapses to one cluster."""
    rows = [(int(i), [1.0, 2.0, 3.0, 4.0]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = S.sample_centroids(df, stride=1000)  # one centroid: vec_id 0
    guarded, purged = S.semantic_dedup(
        df, cents, threshold=0.5, max_cell_population=50, return_purged=True
    )
    assert guarded.filter(F.col("is_canonical") == 1).count() == 60  # all singletons
    audit = purged.collect()
    assert len(audit) == 1 and audit[0]["cell_population"] == 60
    unguarded = S.semantic_dedup(df, cents, threshold=0.5, max_cell_population=None)
    assert unguarded.filter(F.col("is_canonical") == 1).count() == 1
    assert unguarded.filter(F.col("cluster_id") == 0).count() == 60


def test_semantic_dedup_assign_strategies_agree(clustered_vectors):
    df = clustered_vectors
    cents = S.sample_centroids(df, stride=19)
    as_set = lambda d: {tuple(r) for r in d.collect()}
    lit = S.semantic_dedup(df, cents, threshold=0.99, assign_strategy="literal")
    pan = S.semantic_dedup(df, cents, threshold=0.99, assign_strategy="pandas")
    assert as_set(lit) == as_set(pan)


def test_semantic_dedup_rejects_string_ids(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="must be integral"):
        S.semantic_dedup(df, S.sample_centroids(df.limit(0)))


def test_dedup_incremental_layers(spark):
    """Exact layer fires on byte-identical history content, the LSH
    band layer on near-identical, neither on unrelated text."""
    hist = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different content about databases"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),   # exact
            (11, "the quick brown fox jumped over the lazy dog"),  # near
            (12, "totally unrelated text regarding astronomy here"),
        ],
        "doc_id long, text string",
    )
    hashes, bands = D.build_dedup_index(hist)
    out = {r["doc_id"]: r for r in D.dedup_incremental(batch, hashes, bands).collect()}
    assert out[10]["exact_dup"] == 1 and out[10]["near_dup_candidate"] == 1
    assert out[10]["n_history_band_hits"] == 4  # identical -> all 4 bands
    assert out[11]["exact_dup"] == 0 and out[11]["near_dup_candidate"] == 1
    assert out[12]["exact_dup"] == 0 and out[12]["near_dup_candidate"] == 0
    assert [out[i]["novel"] for i in (10, 11, 12)] == [0, 0, 1]


def test_dedup_index_is_value_distinct_and_unionable(spark):
    """The index stores distinct VALUES (no doc ids), and refreshing it
    with a new batch is union+distinct — equal to rebuilding over the
    full corpus."""
    a = spark.createDataFrame(
        [(1, "same text repeated"), (2, "same text repeated"), (3, "other")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(4, "same text repeated"), (5, "brand new content")],
        "doc_id long, text string",
    )
    ha, ba = D.build_dedup_index(a)
    assert ha.count() == 2  # two distinct contents, not three docs
    assert set(ha.columns) == {"content_hash"} and set(ba.columns) == {"band_idx", "band_hash"}
    hb, bb = D.build_dedup_index(b)
    hfull, bfull = D.build_dedup_index(a.unionByName(b))
    union_h = sorted(r[0] for r in ha.unionByName(hb).distinct().collect())
    assert union_h == sorted(r[0] for r in hfull.collect())
    union_b = sorted(map(tuple, ba.unionByName(bb).distinct().collect()))
    assert union_b == sorted(map(tuple, bfull.collect()))


def test_dedup_incremental_verify_estimates(spark):
    """An exact dup of history estimates jaccard 1.0; a near dup lands
    in (0, 1]; unrelated text matches no history signature at all."""
    hist = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # dup content
            (3, "completely different content about databases"),
        ],
        "doc_id long, text string",
    )
    sigs = D.build_signature_index(hist)
    assert sigs.count() == 2  # value-distinct: 3 docs, 2 signatures
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumped over the lazy dog"),
            (12, "totally unrelated text regarding astronomy here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.dedup_incremental_verify(batch, sigs).collect()}
    assert out[10]["est_jaccard_max"] == 1.0 and out[10]["n_matched_sigs"] == 1
    assert 0 < out[11]["est_jaccard_max"] <= 1.0
    assert 12 not in out  # no shared band with any history signature


def test_dedup_incremental_verify_rejects_bad_index(spark):
    batch = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bad = spark.createDataFrame([("a",)], "content_hash string")
    with pytest.raises(ValueError, match="no h"):
        D.dedup_incremental_verify(batch, bad)


# ---------------------------------------------------------------------------
# semantic_decontaminate
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def decon_vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),    # == bench vector 100
        (2, [0.9, 0.1, 0.0]),    # near bench 100
        (3, [0.0, 1.0, 0.0]),    # orthogonal to both bench vectors
        (4, [0.0, 0.0, -1.0]),   # anti-parallel to bench 101
        (5, None),               # NULL embedding
        (100, [2.0, 0.0, 0.0]),  # bench member (same direction as 1)
        (101, [0.0, 0.0, 1.0]),  # bench member
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_decontaminate_flags_near_bench(decon_vectors):
    bench = decon_vectors.filter(F.col("vec_id") >= 100)
    out = {
        r["vec_id"]: (r["max_bench_sim"], r["contaminated"])
        for r in S.semantic_decontaminate(decon_vectors, bench, threshold=0.9).collect()
    }
    assert out[1] == (1.0, True)          # exact direction match
    assert out[100] == (1.0, True)        # bench member self-hit
    assert out[2][1] is True and out[2][0] > 0.99   # cos([.9,.1,0],[1,0,0])~0.9939
    assert out[3] == (0.0, False)         # orthogonal
    assert out[4] == (0.0, False)         # anti-parallel: max is vs bench 100 (0.0)
    assert out[5] == (-1.0, False)        # NULL embedding never contaminates


def test_semantic_decontaminate_threshold_boundary(decon_vectors):
    """The threshold compares against the ROUNDED max-sim (both engines
    round to 6 digits before the comparison)."""
    bench = decon_vectors.filter(F.col("vec_id") >= 100)
    strict = {
        r["vec_id"]: r["contaminated"]
        for r in S.semantic_decontaminate(decon_vectors, bench, threshold=1.0).collect()
    }
    assert strict[1] is True and strict[2] is False


def test_semantic_decontaminate_empty_benchmark(decon_vectors):
    bench = decon_vectors.filter(F.col("vec_id") < 0)
    out = S.semantic_decontaminate(decon_vectors, bench, threshold=0.1).collect()
    assert len(out) == decon_vectors.count()
    assert all(r["contaminated"] is False and r["max_bench_sim"] == -1.0 for r in out)
