"""Deduplication operators for training-data pipelines.

Five families, each a standard web-scale corpus-cleaning primitive:

- exact (content-hash groupBy) — one shuffle on the hash
- MinHash + LSH (shingle -> minhash signature -> band-bucket join) —
  the banding join only ever compares near-candidates, so cost is
  O(sum of bucket sizes squared), not O(n^2)
- SimHash (near-dup via Hamming-adjacent fingerprints)
- n-gram Jaccard (inverted shingle index join, exact similarity on the
  LSH-style candidate set)
- embedding cosine (see similarity.py)

Evaluate-once contract: the pair-generating operators persist their
small (id, signature) frames before the banded self-joins — both join
sides (and the purge audits) consume the same frame, and signature
evaluation is the expensive leg. Frames are MEMORY_AND_DISK and LRU
-evicted; callers embedding these operators in an unbounded
``foreachBatch`` loop should prefer the streaming twins
(``streaming/``), which are persist-free by construction.

MinHash here uses the *min of md5(seed || shingle)* family: md5 imposes
a pseudo-random total order per seed, so the min over a document's
shingle set is a proper min-wise hash, AND the same expression exists
verbatim in ANSI SQL — which is what lets the DuckDB oracle check the
whole signature pipeline bit-for-bit. SimHash uses JVM xxhash64 bits
(no portable SQL twin; validated against a NumPy reference in pytest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: content hash -> canonical (min) id + group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def _shingle_df(
    df: DataFrame, text_col: str, id_col: str, n: int, max_chars: int
) -> DataFrame:
    """(id, shingle) rows: distinct character n-grams of the text prefix.

    The prefix is projected as its own column BEFORE the explode: inside
    a Generate the expression tree is evaluated without common-
    subexpression elimination, so an inlined substring re-runs once per
    reference (length guard + every per-shingle substr) — the same
    evaluate-once shape as curation.word_ngrams_from_tokens (r6)."""
    pre = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, max_chars).alias("_prefix"),
    )
    prefix = F.col("_prefix")
    idx = F.sequence(F.lit(1), F.greatest(F.length(prefix) - (n - 1), F.lit(1)))
    shingles = F.array_distinct(F.transform(idx, lambda i: prefix.substr(i, F.lit(n))))
    return pre.select("id", F.explode(shingles).alias("shingle"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 8,
    max_chars: int = 100,
) -> DataFrame:
    """MinHash signature per document: h_k = min over shingles of
    md5(k || shingle). Output: (id, h0..h{num_hashes-1})."""
    sh = _shingle_df(df, text_col, id_col, shingle_n, max_chars)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(k)), F.col("shingle")))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_bands(
    signatures: DataFrame, rows_per_band: int = 2, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Signature -> (id, band_idx, band_hash) for LSH bucketing.

    ``carry`` keeps additional signature columns on every band row —
    consumers that need the signature next to its bands (the incremental
    verify layer) then skip a whole join back on ``id`` (r6)."""
    hcols = sorted(
        [c for c in signatures.columns if c.startswith("h")], key=lambda c: int(c[1:])
    )
    bands = []
    for b in range(0, len(hcols), rows_per_band):
        group = hcols[b : b + rows_per_band]
        bands.append(
            F.struct(
                F.lit(b // rows_per_band).alias("band_idx"),
                F.md5(F.concat(*[F.col(c) for c in group])).alias("band_hash"),
            )
        )
    return signatures.select(
        "id", *carry, F.explode(F.array(*bands)).alias("band")
    ).select(
        "id",
        *carry,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_hash").alias("band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
    max_band_population: int | None = 100_000,
    return_purged: bool = False,
):
    """Candidate near-duplicate pairs: documents sharing >=1 LSH band.
    Output: (id_1 < id_2, n_shared_bands). Downstream may verify with
    ngram_jaccard_pairs on the candidate set.

    ``max_band_population``: a band bucket shared by d documents emits
    d^2/2 join rows, and the corpora this operator exists for —
    duplicate-heavy web crawls — are exactly the ones that produce huge
    buckets (a boilerplate page duplicated a million times is ONE
    band_hash carried by 10^6 docs = 5*10^11 pairs). Buckets above the
    cap are purged BEFORE the self-join — the same explicit, countable
    degradation contract as ``ngram_jaccard_pairs``'s ``max_doc_freq``
    and ``blocking.candidate_pairs``'s ``max_block_size``. Members of a
    purged bucket can still pair through their other, cooler bands (and
    true exact duplicates belong in ``exact_dedup``'s hash-groupBy,
    which is linear, BEFORE any LSH pass). The default cap never fires
    at test scale; at 100 TB set it to the largest pair blow-up a
    bucket may charge (10^3-10^4). ``None`` disables the guard.
    ``return_purged=True`` returns ``(pairs, purged | None)`` where
    ``purged`` is the audit frame ``(band_idx, band_hash,
    band_population)`` of dropped buckets.
    """
    # persist the banded-signature frame: the self-join (and the purge
    # audit) consume it more than once, and re-deriving it re-runs the
    # md5 min-hash family over every document's shingle set per consumer
    bands = minhash_bands(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, max_chars),
        rows_per_band,
    ).persist()
    purged = None
    if max_band_population is not None:
        sizes = bands.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("band_population")
        )
        purged = sizes.filter(F.col("band_population") > max_band_population)
        bands = bands.join(
            F.broadcast(purged.select("band_idx", "band_hash")),
            ["band_idx", "band_hash"],
            "left_anti",
        )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
        .agg(F.count("*").alias("n_shared_bands"))
    )
    if return_purged:
        return pairs, purged
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    max_chars: int = 100,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    return_purged: bool = False,
):
    """Exact n-gram Jaccard similarity via an inverted shingle index:
    explode distinct shingles -> self-join on shingle -> |A∩B| per pair
    -> Jaccard with |A∪B| = |A|+|B|-|A∩B|. Output (id_1, id_2, jaccard).

    Scale note: the shingle join is the candidate generator; pair cost
    concentrates in high-document-frequency shingles — a shingle shared
    by d documents emits d^2/2 join rows. For 100 TB corpora run
    minhash_lsh_pairs first and verify only candidates; this exact
    operator is for block-sized inputs (and the LSH verification stage).

    ``max_doc_freq``: when set, shingles appearing in more than this
    many documents are purged from the index BEFORE sizes and the join
    (the same explicit, countable degradation as
    blocking.candidate_pairs' ``max_block_size`` purge — a misused call
    degrades measurably instead of OOMing on a stop-word shingle).
    Jaccard is then computed over the surviving shingle universe,
    consistently on both sides of the ratio. The default is ``None``
    (exact semantics — this operator's documented contract); the guard
    is OPT-IN because silently lossy defaults would diverge from any
    exact twin (an oracle, a spot-check recomputation) on corpora with
    hot shingles. At 100 TB, pass a cap — or use lsh_jaccard_verified,
    whose candidate generator carries its own guard.
    ``return_purged=True`` additionally returns the audit frame of
    purged ``(shingle, doc_freq)`` rows: ``(pairs, purged | None)``.
    """
    # persist the inverted index: per-doc sizes, the (optional) purge
    # counts and BOTH sides of the shingle self-join consume it, and
    # each would otherwise re-shingle the corpus from scratch
    sh = _shingle_df(df, text_col, id_col, shingle_n, max_chars).persist()
    purged = None
    if max_doc_freq is not None:
        freqs = sh.groupBy("shingle").agg(F.count("*").alias("doc_freq"))
        purged = freqs.filter(F.col("doc_freq") > max_doc_freq)
        sh = sh.join(F.broadcast(purged.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_1"), F.col("n_sh").alias("n_1"))
    sb = sizes.select(F.col("id").alias("id_2"), F.col("n_sh").alias("n_2"))
    pairs = (
        inter.join(sa, "id_1")
        .join(sb, "id_2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_1") + F.col("n_2") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )
    if return_purged:
        return pairs, purged
    return pairs


def lsh_jaccard_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
    max_band_population: int | None = 100_000,
) -> DataFrame:
    """The scalable near-dup pipeline: MinHash-LSH candidates -> exact
    n-gram Jaccard verification on candidates only.
    ``max_band_population`` is forwarded to the candidate generator
    (minhash_lsh_pairs' hot-bucket purge guard).

    This is the 100 TB shape: the inverted-index self-join of
    ngram_jaccard_pairs costs sum(df^2) over shingle document
    frequencies (quadratic in hot shingles), while here the expensive
    exact measure touches only LSH candidates. Verification uses each
    side's distinct-shingle array (array_intersect — JVM) instead of
    re-joining the inverted index. Output: (id_1, id_2, jaccard).
    """
    # r6 (guide §2.3 "don't shingle twice"): ONE pass over the shingle
    # relation computes BOTH the MinHash signatures and each document's
    # distinct-shingle set — one groupBy instead of two, and the corpus
    # is shingled once instead of once per consumer. The per-doc frame is
    # persisted; bands, the purge audit and both verify join sides are
    # cheap projections of it. Candidate semantics, band purge and the
    # Jaccard formula are unchanged.
    sh = _shingle_df(df, text_col, id_col, shingle_n, max_chars)
    per_doc = sh.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(k)), F.col("shingle")))).alias(f"h{k}")
            for k in range(num_hashes)
        ],
        F.collect_set("shingle").alias("sh"),
    ).persist()
    bands = minhash_bands(
        per_doc.select("id", *[f"h{k}" for k in range(num_hashes)]), rows_per_band
    )
    if max_band_population is not None:
        sizes = bands.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("band_population")
        )
        purged = sizes.filter(F.col("band_population") > max_band_population)
        bands = bands.join(
            F.broadcast(purged.select("band_idx", "band_hash")),
            ["band_idx", "band_hash"],
            "left_anti",
        )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
        .distinct()
    )
    s1 = per_doc.select(F.col("id").alias("id_1"), F.col("sh").alias("sh_1"))
    s2 = per_doc.select(F.col("id").alias("id_2"), F.col("sh").alias("sh_2"))
    inter = F.size(F.array_intersect(F.col("sh_1"), F.col("sh_2")))
    union = F.size("sh_1") + F.size("sh_2") - inter
    return (
        cands.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("jaccard", F.round(inter.cast("double") / union.cast("double"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def neardup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
    max_band_population: int | None = 100_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS: transitive closure over the LSH-verified
    pair graph, one canonical document per cluster — the corpus-dedup
    decision step ("keep one of each near-dup family").

    Pipeline: MinHash-LSH candidates -> exact n-gram Jaccard verify
    (lsh_jaccard_verified, the 100 TB-shaped path) -> connected
    components (large-star/small-star over doc ids) -> every document
    mapped to its cluster's minimum doc id. Documents with no surviving
    near-dup edge are their own singleton cluster.

    Output: (doc_id, cluster_id, is_canonical) — filter
    ``is_canonical`` to materialize the deduplicated corpus, or group by
    ``cluster_id`` for family statistics.

    Id handling: integral ids run CC directly on the id (fast path;
    ``cluster_id`` is the cluster's minimum id). Any other id type is
    hashed to a 64-bit node id with a collision audit (distinct ids
    sharing a hash raise — a silent cast-to-null would have clustered
    unrelated docs), CC runs on the hashes, and ``cluster_id`` is the
    cluster's minimum ORIGINAL id (one extra groupBy over the docs).
    """
    pairs = lsh_jaccard_verified(
        df, text_col, id_col, threshold, num_hashes, rows_per_band, shingle_n, max_chars,
        max_band_population=max_band_population,
    )
    return _pairs_to_clusters(df, id_col, pairs, caller="neardup_clusters")


def _pairs_to_clusters(
    df: DataFrame, id_col: str, pairs: DataFrame, caller: str
) -> DataFrame:
    """Shared decision step of the cluster-tier dedup operators: verified
    pair graph -> connected components -> (doc_id, cluster_id,
    is_canonical), with the id-type handling documented on
    :func:`neardup_clusters` (integral fast path; otherwise hashed node
    ids with a collision audit)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from .spine import connected_components

    id_type = df.schema[id_col].dataType
    if isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        edges = pairs.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
        comp = connected_components(edges).withColumnRenamed("id", "_id")
        docs = df.select(F.col(id_col).cast("long").alias("doc_id"))
        return (
            docs.join(comp, docs["doc_id"] == F.col("_id"), "left")
            .select(
                "doc_id",
                F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            )
            .withColumn("is_canonical", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
        )

    docs = df.select(F.col(id_col).alias("doc_id")).distinct().withColumn(
        "_h", F.xxhash64(F.col("doc_id"))
    )
    dup_hashes = (
        docs.groupBy("_h").agg(F.count("*").alias("_n")).filter(F.col("_n") > 1)
    )
    if not dup_hashes.isEmpty():
        raise RuntimeError(
            f"{caller}: xxhash64 collision among distinct {id_col} values; "
            "dedupe or re-key the input ids"
        )
    edges = pairs.select(
        F.xxhash64(F.col("id_1")).alias("src"), F.xxhash64(F.col("id_2")).alias("dst")
    )
    comp = connected_components(edges).withColumnRenamed("id", "_h")
    members = docs.join(comp, "_h", "left").select(
        "doc_id", F.coalesce(F.col("component"), F.col("_h")).alias("_comp")
    )
    canon = members.groupBy("_comp").agg(F.min("doc_id").alias("cluster_id"))
    return (
        members.join(canon, "_comp")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
        )
    )


def _simhash_pandas(
    text: Column, bits: int, shingle_n: int, max_chars: int
) -> Column:
    """Arrow-vectorized SimHash for the md5 family: hashlib md5 produces
    the identical digest to Spark's / DuckDB's ``md5()``, so this path is
    value-for-value equal to the expression path (pinned by
    ``test_simhash_pandas_matches_expr``) while evaluating ~3x faster —
    one Python pass per doc instead of ``bits`` interpreted higher-order
    filter traversals per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_pd(texts):
        import hashlib

        import numpy as np
        import pandas as pd

        positions = np.arange(bits)
        weights = np.int64(1) << np.arange(bits, dtype=np.int64)
        # r6 batch vectorization (guide §4.2): md5 is computed once per
        # UNIQUE shingle in the Arrow batch (near-dup corpora repeat the
        # same shingles across documents — the whole reason this operator
        # exists), and the per-document bit votes accumulate through one
        # np.add.at scatter instead of a Python loop per (doc, shingle).
        # Values are identical to the per-doc loop: same md5, same votes.
        doc_sets: list = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None or (isinstance(t, float) and t != t):
                # expression-path twin: md5(NULL) drops out of every
                # bit-vote filter, so NULL text packs to 0, not NULL
                continue
            prefix = t[:max_chars]
            if len(prefix) <= shingle_n:
                # mirrors sequence(1, greatest(len-(n-1), 1)) + substr:
                # short/exact-length strings yield one shingle, the prefix
                sh = (prefix,)
            else:
                sh = tuple(
                    {prefix[j : j + shingle_n] for j in range(len(prefix) - shingle_n + 1)}
                )
            counts[i] = len(sh)
            doc_sets.append((i, sh))
        if not doc_sets:
            return pd.Series(np.zeros(len(texts), dtype=np.int64), dtype="Int64")
        flat = [s for _, sh in doc_sets for s in sh]
        seg = np.repeat(
            np.fromiter((i for i, _ in doc_sets), dtype=np.int64, count=len(doc_sets)),
            np.fromiter((len(sh) for _, sh in doc_sets), dtype=np.int64, count=len(doc_sets)),
        )
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        h = np.fromiter(
            (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        bits_of = (h[:, None] >> positions) & 1  # (n_uniq, bits)
        votes = np.zeros((len(texts), bits), dtype=np.int64)
        np.add.at(votes, seg, bits_of[inv])
        fp = ((votes * 2 > counts[:, None]) * weights).sum(axis=1)
        return pd.Series(fp, dtype="Int64")

    return simhash_pd(text)


def simhash(
    text: Column,
    bits: int = 64,
    shingle_n: int = 4,
    max_chars: int = 200,
    hash_family: str = "xxhash64",
    impl: str = "auto",
) -> Column:
    """SimHash fingerprint: per distinct shingle, a hash supplies the
    bit pattern; each bit position accumulates +1/-1 votes; the sign
    vector is packed back into a long.

    ``impl``: ``"expr"`` — JVM array expressions
    (transform/aggregate/filter), no Python; ``"pandas"`` —
    Arrow-vectorized batch UDF (md5 family only; identical values,
    faster per row); ``"auto"`` (default) — pandas for md5, expr for
    xxhash64 (whose hash has no cheap Python twin).

    ``hash_family``: ``"xxhash64"`` (default; 64 hash bits, fastest
    expression path) or ``"md5"`` — the first 8 hex chars of
    md5(shingle) parsed as a 32-bit integer. md5 exists verbatim in
    ANSI SQL, which lets the DuckDB oracle replay the whole bit
    pipeline (same trick as the MinHash family above); cap ``bits`` at
    32 with this family.
    """
    if hash_family == "md5":
        if bits > 32:
            raise ValueError("md5 family supplies 32 hash bits; use bits <= 32")
    elif hash_family != "xxhash64":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    if impl not in ("auto", "expr", "pandas"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "pandas" and hash_family != "md5":
        raise ValueError("impl='pandas' requires hash_family='md5'")
    if hash_family == "md5" and impl in ("auto", "pandas"):
        return _simhash_pandas(text, bits, shingle_n, max_chars)
    prefix = F.substring(text, 1, max_chars)
    idx = F.sequence(F.lit(1), F.greatest(F.length(prefix) - (shingle_n - 1), F.lit(1)))
    shingles = F.array_distinct(F.transform(idx, lambda i: prefix.substr(i, F.lit(shingle_n))))
    if hash_family == "md5":
        hashes = F.transform(
            shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        )
    else:
        hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    # votes[b] = count of shingles with bit b set; bit b of result set iff
    # votes[b]*2 > n_shingles
    n = F.size(hashes)
    result = F.lit(0).cast("long")
    for b in range(bits):
        votes = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        bit = F.when(votes * 2 > n, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        result = result.bitwiseOR(F.shiftleft(bit, b))
    return result


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    hash_family: str = "xxhash64",
    max_band_population: int | None = 100_000,
    return_purged: bool = False,
    max_hamming: int | None = None,
):
    """Near-dup candidates: docs whose simhash matches on >=1 of the
    bits/band_bits bands (Hamming-distance LSH). Output (id_1, id_2,
    hamming), optionally thresholded to ``hamming <= max_hamming``.

    ``max_band_population``: same hot-bucket purge contract as
    ``minhash_lsh_pairs`` — a ``(band_idx, band_val)`` bucket shared by
    d documents emits d^2/2 join rows, and duplicate-heavy corpora
    concentrate mass in few fingerprints (the sf-scale sweep already
    shows pair OUTPUT growing ~2x faster than the corpus). Buckets
    above the cap are purged before the self-join; ``return_purged``
    yields the ``(band_idx, band_val, band_population)`` audit frame as
    ``(pairs, purged | None)``. Default never fires at test scale;
    ``None`` disables.

    Output-density contract: even with ``max_hamming``, RAW pairs are
    inherently quadratic in each duplicate family's size (f identical
    docs = f^2/2 hamming-0 pairs — the r04 sf-sweep measured 22x pairs
    for 8x docs on a dup-dense corpus). Downstream consumers at scale
    should take :func:`simhash_clusters`, whose output is exactly one
    row per document.
    """
    # Signature evaluation is the expensive leg (O(shingles x bits) per
    # row), and the banded self-join below consumes the signature frame
    # TWICE — so (a) widen a narrower-than-the-cluster scan (a single
    # small parquet file otherwise serializes the whole corpus through
    # one task; at real scale the input already has more splits than
    # cores and this is a no-op), and (b) persist the tiny (id, sh)
    # frame so each signature is computed once, not once per join side.
    from ..session import widen_if_narrow

    src = widen_if_narrow(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    sh = src.select(
        "id", simhash(F.col("_t"), bits=bits, hash_family=hash_family).alias("sh")
    ).persist()
    n_bands = bits // band_bits
    bands = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("sh"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sh", "band.band_idx", "band.band_val")
    purged = None
    if max_band_population is not None:
        sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count("*").alias("band_population")
        )
        purged = sizes.filter(F.col("band_population") > max_band_population)
        bands = bands.join(
            F.broadcast(purged.select("band_idx", "band_val")),
            ["band_idx", "band_val"],
            "left_anti",
        )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_1"),
            F.col("b.id").alias("id_2"),
            F.col("a.sh").bitwiseXOR(F.col("b.sh")).alias("x"),
        )
    )
    # r6 (guide §2.3 "shuffle fewer bytes"): Hamming-verify BEFORE the
    # dedup shuffle — bit_count is a map-side expression and the filter
    # commutes with distinct (hamming is a function of the pair), so
    # when a threshold is given the distinct exchange carries only
    # verified pairs (~100x fewer than banded candidates on dup-dense
    # corpora) instead of every candidate row. Identical output set.
    pairs = pairs.select("id_1", "id_2", F.bit_count("x").alias("hamming"))
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    pairs = pairs.distinct()
    if return_purged:
        return pairs, purged
    return pairs


def simhash_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    hash_family: str = "xxhash64",
    max_hamming: int = 3,
    max_band_population: int | None = 100_000,
) -> DataFrame:
    """SimHash near-dup CLUSTERS: banded candidates -> exact Hamming
    verify (``<= max_hamming``) -> connected components -> one canonical
    document per cluster. Same decision-frame contract as
    :func:`neardup_clusters`: (doc_id, cluster_id, is_canonical).

    This is the scale-safe default tier over SimHash: raw
    :func:`simhash_dedup` pairs grow quadratically inside duplicate
    families (f copies = f^2/2 pairs), but the cluster frame is exactly
    one row per document — linear by construction, whatever the corpus
    density. The CC rounds run on the pair graph, whose edge count the
    band purge bounds per bucket."""
    pairs = simhash_dedup(
        df,
        text_col=text_col,
        id_col=id_col,
        bits=bits,
        band_bits=band_bits,
        hash_family=hash_family,
        max_band_population=max_band_population,
        max_hamming=max_hamming,
    )
    return _pairs_to_clusters(df, id_col, pairs, caller="simhash_clusters")


def build_dedup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
) -> tuple[DataFrame, DataFrame]:
    """Build the persisted dedup index of a historical corpus for
    :func:`dedup_incremental`: ``(hashes, bands)`` where ``hashes`` is
    the DISTINCT content-hash set (exact layer) and ``bands`` the
    distinct (band_idx, band_hash) LSH band set (near-dup layer).

    Both frames are per-VALUE distinct — the index stores what content
    exists, not which document carries it, so it stays a fraction of
    corpus size and appending a day's batch is a union+distinct. Write
    them as parquet/Iceberg tables and refresh incrementally."""
    hashes = df.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    bands = minhash_bands(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, max_chars),
        rows_per_band,
    ).select("band_idx", "band_hash").distinct()
    return hashes, bands


def dedup_incremental(
    new_docs: DataFrame,
    history_hashes: DataFrame,
    history_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
) -> DataFrame:
    """Dedup a NEW batch against the persisted index of everything seen
    before (the production shape: today's crawl vs. the historical
    corpus, without ever re-scanning history). Output per new document:

      (id, exact_dup, n_history_band_hits, near_dup_candidate, novel)

    ``exact_dup``: content hash already in ``history_hashes``.
    ``n_history_band_hits`` / ``near_dup_candidate``: how many of the
    document's LSH bands exist in ``history_bands`` — the same candidate
    semantics as ``minhash_lsh_pairs`` (>=1 shared band); verification
    against actual historical text is a second, targeted pass if needed.
    ``novel``: neither layer fired — safe to append, and the document's
    hash/bands are what ``build_dedup_index`` on the batch unions into
    the index.

    100 TB shape: the batch is days smaller than history, but the INDEX
    is value-distinct and layered — the joins here are batch-side
    explode vs two distinct sets, shuffled on content_hash / band_hash
    (high-cardinality, no skew); history documents themselves are never
    read. Left-semi/left-outer joins keep it one pass over the batch.
    """
    # The index layers are value-distinct BY CONTRACT (build_dedup_index
    # produces them distinct; refreshes are union+distinct) — no
    # re-distinct here, which would re-shuffle the full index on every
    # call (stream_dedup_incremental calls this per micro-batch). The
    # batch-sized dropDuplicates below keeps the output correct even if
    # a caller hands in a non-distinct hash frame.
    hashed = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    exact = (
        hashed.join(
            history_hashes.select("content_hash").withColumn("_x", F.lit(1)),
            "content_hash",
            "left",
        )
        .select(id_col, F.coalesce(F.col("_x"), F.lit(0)).alias("exact_dup"))
        .dropDuplicates([id_col])
    )

    batch_bands = minhash_bands(
        minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_n, max_chars),
        rows_per_band,
    )
    band_hits = (
        batch_bands.join(
            # left_semi never multiplies left rows, so right-side dups
            # cannot skew the per-document band-hit count
            history_bands.select("band_idx", "band_hash"),
            ["band_idx", "band_hash"],
            "left_semi",
        )
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count("*").alias("n_history_band_hits"))
    )
    out = (
        exact.join(band_hits, id_col, "left")
        .select(
            id_col,
            "exact_dup",
            F.coalesce(F.col("n_history_band_hits"), F.lit(0)).alias(
                "n_history_band_hits"
            ),
        )
        .withColumn(
            "near_dup_candidate", (F.col("n_history_band_hits") > 0).cast("int")
        )
    )
    return out.withColumn(
        "novel",
        ((F.col("exact_dup") == 0) & (F.col("near_dup_candidate") == 0)).cast("int"),
    )


def build_signature_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 8,
    max_chars: int = 100,
) -> DataFrame:
    """Third layer of the persisted dedup index (after
    :func:`build_dedup_index`'s hash and band sets): the DISTINCT
    MinHash signatures of the historical corpus, (h0..h{k-1}) with no
    doc ids. Lets :func:`dedup_incremental_verify` ESTIMATE how similar
    a new document is to anything in history without ever re-reading
    history text. Refresh by union+distinct like the other layers."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, max_chars)
    return sigs.drop("id").distinct()


def dedup_incremental_verify(
    new_docs: DataFrame,
    history_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
    shingle_n: int = 8,
    max_chars: int = 100,
    max_band_population: int | None = 100_000,
) -> DataFrame:
    """Quantify ``dedup_incremental``'s near-dup CANDIDATES: for each
    new document, the maximum estimated Jaccard against the historical
    signature index — est_jaccard = fraction of agreeing MinHash
    components (the standard unbiased estimator), maximized over the
    history signatures that share >=1 LSH band with the document.

    Output: (id, est_jaccard_max, n_matched_sigs); documents with no
    band match are ABSENT (join with the candidate frame's left side to
    zero-fill). Downstream thresholds est_jaccard_max where
    ``dedup_incremental`` could only say "candidate".

    100 TB shape: the band bucket join runs batch-side bands against
    the value-distinct history band space — never history documents —
    and ``max_band_population`` purges hot history bands (a boilerplate
    signature shared by millions of docs is ONE row in the signature
    index, so the index itself already collapses exact-dup mass).
    """
    num_hashes = len([c for c in history_sigs.columns if c.startswith("h")])
    if num_hashes == 0:
        raise ValueError("dedup_incremental_verify: history_sigs has no h* columns")
    # portable signature identity (md5 of the concatenated components —
    # the oracle SQL reconstructs it verbatim; components are fixed-width
    # md5 hex so plain concatenation is collision-safe)
    hist = history_sigs.withColumn(
        "_sig_id", F.md5(F.concat(*[F.col(f"h{k}") for k in range(num_hashes)]))
    )
    # r6: the signature columns ride the band explode directly (carry=)
    # instead of being joined back on the sig id — one shuffle join less
    # on each side of the candidate join
    hist_bands = minhash_bands(
        hist.withColumnRenamed("_sig_id", "id"),
        rows_per_band,
        carry=tuple(f"h{k}" for k in range(num_hashes)),
    )
    if max_band_population is not None:
        sizes = hist_bands.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("_n")
        )
        hot = sizes.filter(F.col("_n") > max_band_population)
        hist_bands = hist_bands.join(
            F.broadcast(hot.select("band_idx", "band_hash")),
            ["band_idx", "band_hash"],
            "left_anti",
        )

    batch_sigs = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n, max_chars
    )
    batch_bands = minhash_bands(
        batch_sigs, rows_per_band, carry=tuple(f"h{k}" for k in range(num_hashes))
    )

    agree = sum(
        F.when(F.col(f"h{k}") == F.col(f"_hh{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    cand = batch_bands.join(
        hist_bands.select(
            "band_idx",
            "band_hash",
            F.col("id").alias("_sig_id"),
            *[F.col(f"h{k}").alias(f"_hh{k}") for k in range(num_hashes)],
        ),
        ["band_idx", "band_hash"],
    )
    per_sig = (
        cand.groupBy("id", "_sig_id")
        .agg(F.max(agree).alias("_agree"))
        .withColumn(
            "_est", F.round(F.col("_agree").cast("double") / num_hashes, 6)
        )
    )
    return per_sig.groupBy(F.col("id").alias(id_col)).agg(
        F.max("_est").alias("est_jaccard_max"),
        F.countDistinct("_sig_id").cast("long").alias("n_matched_sigs"),
    )
