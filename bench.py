#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf", plus linkage-throughput extras}.

The flagship linkage throughput is measured on a synthesized transcript
corpus (deterministic generator, sized by $SPINELINK_BENCH_ENTITIES,
default 8000 entities -> ~20k conversations -> ~130k turns) running the
FULL pipeline: records aggregation -> criteria passes -> connected
components -> relink. Reported as linked_records_per_sec.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spinebasedrecordlinkage_jl_spark import get_spark  # noqa: E402
from spinebasedrecordlinkage_jl_spark.entry_queries import QUERIES  # noqa: E402

HEADLINE = [
    "conversation_records",
    "dedup_first_wins",
    "linkage_exact_pass",
    "linkage_fuzzy_pass",
    "first_criteria_wins",
    "connected_components",
    "linkage_full",
    "dedup_exact",
    "minhash_lsh_pairs",
    "lsh_jaccard_verified",
    "text_quality",
    "ann_topk",
    "multimodal_meta",
]

#: round-4 operator additions, timed separately so the headline total
#: stays comparable round-over-round
EXTENDED = [
    "ann_ivf_topk",
    "decontaminate",
    "pii_scrub",
    "stratified_sample",
    "quality_filter",
    "repetition_stats",
    "line_dedup",
    "vocab_topk",
    "blocking_profile",
    "media_decode",
    "image_dhash_pairs",
    "semantic_dedup",
    "simhash_clusters",
    "pack_sequences",
    "transcript_checks",
    "corpus_mix",
    "dedup_incremental",
    "corpus_report",
    "dedup_incremental_verify",
    "scrub_transcripts",
    "sessionize",
    "truncate_conversations",
    "compact_latest",
    "dup_span_stats",
    "dup_spans_topk",
    "split_corpus",
    "split_leakage",
    "epoch_shuffle",
    "semantic_decontaminate",
    "ann_ivf_recall",
    "strip_dup_spans",
    "turn_boilerplate",
]


def run_link_to_spine_throughput(
    spark, n_entities: int, max_convs_per_entity: int = 4, repeats: int = 1
) -> dict:
    """Steady-state linkage throughput: records probed against an
    EXISTING spine (the north star's 'first-pass-wins linkage of records
    to spine entities') — the production workload once entities exist.

    Spine construction (entity formation) is excluded from the timing the
    same way input synthesis is: it is the corpus bootstrap, not the
    recurring job. The timed plan is: records aggregation (one shuffle)
    -> three criteria passes as broadcast-hash joins (event side never
    shuffled) with JVM Levenshtein + Arrow Jaro-Winkler scoring ->
    first-criteria-wins window -> count.
    """
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark.operators.linkage import link_table
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records
    from spinebasedrecordlinkage_jl_spark.operators.spine import form_entities
    from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

    crits = _bench_criteria()
    transcripts, _ = synthesize_transcripts(
        spark, n_entities=n_entities, max_convs_per_entity=max_convs_per_entity
    )
    transcripts = transcripts.localCheckpoint(eager=True)
    n_turns = transcripts.count()

    # untimed bootstrap: build the spine once (spine << records is the
    # production shape — the reference's own contract, README.md:289)
    rec0 = (
        linkage_records(transcripts)
        .filter(F.col("birthdate").isNotNull())
        .localCheckpoint(eager=True)
    )
    spine, _ = form_entities(
        rec0, crits,
        construct_entityid_from=["firstname", "lastname", "birthdate"],
        spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
        tablename="transcripts", order_col="conv_id",
    )
    spine = spine.localCheckpoint(eager=True)
    n_spine = spine.count()

    cleanup = _rdd_cleanup_scope(spark)
    best = None
    for _ in range(max(repeats, 1)):
        t0 = time.time()
        # Materialize the records aggregation ONCE (timed): the three
        # criteria passes all consume it, and without the checkpoint
        # Catalyst re-runs the collect_list shuffle per union branch —
        # 3x the most expensive stage (verified via explain("formatted")).
        # Production shape: the records table is written once per batch.
        # Project to the criteria columns BEFORE the checkpoint:
        # localCheckpoint materializes the full schema, and the raw
        # first_user_text (already consumed by the extractors) is the
        # widest column in the row.
        rec = (
            linkage_records(transcripts)
            .filter(F.col("birthdate").isNotNull())
            .select("EventId", "conv_id", "firstname", "lastname", "birthdate")
            .repartition(2 * spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        n_links = link_table(rec, spine, crits, "transcripts").count()
        elapsed = time.time() - t0
        if best is None or elapsed < best:
            best = elapsed
        cleanup()
    return {
        "n_turns": n_turns,
        "n_spine": n_spine,
        "n_records_linked": n_links,
        "linkage_sec": round(best, 3),
        "linked_records_per_sec": round(n_links / best, 1),
        "turns_per_sec": round(n_turns / best, 1),
    }


#: Pair-generating text-dedup queries whose cost could grow
#: superlinearly with corpus size (banded joins are quadratic WITHIN
#: buckets); the sf-scale sweep measures their growth exponent.
SCALE_QUERIES = [
    "minhash_lsh_pairs",
    "lsh_jaccard_verified",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "dedup_clusters",
]


def _scaled_docs_dir(spark, sf_dir: str, k: int) -> str:
    """Materialize a k-times-larger documents table: k replicas with
    shifted doc_ids and per-replica Caesar-rotated text. Rotation makes
    replicas DISJOINT in shingle space while preserving each replica's
    internal duplicate structure — so the k-times corpus behaves like k
    independent corpora of the original's dup rate, and the honest
    expectation for a scale-linear operator is cost ~ k (pairs grow
    exactly k-fold, not k^2-fold as identical replicas would)."""
    from pyspark.sql import functions as F

    # v2: corpus-derived id shift + three-class rotation (the path is
    # versioned so a stale cache from the v1 generator is never reused)
    out = f"/dev/shm/spinelink-sfscale/v2-x{k}-{Path(sf_dir).name}"
    if not Path(f"{out}/documents.parquet/_SUCCESS").exists():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # id shift derived from the corpus (not a fixed 1M, which would
        # collide for >=1M-doc corpora); rotate lower, UPPER and digits
        # as three classes so shingles dominated by any of them still
        # land in a replica-disjoint shingle space.
        shift = docs.agg(F.max("doc_id")).first()[0] + 1
        lower = "abcdefghijklmnopqrstuvwxyz"
        upper = lower.upper()
        digit = "0123456789"
        rep = None
        for i in range(k):
            src = lower + upper + digit
            dst = (
                lower[i % 26:] + lower[: i % 26]
                + upper[i % 26:] + upper[: i % 26]
                + digit[i % 10:] + digit[: i % 10]
            )
            r = docs.select(
                (F.col("doc_id") + i * shift).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            rep = r if rep is None else rep.unionByName(r)
        rep.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(f"{out}/documents.parquet")
    return out


def run_sf_scale_sweep(
    spark, sf_dir: str, k: int, queries: list[str] | None = None, repeats: int = 2
) -> dict:
    """Time each sweep query on the 1x and kx corpora and report the
    growth exponent log_k(t_kx / t_1x): ~1 = scale-linear, ~2 =
    quadratic (a banded join gone hot). Catches nonlinearities the
    single-sf per-query suite cannot see. Best-of-``repeats`` per cell
    so a single GC pause or stage-scheduling hiccup cannot fabricate a
    superlinear exponent (or hide one)."""
    import math

    # Both corpora go through the same materialization (k=1 is an
    # identity rewrite): the raw sf dir is a handful of parquet files,
    # so reading it directly starves the 1x run of input partitions
    # (1-2 tasks vs defaultParallelism on the kx side) and the exponent
    # measures file layout, not operator growth.
    sdir1 = _scaled_docs_dir(spark, sf_dir, 1)
    sdir = _scaled_docs_dir(spark, sf_dir, k)
    out = {}
    for name in queries if queries is not None else SCALE_QUERIES:
        # untimed warmup on the 1x corpus: codegen compilation and the
        # Arrow worker pool otherwise land on the first timed run and
        # skew the exponent negative (the kx run would look cheaper)
        QUERIES[name](spark, sdir1).count()
        t1 = n1 = tk = nk = None
        for _ in range(repeats):
            t0 = time.time()
            n1 = QUERIES[name](spark, sdir1).count()
            dt = time.time() - t0
            t1 = dt if t1 is None else min(dt, t1)
            t0 = time.time()
            nk = QUERIES[name](spark, sdir).count()
            dt = time.time() - t0
            tk = dt if tk is None else min(dt, tk)
        out[name] = {
            "sec_1x": round(t1, 3),
            f"sec_{k}x": round(tk, 3),
            "rows_1x": n1,
            f"rows_{k}x": nk,
            "growth_exponent": round(math.log(max(tk, 1e-3) / max(t1, 1e-3)) / math.log(k), 2),
        }
    return {"factor": k, "queries": out}


def _bench_criteria():
    from spinebasedrecordlinkage_jl_spark.config import ApproxMatch, LinkageCriteria

    return [
        LinkageCriteria(
            id=1,
            tablename="transcripts",
            exactmatch={"firstname": "firstname", "lastname": "lastname", "birthdate": "birthdate"},
        ),
        LinkageCriteria(
            id=2,
            tablename="transcripts",
            exactmatch={"firstname": "firstname", "birthdate": "birthdate"},
            approxmatch=(ApproxMatch("lastname", "lastname", "levenshtein", 0.3),),
        ),
        LinkageCriteria(
            id=3,
            tablename="transcripts",
            exactmatch={"lastname": "lastname", "birthdate": "birthdate"},
            approxmatch=(ApproxMatch("firstname", "firstname", "jarowinkler", 0.35),),
        ),
    ]


def _rdd_cleanup_scope(spark):
    """Snapshot the persistent-RDD set; returns a callable that
    unpersists everything registered since — per-rep localCheckpoints
    must not accumulate storage across benchmark reps."""
    sc = spark.sparkContext
    baseline = set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def cleanup():
        m = sc._jsc.getPersistentRDDs()
        for rid in set(m.keySet().toArray()) - baseline:
            m.get(rid).unpersist(True)

    return cleanup


def run_linkage_throughput(spark, n_entities: int, repeats: int = 1) -> dict:
    """Full pipeline over synthesized transcripts; returns metrics.
    Best-of-``repeats`` (per-rep checkpoint RDDs unpersisted between
    reps so reps are independent)."""
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark.operators.linkage import link_table
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records
    from spinebasedrecordlinkage_jl_spark.operators.spine import form_entities
    from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

    crits = _bench_criteria()
    transcripts, _ = synthesize_transcripts(spark, n_entities=n_entities)
    transcripts = transcripts.localCheckpoint(eager=True)  # materialize input
    n_turns = transcripts.count()
    cleanup = _rdd_cleanup_scope(spark)

    best = None
    for rep in range(max(repeats, 1)):
        t0 = time.time()
        # Materialize each reused intermediate exactly once — records feed
        # the criteria joins, the edge generator, representative selection
        # AND the relink; without the checkpoint Catalyst re-runs the
        # records aggregation for every branch of the DAG.
        rec = (
            linkage_records(transcripts)
            .filter(F.col("birthdate").isNotNull())
            # drop the consumed first_user_text before the checkpoint
            # materializes the row (widest column, dead after extraction)
            .select("EventId", "conv_id", "firstname", "lastname", "birthdate")
            .repartition(2 * spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        spine0 = rec.limit(0).select(
            F.col("EventId").alias("EntityId"),
            F.col("EventId").alias("spine_seq"),
            "firstname", "lastname", "birthdate",
        )
        linked = link_table(rec, spine0, crits, "transcripts")
        unlinked = rec.join(linked.select("EventId"), "EventId", "left_anti").localCheckpoint(
            eager=True
        )
        new_spine, _ = form_entities(
            unlinked, crits,
            construct_entityid_from=["firstname", "lastname", "birthdate"],
            spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
            tablename="transcripts", order_col="conv_id",
        )
        new_spine = new_spine.localCheckpoint(eager=True)
        relink = link_table(unlinked, new_spine, crits, "transcripts", broadcast_spine=None)
        n_links = linked.unionByName(relink).count()
        elapsed = time.time() - t0
        if best is None or elapsed < best:
            best = elapsed
        cleanup()
    return {
        "n_turns": n_turns,
        "n_records_linked": n_links,
        "linkage_sec": round(best, 3),
        "linked_records_per_sec": round(n_links / best, 1),
        "turns_per_sec": round(n_turns / best, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_entities = int(os.environ.get("SPINELINK_BENCH_ENTITIES", "8000"))
    mem = os.environ.get("SPINELINK_DRIVER_MEM", "16g")
    # pre-size + pre-touch the heap so timed queries don't pay first-touch
    # page faults while the heap grows (see bench_scaling.py)
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            # keep -Xmx (spark.driver.memory) in lockstep with -Xms: with
            # the session default of 8g the JVM refuses to start
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Arrow paths once so per-query numbers measure the
    # queries, not first-call initialization (incl. pre-spawning the
    # Python worker pool for the pandas kernels)
    QUERIES["token_counts"](spark, sf_dir).count()
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark.functions.distances import distance_column

    spark.range(100000).select(
        distance_column("jarowinkler", F.lit("warm"), F.lit("worm")).alias("d")
    ).select(F.sum("d")).collect()

    # Best-of-REPEATS per query: the single-rep protocol let one GC
    # pause or stage-scheduling hiccup read as a 60%+ "regression" on
    # untouched code round-over-round; best-of-N measures the query,
    # not the noise floor.
    repeats = int(os.environ.get("SPINELINK_BENCH_REPEATS", "3"))
    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        best = None
        for _ in range(repeats):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        per_query[name] = round(best, 3)
        total += best

    link = run_linkage_throughput(spark, n_entities, repeats=repeats)
    total += link["linkage_sec"]
    per_query["linkage_synthetic"] = link["linkage_sec"]

    # round-4 additions, timed OUTSIDE the headline total so `value`
    # stays comparable across rounds
    extended: dict[str, float] = {}
    for name in EXTENDED:
        best = None
        for _ in range(repeats):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        extended[name] = round(best, 3)

    # sf-scale sweep (separate from the headline total so BENCH_r* stays
    # comparable across rounds); SPINELINK_BENCH_SCALE=1 disables.
    scale_k = int(os.environ.get("SPINELINK_BENCH_SCALE", "4"))
    sf_scale = run_sf_scale_sweep(spark, sf_dir, scale_k) if scale_k > 1 else None
    # second-decade sweep for the operators whose k=4 exponent (~0.8)
    # is within noise of linear-plus-constant: k=8 separates "amortizing
    # fixed cost" from "creeping superlinear".
    scale_k2 = int(os.environ.get("SPINELINK_BENCH_SCALE2", "8"))
    sf_scale2 = (
        run_sf_scale_sweep(
            spark, sf_dir, scale_k2, queries=["ngram_jaccard_pairs", "simhash_pairs"]
        )
        if scale_k2 > 1
        else None
    )

    out = {
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "queries_extended": extended,
        "sf": sf_dir,
        "cpus": int(cpus),
        "repeats": repeats,
        "linkage_throughput": link,
        "sf_scale": sf_scale,
        "sf_scale_k8": sf_scale2,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
