#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

A real multi-executor cluster is unavailable in the sandbox, so per the
driver instruction the same job runs at two parallelism levels — 8 and 32
cores — on the SAME materialized input (synthesized once, written to
parquet, read identically by both levels), in separate JVMs. Two jobs:

1. link_to_spine (HEADLINE, the north star's linked-records/sec):
   parquet scan -> records aggregation (one shuffle) -> three criteria
   passes as broadcast-hash joins (JVM Levenshtein + Arrow Jaro-Winkler
   scoring; the event side is never shuffled) -> first-criteria-wins
   window -> count. The steady-state production workload: the spine
   exists and is small relative to events (the reference's own contract,
   /root/reference/README.md:289), new transcripts get linked.
2. full_pipeline: entity formation included (match-pair graph, connected
   components, relink) — the one-time corpus bootstrap / consolidation.

Untimed at every level: JVM startup, parquet synthesis (parent, once),
the one-time spine bootstrap (parent, once, written to parquet), and a
warm-up rep that pre-spawns the Python worker pool (best-of-REPEATS
timing keeps only warm runs).

Results land in BENCH/BASELINE.md.

Usage:  python bench_scaling.py [link_entities] [link_maxconvs] [full_entities]
Worker: python bench_scaling.py --worker <cores> <job> <data_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPEATS = 3
DATA_BASE = os.environ.get("SPINELINK_BENCH_DATA", "/dev/shm/spinelink-bench")


def _criteria():
    from bench import _bench_criteria

    return _bench_criteria()


def prepare(link_n: int, link_mc: int, full_n: int, full_mc: int) -> str:
    """Synthesize both corpora ONCE and write them to parquet, plus the
    one-time spine bootstrap for the link job. Everything here is
    excluded from timing at both parallelism levels — it is input, not
    the job under test."""
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark import get_spark
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records
    from spinebasedrecordlinkage_jl_spark.operators.spine import form_entities
    from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

    base = f"{DATA_BASE}/n{link_n}x{link_mc}-f{full_n}x{full_mc}"
    if Path(f"{base}/_READY").exists():
        return base

    # the spine bootstrap runs entity formation over every link record —
    # give the prepare JVM a real heap (the workers size their own)
    spark = get_spark(
        "scaleprep",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": os.environ.get("SPINELINK_PREP_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not Path(f"{base}/link_transcripts/_SUCCESS").exists():
        link_t, _ = synthesize_transcripts(
            spark, n_entities=link_n, max_convs_per_entity=link_mc, partitions=256
        )
        link_t.repartition(256).write.mode("overwrite").parquet(f"{base}/link_transcripts")

    if not Path(f"{base}/full_transcripts/_SUCCESS").exists():
        full_t, _ = synthesize_transcripts(
            spark, n_entities=full_n, max_convs_per_entity=full_mc, partitions=64
        )
        full_t.repartition(64).write.mode("overwrite").parquet(f"{base}/full_transcripts")

    # one-time spine bootstrap (corpus entity formation) for the link job
    if not Path(f"{base}/spine/_SUCCESS").exists():
        rec0 = (
            linkage_records(spark.read.parquet(f"{base}/link_transcripts"))
            .filter(F.col("birthdate").isNotNull())
            .repartition(64)
            .localCheckpoint(eager=True)
        )
        spine, _ = form_entities(
            rec0,
            _criteria(),
            construct_entityid_from=["firstname", "lastname", "birthdate"],
            spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
            tablename="transcripts",
            order_col="conv_id",
        )
        spine.repartition(8).write.mode("overwrite").parquet(f"{base}/spine")
    spark.stop()
    Path(f"{base}/_READY").write_text("ok")
    return base


def worker(cores: int, job: str, base: str) -> None:
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark import get_spark
    from spinebasedrecordlinkage_jl_spark.functions.distances import distance_column
    from spinebasedrecordlinkage_jl_spark.operators.linkage import link_table
    from spinebasedrecordlinkage_jl_spark.operators.records import linkage_records
    from spinebasedrecordlinkage_jl_spark.operators.spine import form_entities

    # Pre-size + pre-touch the heap at JVM start (untimed): without it
    # the first timed reps pay tens of seconds of first-touch page faults
    # while the heap grows, producing 10x run-to-run variance.
    mem = os.environ.get("SPINELINK_DRIVER_MEM", "24g")
    spark = get_spark(
        f"scale{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Arrow/pandas worker pool (untimed; sized to the core count)
    spark.range(500_000).select(
        distance_column("jarowinkler", F.lit("warm"), F.lit("worm")).alias("d")
    ).select(F.sum("d")).collect()

    crits = _criteria()
    if job == "link":
        transcripts = spark.read.parquet(f"{base}/link_transcripts")
        n_turns = transcripts.count()
        spine = spark.read.parquet(f"{base}/spine").localCheckpoint(eager=True)
        n_spine = spine.count()
        best = None
        for _ in range(REPEATS):
            t0 = time.time()
            # Materialize the records aggregation once (timed) — all three
            # criteria passes consume it; without the checkpoint Catalyst
            # re-runs the collect_list shuffle per union branch.
            # Explicit repartition before the checkpoint: the pruned
            # aggregation output is small enough that AQE coalesces it to
            # a handful of partitions, which would starve every downstream
            # pass of parallelism (north rule: explicit repartitioning).
            rec = (
                linkage_records(transcripts)
                .filter(F.col("birthdate").isNotNull())
                .repartition(2 * spark.sparkContext.defaultParallelism)
                .localCheckpoint(eager=True)
            )
            n_links = link_table(rec, spine, crits, "transcripts").count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out = {
            "n_turns": n_turns,
            "n_spine": n_spine,
            "n_records_linked": n_links,
            "linkage_sec": round(best, 3),
            "linked_records_per_sec": round(n_links / best, 1),
            "turns_per_sec": round(n_turns / best, 1),
        }
    else:
        transcripts = spark.read.parquet(f"{base}/full_transcripts")
        n_turns = transcripts.count()
        best = None
        for _ in range(REPEATS):
            t0 = time.time()
            # Explicit repartition before the checkpoint: the pruned
            # aggregation output is small enough that AQE coalesces it to
            # a handful of partitions, which would starve every downstream
            # pass of parallelism (north rule: explicit repartitioning).
            rec = (
                linkage_records(transcripts)
                .filter(F.col("birthdate").isNotNull())
                .repartition(2 * spark.sparkContext.defaultParallelism)
                .localCheckpoint(eager=True)
            )
            spine0 = rec.limit(0).select(
                F.col("EventId").alias("EntityId"),
                F.col("EventId").alias("spine_seq"),
                "firstname",
                "lastname",
                "birthdate",
            )
            linked = link_table(rec, spine0, crits, "transcripts")
            unlinked = rec.join(
                linked.select("EventId"), "EventId", "left_anti"
            ).localCheckpoint(eager=True)
            new_spine, _ = form_entities(
                unlinked,
                crits,
                construct_entityid_from=["firstname", "lastname", "birthdate"],
                spine_columns=["EntityId", "firstname", "lastname", "birthdate"],
                tablename="transcripts",
                order_col="conv_id",
            )
            new_spine = new_spine.localCheckpoint(eager=True)
            # the fresh spine is the same order of magnitude as the
            # unlinked records — let AQE pick the join strategy instead
            # of forcing 3 serial driver-side broadcast builds
            relink = link_table(
                unlinked, new_spine, crits, "transcripts", broadcast_spine=None
            )
            n_links = linked.unionByName(relink).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out = {
            "n_turns": n_turns,
            "n_records_linked": n_links,
            "linkage_sec": round(best, 3),
            "linked_records_per_sec": round(n_links / best, 1),
            "turns_per_sec": round(n_turns / best, 1),
        }
    out["cores"] = cores
    print("SCALEJSON " + json.dumps(out))
    spark.stop()


def _run(cores: int, job: str, base: str) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--worker", str(cores), job, base],
        capture_output=True,
        text=True,
        env={**os.environ, "SPINELINK_DRIVER_MEM": os.environ.get("SPINELINK_DRIVER_MEM", "24g")},
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SCALEJSON ")]
    if not lines:
        sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
        raise RuntimeError(f"worker {cores}/{job} produced no result")
    return json.loads(lines[-1][len("SCALEJSON ") :])


def main() -> None:
    link_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    link_mc = int(sys.argv[2]) if len(sys.argv) > 2 else 144
    full_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_600_000
    full_mc = 4
    base = prepare(link_n, link_mc, full_n, full_mc)

    res = {}
    for job in ("link", "full"):
        for cores in (8, 32):
            res[(job, cores)] = _run(cores, job, base)

    def eff(job):
        t8 = res[(job, 8)]["linked_records_per_sec"]
        t32 = res[(job, 32)]["linked_records_per_sec"]
        return t8, t32, t32 / t8, t32 / t8 / 4

    l8, l32, lsp, leff = eff("link")
    f8, f32, fsp, feff = eff("full")

    md = f"""# BENCH/BASELINE.md — measured numbers

## Headline: steady-state linkage throughput (linked records/sec)

Job: parquet scan -> records aggregation -> 3 criteria passes (broadcast
spine, JVM Levenshtein + Arrow Jaro-Winkler) -> first-criteria-wins
window -> count, over a {link_n}-entity / <= {link_mc}-convs-per-entity
transcript corpus synthesized ONCE to parquet and read identically at
both parallelism levels (separate JVMs; input synthesis, one-time spine
bootstrap and a Python-worker warm-up excluded; best of {REPEATS} timed
reps per level).

| cores | turns | spine | records linked | wall sec | linked rec/s | turns/s |
|---|---|---|---|---|---|---|
| 8 (N) | {res[('link',8)]['n_turns']} | {res[('link',8)]['n_spine']} | {res[('link',8)]['n_records_linked']} | {res[('link',8)]['linkage_sec']} | {l8} | {res[('link',8)]['turns_per_sec']} |
| 32 (4N) | {res[('link',32)]['n_turns']} | {res[('link',32)]['n_spine']} | {res[('link',32)]['n_records_linked']} | {res[('link',32)]['linkage_sec']} | {l32} | {res[('link',32)]['turns_per_sec']} |

- speedup 8->32: **{lsp:.2f}x** — scaling efficiency **{leff:.3f}** (target >= 0.8)

## Full pipeline (entity formation + connected components + relink)

Same protocol over a {full_n}-entity / <= {full_mc}-convs corpus.

| cores | turns | records linked | wall sec | linked rec/s |
|---|---|---|---|---|
| 8 (N) | {res[('full',8)]['n_turns']} | {res[('full',8)]['n_records_linked']} | {res[('full',8)]['linkage_sec']} | {f8} |
| 32 (4N) | {res[('full',32)]['n_turns']} | {res[('full',32)]['n_records_linked']} | {res[('full',32)]['linkage_sec']} | {f32} |

- speedup 8->32: **{fsp:.2f}x** — scaling efficiency **{feff:.3f}**

Reproduce: `python bench_scaling.py {link_n} {link_mc} {full_n}`.
Per-query numbers: `python bench.py` (BENCH_r*.json).
"""
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/BASELINE.md").write_text(md)
    print(md)
    print(json.dumps({"link_eff": round(leff, 3), "full_eff": round(feff, 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
