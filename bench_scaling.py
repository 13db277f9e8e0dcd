#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

A real multi-executor cluster is unavailable in the sandbox, so per the
driver instruction the same jobs run at two parallelism levels — 8 and
32 cores — on the same deterministic synthesized input, in separate JVMs
(fresh SparkSession per level; JVM startup, input synthesis and the
one-time spine bootstrap excluded from timing). Two jobs:

1. link_to_spine (HEADLINE, the north star's linked-records/sec):
   records aggregation -> three criteria passes as broadcast-hash joins
   -> first-criteria-wins window. The steady-state production workload:
   the spine exists and is small relative to events (the reference's own
   contract, /root/reference/README.md:289), new transcripts get linked.
2. full_pipeline: entity formation included (match-pair graph, connected
   components, relink) — the one-time corpus bootstrap / consolidation.

Results land in BENCH/BASELINE.md.

Usage:  python bench_scaling.py [n_entities] [max_convs_per_entity]
Worker: python bench_scaling.py --worker <cores> <n> <maxconvs> <job>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPEATS = 2


def worker(cores: int, n: int, maxconvs: int, job: str) -> None:
    from spinebasedrecordlinkage_jl_spark import get_spark

    from bench import run_link_to_spine_throughput, run_linkage_throughput

    spark = get_spark(f"scale{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    if job == "link":
        best = run_link_to_spine_throughput(
            spark, n, max_convs_per_entity=maxconvs, repeats=REPEATS
        )
    else:
        best = None
        for _ in range(REPEATS):
            m = run_linkage_throughput(spark, n)
            if best is None or m["linkage_sec"] < best["linkage_sec"]:
                best = m
    best["cores"] = cores
    print("SCALEJSON " + json.dumps(best))
    spark.stop()


def _run(cores: int, n: int, maxconvs: int, job: str) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, "--worker", str(cores), str(n), str(maxconvs), job],
        capture_output=True,
        text=True,
        env={**os.environ, "SPINELINK_DRIVER_MEM": os.environ.get("SPINELINK_DRIVER_MEM", "60g")},
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SCALEJSON ")]
    if not lines:
        sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
        raise RuntimeError(f"worker {cores}/{job} produced no result")
    return json.loads(lines[-1][len("SCALEJSON ") :])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    maxconvs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    res = {}
    for job in ("link", "full"):
        nn = n if job == "link" else max(n // 4, 10_000)
        mc = maxconvs if job == "link" else 4
        for cores in (8, 32):
            res[(job, cores)] = _run(cores, nn, mc, job)

    def eff(job):
        t8 = res[(job, 8)]["linked_records_per_sec"]
        t32 = res[(job, 32)]["linked_records_per_sec"]
        return t8, t32, t32 / t8, t32 / t8 / 4

    l8, l32, lsp, leff = eff("link")
    f8, f32, fsp, feff = eff("full")

    md = f"""# BENCH/BASELINE.md — measured numbers

## Headline: steady-state linkage throughput (linked records/sec)

Job: records aggregation -> 3 criteria passes (broadcast spine, JVM
Levenshtein + Arrow Jaro-Winkler) -> first-criteria-wins window, over a
synthesized {n}-entity / <= {maxconvs}-convs-per-entity transcript corpus.
Input synthesis and one-time spine bootstrap excluded; best of {REPEATS}
timed reps per level, separate JVMs.

| cores | turns | spine | records linked | wall sec | linked rec/s | turns/s |
|---|---|---|---|---|---|---|
| 8 (N) | {res[('link',8)]['n_turns']} | {res[('link',8)]['n_spine']} | {res[('link',8)]['n_records_linked']} | {res[('link',8)]['linkage_sec']} | {l8} | {res[('link',8)]['turns_per_sec']} |
| 32 (4N) | {res[('link',32)]['n_turns']} | {res[('link',32)]['n_spine']} | {res[('link',32)]['n_records_linked']} | {res[('link',32)]['linkage_sec']} | {l32} | {res[('link',32)]['turns_per_sec']} |

- speedup 8->32: **{lsp:.2f}x** — scaling efficiency **{leff:.3f}**

## Full pipeline (entity formation + connected components + relink)

| cores | turns | records linked | wall sec | linked rec/s |
|---|---|---|---|---|
| 8 (N) | {res[('full',8)]['n_turns']} | {res[('full',8)]['n_records_linked']} | {res[('full',8)]['linkage_sec']} | {f8} |
| 32 (4N) | {res[('full',32)]['n_turns']} | {res[('full',32)]['n_records_linked']} | {res[('full',32)]['linkage_sec']} | {f32} |

- speedup 8->32: **{fsp:.2f}x** — scaling efficiency **{feff:.3f}**

Reproduce: `python bench_scaling.py {n} {maxconvs}`.
Per-query numbers: `python bench.py` (BENCH_r*.json).
"""
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/BASELINE.md").write_text(md)
    print(md)
    print(json.dumps({"link_eff": round(leff, 3), "full_eff": round(feff, 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        main()
