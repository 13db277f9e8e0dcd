#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

A real multi-executor cluster is unavailable in the sandbox, so per the
driver instruction the same linkage job runs at two parallelism levels —
local[8] and local[32] — on the same synthesized input, in separate JVMs
(fresh SparkSession each; JVM startup excluded from the timing). Results
land in BENCH/BASELINE.md.

Usage: python bench_scaling.py [n_entities]
Worker: python bench_scaling.py --worker <cores> <n_entities>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPEATS = 2  # take the best of N runs per level (steady-state)


def worker(cores: int, n_entities: int) -> None:
    from spinebasedrecordlinkage_jl_spark import get_spark

    from bench import run_linkage_throughput

    spark = get_spark(
        f"scale{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for _ in range(REPEATS):
        m = run_linkage_throughput(spark, n_entities)
        if best is None or m["linkage_sec"] < best["linkage_sec"]:
            best = m
    best["cores"] = cores
    print("SCALEJSON " + json.dumps(best))
    spark.stop()


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    results = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores), str(n_entities)],
            capture_output=True,
            text=True,
            # plenty of heap: the input corpus is localCheckpointed into
            # the block manager so both levels measure pure compute
            env={**os.environ, "SPINELINK_DRIVER_MEM": "48g"},
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("SCALEJSON ")]
        if not line:
            sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
            raise RuntimeError(f"worker {cores} produced no result")
        results[cores] = json.loads(line[-1][len("SCALEJSON ") :])

    thr8 = results[8]["linked_records_per_sec"]
    thr32 = results[32]["linked_records_per_sec"]
    speedup = thr32 / thr8
    efficiency = speedup / 4.0

    md = f"""# BENCH/BASELINE.md — measured numbers

## Linkage throughput & scaling efficiency (north-rule evidence)

Same job (full pipeline: synthesize {n_entities} entities ->
records aggregation -> 3 criteria passes -> connected components ->
relink), same deterministic input, two parallelism levels, separate
JVMs, best of {REPEATS} runs per level (JVM startup excluded):

| cores | turns | linked records | wall sec | linked rec/s | turns/s |
|---|---|---|---|---|---|
| 8 (N) | {results[8]['n_turns']} | {results[8]['n_records_linked']} | {results[8]['linkage_sec']} | {thr8} | {results[8]['turns_per_sec']} |
| 32 (4N) | {results[32]['n_turns']} | {results[32]['n_records_linked']} | {results[32]['linkage_sec']} | {thr32} | {results[32]['turns_per_sec']} |

- speedup 8->32 cores: **{speedup:.2f}x** (ideal 4.0x)
- **scaling efficiency: {efficiency:.3f}** (target >= 0.8)

Reproduce: `python bench_scaling.py {n_entities}`
Headline per-query numbers: `python bench.py` (BENCH_r*.json).
"""
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/BASELINE.md").write_text(md)
    print(md)
    print(
        json.dumps(
            {
                "throughput_8": thr8,
                "throughput_32": thr32,
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(efficiency, 3),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
