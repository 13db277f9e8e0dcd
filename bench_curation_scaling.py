"""Scaling evidence for the CURATION operator family (secondary to the
north-rule linkage campaign in bench_scaling.py): the same composite
curation job at two pinned parallelism levels on the same parquet input.

Protocol mirrors bench_scaling.py: separate JVMs per level, each pinned
to exactly its core count with `taskset -c`; shuffle partitions FIXED at
64 at every level; corpus synthesis and JVM/Arrow warm-up untimed;
best-of-REPEATS per level; heap pre-sized + pre-touched.

Job under test (phases timed separately, one composite wall-clock):
  corpus_report   — per-source datasheet (one groupBy + two-level distinct)
  quality_filter  — codegen gate, map-side
  minhash_lsh     — signatures + banded candidate pairs (the dedup shuffle)
  pack_sequences  — two-level distributed prefix sum
  corpus_mix      — in-plan rates + md5-uniform filter

Corpus: deterministic doc families — every 8 consecutive ids share a
base word set plus per-doc suffix words, so the LSH stage sees a real
near-dup structure (~12.5% canonical mass), not random noise.

Usage: python bench_curation_scaling.py [--probe]
Prints one JSON line per level and a summary row; append the summary to
BENCH/BASELINE.md (this script does not rewrite that file).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

DATA_BASE = "/dev/shm/spinelink-curation"
N_DOCS = int(os.environ.get("SPINELINK_CURATION_DOCS", "2000000"))
REPEATS = int(os.environ.get("SPINELINK_CURATION_REPEATS", "2"))
LEVELS = (2, 8, 32)


def prepare() -> str:
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark import get_spark

    base = f"{DATA_BASE}/d{N_DOCS}"
    if Path(f"{base}/docs/_SUCCESS").exists():
        return base
    spark = get_spark(
        "curprep", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    fam = (F.col("doc_id") - F.col("doc_id") % 8).cast("string")
    # ~40 shared family words + 0-7 per-doc suffix words, 6 chars each
    base_words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.substring(F.md5(F.concat(fam, F.lit("w"), i.cast("string"))), 1, 6),
    )
    extra_words = F.transform(
        F.sequence(F.lit(1), (F.col("doc_id") % 8 + 1).cast("int")),
        lambda i: F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("x"), i.cast("string"))), 1, 6
        ),
    )
    docs = ids.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 16).cast("string")).alias("source"),
        F.array_join(F.concat(base_words, extra_words), " ").alias("text"),
    )
    docs.repartition(128).write.mode("overwrite").parquet(f"{base}/docs")
    spark.stop()
    return base


def worker(cores: int, base: str) -> None:
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark import get_spark
    from spinebasedrecordlinkage_jl_spark.operators import curation as C
    from spinebasedrecordlinkage_jl_spark.operators import dedup as D
    from spinebasedrecordlinkage_jl_spark.functions.text import ws_token_count

    mem = os.environ.get("SPINELINK_DRIVER_MEM", "32g" if cores >= 32 else "24g")
    spark = get_spark(
        f"cur{cores}", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch",
        },
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{base}/docs")
    n_docs = docs.count()  # warm scan, untimed

    best, best_phases = None, {}
    counts = {}
    for _ in range(REPEATS):
        phases = {}
        t0 = time.time()
        counts["report"] = C.corpus_report(docs).count()
        phases["corpus_report"] = time.time() - t0
        counts["kept"] = C.quality_filter(docs, min_tokens=20).filter("keep").count()
        phases["quality_filter"] = time.time() - t0 - sum(phases.values())
        counts["lsh_pairs"] = D.minhash_lsh_pairs(
            docs, max_chars=200, max_band_population=10_000
        ).count()
        phases["minhash_lsh"] = time.time() - t0 - sum(phases.values())
        toks = docs.select("doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens"))
        counts["packed"] = C.pack_sequences(toks, context_len=2048, n_buckets=256).count()
        phases["pack_sequences"] = time.time() - t0 - sum(phases.values())
        counts["mixed"] = C.corpus_mix(
            toks, {f"src{i}": 1.0 for i in range(8)}, token_budget=N_DOCS * 10
        ).count()
        phases["corpus_mix"] = time.time() - t0 - sum(phases.values())
        dt = time.time() - t0
        if best is None or dt < best:
            best, best_phases = dt, {k: round(v, 3) for k, v in phases.items()}

    print("SCALEJSON " + json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "phases": best_phases,
        "counts": counts,
    }))
    spark.stop()


def run_level(cores: int, base: str) -> dict:
    mem = "32g" if cores >= 32 else "24g"
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
         "--worker", str(cores), base],
        capture_output=True, text=True,
        env={**os.environ, "SPINELINK_DRIVER_MEM": mem},
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SCALEJSON ")]
    if not lines:
        sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
        raise RuntimeError(f"worker {cores} produced no result")
    return json.loads(lines[-1][len("SCALEJSON "):])


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    base = prepare()
    levels = LEVELS if "--probe" not in sys.argv else (32,)
    cells = {c: run_level(c, base) for c in levels}
    for c in levels:
        print(json.dumps(cells[c]))
    for lo, hi in ((2, 8), (8, 32)):
        if lo in cells and hi in cells:
            sp = cells[lo]["sec"] / cells[hi]["sec"]
            eff = sp / (hi / lo)
            print(json.dumps({
                "pair": f"{lo}->{hi}", "speedup": round(sp, 2),
                "efficiency": round(eff, 3),
            }))


if __name__ == "__main__":
    main()
