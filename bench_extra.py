#!/usr/bin/env python
"""Per-query optimization harness (guide §1.4/§1.5) — NOT the driver
contract. ``bench.py`` stays the frozen measurement; this file exists to

- time individual registry queries in isolation (best-of-N), with either
  the bench's ``count()`` methodology (default — comparable to
  BENCH_r*.json numbers) or a ``noop`` sink (``SPINELINK_SINK=noop``,
  guide §1.4: computes every column, no count-pruning),
- label each query's jobs (`setJobDescription`, guide §1.5), and
- dump ``explain("formatted")`` for every timed query into
  ``$SPINELINK_PLAN_DIR/<query>_$SPINELINK_PLAN_SUFFIX.txt`` (the
  plans/r06/ evidence files).

Usage:
    SPINELINK_PLAN_DIR=plans/r06 SPINELINK_PLAN_SUFFIX=before \
        python bench_extra.py linkage_full semantic_dedup ...
    python bench_extra.py --all        # every HEADLINE+EXTENDED query
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spinebasedrecordlinkage_jl_spark import get_spark  # noqa: E402


def _explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    from bench import EXTENDED, HEADLINE

    from spinebasedrecordlinkage_jl_spark.entry_queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPINELINK_DRIVER_MEM", "16g")
    repeats = int(os.environ.get("SPINELINK_BENCH_REPEATS", "3"))
    sink = os.environ.get("SPINELINK_SINK", "count")
    plan_dir = os.environ.get("SPINELINK_PLAN_DIR")
    suffix = os.environ.get("SPINELINK_PLAN_SUFFIX", "before")

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = (HEADLINE + EXTENDED) if ("--all" in sys.argv or not args) else args

    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: JVM codegen + the Arrow worker pool
    QUERIES["token_counts"](spark, sf_dir).count()
    from pyspark.sql import functions as F

    from spinebasedrecordlinkage_jl_spark.functions.distances import distance_column

    spark.range(100000).select(
        distance_column("jarowinkler", F.lit("warm"), F.lit("worm")).alias("d")
    ).select(F.sum("d")).collect()

    out: dict[str, float] = {}
    for name in names:
        if plan_dir:
            Path(plan_dir).mkdir(parents=True, exist_ok=True)
            df = QUERIES[name](spark, sf_dir)
            Path(plan_dir, f"{name}_{suffix}.txt").write_text(_explain_formatted(df))
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"[bench_extra] {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(json.dumps({"sink": sink, "repeats": repeats, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
