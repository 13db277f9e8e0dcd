#!/bin/bash
cd /root/repo
export SPINELINK_DRIVER_MEM=48g
export SPINELINK_SHUFFLE_MULT=4
python - <<'PYEOF' 2>/dev/null >> /tmp/big2.log
import sys, json
sys.path.insert(0, "/root/repo")
from spinebasedrecordlinkage_jl_spark import get_spark
from bench import run_linkage_throughput
for cores in (32, 8):
    spark = get_spark(f"b{cores}", master=f"local[{cores}]", shuffle_partitions=cores*4)
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for _ in range(2):
        m = run_linkage_throughput(spark, 2500000)
        if best is None or m["linkage_sec"] < best["linkage_sec"]:
            best = m
    print("CURVE " + json.dumps({"cores": cores, "shufp": cores*4, **best}), flush=True)
    spark.stop()
PYEOF
echo DONE >> /tmp/big2.log
