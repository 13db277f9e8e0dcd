#!/bin/bash
cd /root/repo
export SPINELINK_DRIVER_MEM=48g
python - <<'PYEOF' 2>/dev/null >> /tmp/big3.log
import sys, json
sys.path.insert(0, "/root/repo")
from spinebasedrecordlinkage_jl_spark import get_spark
from bench import run_link_to_spine_throughput
for cores in (32, 8):
    spark = get_spark(f"l{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for _ in range(2):
        m = run_link_to_spine_throughput(spark, 2500000)
        if best is None or m["linkage_sec"] < best["linkage_sec"]:
            best = m
    print("LINK " + json.dumps({"cores": cores, **best}), flush=True)
    spark.stop()
PYEOF
echo DONE >> /tmp/big3.log
