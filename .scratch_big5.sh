#!/bin/bash
cd /root/repo
export SPINELINK_DRIVER_MEM=70g
export SPINELINK_LOCAL_DIR=/tmp/spinelink-spark
python - <<'PYEOF' 2>/dev/null >> /tmp/big5.log
import sys, json
sys.path.insert(0, "/root/repo")
from spinebasedrecordlinkage_jl_spark import get_spark
from bench import run_link_to_spine_throughput
for cores in (8, 32):
    spark = get_spark(f"l{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    m = run_link_to_spine_throughput(spark, 2400000, max_convs_per_entity=24, repeats=2)
    print("LINK " + json.dumps({"cores": cores, **m}), flush=True)
    spark.stop()
PYEOF
echo DONE >> /tmp/big5.log
