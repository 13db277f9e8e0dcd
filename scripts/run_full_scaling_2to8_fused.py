"""Round-5 campaign driver: measure the full-pipeline 2- and 8-core
cells with the fused form_entities engine (spine.py @ e29343f+).

The round-5 fusion campaign (`run_full_scaling_835.py`) re-ran only the
8/32 pair the code change invalidated; the 2->8 full-pipeline row in
BENCH/BASELINE.md therefore still quotes the round-4 pre-fusion engine
and explicitly notes "no cross-version efficiency is quoted for 2->8".
This driver fills that missing cell: the SAME prepare/_run protocol
(taskset pinning, fixed-64 shuffle partitions, best-of-3, 24g heap at
both levels) over the same 208M-turn corpus shape, at 2 and 8 cores,
current engine.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench_scaling as bs

base = bs.prepare(12_800_000, 4, need_spine=False)
print("PREP_DONE " + base, flush=True)
for cores in (8, 2):
    r = bs._run(cores, "full", base)
    print(f"CELL {cores} " + json.dumps(r), flush=True)
print("ALL_DONE", flush=True)
