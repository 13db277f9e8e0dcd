"""One-off round-5 campaign driver: re-measure ONLY the full-pipeline
8- and 32-core cells with the fused form_entities (spine.py @ e29343f).

The link job's code path is untouched this round (its cells carry from
the round-4 campaign, recorded in BENCH/BASELINE.md), and VERDICT r04
item 4 explicitly says not to burn hours re-running the 2-core cell
chasing variance — so this driver runs exactly the two cells the code
change invalidates, via the same prepare/_run protocol as the full
campaign (taskset pinning, fixed-64 shuffle partitions, best-of-3).
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench_scaling as bs

base = bs.prepare(12_800_000, 4, need_spine=False)
print("PREP_DONE " + base, flush=True)
for cores in (8, 32):
    r = bs._run(cores, "full", base)
    print(f"CELL {cores} " + json.dumps(r), flush=True)
print("ALL_DONE", flush=True)
