"""Sequential oracle: a faithful single-process Python mimic of the
reference algorithm (/root/reference/src/runlinkage.jl), used to validate
our order-free Spark clustering (pairwise F1 >= 0.99 gate, BASELINE.json).

This is a *behavioral* reimplementation from SURVEY.md's observed
semantics, not a translation of the Julia code:
  - per record, criteria tried in config order, first satisfied wins
    (runlinkage.jl:216,240)
  - exact probe skips a criterion when any key value is missing
    (runlinkage.jl:378-385); skipped criteria counted in n_hasmissing
  - exact-only: link iff exactly 1 candidate (runlinkage.jl:250-252)
  - approx: all thresholds must pass; best = min total distance with
    strict < (ties -> earliest spine row); total must be < 1.0
    (runlinkage.jl:254-275)
  - unlinked + append_to_spine + n_hasmissing < n_criteria: append row to
    spine, then re-probe (runlinkage.jl:168-176)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spinebasedrecordlinkage_jl_spark.config import LinkageCriteria
from spinebasedrecordlinkage_jl_spark.functions.distances import py_distance


@dataclass
class OracleResult:
    spine: list[dict] = field(default_factory=list)  # each has _entity (ordinal)
    links: dict = field(default_factory=dict)  # event_key -> (entity_ordinal, criteria_id)


def _probe(row: dict, spine: list[dict], criteria: list[LinkageCriteria]):
    """Return ((entity_idx, criteria_id) | None, n_hasmissing)."""
    n_hasmissing = 0
    for crit in criteria:
        if any(row.get(dc) is None for dc in crit.exactmatch):
            n_hasmissing += 1
            continue
        candidates = [
            i
            for i, sp in enumerate(spine)
            if all(sp.get(sc) == row[dc] for dc, sc in crit.exactmatch.items())
        ]
        if not crit.approxmatch:
            if len(candidates) == 1:
                return (candidates[0], crit.id), n_hasmissing
            continue
        best, min_dist = None, 1.0  # init 1.0 => total >= 1.0 never links
        for i in candidates:
            total, ok = 0.0, True
            for am in crit.approxmatch:
                d = py_distance(am.distancemetric, row.get(am.datacolumn), spine[i].get(am.spinecolumn))
                if d > am.threshold:
                    ok = False
                    break
                total += d
            if ok and total < min_dist:  # strict: ties keep earliest row
                best, min_dist = i, total
        if best is not None:
            return (best, crit.id), n_hasmissing
    return None, n_hasmissing


def sequential_linkage(
    records: list[dict],
    criteria: list[LinkageCriteria],
    append_to_spine: bool,
    construct_entityid_from: list[str],
    spine_columns: list[str],
    event_key: str = "conv_id",
    spine: list[dict] | None = None,
) -> OracleResult:
    """Run the reference algorithm over records in the given order."""
    res = OracleResult(spine=list(spine or []))
    for row in records:
        if append_to_spine and any(row.get(c) is None for c in construct_entityid_from):
            continue  # O6: dropped entirely (runlinkage.jl:146-154)
        hit, n_missing = _probe(row, res.spine, criteria)
        if hit is None and append_to_spine and n_missing < len(criteria):
            new = {c: row.get(c) for c in spine_columns if c != "EntityId"}
            new["_entity"] = len(res.spine)
            res.spine.append(new)
            hit, _ = _probe(row, res.spine, criteria)  # guaranteed-ish relink
        if hit is not None:
            idx, cid = hit
            res.links[row[event_key]] = (res.spine[idx]["_entity"], cid)
    return res


def pairwise_f1(clusters_a: dict, clusters_b: dict) -> float:
    """Pairwise F1 between two clusterings given as item -> cluster-label
    maps (only items present in BOTH are compared)."""
    from collections import defaultdict
    from itertools import combinations

    common = sorted(set(clusters_a) & set(clusters_b))

    def pair_set(lbl: dict) -> set:
        groups = defaultdict(list)
        for it in common:
            groups[lbl[it]].append(it)
        pairs = set()
        for g in groups.values():
            pairs.update(combinations(sorted(g), 2))
        return pairs

    pa, pb = pair_set(clusters_a), pair_set(clusters_b)
    if not pa and not pb:
        return 1.0
    tp = len(pa & pb)
    prec = tp / len(pb) if pb else 1.0
    rec = tp / len(pa) if pa else 1.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0
