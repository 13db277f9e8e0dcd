"""spinebasedrecordlinkage_jl_spark — a PySpark-native spine-based
record-linkage engine.

A from-scratch re-expression of the *semantics* of
JockLawrie/SpineBasedRecordLinkage.jl (reference: /root/reference, v0.4.2)
on Spark's declarative DataFrame API:

- blocking (exact keys + salted normalized-text hash blocks)
- pairwise scoring (JVM-side Levenshtein; Arrow-batched pandas UDFs for
  Jaro / Jaro-Winkler / Damerau-Levenshtein / Ratcliff-Obershelp)
- first-criteria-wins linkage passes with ambiguity rejection
- entity formation via connected components (large-star/small-star)
- checkpointed, resumable runs with per-pass lineage + match metrics
- reporting (summarise / compare runs)

The reference is a single-threaded row-at-a-time Julia engine
(src/runlinkage.jl); nothing here is a port — every stage is a Spark
logical plan optimized by Catalyst (broadcast joins, AQE skew handling,
predicate pushdown), designed for 100 TB-scale transcript corpora.
"""

from .config import ApproxMatch, LinkageConfig, LinkageCriteria, TableConfig
from .session import get_spark

__all__ = [
    "ApproxMatch",
    "LinkageConfig",
    "LinkageCriteria",
    "TableConfig",
    "get_spark",
]

__version__ = "0.1.0"
