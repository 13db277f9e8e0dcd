"""Normalized string-distance kernels (operator O24).

Reference semantics (/root/reference/src/unexported/distances.jl:14-18):
``distance(metric, v1, v2) = 1 - compare(v1, v2, metric())`` scaled to
[0, 1] where 0 = equal and 1 = totally different, and **missing on either
side => 1.0** (distances.jl:15-16, README.md:174-175). Metric set:
jaro, levenshtein, dameraulevenshtein, ratcliffobershelp
(config.jl:62-66) plus jarowinkler (north-star addition).

Golden values pinned from /root/reference/README.md:160-166:
lev("robert","rob") = 0.5, lev("robert","bob") = 2/3, lev("rob","bob") = 1/3.

Execution strategy — two tiers:
- ``levenshtein``: pure Catalyst expression (``F.levenshtein`` is a JVM
  builtin inside whole-stage codegen) — this is the hot path and never
  leaves the JVM.
- the other metrics: Arrow-batched ``pandas_udf`` (no per-row Python UDF;
  batches of 10k pairs cross the JVM<->Python boundary once, per the
  input_hint's "vectorized pandas/Arrow UDFs" requirement). The inner
  kernels are pure Python over short linkage strings.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------------------
# Pure-Python kernels (similarity in [0,1]); used inside pandas UDFs and by
# the sequential oracle in tests.
# ---------------------------------------------------------------------------


def _levenshtein(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def _damerau_levenshtein(s1: str, s2: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment), the
    variant StringDistances.jl implements (adjacent-transposition DP)."""
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if not l1:
        return l2
    if not l2:
        return l1
    d = [[0] * (l2 + 1) for _ in range(l1 + 1)]
    for i in range(l1 + 1):
        d[i][0] = i
    for j in range(l2 + 1):
        d[0][j] = j
    for i in range(1, l1 + 1):
        for j in range(1, l2 + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and s1[i - 1] == s2[j - 2] and s1[i - 2] == s2[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[l1][l2]


def _jaro(s1: str, s2: str) -> float:
    """Jaro similarity in [0,1]."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * l2
    matches1 = []
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                matches1.append(c)
                break
    m = len(matches1)
    if m == 0:
        return 0.0
    matches2 = [s2[j] for j in range(l2) if flags2[j]]
    t = sum(a != b for a, b in zip(matches1, matches2)) / 2.0
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def _jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (prefix scale 0.1, max prefix 4, Winkler's
    0.7 boost threshold — matches DuckDB's jaro_winkler_similarity, which
    tests use as an independent cross-check)."""
    jaro = _jaro(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def _ratcliff_obershelp(s1: str, s2: str) -> float:
    """Gestalt pattern-matching similarity (difflib ratio, autojunk off)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return SequenceMatcher(None, s1, s2, autojunk=False).ratio()


def py_distance(metric: str, v1: str | None, v2: str | None) -> float:
    """Normalized distance in [0,1]; missing on either side => 1.0.

    Exact analogue of distances.jl:14-18 — used by the sequential oracle
    in tests and by the pandas-UDF kernels below.
    """
    if v1 is None or v2 is None:
        return 1.0
    if metric == "levenshtein":
        m = max(len(v1), len(v2))
        return _levenshtein(v1, v2) / m if m else 0.0
    if metric == "dameraulevenshtein":
        m = max(len(v1), len(v2))
        return _damerau_levenshtein(v1, v2) / m if m else 0.0
    if metric == "jaro":
        return 1.0 - _jaro(v1, v2)
    if metric == "jarowinkler":
        return 1.0 - _jaro_winkler(v1, v2)
    if metric == "ratcliffobershelp":
        return 1.0 - _ratcliff_obershelp(v1, v2)
    raise ValueError(f"unknown metric {metric!r}")


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------


def jaro_winkler_column(a: Column, b: Column, winkler: bool = True) -> Column:
    """Jaro(-Winkler) distance as a pure Catalyst expression.

    CORRECT but NOT the production path: Spark's higher-order functions
    (aggregate/transform/filter) are interpreted, and lambda bodies
    re-evaluate referenced expression TREES (not DAGs), so the char
    arrays get recomputed per fold step — measured >3ms/row, ~1000x the
    memoized pandas kernel. Kept for cross-validation of the kernel in
    tests; ``distance_column`` routes jaro/jarowinkler to the Arrow
    pandas kernel instead.

    null on either side => 1.0 (distances.jl:15-16 semantics).
    """
    l1, l2 = F.length(a), F.length(b)
    c1 = F.transform(F.sequence(F.lit(1), F.greatest(l1, F.lit(1))), lambda i: a.substr(i, F.lit(1)))
    c2 = F.transform(F.sequence(F.lit(1), F.greatest(l2, F.lit(1))), lambda i: b.substr(i, F.lit(1)))
    window = F.greatest(
        (F.greatest(l1, l2) / 2).cast("int") - 1, F.lit(0)
    )

    # fold over s1 positions: acc = (used s2 idx, matched-from-s1, matched s2 idx)
    init = F.struct(
        F.array().cast("array<int>").alias("used"),
        F.array().cast("array<string>").alias("m1"),
        F.array().cast("array<int>").alias("j1"),
    )

    def step(acc, i):
        lo = F.greatest(i - window, F.lit(0))
        hi = F.least(l2 - 1, i + window)
        cand = F.filter(
            F.sequence(lo, F.greatest(hi, lo)),
            lambda j: (j <= hi)
            & (F.element_at(c2, (j + 1).cast("int")) == F.element_at(c1, (i + 1).cast("int")))
            & ~F.array_contains(acc["used"], j.cast("int")),
        )
        j = F.array_min(cand)
        return F.when(
            j.isNotNull(),
            F.struct(
                F.concat(acc["used"], F.array(j.cast("int"))).alias("used"),
                F.concat(acc["m1"], F.array(F.element_at(c1, (i + 1).cast("int")))).alias("m1"),
                F.concat(acc["j1"], F.array(j.cast("int"))).alias("j1"),
            ),
        ).otherwise(acc)

    folded = F.aggregate(F.sequence(F.lit(0), F.greatest(l1 - 1, F.lit(0))), init, step)
    m = F.size(folded["m1"]).cast("double")
    m2 = F.transform(F.array_sort(folded["j1"]), lambda j: F.element_at(c2, j + 1))
    half_transpositions = F.size(
        F.filter(F.zip_with(folded["m1"], m2, lambda x, y: x != y), lambda v: v)
    ).cast("double")
    jaro = (m / l1 + m / l2 + (m - half_transpositions / 2.0) / m) / 3.0

    if winkler:
        # common prefix length (<= 4): first position where chars differ
        eqs = F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: (i <= F.least(l1, l2)) & (a.substr(i.cast("int"), F.lit(1)) == b.substr(i.cast("int"), F.lit(1))),
        )
        first_false = F.array_position(eqs, F.lit(False))
        prefix = F.when(first_false > 0, first_false - 1).otherwise(F.lit(4)).cast("double")
        sim = F.when(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro)).otherwise(jaro)
    else:
        sim = jaro

    return (
        F.when(a.isNull() | b.isNull(), F.lit(1.0))
        .when(a == b, F.lit(0.0))
        .when((l1 == 0) | (l2 == 0), F.lit(1.0))
        .when(m == 0, F.lit(1.0))
        .otherwise(1.0 - sim)
    )


def normalized_levenshtein_column(a: Column, b: Column) -> Column:
    """Normalized Levenshtein as a pure Catalyst expression (JVM-side,
    whole-stage codegen; never touches Python).

    null on either side => 1.0; both empty => 0.0.
    """
    maxlen = F.greatest(F.length(a), F.length(b))
    d = (
        F.when(a.isNull() | b.isNull(), F.lit(1.0))
        .when(maxlen == 0, F.lit(0.0))
        .otherwise(F.levenshtein(a, b).cast(DoubleType()) / maxlen.cast(DoubleType()))
    )
    return d


def _make_pandas_kernel(metric: str):
    from pyspark.sql.functions import pandas_udf

    # Worker-lifetime memo: linkage columns are heavily repeated (common
    # names / common conversation prefixes), so across Arrow batches the
    # hit rate approaches 100% and the Python cost per pair amortizes to
    # a dict lookup. Bounded to keep executor memory predictable.
    _MEMO_MAX = 1 << 20

    @pandas_udf(DoubleType())
    def kernel(a: pd.Series, b: pd.Series) -> pd.Series:
        cache = kernel_cache  # module-level, survives across batches
        out = []
        for v1, v2 in zip(a, b):
            if v1 is None or v2 is None or v1 != v1 or v2 != v2:  # None or NaN
                out.append(1.0)
                continue
            key = (v1, v2)
            d = cache.get(key)
            if d is None:
                if len(cache) >= _MEMO_MAX:
                    cache.clear()
                d = py_distance(metric, v1, v2)
                cache[key] = d
            out.append(d)
        return pd.Series(out, dtype="float64")

    kernel_cache: dict[tuple[str, str], float] = {}
    # The kernel is a pure function; asNondeterministic() only tells
    # Catalyst not to clone the call across operator boundaries. Without
    # it, pushing the threshold Filter below the _total Project duplicates
    # the ArrowEvalPython node and every candidate row crosses the Python
    # boundary twice (verified via explain("formatted")).
    return kernel.asNondeterministic()


_KERNEL_CACHE: dict[str, object] = {}


def distance_column(metric: str, a: Column, b: Column) -> Column:
    """Normalized-distance Column for any supported metric.

    Dispatch: levenshtein stays JVM-side (codegen); everything else is an
    Arrow-batched pandas UDF.

    CONSTRAINT for the pandas metrics: the kernel is marked
    ``asNondeterministic()`` (to stop Catalyst cloning the Python call
    across operator boundaries — see _make_pandas_kernel), and Spark
    refuses nondeterministic expressions inside aggregate functions and
    join conditions (AnalysisException). Compute the distance into a
    projection first (``df.withColumn(...)`` / ``attach_distance``), then
    aggregate or join on the materialized column. ``levenshtein`` has no
    such restriction.
    """
    if metric == "levenshtein":
        return normalized_levenshtein_column(a, b)
    if metric not in PANDAS_METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    if metric not in _KERNEL_CACHE:
        _KERNEL_CACHE[metric] = _make_pandas_kernel(metric)
    return _KERNEL_CACHE[metric](a, b)


#: metrics whose scoring crosses into Python (Arrow-batched pandas UDF
#: with a worker-lifetime memo); levenshtein is pure JVM codegen.
PANDAS_METRICS = frozenset({"jaro", "jarowinkler", "dameraulevenshtein", "ratcliffobershelp"})


def attach_distance(
    df, metric: str, col_a: str, col_b: str, out: str, dedup: bool | None = None
):
    """Attach a normalized-distance column.

    ``levenshtein`` is inlined into the candidate plan — whole-stage
    codegen, no extra operators. The pandas-UDF metrics (jaro,
    jarowinkler, dameraulevenshtein, ratcliffobershelp) score directly by
    default, with the worker-lifetime memo absorbing repeats; the
    optional ``dedup=True`` mode instead scores DISTINCT VALUE PAIRS and
    broadcast-joins the scores back, so the Python boundary sees orders
    of magnitude fewer rows. Caveat: the dedup path evaluates the
    candidate plan twice (once under the distinct) — worth it only when
    the UDF dominates the candidate-build cost, which the memo usually
    prevents; that is why direct scoring is the default and why
    criteria_pass does not opt in.
    """
    from pyspark.sql import functions as F

    a, b = F.col(col_a), F.col(col_b)
    if metric not in PANDAS_METRICS or not dedup:
        return df.withColumn(out, distance_column(metric, a, b))
    pairs = df.select(a.alias("_dp_a"), b.alias("_dp_b")).distinct()
    scored = pairs.withColumn(
        out, distance_column(metric, F.col("_dp_a"), F.col("_dp_b"))
    )
    joined = df.join(
        F.broadcast(scored),
        a.eqNullSafe(F.col("_dp_a")) & b.eqNullSafe(F.col("_dp_b")),
        "left",
    ).drop("_dp_a", "_dp_b")
    return joined.withColumn(out, F.coalesce(F.col(out), F.lit(1.0)))
