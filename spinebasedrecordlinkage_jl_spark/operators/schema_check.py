"""Schema validation (the Schemata.jl seam of O2).

The reference validates each input table against a declared TOML schema
— per-column ``datatype`` / ``isrequired`` / ``isunique`` /
``validvalues`` (/root/reference/src/unexported/config.jl:32,
test/schema/spine.toml:4-11) — before linking. This module enforces the
same rules Spark-side, in ONE aggregation job per table: every rule
becomes a conditional-count aggregate over a single scan (column-pruned
to the declared columns), so validating a 10^12-row table costs one
pass with map-side partial aggregation and a scalar result. ``isunique``
uses exact ``count_distinct`` (one expand per unique-declared column —
the reference only ever declares keys unique).

The engine itself still compares strings (runlinkage.jl:56); datatype
rules check that values PARSE as the declared type (cast-to-null under
non-ANSI semantics), exactly the guarantee a reference user expects
from their schema file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ColumnSchema, TableConfig

_NUMERIC = {"Int", "UInt", "Float"}


def _typed(c: Column, datatype: str) -> Column:
    """Cast a (string) column to the declared type; null = unparseable."""
    if datatype == "Int":
        return c.cast("long")
    if datatype == "UInt":
        lng = c.cast("long")
        return F.when(lng >= 0, lng)
    if datatype == "Float":
        return c.cast("double")
    if datatype == "Date":
        return F.to_date(c)
    if datatype == "Timestamp":
        return F.to_timestamp(c)
    if datatype == "Bool":
        return c.cast("boolean")
    return c  # String


def _rule_aggs(cs: ColumnSchema) -> list[tuple[str, Column]]:
    """(rule label, violation-count aggregate) pairs for one column."""
    c = F.col(cs.name)
    typed = _typed(c, cs.datatype)
    out: list[tuple[str, Column]] = []
    if cs.isrequired:
        out.append(("required", F.count_if(c.isNull())))
    if cs.datatype != "String":
        out.append(("datatype", F.count_if(c.isNotNull() & typed.isNull())))
    if cs.isunique:
        out.append(("unique", F.count(c) - F.count_distinct(c)))
    if cs.validvalues is not None:
        if isinstance(cs.validvalues, str):
            # 'lo..hi' is accepted for every type and REQUIRED for
            # Timestamp (timestamps contain ':', so partition(':') would
            # silently mis-split; ColumnSchema.__post_init__ rejects it)
            if ".." in cs.validvalues:
                lo, _, hi = cs.validvalues.partition("..")
            else:
                lo, _, hi = cs.validvalues.partition(":")
            if cs.datatype in _NUMERIC:
                in_range = typed.between(float(lo), float(hi))
            elif cs.datatype == "Timestamp":
                in_range = typed.between(
                    F.to_timestamp(F.lit(lo)), F.to_timestamp(F.lit(hi))
                )
            else:
                in_range = c.between(lo, hi)  # lexicographic; ISO dates order
            out.append(("validvalues", F.count_if(c.isNotNull() & ~in_range)))
        else:
            out.append(
                ("validvalues", F.count_if(c.isNotNull() & ~c.isin(*cs.validvalues)))
            )
    return out


def schema_violations(df: DataFrame, tcfg: TableConfig) -> list[tuple[str, str, int]]:
    """Validate ``df`` against ``tcfg.schema``.

    Returns ``[(column, rule, n_violations), ...]`` for every violated
    rule (empty = valid). Missing declared-required columns are reported
    with n = -1 (structural, not countable). One Spark job total.
    """
    problems: list[tuple[str, str, int]] = []
    aggs: list[Column] = []
    labels: list[tuple[str, str]] = []
    for cs in tcfg.schema:
        if cs.name not in df.columns:
            if cs.isrequired:
                problems.append((cs.name, "missing_column", -1))
            continue
        for rule, agg in _rule_aggs(cs):
            labels.append((cs.name, rule))
            aggs.append(agg.alias(f"_v{len(aggs)}"))
    if aggs:
        row = df.agg(*aggs).first()
        for (name, rule), v in zip(labels, row):
            if v and int(v) > 0:
                problems.append((name, rule, int(v)))
    return problems


def enforce_schema(df: DataFrame, tcfg: TableConfig) -> DataFrame:
    """Fail fast like the reference's config-time validation: raise
    ``ValueError`` naming every violated (column, rule, count) if the
    table does not conform; return ``df`` unchanged otherwise."""
    problems = schema_violations(df, tcfg)
    if problems:
        detail = ", ".join(f"{c}:{r}={n}" for c, r, n in problems)
        raise ValueError(f"table {tcfg.name!r} fails schema validation: {detail}")
    return df
