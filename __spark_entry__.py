"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship linkage pipeline at sf0.001.
queries(): one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline extensions); each callable (spark, sf_dir) -> DataFrame.
oracle_sql(): DuckDB twins for the value-hash correctness gate — one per
query, including the iterative pieces (linkage_full's connected
components as a recursive CTE, simhash via a portable md5-derived bit
family, sign-LSH via hyperplane literals embedded in the SQL). See
spinebasedrecordlinkage_jl_spark/entry_queries.py for the lockstep
construction rules.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spinebasedrecordlinkage_jl_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Session settings the queries rely on, for driver-built sessions:
    permissive semantics + UTC (oracle parity) and the Spark 4.1
    Union-constraint workaround (see session.py)."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full spine-based linkage pipeline (blocking ->
    criteria passes -> connected-components entity formation -> relink)
    over conversation records derived from sf0.001 events."""
    _configure(spark)
    return QUERIES["linkage_full"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
