"""Table readers (operator O3).

The reference streams CSV row-by-row (/root/reference/src/runlinkage.jl:128,
``CSV.Rows(...; reusebuffer=true)``). Spark's equivalent is a partitioned
columnar scan with predicate pushdown — ``spark.read.parquet`` (tests) or an
Iceberg catalog table (production; gated on the Iceberg runtime jar being on
the classpath, which it isn't in this sandbox).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read an input table.

    ``location`` forms:
    - ``iceberg:<catalog.db.table>`` -> Iceberg catalog table (production)
    - ``*.parquet`` / directory      -> parquet scan
    - ``*.csv`` / ``*.tsv``          -> header CSV scan, all-string columns
      (matching the reference's string-only comparison contract,
      runlinkage.jl:56)
    """
    if location.startswith("iceberg:"):
        return spark.read.format("iceberg").load(location[len("iceberg:") :])
    suffix = Path(location).suffix.lower()
    if fmt == "csv" or suffix in {".csv", ".tsv"}:
        sep = "\t" if suffix == ".tsv" else ","
        # inferSchema=False on purpose: everything compared is a string.
        return spark.read.option("header", "true").option("sep", sep).csv(location)
    return spark.read.parquet(location)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-generated testdata tables."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
