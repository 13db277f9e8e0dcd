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
from pyspark.sql.types import StructType

from .transcripts import TRANSCRIPT_SCHEMA

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


#: malformed-record policies for text formats (CSV/JSON), mapped onto
#: Spark parse modes. Parquet/Iceberg are self-describing and unaffected.
_MALFORMED_MODES = {"fail": "FAILFAST", "drop": "DROPMALFORMED", "null": "PERMISSIVE"}


def read_table(
    spark: SparkSession,
    location: str,
    fmt: str | None = None,
    schema: StructType | None = None,
    malformed: str = "null",
) -> DataFrame:
    """Read an input table.

    ``location`` forms:
    - ``iceberg:<catalog.db.table>`` -> Iceberg catalog table (production)
    - ``*.parquet`` / directory      -> parquet scan
    - ``*.csv`` / ``*.tsv``          -> header CSV scan, all-string columns
      (matching the reference's string-only comparison contract,
      runlinkage.jl:56)
    - ``*.jsonl`` / ``*.ndjson`` / ``*.json`` -> newline-delimited JSON.
      Pass ``schema``: without one Spark infers it by pre-scanning the
      whole input — an extra full read of the corpus at scale. A missing
      schema is accepted (tests, ad-hoc exploration) but is never the
      production path.

    ``schema``, when given, is applied to CSV/JSON scans (parquet and
    Iceberg carry their own schemas).

    ``malformed`` (CSV/JSON only): what a syntactically corrupt record
    becomes — ``"fail"`` aborts the scan on the first one (FAILFAST),
    ``"drop"`` discards them (DROPMALFORMED), ``"null"`` keeps them as
    all-NULL rows (PERMISSIVE, Spark's default). A 100 TB log corpus
    WILL contain torn lines; pick the policy explicitly at the ingest
    boundary rather than inheriting silent NULL rows.
    """
    if malformed not in _MALFORMED_MODES:
        raise ValueError(
            f"malformed must be one of {sorted(_MALFORMED_MODES)}, got {malformed!r}"
        )
    mode = _MALFORMED_MODES[malformed]
    if location.startswith("iceberg:"):
        return spark.read.format("iceberg").load(location[len("iceberg:") :])
    suffix = Path(location).suffix.lower()
    if fmt == "csv" or suffix in {".csv", ".tsv"}:
        reader = (
            spark.read.option("header", "true")
            .option("sep", "\t" if suffix == ".tsv" else ",")
            .option("mode", mode)
        )
        # no inferSchema on purpose: everything compared is a string.
        return (reader.schema(schema) if schema is not None else reader).csv(location)
    if fmt in {"json", "jsonl"} or suffix in {".json", ".jsonl", ".ndjson"}:
        reader = spark.read.option("mode", mode)
        return (reader.schema(schema) if schema is not None else reader).json(location)
    return spark.read.parquet(location)


def read_transcripts(
    spark: SparkSession,
    location: str,
    fmt: str | None = None,
    malformed: str = "fail",
) -> DataFrame:
    """Read a transcripts table (the input_hint shape) from any supported
    format, always under the explicit ``TRANSCRIPT_SCHEMA`` — JSONL ingest
    never falls back to inference, and ``ts`` parses to a real timestamp.
    Column order is normalized so downstream schema-sensitive consumers
    (checkpoint round-trips, union with synthesized corpora) line up.

    ``malformed`` defaults to ``"fail"`` here (vs ``read_table``'s
    passthrough ``"null"``): a corrupt line entering the LINKAGE input
    would otherwise surface as a NULL-conv_id record far downstream;
    failing at the scan names the bad file and offset. Use ``"drop"``
    for best-effort ingest of known-dirty logs."""
    df = read_table(
        spark, location, fmt=fmt, schema=TRANSCRIPT_SCHEMA, malformed=malformed
    )
    return df.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-generated testdata tables."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
