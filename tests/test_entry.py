"""Driver-contract harness: run every queries() entry at sf0.001 and
compare against its oracle_sql() twin in DuckDB — stricter than the
driver (exact sorted-value comparison, not just hashes)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())

#: Queries deliberately without a SQL twin; each must carry its own
#: pytest pinning the semantics.  Empty since image_dhash_pairs gained a
#: materialized-fingerprint oracle (the numpy decode stays pinned by
#: tests/test_media_codecs.py; the band join + Hamming verify is SQL).
ROWS_ONLY: set = set()


def test_every_query_has_an_oracle():
    """Every registry query is value-hash verifiable against DuckDB,
    except the explicit ROWS_ONLY allowlist."""
    assert sorted(set(entry_mod.queries().keys()) - ROWS_ONLY) == ORACLE_NAMES
    assert ROWS_ONLY <= set(entry_mod.queries().keys())


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


#: Spark type-name → pandas dtype prefixes the driver's value hash treats as
#: the same scalar kind.  A LongType column surfacing as float64 (DuckDB
#: HUGEINT, e.g. an uncast window sum) is exactly the drift this catches.
_DTYPE_OK = {
    "LongType": ("int", "uint"),
    "IntegerType": ("int", "uint"),
    "ShortType": ("int", "uint"),
    "ByteType": ("int", "uint"),
    "DoubleType": ("float", "double"),
    "FloatType": ("float", "double"),
    "BooleanType": ("bool",),
    "StringType": ("string", "large_string"),
    "TimestampType": ("timestamp",),
    "TimestampNTZType": ("timestamp",),
    "DateType": ("date",),
}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_dtype_canonical(spark, duck, name):
    """Driver-faithful typing gate: the driver hashes raw values, so an
    oracle column that DuckDB materializes as a wider type than Spark's
    (HUGEINT from an uncast window sum → float64) hash-mismatches even when
    every value is numerically equal (CORRECTNESS_r04 `pack_sequences`).
    Compare the oracle's Arrow types (DuckDB's true result types; nullable
    ints stay ints, HUGEINT surfaces as decimal128) against the Spark
    schema class per column, before any value comparison."""
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    stypes = {f.name.lower(): type(f.dataType).__name__ for f in sdf.schema.fields}
    tbl = duck.execute(entry_mod.oracle_sql()[name]).arrow()
    for field in tbl.schema:
        stype = stypes[field.name.lower()]
        allowed = _DTYPE_OK.get(stype)
        if allowed is None:  # arrays/structs — value comparison covers them
            continue
        dt = str(field.type)
        assert dt.startswith(allowed), (
            f"{name}.{field.name}: oracle type {dt} vs Spark {stype} — "
            f"add an explicit CAST in the oracle SQL"
        )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch {scols} vs {dcols}"
    )
    a = _rows_to_set(scols, srows)
    b = _rows_to_set(dcols, drows)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(f"{name}: value mismatch\n spark-only={diff_a}\n duck-only={diff_b}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert "EntityId" in df.columns
