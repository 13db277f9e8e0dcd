"""Iceberg seam contract tests.

The sandbox has no Iceberg runtime jar, so the ``iceberg:`` branches of
checkpoint.write_table / read_table cannot run for real here (they do on
a cluster with ``spark.sql.catalog.*`` configured). These tests pin the
CALL SEQUENCE against mocks so the ~6 production-only lines are
exercised: a refactor that breaks the writer chain fails CI instead of
the first cluster deploy. The parquet branch is covered for real by
test_resume / test_cli.
"""

from unittest.mock import MagicMock

from spinebasedrecordlinkage_jl_spark.checkpoint import read_table, write_table


def test_write_table_iceberg_calls_writeTo_createOrReplace():
    df = MagicMock(name="df")
    write_table(df, "iceberg:catalog.db.spine")
    # the prefix must be stripped and the v2 writer committed via
    # createOrReplace (idempotent for resume: re-running a stage
    # replaces, never duplicates)
    df.writeTo.assert_called_once_with("catalog.db.spine")
    df.writeTo.return_value.createOrReplace.assert_called_once_with()
    # the parquet path must NOT be touched on the iceberg branch
    df.write.mode.assert_not_called()


def test_write_table_parquet_branch_not_iceberg():
    df = MagicMock(name="df")
    write_table(df, "/tmp/somewhere/spine")
    df.writeTo.assert_not_called()
    df.write.mode.assert_called_once_with("overwrite")
    df.write.mode.return_value.parquet.assert_called_once_with("/tmp/somewhere/spine")


def test_read_table_iceberg_calls_format_load():
    spark = MagicMock(name="spark")
    out = read_table(spark, "iceberg:catalog.db.links")
    spark.read.format.assert_called_once_with("iceberg")
    spark.read.format.return_value.load.assert_called_once_with("catalog.db.links")
    assert out is spark.read.format.return_value.load.return_value


def test_read_table_parquet_branch(spark, tmp_path):
    # real-parquet sanity for the non-iceberg branch of read_table
    p = str(tmp_path / "t")
    spark.createDataFrame([(1,)], "a long").write.parquet(p)
    assert read_table(spark, p).collect()[0]["a"] == 1
