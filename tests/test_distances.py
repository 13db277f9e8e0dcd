"""Distance-kernel goldens: the reference's worked examples
(/root/reference/README.md:160-166) + null semantics
(distances.jl:15-16) + an independent DuckDB cross-check for Jaro /
Jaro-Winkler / Levenshtein."""

import duckdb
import pytest

from spinebasedrecordlinkage_jl_spark.functions.distances import (
    _damerau_levenshtein,
    _jaro,
    _jaro_winkler,
    py_distance,
)

APPROX = pytest.approx


class TestReferenceGoldens:
    # /root/reference/README.md:160-166: normalized Levenshtein table
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("robert", "robert", 0.0),
            ("robert", "rob", 0.5),
            ("robert", "bob", 2 / 3),
            ("rob", "bob", 1 / 3),
            ("rob", "tim", 1.0),
            ("smith", "smithh", 1 / 6),  # testset golden: links at threshold 0.3
            ("elizabeth", "eliza", 4 / 9),  # links at threshold 0.5
        ],
    )
    def test_normalized_levenshtein(self, a, b, expected):
        assert py_distance("levenshtein", a, b) == APPROX(expected)

    def test_missing_is_distance_one(self):
        # distances.jl:15-16: missing on either side => 1.0, all metrics
        for m in ["levenshtein", "jaro", "jarowinkler", "dameraulevenshtein", "ratcliffobershelp"]:
            assert py_distance(m, None, "x") == 1.0
            assert py_distance(m, "x", None) == 1.0
            assert py_distance(m, None, None) == 1.0

    def test_empty_strings(self):
        assert py_distance("levenshtein", "", "") == 0.0
        assert py_distance("levenshtein", "", "abc") == 1.0
        assert py_distance("jaro", "", "") == 0.0
        assert py_distance("ratcliffobershelp", "x", "x") == 0.0

    def test_damerau_transposition(self):
        assert _damerau_levenshtein("ab", "ba") == 1  # one transposition
        assert _damerau_levenshtein("abcdef", "abcdfe") == 1
        assert py_distance("dameraulevenshtein", "ab", "ba") == APPROX(0.5)


class TestDuckDBCrossCheck:
    """Independent implementation check: DuckDB ships jaro_similarity /
    jaro_winkler_similarity / levenshtein with the standard definitions."""

    PAIRS = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("duane", "dwayne"),
        ("smith", "smithh"),
        ("elizabeth", "eliza"),
        ("abc", "xyz"),
        ("a", "a"),
    ]

    @pytest.fixture(scope="class")
    def con(self):
        return duckdb.connect()

    @pytest.mark.parametrize("a,b", PAIRS)
    def test_jaro(self, con, a, b):
        want = con.execute("SELECT jaro_similarity(?, ?)", [a, b]).fetchone()[0]
        assert _jaro(a, b) == APPROX(want, abs=1e-12)

    @pytest.mark.parametrize("a,b", PAIRS)
    def test_jaro_winkler(self, con, a, b):
        want = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert _jaro_winkler(a, b) == APPROX(want, abs=1e-12)

    @pytest.mark.parametrize("a,b", PAIRS)
    def test_levenshtein(self, con, a, b):
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = py_distance("levenshtein", a, b) * max(len(a), len(b))
        assert got == APPROX(want)


class TestSparkColumns:
    def test_jvm_levenshtein_matches_python(self, spark):
        from pyspark.sql import functions as F

        from spinebasedrecordlinkage_jl_spark.functions.distances import (
            normalized_levenshtein_column,
        )

        df = spark.createDataFrame(
            [("robert", "rob"), ("smith", "smithh"), (None, "x"), ("", "")],
            ["a", "b"],
        )
        got = [
            r["d"]
            for r in df.select(
                normalized_levenshtein_column(F.col("a"), F.col("b")).alias("d")
            ).collect()
        ]
        assert got[0] == APPROX(0.5)
        assert got[1] == APPROX(1 / 6)
        assert got[2] == 1.0
        assert got[3] == 0.0

    def test_pandas_udf_kernels(self, spark):
        from pyspark.sql import functions as F

        from spinebasedrecordlinkage_jl_spark.functions.distances import distance_column

        df = spark.createDataFrame(
            [("martha", "marhta"), (None, "x"), ("same", "same")], ["a", "b"]
        )
        for metric in ["jaro", "jarowinkler", "dameraulevenshtein", "ratcliffobershelp"]:
            rows = df.select(
                distance_column(metric, F.col("a"), F.col("b")).alias("d")
            ).collect()
            got = [r["d"] for r in rows]
            assert got[0] == APPROX(py_distance(metric, "martha", "marhta"))
            assert got[1] == 1.0
            assert got[2] == 0.0
