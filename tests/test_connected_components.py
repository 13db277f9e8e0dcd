"""Connected components (large-star/small-star) unit tests."""

from spinebasedrecordlinkage_jl_spark.operators.spine import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_single_edge(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_chain_converges_to_min(spark):
    # long path graph: worst case for naive propagation
    got = _cc(spark, [(i, i + 1) for i in range(1, 20)])
    assert set(got.values()) == {1}
    assert set(got.keys()) == set(range(1, 21))


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_graph(spark):
    got = _cc(spark, [(5, i) for i in range(6, 16)])
    assert set(got.values()) == {5}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
