"""k-core peeling unit tests (operators/graph.kcore_peel).

Fixture graph: a 4-clique (every node degree 3 — survives a 3-core) plus
a pendant chain hanging off it (degree <= 2 — peels away round 1) and a
triangle (degree 2 each — peels in a 3-core, survives a 2-core).
"""

import pytest

from rdf_tabular_spark.operators.graph import kcore_peel

CLIQUE = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
CHAIN = [("d", "e"), ("e", "f")]
TRIANGLE = [("x", "y"), ("y", "z"), ("z", "x")]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(CLIQUE + CHAIN + TRIANGLE,
                                 "src string, dst string")


def test_three_core_keeps_clique_only(spark, edges):
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=3).collect()}
    # the pendant chain and the triangle peel; the 4-clique survives with
    # undirected degree 3 each (d loses its chain edge)
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_two_core_keeps_triangle(spark, edges):
    out = {r["node"]: r["degree"]
           for r in kcore_peel(edges, k=2, n_rounds=3).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3,
                   "x": 2, "y": 2, "z": 2}


def test_high_k_empties(spark, edges):
    assert kcore_peel(edges, k=5, n_rounds=2).count() == 0
