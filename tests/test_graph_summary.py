"""Unit tests for the graph-summarization and ER tier: characteristic
sets, predicate co-occurrence, skip-gram pairs, blocked ER — hand-computed
expectations on tiny fixtures (the oracle-parity sweep covers the big
ones)."""

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.operators.dedup import blocked_er_name_pairs
from rdf_tabular_spark.operators.graph import (characteristic_sets,
                                               pred_cooccurrence,
                                               skipgram_pairs)

NS = "http://x.org/t#"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # s1: {name, age}; s2: {name, age} (same set); s3: {name}
        ("s1", NS + "name", "a"), ("s1", NS + "age", "1"),
        ("s2", NS + "name", "b"), ("s2", NS + "age", "2"),
        ("s2", NS + "age", "3"),          # duplicate predicate — one set entry
        ("s3", NS + "name", "c"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_characteristic_sets(spark, triples):
    out = {(r["cs"], r["n_props"]): r["n_subjects"]
           for r in characteristic_sets(triples).collect()}
    assert out == {("age name", 2): 2, ("name", 1): 1}


def test_pred_cooccurrence(spark, triples):
    out = {(r["p1"], r["p2"]): r["n_subjects"]
           for r in pred_cooccurrence(triples).collect()}
    assert out == {("age", "name"): 2}


def test_skipgram_window(spark):
    # one walk 0->a->b->c (steps 0..2): window 1 pairs each adjacent step
    walks = spark.createDataFrame(
        [("w", 0, 0, "a"), ("w", 0, 1, "b"), ("w", 0, 2, "c")],
        "start string, walk long, step long, node string")
    out = {(r["center"], r["context"]): r["n_pairs"]
           for r in skipgram_pairs(walks, window=1).collect()}
    assert out == {("a", "b"): 1, ("b", "a"): 1,
                   ("b", "c"): 1, ("c", "b"): 1}


def test_blocked_er_pairs(spark):
    parts = spark.createDataFrame(
        [("B1", "red widget"), ("B1", "red widgit"), ("B1", "red widgit"),
         ("B1", "blue bolt"),               # far from both widget names
         ("B2", "red widget")],             # other block — never compared
        "brand string, name string")
    out = blocked_er_name_pairs(parts, "brand", "name", max_dist=2).collect()
    assert len(out) == 1
    r = out[0]
    # 1 "red widget" x 2 "red widgit" rows -> 2 entity pairs, distance 1
    assert (r["block"], r["name_a"], r["name_b"], r["dist"],
            r["n_pairs"]) == ("B1", "red widget", "red widgit", 1, 2)
