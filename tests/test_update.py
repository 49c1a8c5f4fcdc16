"""SPARQL UPDATE tier: retraction batches on the append-only graph store
(equality-delete design — reads subtract, full compaction bakes in and
shadows), and the UPDATE string forms routed through update_store."""

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.sinks.graph_store import (compact, delete_where,
                                                 expire_replaced,
                                                 live_batches,
                                                 live_retractions,
                                                 materialize, read_graph,
                                                 retract_batch,
                                                 update_store)
from rdf_tabular_spark.sparql import SparqlError, parse_update


def _store_rows(spark, rows, url="t"):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return df.select(
        "subj", "pred", "obj", F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(url).alias("table_url"),
        F.lit(0).cast("long").alias("source_num"))


def _spo(df):
    return {(r.subj, r.pred, r.obj)
            for r in df.select("subj", "pred", "obj").collect()}


ROWS = [("a", "p", "b"), ("b", "p", "c"), ("a", "q", "x"), ("c", "q", "y")]


def test_retract_batch_subtracts_on_read(spark, tmp_path):
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, ROWS), root, "b1")
    keys = spark.createDataFrame([("a", "p", "b")],
                                 "subj string, pred string, obj string")
    m = retract_batch(spark, root, "r1", keys)
    assert m["kind"] == "retraction" and m["n_triples"] == 1
    assert _spo(read_graph(spark, root)) == set(ROWS) - {("a", "p", "b")}
    # retraction ids never enter the data-batch live set
    assert live_batches(root) == {"b1"}
    assert live_retractions(root) == {"r1"}
    # time travel to before the retraction sees the full graph
    assert _spo(read_graph(spark, root, batches=["b1"])) == set(ROWS)
    # ... and including it in the snapshot applies it
    assert ("a", "p", "b") not in _spo(
        read_graph(spark, root, batches=["b1", "r1"]))
    # idempotent per batch-id
    m2 = retract_batch(
        spark, root, "r1",
        spark.createDataFrame([("zzz", "zzz", "zzz")],
                              "subj string, pred string, obj string"))
    assert m2["n_triples"] == 1


def test_delete_where_patterns(spark, tmp_path):
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, ROWS), root, "b1")
    delete_where(spark, root, "r1", [("?s", "q", "?o")])
    assert _spo(read_graph(spark, root)) \
        == {("a", "p", "b"), ("b", "p", "c")}


def test_full_compaction_bakes_in_retractions(spark, tmp_path):
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, ROWS[:2]), root, "b1")
    materialize(_store_rows(spark, ROWS[2:]), root, "b2")
    retract_batch(spark, root, "r1", spark.createDataFrame(
        [("a", "q", "x")], "subj string, pred string, obj string"))
    m = compact(spark, root)
    assert "r1" in m["replaces"]
    assert live_retractions(root) == set()
    assert _spo(read_graph(spark, root)) == set(ROWS) - {("a", "q", "x")}
    # expire removes the retraction files via the manifest path
    expired = expire_replaced(spark, root)
    assert set(expired) >= {"b1", "b2", "r1"}
    assert _spo(read_graph(spark, root)) == set(ROWS) - {("a", "q", "x")}


def test_update_store_forms(spark, tmp_path):
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, ROWS), root, "b1")
    # INSERT DATA
    update_store(spark, root, "u1",
                 'INSERT DATA { d p e . e q "lit" }')
    g = _spo(read_graph(spark, root))
    assert {("d", "p", "e"), ("e", "q", "lit")} <= g
    # DELETE DATA
    update_store(spark, root, "u2", "DELETE DATA { d p e }")
    assert ("d", "p", "e") not in _spo(read_graph(spark, root))
    # DELETE WHERE with FILTER
    update_store(spark, root, "u3",
                 'DELETE WHERE { ?s q ?o . FILTER(?o = "y") }')
    assert ("c", "q", "y") not in _spo(read_graph(spark, root))
    # INSERT ... WHERE (derivation)
    update_store(spark, root, "u4",
                 "INSERT { ?o rev_p ?s } WHERE { ?s p ?o }")
    assert ("b", "rev_p", "a") in _spo(read_graph(spark, root))
    # DELETE {t} WHERE {p} (template differs from patterns)
    update_store(spark, root, "u5",
                 "DELETE { ?o rev_p ?s } WHERE { ?s p ?o }")
    g = _spo(read_graph(spark, root))
    assert not {t for t in g if t[1] == "rev_p"}
    # idempotence: replaying u1 adds nothing new
    update_store(spark, root, "u1", 'INSERT DATA { zz p zz }')
    assert ("zz", "p", "zz") not in _spo(read_graph(spark, root))


def test_parse_update_errors():
    with pytest.raises(SparqlError, match="ground"):
        parse_update("INSERT DATA { ?s p o }")
    with pytest.raises(SparqlError, match="paths"):
        parse_update("DELETE WHERE { ?s p+ ?o }")
    with pytest.raises(SparqlError):
        parse_update("SELECT ?s WHERE { ?s p ?o }")


def test_query_job_update_mode(spark, tmp_path):
    from rdf_tabular_spark.jobs.query import main as query_main
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, ROWS), root, "b1")
    m = query_main(["--store", root, "--update",
                    "DELETE WHERE { ?s p ?o }",
                    "--derive-batch-id", "r1"])
    assert m["kind"] == "retraction" and m["n_triples"] == 2
    res = query_main(["--store", root, "--sparql",
                      "SELECT ?s ?o WHERE { ?s p ?o }"])
    assert res["n_rows"] == 0
