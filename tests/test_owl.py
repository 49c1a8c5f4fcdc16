"""Unit tests for the OWL pD* subset (operators/owl.py): sameAs
canonicalization semantics and the one-pass property rules. The oracle
parity of the same operators over real tables is covered by
test_queries_oracle (kg_sameas_mapping / kg_sameas_canonical /
kg_owl_derived); these tests pin the corner semantics."""

import pytest

from rdf_tabular_spark.operators.owl import (OWL_INVERSE, OWL_SAMEAS,
                                             OWL_SYMMETRIC, OWL_TRANSITIVE,
                                             RDF_TYPE,
                                             owl_horst_materialize,
                                             sameas_mapping, sameas_rewrite)

T3 = "subj string, pred string, obj string"


def _g(spark, rows):
    return spark.createDataFrame(rows, T3)


def test_sameas_mapping_transitive_chain(spark):
    # a~b, b~c, no a~c asserted: one class, canon = lexical min
    g = _g(spark, [("b", OWL_SAMEAS, "a"), ("b", OWL_SAMEAS, "c"),
                   ("x", "p", "y")])
    m = {r.term: r.canon for r in sameas_mapping(g).collect()}
    assert m == {"a": "a", "b": "a", "c": "a"}


def test_sameas_rewrite_collapses_duplicates(spark):
    # coreferent subjects carrying the same property triple collapse to ONE
    g = _g(spark, [("a", OWL_SAMEAS, "b"),
                   ("a", "name", "N"), ("b", "name", "N"),
                   ("c", "knows", "b")])
    out = sameas_rewrite(g)
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("a", "name", "N"), ("c", "knows", "a")}


def test_sameas_rewrite_obj_is_iri_guard(spark):
    # a literal lexically equal to a mapped IRI must survive when the
    # frame tracks obj_is_iri
    schema = T3 + ", obj_is_iri boolean"
    g = spark.createDataFrame(
        [("a", OWL_SAMEAS, "b", True),
         ("x", "label", "b", False),      # literal "b" — keep
         ("x", "link", "b", True)],       # IRI b — rewrite
        schema)
    out = sameas_rewrite(g, obj_is_iri_col="obj_is_iri")
    rows = {(r.subj, r.pred, r.obj) for r in
            out.select("subj", "pred", "obj").collect()}
    assert rows == {("x", "label", "b"), ("x", "link", "a")}


def test_sameas_noop_without_statements(spark):
    g = _g(spark, [("x", "p", "y")])
    assert sameas_mapping(g).count() == 0
    assert {(r.subj, r.pred, r.obj) for r in sameas_rewrite(g).collect()} \
        == {("x", "p", "y")}


def test_inverse_both_directions(spark):
    g = _g(spark, [("parent", OWL_INVERSE, "child"),
                   ("a", "parent", "b"), ("c", "child", "d")])
    rows = {(r.subj, r.pred, r.obj)
            for r in owl_horst_materialize(g).collect()}
    assert rows == {("b", "child", "a"), ("d", "parent", "c")}


def test_symmetric_then_transitive_composition(spark):
    # p symmetric AND transitive: closure must run over the symmetrized
    # edges — a-b, b-c yields the full 3-clique both ways plus self-loops
    g = _g(spark, [("p", RDF_TYPE, OWL_SYMMETRIC),
                   ("p", RDF_TYPE, OWL_TRANSITIVE),
                   ("a", "p", "b"), ("b", "p", "c")])
    rows = {(r.subj, r.obj)
            for r in owl_horst_materialize(g, include_input=True)
            .filter("pred = 'p'").collect()}
    terms = {"a", "b", "c"}
    assert rows == {(x, y) for x in terms for y in terms}


def test_transitive_only_closure(spark):
    g = _g(spark, [("p", RDF_TYPE, OWL_TRANSITIVE),
                   ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
    rows = {(r.subj, r.obj) for r in owl_horst_materialize(g).collect()}
    # new pairs only (asserted edges set-minus'd away)
    assert rows == {("a", "c"), ("a", "d"), ("b", "d")}


def test_no_schema_yields_empty(spark):
    g = _g(spark, [("a", "p", "b")])
    assert owl_horst_materialize(g).count() == 0
    assert {(r.subj, r.pred, r.obj)
            for r in owl_horst_materialize(g, include_input=True).collect()} \
        == {("a", "p", "b")}


def test_schema_cap_guard(spark):
    g = _g(spark, [(f"p{i}", RDF_TYPE, OWL_SYMMETRIC) for i in range(10)])
    with pytest.raises(ValueError, match="schema_cap"):
        owl_horst_materialize(g, schema_cap=5)


def _store_rows(spark, rows):
    from pyspark.sql import functions as F
    return _g(spark, rows).select(
        "subj", "pred", "obj", F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit("t").alias("table_url"),
        F.lit(0).cast("long").alias("source_num"))


def test_infer_owl_batch_commits_lineage(spark, tmp_path):
    from rdf_tabular_spark.sinks.graph_store import (infer_owl_batch,
                                                     materialize, read_graph)
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, [("parent", OWL_INVERSE, "child"),
                                    ("a", "parent", "b")]), root, "b1")
    m = infer_owl_batch(spark, root, "owl1")
    assert m["n_triples"] == 1
    assert m["lineage"]["rule_id"] == "owl-horst"
    g = {(r.subj, r.pred, r.obj) for r in read_graph(spark, root).collect()}
    assert ("b", "child", "a") in g
    # idempotent per batch-id
    m2 = infer_owl_batch(spark, root, "owl1")
    assert m2["n_triples"] == m["n_triples"]


def test_update_sameas_map_merges_across_runs(spark, tmp_path):
    """Identities learned in later batches merge union-find-style with the
    CURRENT map: b1 asserts a~b, b2 asserts b~c — after the second update
    every term reads through to 'a', with no batch rewritten."""
    from rdf_tabular_spark.sinks.graph_store import (materialize,
                                                     read_graph_canonical,
                                                     update_sameas_map)
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, [("a", OWL_SAMEAS, "b"),
                                    ("b", "name", "N")]), root, "b1")
    update_sameas_map(spark, root, "m1")
    g1 = {(r.subj, r.pred, r.obj)
          for r in read_graph_canonical(spark, root)
          .select("subj", "pred", "obj").collect()}
    assert ("a", "name", "N") in g1
    materialize(_store_rows(spark, [("b", OWL_SAMEAS, "c"),
                                    ("c", "knows", "d")]), root, "b2")
    m = update_sameas_map(spark, root, "m2")
    assert m["n_terms"] == 3
    g2 = {(r.subj, r.pred, r.obj)
          for r in read_graph_canonical(spark, root)
          .select("subj", "pred", "obj").collect()}
    assert ("a", "knows", "d") in g2


def test_query_job_owl_modes(spark, tmp_path):
    """CLI surface: --infer-owl commits a derived batch; --merge-sameas
    folds identities into the canonical map."""
    from rdf_tabular_spark.jobs.query import main as query_main
    from rdf_tabular_spark.sinks.graph_store import (load_canonical_map,
                                                     materialize)
    root = str(tmp_path / "g")
    materialize(_store_rows(spark, [("p", RDF_TYPE, OWL_TRANSITIVE),
                                    ("a", "p", "b"), ("b", "p", "c"),
                                    ("a", OWL_SAMEAS, "z")]), root, "b1")
    m = query_main(["--store", root, "--infer-owl",
                    "--derive-batch-id", "owl1"])
    assert m["n_triples"] == 1          # (a, p, c)
    m2 = query_main(["--store", root, "--merge-sameas",
                     "--derive-batch-id", "m1"])
    assert m2["n_terms"] == 2
    cmap = {r.id: r.canonical_id
            for r in load_canonical_map(spark, root).collect()}
    assert cmap == {"a": "a", "z": "a"}
