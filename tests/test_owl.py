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
