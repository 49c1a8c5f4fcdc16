"""SPARQL 1.1 property paths (operators/paths.py): parser shape, SPARQL
§9.1 semantics, and Spark↔DuckDB emitter parity."""

from __future__ import annotations

import duckdb
import pytest

from rdf_tabular_spark.operators import paths as P


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _values_sql(rows):
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in rows)
    return f"select * from (values {vals}) v(subj, pred, obj)"


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_precedence_alt_lowest():
    # a/b|c+  ==  (a/b) | (c+)
    ast = P.parse_path("a/b|c+")
    assert isinstance(ast, P.Alt)
    assert isinstance(ast.left, P.Seq)
    assert isinstance(ast.right, P.Plus)


def test_parse_inverse_binds_tighter_than_seq():
    ast = P.parse_path("^a/b")
    assert isinstance(ast, P.Seq)
    assert isinstance(ast.left, P.Inv)


def test_parse_parens_override():
    ast = P.parse_path("a/(b|c)")
    assert isinstance(ast, P.Seq)
    assert isinstance(ast.right, P.Alt)


def test_parse_angle_bracketed_iri_atom():
    # bare tokens stop at the '/' operator, so full IRIs use SPARQL's
    # <IRI> form where '/' is literal
    ast = P.parse_path("<http://schema.org/name>/^<http://schema.org/name>")
    assert isinstance(ast, P.Seq)
    assert ast.left == P.Atom("http://schema.org/name")
    assert isinstance(ast.right, P.Inv)


def test_parse_bare_iri_with_slashes_rejected():
    with pytest.raises(ValueError):
        P.parse_path("http://schema.org/name")


@pytest.mark.parametrize("bad", ["", "a|", "(a", "a)", "^", "a//b", "<oops"])
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        P.parse_path(bad)


# ---------------------------------------------------------------------------
# semantics
# ---------------------------------------------------------------------------

def test_seq_is_bag_alt_is_bag(spark):
    # two derivations of (a, c) via p/q must both survive (SPARQL bag)
    rows = [("a", "p", "m1"), ("a", "p", "m2"),
            ("m1", "q", "c"), ("m2", "q", "c")]
    out = P.path_match(_triples(spark, rows), "p/q").collect()
    assert [tuple(r) for r in out] == [("a", "c"), ("a", "c")]


def test_plus_is_set_semantics_on_cycle(spark):
    # a→b→a cycle: + must terminate and emit distinct pairs only
    rows = [("a", "p", "b"), ("b", "p", "a")]
    out = {tuple(r) for r in P.path_match(_triples(spark, rows), "p+").collect()}
    assert out == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_inverse_swaps_endpoints(spark):
    rows = [("a", "p", "b")]
    out = [tuple(r) for r in P.path_match(_triples(spark, rows), "^p").collect()]
    assert out == [("b", "a")]


def test_star_includes_zero_length_over_all_graph_terms(spark):
    # ZeroLengthPath (SPARQL 1.1 §18.4): p* pairs every term of the GRAPH
    # with itself — including 'x', which has no p-edge at all.
    rows = [("a", "p", "b"), ("c", "q", "x")]
    out = {tuple(r) for r in
           P.path_match(_triples(spark, rows), "p*").collect()}
    assert out == {("a", "a"), ("b", "b"), ("c", "c"), ("x", "x"),
                   ("a", "b")}


def test_opt_is_identity_union_child_distinct(spark):
    # p? on a self-loop: the (a, a) identity pair and the (a, a) edge
    # collapse to ONE row (duplicate-free W3C semantics).
    rows = [("a", "p", "a"), ("a", "p", "b")]
    out = sorted(tuple(r) for r in
                 P.path_match(_triples(spark, rows), "p?").collect())
    assert out == [("a", "a"), ("a", "b"), ("b", "b")]


def test_star_terminates_on_cycle(spark):
    rows = [("a", "p", "b"), ("b", "p", "a")]
    out = {tuple(r) for r in
           P.path_match(_triples(spark, rows), "p*").collect()}
    assert out == {("a", "a"), ("b", "b"), ("a", "b"), ("b", "a")}


# ---------------------------------------------------------------------------
# emitter parity (same AST, two engines)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", [
    "parent", "^parent", "parent/parent", "parent/^parent", "parent+",
    "parent+|knows", "(parent|knows)/label", "^parent/parent | knows+",
    "parent*", "parent?", "parent*/label", "(^parent)?|knows*",
])
def test_sql_emitter_matches_dataframe(spark, path):
    rows = [("a", "parent", "b"), ("b", "parent", "c"),
            ("d", "parent", "b"), ("a", "knows", "d"),
            ("c", "label", "root")]
    spark_out = sorted(
        map(tuple, P.path_match(_triples(spark, rows), path).collect()))
    ddb_out = sorted(duckdb.sql(P.path_sql(_values_sql(rows), path)).fetchall())
    assert spark_out == ddb_out


def test_negated_property_set(spark):
    rows = [("a", "p", "b"), ("a", "q", "c"), ("a", "r", "d")]
    out = {tuple(r) for r in P.path_match(
        _triples(spark, rows), "!(p|q)").collect()}
    assert out == {("a", "d")}
    # single-predicate form, composed with sequence
    out2 = {tuple(r) for r in P.path_match(
        _triples(spark, rows + [("b", "r", "e")]), "!q/r").collect()}
    assert out2 == {("a", "e")}


def test_negset_sql_parity():
    import duckdb
    rows = [("a", "p", "b"), ("a", "q", "c"), ("b", "r", "a")]
    sql = P.path_sql(_values_sql(rows), "(!p)+")
    out = sorted(duckdb.sql(sql).fetchall())
    # non-p edges: a-q->c, b-r->a; closure adds b->c
    assert out == [("a", "c"), ("b", "a"), ("b", "c")]
