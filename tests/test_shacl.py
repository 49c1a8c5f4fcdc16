"""SHACL-lite distributed shape validation (operators/shacl).

Complements the reference's TABLE-side validation (metadata.rb validate! →
csvw/validate.py) with the GRAPH-side quality gate a KG pipeline needs
before materializing.
"""

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.operators.shacl import (
    RDF_TYPE,
    NodeShape,
    PropertyShape,
    conformance_summary,
    validate_shapes,
)

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string")


@pytest.fixture()
def graph(spark):
    P, T = EX + "name", EX + "Person"
    return _triples(spark, [
        (EX + "a", RDF_TYPE, T, True, None),
        (EX + "a", P, "Alice", False, XSD + "string"),
        (EX + "b", RDF_TYPE, T, True, None),          # no name at all
        (EX + "c", RDF_TYPE, T, True, None),
        (EX + "c", P, "C1", False, XSD + "string"),   # two names
        (EX + "c", P, "C2", False, XSD + "string"),
        (EX + "d", P, "NotTyped", False, XSD + "string"),  # not a focus
    ])


def _viol(report):
    return {(r.focus, r.constraint): (r.actual, r.expected)
            for r in report.collect()}


def test_cardinality_min_and_max(spark, graph):
    shapes = [NodeShape("S", EX + "Person",
                        (PropertyShape(EX + "name", min_count=1,
                                       max_count=1),))]
    got = _viol(validate_shapes(graph, shapes))
    assert got == {(EX + "b", "minCount"): ("0", "1"),
                   (EX + "c", "maxCount"): ("2", "1")}


def test_untyped_subject_is_not_a_focus_node(spark, graph):
    shapes = [NodeShape("S", EX + "Person",
                        (PropertyShape(EX + "name", min_count=1),))]
    focuses = {r.focus for r in validate_shapes(graph, shapes).collect()}
    assert EX + "d" not in focuses


def test_target_class_none_targets_every_subject(spark, graph):
    shapes = [NodeShape("S", None,
                        (PropertyShape(EX + "name", min_count=1),))]
    focuses = {r.focus for r in validate_shapes(graph, shapes).collect()}
    # a/b/c are typed; b lacks name; d HAS a name → only b (and the typed
    # subjects' rdf:type rows make them subjects too, but a/c/d have names)
    assert focuses == {EX + "b"}


def test_pattern_and_in_and_datatype(spark):
    g = _triples(spark, [
        (EX + "x", EX + "lang", "en", False, XSD + "string"),
        (EX + "y", EX + "lang", "xx", False, None),
        (EX + "z", EX + "lang", "Deutsch!", False, XSD + "string"),
    ])
    shapes = [NodeShape("S", None, (
        PropertyShape(EX + "lang", pattern="^[a-z]{2}$",
                      in_values=("en", "fr"), datatype=XSD + "string"),))]
    rep = validate_shapes(g, shapes)
    got = {(r.focus, r.constraint) for r in rep.collect()}
    assert got == {(EX + "y", "in"), (EX + "y", "datatype"),
                   (EX + "z", "in"), (EX + "z", "pattern")}


def test_node_kind(spark):
    g = _triples(spark, [
        (EX + "x", EX + "knows", EX + "y", True, None),
        (EX + "x", EX + "knows", "just a string", False, None),
    ])
    shapes = [NodeShape("S", None,
                        (PropertyShape(EX + "knows", node_kind="IRI"),))]
    got = _viol(validate_shapes(g, shapes))
    assert got == {(EX + "x", "nodeKind"): ("Literal", "IRI")}


def test_conforming_graph_empty_report(spark, graph):
    shapes = [NodeShape("S", EX + "Person",
                        (PropertyShape(EX + "name", min_count=0,
                                       pattern="^[A-Z]"),))]
    rep = validate_shapes(graph, shapes)
    assert rep.count() == 0
    assert rep.columns == ["focus", "shape_id", "path", "constraint",
                           "actual", "expected"]


def test_no_shapes_returns_empty_typed_frame(spark, graph):
    rep = validate_shapes(graph, [])
    assert rep.count() == 0 and "focus" in rep.columns


def test_conformance_summary(spark, graph):
    shapes = [NodeShape("S", EX + "Person",
                        (PropertyShape(EX + "name", min_count=1,
                                       max_count=1),))]
    s = {r["constraint"]: (r.n_violations, r.n_focus)
         for r in conformance_summary(
             validate_shapes(graph, shapes)).collect()}
    assert s == {"minCount": (1, 1), "maxCount": (1, 1)}


def test_pred_filter_pushes_down(spark, graph):
    """Each property shape reads one pred slice — the filter must reach the
    scan side, not sit above a join."""
    import contextlib
    import io
    shapes = [NodeShape("S", EX + "Person",
                        (PropertyShape(EX + "name", min_count=1),))]
    rep = validate_shapes(graph, shapes)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain("formatted")
    assert "pred" in buf.getvalue()


def test_class_constraint(spark):
    g = _triples(spark, [
        (EX + "doc", EX + "author", EX + "alice", True, None),
        (EX + "doc", EX + "author", EX + "ghost", True, None),
        (EX + "alice", RDF_TYPE, EX + "Person", True, None),
    ])
    shapes = [NodeShape("S", None,
                        (PropertyShape(EX + "author",
                                       class_=EX + "Person"),))]
    got = _viol(validate_shapes(g, shapes))
    assert got == {(EX + "doc", "class"): (EX + "ghost", EX + "Person")}


def test_length_constraints(spark):
    g = _triples(spark, [
        (EX + "a", EX + "code", "US", False, None),
        (EX + "b", EX + "code", "X", False, None),
        (EX + "c", EX + "code", "TOOLONG", False, None),
    ])
    shapes = [NodeShape("S", None,
                        (PropertyShape(EX + "code", min_length=2,
                                       max_length=3),))]
    got = _viol(validate_shapes(g, shapes))
    assert got == {(EX + "b", "minLength"): ("1", "2"),
                   (EX + "c", "maxLength"): ("7", "3")}


def test_unique_lang(spark):
    g = spark.createDataFrame(
        [(EX + "a", EX + "label", "hi", False, None, "en"),
         (EX + "a", EX + "label", "hello", False, None, "en"),
         (EX + "a", EX + "label", "salut", False, None, "fr"),
         (EX + "b", EX + "label", "x", False, None, "en")],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")
    shapes = [NodeShape("S", None,
                        (PropertyShape(EX + "label", unique_lang=True),))]
    got = _viol(validate_shapes(g, shapes))
    assert got == {(EX + "a", "uniqueLang"): ("en", "unique")}


def test_shapes_from_json_new_constraints(spark):
    from rdf_tabular_spark.operators.shacl import shapes_from_json
    shapes = shapes_from_json([{
        "shape_id": "s",
        "properties": [{"path": "p", "class": "C", "min_length": 1,
                        "max_length": 9, "unique_lang": True}]}])
    pr = shapes[0].properties[0]
    assert pr.class_ == "C" and pr.min_length == 1 and pr.max_length == 9
    assert pr.unique_lang is True


def test_has_value_less_than_equals(spark):
    from rdf_tabular_spark.operators.shacl import (NodeShape, PropertyShape,
                                                   validate_shapes)
    rows = [
        # e1 conforms to all three; e2 violates all three
        ("e1", "p:flag", "yes"), ("e1", "p:lo", "3"), ("e1", "p:hi", "7"),
        ("e1", "p:a", "x"), ("e1", "p:b", "x"),
        ("e2", "p:flag", "no"), ("e2", "p:lo", "9"), ("e2", "p:hi", "7"),
        ("e2", "p:a", "x"), ("e2", "p:b", "y"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    shapes = [NodeShape("s", None, (
        PropertyShape(path="p:flag", has_value="yes"),
        PropertyShape(path="p:lo", less_than="p:hi"),
        PropertyShape(path="p:a", equals="p:b"),
    ))]
    rep = {(r["focus"], r["constraint"]) for r in
           validate_shapes(t, shapes).collect()}
    assert ("e2", "hasValue") in rep
    assert ("e2", "lessThan") in rep
    assert ("e2", "equals") in rep
    assert not any(f == "e1" for f, _ in rep)


def test_less_than_numeric_not_lexical(spark):
    from rdf_tabular_spark.operators.shacl import (NodeShape, PropertyShape,
                                                   validate_shapes)
    # lexically "10" < "9" is FALSE... lexical would flag it; numeric must not
    t = spark.createDataFrame([("e", "p:lo", "9"), ("e", "p:hi", "10")],
                              "subj string, pred string, obj string")
    shapes = [NodeShape("s", None,
                        (PropertyShape(path="p:lo", less_than="p:hi"),))]
    assert validate_shapes(t, shapes).count() == 0


def test_less_than_mixed_pair_is_violation(spark):
    """Exactly one side numeric → the pair is incomparable → violation
    (r5 advice: the lexical fallback previously let '10' < '9x' pass)."""
    from rdf_tabular_spark.operators.shacl import (NodeShape, PropertyShape,
                                                   validate_shapes)
    t = spark.createDataFrame(
        [("e", "p:lo", "10"), ("e", "p:hi", "9x"),     # num vs non-num
         ("f", "p:lo", "abc"), ("f", "p:hi", "7"),     # non-num vs num
         ("g", "p:lo", "abc"), ("g", "p:hi", "abd")],  # string/string ok
        "subj string, pred string, obj string")
    shapes = [NodeShape("s", None,
                        (PropertyShape(path="p:lo", less_than="p:hi"),))]
    rep = {r["focus"] for r in validate_shapes(t, shapes).collect()}
    assert rep == {"e", "f"}


def test_shapes_from_json_new_keys(spark):
    from rdf_tabular_spark.operators.shacl import shapes_from_json
    shapes = shapes_from_json([
        {"shape_id": "s", "target_class": None,
         "properties": [{"path": "p", "has_value": "v",
                         "less_than": "q", "equals": "r"}]}])
    pr = shapes[0].properties[0]
    assert (pr.has_value, pr.less_than, pr.equals) == ("v", "q", "r")
