"""JSON-LD script-block extraction (stage 1d): parser capture on both
front-ends, expander subset semantics, and the Spark emitter end-to-end."""

import json

import pytest

from rdf_tabular_spark.sources.html_extract import extract_page
from rdf_tabular_spark.sources.jsonld import RDF_TYPE, XSD, expand_jsonld

URL = "http://ex.org/page/1"


def _wrap(body: str, extra: str = "") -> str:
    return (f"<html><head><title>t</title>"
            f'<script type="application/ld+json">{body}</script>{extra}'
            f"</head><body><p>visible</p></body></html>")


def test_parser_captures_block_both_frontends():
    body = json.dumps({"@context": "http://schema.org/", "name": "x"})
    fast = extract_page(_wrap(body))
    slow = extract_page("<!-- force html.parser -->" + _wrap(body))
    assert fast.jsonld == slow.jsonld == [body]
    # block content never leaks into visible text (script/head are skipped)
    assert fast.text == slow.text == "visible"


def test_parser_multiple_blocks_in_order():
    pc = extract_page(_wrap('{"a": 1}',
                            '<script type="application/ld+json">'
                            '{"b": 2}</script>'))
    assert pc.jsonld == ['{"a": 1}', '{"b": 2}']


def test_parser_ignores_other_script_types():
    pc = extract_page('<html><head><script>var x = 1;</script>'
                      '<script type="text/javascript">{"no": 1}</script>'
                      "</head><body>hi</body></html>")
    assert pc.jsonld == []


def test_expand_basic_node_with_vocab_context():
    t = expand_jsonld(json.dumps({
        "@context": "http://schema.org",          # no trailing slash
        "@id": "#art", "@type": "Article",
        "headline": "h", "wordCount": 7, "free": True, "score": 1.5,
    }), URL)
    got = set(t)
    assert (f"{URL}#art", RDF_TYPE, "http://schema.org/Article",
            True, None, None) in got
    assert (f"{URL}#art", "http://schema.org/headline", "h",
            False, None, None) in got
    assert (f"{URL}#art", "http://schema.org/wordCount", "7",
            False, XSD + "integer", None) in got
    assert (f"{URL}#art", "http://schema.org/free", "true",
            False, XSD + "boolean", None) in got
    assert (f"{URL}#art", "http://schema.org/score", "1.5",
            False, XSD + "double", None) in got


def test_expand_nested_node_gets_deterministic_bnode():
    body = json.dumps({"@context": "http://schema.org/",
                       "author": {"name": "a"}})
    t1, t2 = expand_jsonld(body, URL), expand_jsonld(body, URL)
    assert t1 == t2
    edge = [x for x in t1 if x[1].endswith("author")][0]
    assert edge[2].startswith("_:jl-") and edge[3] is True
    assert (edge[2], "http://schema.org/name", "a",
            False, None, None) in t1


def test_expand_graph_prefix_language_and_id_object():
    t = expand_jsonld(json.dumps({
        "@context": {"ex": "http://ex.org/v#", "@vocab": "http://v.org/",
                     "@language": "de"},
        "@graph": [
            {"@id": "http://a.org/x", "ex:p": "s",
             "rel": {"@id": "other"},
             "lit": {"@value": "5", "@type": "ex:t"},
             "tagged": {"@value": "w", "@language": "en"}},
        ],
    }), URL)
    got = set(t)
    assert ("http://a.org/x", "http://ex.org/v#p", "s",
            False, None, "de") in got            # context default language
    assert ("http://a.org/x", "http://v.org/rel", f"{URL.rsplit('/', 1)[0]}/other",
            True, None, None) in got             # relative @id resolves
    assert ("http://a.org/x", "http://v.org/lit", "5",
            False, "http://ex.org/v#t", None) in got  # prefixed @type expands
    assert ("http://a.org/x", "http://v.org/tagged", "w",
            False, None, "en") in got            # explicit @language wins


def test_expand_array_values_and_type_list():
    t = expand_jsonld(json.dumps({
        "@context": "http://s.org/", "@id": "#n",
        "@type": ["A", "B"], "k": ["x", 2],
    }), URL)
    got = set(t)
    assert (f"{URL}#n", RDF_TYPE, "http://s.org/A", True, None, None) in got
    assert (f"{URL}#n", RDF_TYPE, "http://s.org/B", True, None, None) in got
    assert (f"{URL}#n", "http://s.org/k", "x", False, None, None) in got
    assert (f"{URL}#n", "http://s.org/k", "2",
            False, XSD + "integer", None) in got


def test_expand_vocabless_falls_back_to_page_local():
    t = expand_jsonld(json.dumps({"@id": "#n", "p": "v"}), URL)
    assert t == [(f"{URL}#n", f"{URL}#p", "v", False, None, None)]


@pytest.mark.parametrize("bad", [
    "{not json", "42", '"just a string"', "[1, 2]", "null", "",
])
def test_expand_malformed_or_scalar_roots_yield_nothing(bad):
    assert expand_jsonld(bad, URL) == []


def test_expand_null_values_skipped():
    t = expand_jsonld(json.dumps({"@context": "http://s.org/",
                                  "@id": "#n", "p": None, "q": "x"}), URL)
    assert [x[1] for x in t] == ["http://s.org/q"]


def test_pages_to_jsonld_triples_end_to_end(spark):
    from rdf_tabular_spark.web import pages_to_jsonld_triples
    body = json.dumps({"@context": "http://schema.org/", "@id": "#jld",
                       "@type": "Article", "headline": "h"})
    html = _wrap(body).encode()
    pages = spark.createDataFrame(
        [(URL, html), ("http://ex.org/empty", b"<html><body>x</body></html>")],
        "url string, html binary")
    got = {(r.subj, r.pred, r.obj, r.obj_is_iri, r.table_url, r.source_num)
           for r in pages_to_jsonld_triples(pages).collect()}
    assert got == {
        (f"{URL}#jld", RDF_TYPE, "http://schema.org/Article", True, URL, -1),
        (f"{URL}#jld", "http://schema.org/headline", "h", False, URL, -1),
    }


def test_pages_to_jsonld_plan_is_narrow(spark):
    from rdf_tabular_spark.web import pages_to_jsonld_triples
    pages = spark.createDataFrame([(URL, b"<html></html>")],
                                  "url string, html binary")
    plan = pages_to_jsonld_triples(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_expand_null_or_object_at_value_emits_nothing():
    t = expand_jsonld(json.dumps({"@context": "http://s.org/", "@id": "#n",
                                  "p": {"@value": None},
                                  "q": {"@value": {"a": 1}},
                                  "r": {"@value": [1]},
                                  "ok": {"@value": "v"}}), URL)
    assert [(x[1], x[2]) for x in t] == [("http://s.org/ok", "v")]


def test_parser_mime_params_and_case():
    body = '{"a": 1}'
    for stype in ("application/ld+json; charset=utf-8",
                  "APPLICATION/LD+JSON", "Application/Ld+Json ;x=y"):
        pc = extract_page(f'<html><head><script type="{stype}">{body}'
                          "</script></head><body>x</body></html>")
        assert pc.jsonld == [body], stype
