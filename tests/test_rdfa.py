"""RDFa-lite extraction: parser semantics (vocab/prefix/typeof/property,
both tokenizer front-ends), the Arrow source, the triple face, and fused-
kernel parity."""

import pytest

from rdf_tabular_spark.sources.html_extract import extract_page

RDFA_PAGE = """<html><body>
<div vocab="http://schema.org/" prefix="ex: http://ex.org/ns#"
     typeof="Article" resource="#art-1">
  <span property="name">Doc One</span>
  <a property="inLanguage" href="http://lang.example.org/en">english</a>
  <meta property="wordCount" content="128">
  <b property="ex:rank" content="3"></b>
</div>
<div typeof="Person Teacher">
  <span property="name">Ada</span>
</div>
</body></html>"""


def _props(page):
    return {it.subject: (it.types, dict(it.props)) for it in page.rdfa}


def test_rdfa_parser_semantics():
    out = _props(extract_page(RDFA_PAGE))
    types, props = out["#art-1"]
    assert types == "http://schema.org/Article"
    assert props["http://schema.org/name"] == "Doc One"       # text content
    assert props["http://schema.org/inLanguage"] == \
        "http://lang.example.org/en"                          # href value
    assert props["http://schema.org/wordCount"] == "128"      # content attr
    assert props["http://ex.org/ns#rank"] == "3"              # CURIE prefix
    # second scope: blank-node subject, multi-token typeof, vocab persists
    types2, props2 = out["_:rdfa1"]
    assert types2 == "http://schema.org/Person http://schema.org/Teacher"
    assert props2["http://schema.org/name"] == "Ada"


def test_rdfa_fast_and_slow_parsers_agree():
    # a comment forces the html.parser fallback; output must be identical
    slow = extract_page("<!-- c -->" + RDFA_PAGE)
    fast = extract_page(RDFA_PAGE)
    assert _props(slow) == _props(fast)
    assert slow.text == fast.text


def test_rdfa_no_vocab_keeps_bare_terms():
    p = extract_page('<div typeof="Thing"><i property="x">v</i></div>')
    assert _props(p) == {"_:rdfa0": ("Thing", {"x": "v"})}


def test_rdfa_triple_face_and_fused_parity(spark):
    from pyspark.sql import functions as F

    from rdf_tabular_spark.web import pages_to_combined_triples, rdfa_to_triples
    pages = spark.createDataFrame(
        [("http://x.org/p1", RDFA_PAGE.encode())], "url string, html binary")
    single = rdfa_to_triples(pages)
    rows = {(r["subj"], r["pred"], r["obj"], r["obj_is_iri"])
            for r in single.collect()}
    # fragment subject resolved against the url
    assert ("http://x.org/p1#art-1",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://schema.org/Article", True) in rows
    assert ("http://x.org/p1#art-1", "http://schema.org/inLanguage",
            "http://lang.example.org/en", True) in rows
    assert ("http://x.org/p1#art-1", "http://schema.org/wordCount",
            "128", False) in rows
    # skolemized blank subject is url-scoped and deterministic
    blanks = {s for s, _, _, _ in rows if s.startswith("_:")}
    assert len(blanks) == 1 and next(iter(blanks)).startswith("_:ra-")
    # two type triples from the multi-token typeof
    assert sum(1 for _, p, _, _ in rows if p.endswith("#type")) == 3
    # fused kernel emits the identical RDFa triple set (page has no
    # tables/microdata/jsonld, so combined == rdfa facet)
    fused = pages_to_combined_triples(pages, minimal=True)
    frows = {(r["subj"], r["pred"], r["obj"], r["obj_is_iri"])
             for r in fused.select("subj", "pred", "obj", "obj_is_iri")
             .collect()}
    assert frows == rows
