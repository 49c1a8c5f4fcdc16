"""Distributed Turtle source (sources/turtle_source.py): per-file Arrow
kernel over a binaryFile scan. write_turtle → read_turtle must be
isomorphic (P = R = 1.0), bnode labels must be file-scoped, and bad
documents must be skipped/reported, not fatal."""

from __future__ import annotations

import os

from rdf_tabular_spark.pipeline import csvw_to_triples
from rdf_tabular_spark.rdfio.compare import df_to_terms, triple_pr
from rdf_tabular_spark.sinks.turtle_sink import write_turtle
from rdf_tabular_spark.sources.turtle_source import (read_turtle,
                                                     read_turtle_errors)

DATA = "/root/reference/spec/data"
BASE = "http://example.org/"


def _resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(DATA, url[len(BASE):])
    return url


def test_read_turtle_roundtrip_pipeline_output(spark, tmp_path):
    df = csvw_to_triples(spark, DATA + "/tree-ops.csv-metadata.json",
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=_resolver)
    out = str(tmp_path / "ttl")
    write_turtle(df, out)
    back = read_turtle(spark, out)
    pr = triple_pr(df_to_terms(back.collect()), df_to_terms(df.collect()))
    assert pr.precision == 1.0 and pr.recall == 1.0, (pr.missing, pr.extra)
    # lineage: every row carries its source file
    assert back.filter("table_url is null").count() == 0


def test_read_turtle_literal_fidelity(spark, tmp_path):
    p = tmp_path / "lit.ttl"
    p.write_text(
        '<http://s> <http://p> "caf\\u00e9"@fr .\n'
        '<http://s> <http://q> '
        '"7"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<http://s> <http://r> "plain" .\n')
    rows = {(r.pred, r.obj, r.obj_is_iri, r.obj_datatype, r.obj_lang)
            for r in read_turtle(spark, str(p)).collect()}
    assert rows == {
        ("http://p", "café", False, None, "fr"),
        ("http://q", "7", False,
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://r", "plain", False, None, None)}


def test_read_turtle_prefixes_and_groups(spark, tmp_path):
    p = tmp_path / "pfx.ttl"
    p.write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:s a ex:Doc ;\n    ex:name \"n1\", \"n2\" .\n")
    rows = {(r.subj, r.pred, r.obj)
            for r in read_turtle(spark, str(p)).collect()}
    assert rows == {
        ("http://ex.org/s",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex.org/Doc"),
        ("http://ex.org/s", "http://ex.org/name", "n1"),
        ("http://ex.org/s", "http://ex.org/name", "n2")}


def test_read_turtle_bnode_labels_are_file_scoped(spark, tmp_path):
    # the same label in two documents is two distinct RDF nodes
    (tmp_path / "a.ttl").write_text('_:b0 <http://p> "x" .\n')
    (tmp_path / "b.ttl").write_text('_:b0 <http://p> "x" .\n')
    df = read_turtle(spark, str(tmp_path))
    subjects = {r.subj for r in df.collect()}
    assert len(subjects) == 2
    assert all(s.startswith("_:f") for s in subjects)
    # deterministic per file: a re-read maps labels identically
    assert {r.subj for r in read_turtle(spark, str(tmp_path)).collect()} \
        == subjects


def test_read_turtle_skips_bad_file_and_reports(spark, tmp_path):
    (tmp_path / "good.ttl").write_text('<http://s> <http://p> "ok" .\n')
    (tmp_path / "bad.ttl").write_text('<http://s> <http://p "unclosed .\n')
    df = read_turtle(spark, str(tmp_path))
    assert [r.obj for r in df.collect()] == ["ok"]
    errs = read_turtle_errors(spark, str(tmp_path)).collect()
    assert len(errs) == 1 and errs[0].file.endswith("bad.ttl")
    import pytest
    with pytest.raises(Exception):
        read_turtle(spark, str(tmp_path), strict=True).collect()


def test_read_trig_roundtrip_with_graph_provenance(spark, tmp_path):
    """write_trig → read_trig: triples isomorphic AND the named-graph
    label (table_url provenance) survives the round-trip."""
    from pyspark.sql import functions as F
    from rdf_tabular_spark.sinks.turtle_sink import write_trig
    from rdf_tabular_spark.sources.turtle_source import read_trig

    df = csvw_to_triples(spark, DATA + "/tree-ops.csv-metadata.json",
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=_resolver) \
        .withColumn("table_url", F.lit("http://g/tree-ops"))
    out = str(tmp_path / "trig")
    write_trig(df, out)
    back = read_trig(spark, out)
    pr = triple_pr(df_to_terms(back.collect()), df_to_terms(df.collect()))
    assert pr.precision == 1.0 and pr.recall == 1.0, (pr.missing, pr.extra)
    assert (back.select("table_url").distinct().collect()
            == [("http://g/tree-ops",)])


def test_read_trig_mixed_graphs_and_default(spark, tmp_path):
    """GRAPH keyword, bare braces, and top-level statements all parse;
    default-graph rows fall back to the file path (read_turtle parity)."""
    from rdf_tabular_spark.sources.turtle_source import read_trig
    doc = tmp_path / "m.trig"
    doc.write_text(
        '@prefix ex: <http://ex.org/> .\n'
        '<http://g/1> { ex:s ex:p "v" ; ex:q <http://o> . }\n'
        'GRAPH <http://g/2> { ex:u ex:p "x"@en }\n'
        'ex:top ex:p "default" .\n'
        '{ ex:d ex:p "42"^^<http://www.w3.org/2001/XMLSchema#integer> . }\n')
    rows = read_trig(spark, str(doc)).collect()
    by_graph = {}
    for r in rows:
        by_graph.setdefault(r["table_url"], []).append(r)
    assert len(by_graph["http://g/1"]) == 2
    g2 = by_graph["http://g/2"][0]
    assert g2["obj"] == "x" and g2["obj_lang"] == "en"
    default = by_graph[next(k for k in by_graph if k.endswith("m.trig"))]
    objs = {r["obj"] for r in default}
    assert objs == {"default", "42"}
    dtypes = {r["obj_datatype"] for r in default}
    assert "http://www.w3.org/2001/XMLSchema#integer" in dtypes


def test_trig_roundtrip_fuzz(spark, tmp_path):
    """Deterministic fuzz: 60 generated statements across escapes, langs,
    datatypes, IRI objects, and three graphs must survive
    write_trig → read_trig exactly (term identity, graph included)."""
    import hashlib
    from rdf_tabular_spark.sinks.turtle_sink import write_trig
    from rdf_tabular_spark.sources.turtle_source import read_trig

    def h(i, salt):
        return hashlib.md5(f"{salt}:{i}".encode()).hexdigest()

    rows = []
    nasty = ['plain', 'quote " inside', 'back\\slash', 'tab\there',
             'new\nline', 'cr\rreturn', 'unicode héllo 漢字', '']
    for i in range(60):
        subj = f"http://ex.org/s/{h(i, 's')[:6]}"
        pred = f"http://ex.org/p/{i % 5}"
        graph = f"http://g/{i % 3}"
        if i % 4 == 0:
            rows.append((subj, pred, f"http://o/{h(i, 'o')[:6]}", True,
                         None, None, graph, 0))
        elif i % 4 == 1:
            rows.append((subj, pred, nasty[i % len(nasty)], False,
                         None, None, graph, 0))
        elif i % 4 == 2:
            rows.append((subj, pred, str(i * 7), False,
                         "http://www.w3.org/2001/XMLSchema#integer",
                         None, graph, 0))
        else:
            rows.append((subj, pred, nasty[i % len(nasty)], False,
                         None, ("en" if i % 2 else "fr-CA"), graph, 0))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string, table_url string, "
              "source_num long")
    out = str(tmp_path / "fuzz")
    write_trig(df, out)
    back = read_trig(spark, out, strict=True)
    key = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang",
           "table_url"]
    got = sorted(map(tuple, back.select(*key).collect()))
    want = sorted(map(tuple, df.select(*key).distinct().collect()))
    assert got == want
