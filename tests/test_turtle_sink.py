"""Turtle sink round-trip: pipeline triples → .ttl part files → re-parsed
graph must be isomorphic to the input (P = R = 1.0), and the grouped form
must collapse each subject to one statement block."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rdf_tabular_spark.pipeline import csvw_to_triples
from rdf_tabular_spark.rdfio.compare import df_to_terms, triple_pr
from rdf_tabular_spark.rdfio.turtle import parse_turtle
from rdf_tabular_spark.sinks.turtle_sink import to_turtle_lines, write_turtle

DATA = "/root/reference/spec/data"
BASE = "http://example.org/"


def resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(DATA, url[len(BASE):])
    return url


def test_turtle_roundtrip_tree_ops(spark, tmp_path):
    df = csvw_to_triples(spark, DATA + "/tree-ops.csv-metadata.json",
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=resolver)
    out = str(tmp_path / "ttl")
    write_turtle(df, out)
    text = "\n".join(open(p).read()
                     for p in sorted(glob.glob(os.path.join(out, "part-*"))))
    reparsed = parse_turtle(text)
    pr = triple_pr(reparsed, df_to_terms(df.collect()))
    assert pr.precision == 1.0 and pr.recall == 1.0, (pr.missing, pr.extra)


def test_turtle_groups_subjects(spark):
    rows = [("http://s/1", "http://p/a", "x", False, None, None, None, 0),
            ("http://s/1", "http://p/b", "http://o", True, None, None, None, 0),
            ("http://s/2", "http://p/a", "hi\nthere", False, None, "en",
             None, 0)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string, table_url string, "
              "source_num long")
    lines = {r["line"] for r in to_turtle_lines(df).collect()}
    assert len(lines) == 2                      # one block per subject
    s1 = next(l for l in lines if l.startswith("<http://s/1>"))
    assert ' ;\n    ' in s1 and s1.endswith(" .")
    s2 = next(l for l in lines if l.startswith("<http://s/2>"))
    assert '"hi\\nthere"@en' in s2              # escaped + lang-tagged


def test_trig_groups_graphs(spark):
    from rdf_tabular_spark.sinks.turtle_sink import to_trig_lines
    rows = [("http://s/1", "http://p/a", "x", False, None, None,
             "http://g/1", 0),
            ("http://s/2", "http://p/a", "y", False, None, None,
             "http://g/1", 0),
            ("http://s/3", "http://p/a", "http://o", True, None, None,
             "http://g/2", 0),
            ("http://s/4", "http://p/a", "z", False, None, None, None, 0)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string, table_url string, "
              "source_num long")
    lines = {r["line"] for r in to_trig_lines(df).collect()}
    assert len(lines) == 3                      # g1, g2, default graph
    g1 = next(l for l in lines if l.startswith("<http://g/1> {"))
    # both subjects inside one braced block, sorted, each a full statement
    assert g1.index("<http://s/1>") < g1.index("<http://s/2>")
    assert g1.rstrip().endswith("}")
    default = next(l for l in lines if l.startswith("<http://s/4>"))
    assert "{" not in default and default.endswith(" .")


def test_trig_named_graph_content_reparses(spark, tmp_path):
    """The inside of each named-graph block is valid Turtle equal to that
    graph's triples (TriG = Turtle inside graph braces)."""
    import re as _re
    from rdf_tabular_spark.sinks.turtle_sink import write_trig
    df = csvw_to_triples(spark, DATA + "/tree-ops.csv-metadata.json",
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=resolver)
    df = df.withColumn("table_url", F.lit("http://g/tree-ops"))
    out = str(tmp_path / "trig")
    write_trig(df, out)
    text = "\n".join(open(p).read()
                     for p in sorted(glob.glob(os.path.join(out, "part-*"))))
    m = _re.match(r"<http://g/tree-ops> \{\n(.*)\n\}\s*$", text, _re.S)
    assert m, text[:200]
    reparsed = parse_turtle(m.group(1))
    pr = triple_pr(reparsed, df_to_terms(df.collect()))
    assert pr.precision == 1.0 and pr.recall == 1.0, (pr.missing, pr.extra)
