"""Turtle sink round-trip: pipeline triples → .ttl part files → re-parsed
graph must be isomorphic to the input (P = R = 1.0), and the grouped form
must collapse each subject to one statement block."""

from __future__ import annotations

import glob
import os

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
