"""N-Triples source: write_ntriples → read_ntriples round trip must be the
identity on the logical triple columns, and malformed lines must degrade to
an error view, not a job abort."""

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.sinks.ntriples import write_ntriples
from rdf_tabular_spark.sources.ntriples_source import (parse_ntriples_line,
                                                       read_ntriples,
                                                       read_ntriples_errors)

LOGICAL = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]


def _triples_df(spark):
    rows = [
        ("http://e/s1", "http://e/p", "plain value", False, None, None),
        ("http://e/s1", "http://e/p", 'tricky "q" \\ and\nnewline\ttab',
         False, None, None),
        ("http://e/s2", "http://e/p", "42", False,
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://e/s2", "http://e/lang", "bonjour", False, None, "fr"),
        ("_:b0", "http://e/p", "http://e/o", True, None, None),
        ("http://e/s3", "http://e/p", "_:b1", True, None, None),
        ("http://e/s3", "http://e/u", "ünïcodé ☃", False, None, None),
    ]
    return spark.createDataFrame(
        [r + (None, 0) for r in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string, table_url string, "
        "source_num long")


def test_round_trip_identity(spark, tmp_path):
    src = _triples_df(spark)
    out = str(tmp_path / "nt")
    write_ntriples(src, out)
    back = read_ntriples(spark, out)
    a = sorted(tuple(r) for r in src.select(*LOGICAL).collect())
    b = sorted(tuple(r) for r in back.select(*LOGICAL).collect())
    assert a == b


def test_comments_and_blanks_skipped(spark, tmp_path):
    p = tmp_path / "x.nt"
    p.write_text("# a comment\n\n<http://e/s> <http://e/p> \"v\" .\n")
    rows = read_ntriples(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0]["obj"] == "v"


def test_malformed_lines_skip_and_report(spark, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text('<http://e/s> <http://e/p> "ok" .\n'
                 "this is not a statement\n"
                 '"literal subject" <http://e/p> <http://e/o> .\n')
    good = read_ntriples(spark, str(p)).collect()
    assert len(good) == 1
    errs = read_ntriples_errors(spark, str(p)).collect()
    assert len(errs) == 2
    with pytest.raises(Exception):
        read_ntriples(spark, str(p), strict=True).collect()


def test_unicode_escapes():
    t = parse_ntriples_line(
        '<http://e/s> <http://e/p> "\\u00e9 and \\U0001F600" .')
    assert t[2] == "é and 😀"


def test_nquads_round_trip_with_graphs(spark, tmp_path):
    """write_nquads → read_nquads is identity on the logical columns PLUS
    the graph label (table_url); NULL graph serializes as a 3-term
    default-graph statement."""
    from rdf_tabular_spark.sinks.ntriples import write_nquads
    from rdf_tabular_spark.sources.ntriples_source import read_nquads
    src = _triples_df(spark).withColumn(
        "table_url",
        F.when(F.col("subj") == "http://e/s1", F.lit("http://g/one"))
        .when(F.col("subj") == "_:b0", F.lit("_:gb")))
    out = str(tmp_path / "nq")
    write_nquads(src, out)
    back = read_nquads(spark, out)
    cols = LOGICAL + ["table_url"]
    a = sorted(tuple(r) for r in src.select(*cols).collect())
    b = sorted(tuple(r) for r in back.select(*cols).collect())
    assert a == b


def test_parse_nquads_line_forms():
    from rdf_tabular_spark.sources.ntriples_source import parse_nquads_line
    t = parse_nquads_line('<http://s> <http://p> "v"@en <http://g> .')
    assert t == ("http://s", "http://p", "v", False, None, "en", "http://g")
    t2 = parse_nquads_line("<http://s> <http://p> <http://o> .")
    assert t2[6] is None
    t3 = parse_nquads_line("_:b <http://p> <http://o> _:g .")
    assert t3[0] == "_:b" and t3[6] == "_:g"
    assert parse_nquads_line("# comment") is None
    with pytest.raises(ValueError):
        parse_nquads_line('<http://s> <http://p> "v" "g" .')


def test_nquads_import_graph_queryable(spark, tmp_path):
    """jobs/import_rdf --format nq: imported named graphs answer
    GRAPH ?g patterns through the SPARQL front-end (graph = table_url)."""
    from rdf_tabular_spark.jobs.import_rdf import main as import_main
    from rdf_tabular_spark.jobs.query import main as query_main
    nq = tmp_path / "in.nq"
    nq.write_text(
        '<http://e/a> <http://e/p> <http://e/b> <http://g/1> .\n'
        '<http://e/c> <http://e/p> <http://e/d> <http://g/2> .\n'
        '<http://e/e> <http://e/p> <http://e/f> .\n')
    root = str(tmp_path / "store")
    m = import_main(["--in", str(nq), "--format", "nq",
                     "--store", root, "--batch-id", "b1"])
    assert m["n_triples"] == 3
    res = query_main(["--store", root, "--sparql",
                      "SELECT ?g ?s WHERE { GRAPH ?g "
                      "{ ?s <http://e/p> ?o } } ORDER BY ?g"])
    gs = [(r["g"], r["s"]) for r in res["sample"] if r["g"] is not None]
    assert gs == [("http://g/1", "http://e/a"), ("http://g/2", "http://e/c")]
