"""JSON serialization goldens (reference: spec/reader_spec.rb:82-122).

NB: the reference repo's tree-ops-ext-standard.json is a stale duplicate of
the virtual fixture's output (its content lacks the ext columns dbh/comments/
protected/kml), so the ext JSON golden is skipped; the 5 self-consistent
goldens are asserted deep-equal.
"""

import json
import os

import pytest

from rdf_tabular_spark.sinks.json_rows import csvw_to_json
from rdf_tabular_spark.sinks.ntriples import to_ntriples_lines

DATA = "/root/reference/spec/data"
BASE = "http://example.org/"


def resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(DATA, url[len(BASE):])
    return url


def run_json(spark, source, expected_json, base):
    got = csvw_to_json(spark, os.path.join(DATA, source), base=BASE + base, resolver=resolver)
    with open(os.path.join(DATA, expected_json)) as f:
        expected = json.load(f)
    assert got == expected


def test_tree_ops_json(spark):
    run_json(spark, "tree-ops.csv-metadata.json", "tree-ops-standard.json", "tree-ops.csv-metadata.json")


def test_tree_ops_virtual_json(spark):
    run_json(spark, "tree-ops-virtual.json", "tree-ops-virtual-standard.json", "tree-ops-virtual.json")


def test_countries_json(spark):
    run_json(spark, "countries.json", "countries-standard.json", "countries.json")


def test_roles_json(spark):
    run_json(spark, "roles.json", "roles-standard.json", "roles.json")


def test_country_codes_json(spark):
    run_json(spark, "country-codes-and-names.csv", "country-codes-and-names-standard.json",
             "country-codes-and-names.csv")


def test_ntriples_roundtrip(spark):
    """Triples DF → N-Triples lines → parse back → same canonical set."""
    from rdf_tabular_spark.pipeline import csvw_to_triples
    from rdf_tabular_spark.rdfio.compare import df_to_terms, triple_pr
    from rdf_tabular_spark.rdfio.turtle import parse_turtle

    df = csvw_to_triples(spark, os.path.join(DATA, "tree-ops.csv-metadata.json"),
                         base=BASE + "tree-ops.csv-metadata.json", resolver=resolver)
    lines = [r["line"] for r in to_ntriples_lines(df).collect()]
    assert all(l.endswith(" .") for l in lines)
    reparsed = parse_turtle("\n".join(lines))
    pr = triple_pr(reparsed, df_to_terms(df.collect()))
    assert pr.precision == 1.0 and pr.recall == 1.0


def test_atd_sink_structure(spark):
    """S8 ATD serialization (reference: reader.rb:387-448; the repo's
    tree-ops-atd.json golden is an empty placeholder, so the shape is
    asserted structurally against the to_atd contracts)."""
    from rdf_tabular_spark.sinks.atd import csvw_to_atd
    atd = csvw_to_atd(spark, os.path.join(DATA, "tree-ops.csv-metadata.json"),
                      base=BASE + "tree-ops.csv-metadata.json", resolver=resolver)
    assert atd["@type"] == "AnnotatedTable"
    assert atd["url"].endswith("tree-ops.csv")
    assert [c["name"] for c in atd["columns"]] == \
        ["GID", "on_street", "species", "trim_cycle", "inventory_date"]
    assert len(atd["rows"]) == 3
    row1 = atd["rows"][0]
    assert row1["number"] == 1 and row1["sourceNumber"] == 2
    assert row1["cells"][0]["stringValue"] == "1"
    # each column's cell registry references every row's cell ids
    assert len(atd["columns"][0]["cells"]) == 3
    assert row1["cells"][0]["@id"] in atd["columns"][0]["cells"]
