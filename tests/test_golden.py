"""Golden end-to-end tests: pipeline triples vs reference fixture Turtle
(reference: spec/reader_spec.rb:50-80; P/R gate per BASELINE.json ≥ 0.95,
we assert exact set equality after bnode canonicalization)."""

import os

import pytest

from rdf_tabular_spark.pipeline import csvw_to_triples
from rdf_tabular_spark.rdfio.compare import df_to_terms, triple_pr
from rdf_tabular_spark.rdfio.turtle import parse_turtle_file

DATA = "/root/reference/spec/data"
BASE = "http://example.org/"


def resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(DATA, url[len(BASE):])
    return url


def run_fixture(spark, source, expected_ttl, base="", minimal=False, min_pr=1.0):
    df = csvw_to_triples(spark, source, base=base, resolver=resolver, minimal=minimal)
    ours = df_to_terms(df.collect())
    expected = parse_turtle_file(os.path.join(DATA, expected_ttl))
    pr = triple_pr(ours, expected)
    assert pr.precision >= min_pr and pr.recall >= min_pr, (
        f"P={pr.precision:.3f} R={pr.recall:.3f} ours={pr.n_ours} exp={pr.n_expected}\n"
        f"missing={pr.missing}\nextra={pr.extra}"
    )
    return pr


def test_tree_ops_minimal(spark):
    """Cell triples only — the v0 vertical slice."""
    df = csvw_to_triples(
        spark, os.path.join(DATA, "tree-ops.csv-metadata.json"),
        base=BASE + "tree-ops.csv-metadata.json", resolver=resolver, minimal=True)
    ours = df_to_terms(df.collect())
    expected = [t for t in parse_turtle_file(os.path.join(DATA, "tree-ops-standard.ttl"))
                if not t[1].value.startswith("http://www.w3.org/ns/csvw#")
                and t[0].kind != "bnode"]
    pr = triple_pr(ours, expected)
    assert pr.recall == 1.0, f"missing={pr.missing}"


def test_tree_ops_standard(spark):
    run_fixture(spark, os.path.join(DATA, "tree-ops.csv-metadata.json"),
                "tree-ops-standard.ttl", base=BASE + "tree-ops.csv-metadata.json")


def test_tree_ops_ext_standard(spark):
    run_fixture(spark, os.path.join(DATA, "tree-ops-ext.json"),
                "tree-ops-ext-standard.ttl", base=BASE + "tree-ops-ext.json")


def test_tree_ops_virtual_standard(spark):
    run_fixture(spark, os.path.join(DATA, "tree-ops-virtual.json"),
                "tree-ops-virtual-standard.ttl", base=BASE + "tree-ops-virtual.json")


def test_countries_standard(spark):
    run_fixture(spark, os.path.join(DATA, "countries.json"),
                "countries-standard.ttl", base=BASE + "countries.json")


def test_roles_standard(spark):
    run_fixture(spark, os.path.join(DATA, "roles.json"),
                "roles-standard.ttl", base=BASE + "roles.json")


def test_country_codes_standard(spark):
    """Metadata-less CSV: embedded header only."""
    run_fixture(spark, os.path.join(DATA, "country-codes-and-names.csv"),
                "country-codes-and-names-standard.ttl",
                base=BASE + "country-codes-and-names.csv")


def test_tree_ops_discovered_metadata(spark):
    """S3 discovery: opening the CSV finds {url}-metadata.json and produces
    the standard output (reference: Metadata.for_input, metadata.rb:139-194)."""
    run_fixture(spark, os.path.join(DATA, "tree-ops.csv"),
                "tree-ops-standard.ttl", base=BASE + "tree-ops.csv")
