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


def test_prov_block(spark):
    """U9 provenance (reference: reader.rb:186-218; SPARQL ASK checks in
    spec/reader_spec.rb:125-158): activity with start/end times and
    qualified usages of the CSV and metadata files."""
    from rdf_tabular_spark.csvw.model import load_metadata
    from rdf_tabular_spark.pipeline import table_to_triples

    meta = load_metadata(os.path.join(DATA, "tree-ops.csv-metadata.json"),
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=resolver)
    df = table_to_triples(
        spark, meta, resolver,
        prov_times=("2024-01-01T00:00:00Z", "2024-01-01T00:00:05Z"),
        metadata_files=[BASE + "tree-ops.csv-metadata.json"])
    rows = [tuple(r) for r in df.collect()]
    preds = {r[1] for r in rows}
    PROV = "http://www.w3.org/ns/prov#"
    DCAT = "http://www.w3.org/ns/dcat#"
    assert PROV + "activity" in preds
    assert DCAT + "downloadURL" in preds
    starts = [r for r in rows if r[1] == PROV + "startedAtTime"]
    assert starts[0][2] == "2024-01-01T00:00:00Z"
    assert starts[0][4] == "http://www.w3.org/2001/XMLSchema#dateTime"
    usages = [r for r in rows if r[1] == PROV + "qualifiedUsage"]
    assert len(usages) == 2  # csv + metadata file
    roles = {r[2] for r in rows if r[1] == PROV + "hadRole"}
    assert roles == {"http://www.w3.org/ns/csvw#csvEncodedTabularData",
                     "http://www.w3.org/ns/csvw#tabularMetadata"}


def test_prov_ask_query(spark):
    """The reference validates its provenance with a SPARQL ASK
    (spec/reader_spec.rb:131-147: an Activity with dateTime-typed
    start/end and a qualifiedUsage whose hadRole is
    csvEncodedTabularData) — the same ASK runs here through
    operators/bgp.ask, with the DATATYPE() filter expressed as patterns
    over a reified datatype view (one extra (lexical, spark:datatype, dt)
    triple per typed literal)."""
    from rdf_tabular_spark.csvw.model import load_metadata
    from rdf_tabular_spark.operators.bgp import ask
    from rdf_tabular_spark.pipeline import table_to_triples

    meta = load_metadata(os.path.join(DATA, "tree-ops.csv-metadata.json"),
                         base=BASE + "tree-ops.csv-metadata.json",
                         resolver=resolver)
    df = table_to_triples(
        spark, meta, resolver,
        prov_times=("2024-01-01T00:00:00Z", "2024-01-01T00:00:05Z"),
        metadata_files=[BASE + "tree-ops.csv-metadata.json"])
    from pyspark.sql import functions as F
    t = df.select("subj", "pred", "obj").unionByName(
        df.filter(F.col("obj_datatype").isNotNull())
          .select(F.col("obj").alias("subj"),
                  F.lit("spark:datatype").alias("pred"),
                  F.col("obj_datatype").alias("obj")))
    PROV = "http://www.w3.org/ns/prov#"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
    CSVW = "http://www.w3.org/ns/csvw#"
    prov_ask = [
        ("?res", PROV + "activity", "?act"),
        ("?act", RDF_TYPE, PROV + "Activity"),
        ("?act", PROV + "startedAtTime", "?start"),
        ("?act", PROV + "endedAtTime", "?end"),
        ("?start", "spark:datatype", XSD_DT),
        ("?end", "spark:datatype", XSD_DT),
        ("?act", PROV + "qualifiedUsage", "?usage"),
        ("?usage", RDF_TYPE, PROV + "Usage"),
        ("?usage", PROV + "Entity", "?csv"),
        ("?usage", PROV + "hadRole", CSVW + "csvEncodedTabularData"),
    ]
    assert ask(t, prov_ask)
    # and the negative: no usage carries a bogus role
    assert not ask(t, prov_ask[:-1] + [
        ("?usage", PROV + "hadRole", CSVW + "noSuchRole")])


def test_validation_mode_errors_df(spark, tmp_path):
    """Data-level validate mode: cell errors as a DataFrame
    (reference: validate! + Cell#errors)."""
    from rdf_tabular_spark.csvw.model import load_metadata
    from rdf_tabular_spark.pipeline import validate_table

    csv = tmp_path / "t.csv"
    csv.write_text("id,n,flag\n1,12,true\n2,notanum,maybe\n,5,false\n")
    meta = {
        "url": "t.csv",
        "tableSchema": {"columns": [
            {"name": "id", "datatype": "integer", "required": True},
            {"name": "n", "datatype": "integer"},
            {"name": "flag", "datatype": "boolean"},
        ]},
        "dialect": {"header": True},
    }
    table = load_metadata(meta, base=str(csv))
    errs = validate_table(spark, table, resolver=lambda u: str(csv))
    rows = {(r["source_num"], r["column"]): r["error"] for r in errs.collect()}
    assert rows[(3, "n")] == "notanum is not a valid integer"
    assert rows[(3, "flag")] == "maybe is not a valid boolean"
    assert rows[(4, "id")] == "id is required"
    assert len(rows) == 3
