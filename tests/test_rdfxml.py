"""RDF/XML sink + source: well-formedness, escaping, round-trip through
disk, QName validation, typed-node/subset handling, and job wiring."""

import glob
import os
import xml.etree.ElementTree as ET

import pytest

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _triples_df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string, table_url string, "
              "source_num long")


ROWS = [
    ("http://x.org/a", "http://schema.org/name", 'T<o&m> "Q"', False,
     None, None, "u", 0),
    ("http://x.org/a", "http://schema.org/knows", "http://x.org/b", True,
     None, None, "u", 0),
    ("http://x.org/a", "http://schema.org/age", "41", False,
     "http://www.w3.org/2001/XMLSchema#integer", None, "u", 0),
    ("http://x.org/a", "http://schema.org/motto", "salut", False,
     None, "fr", "u", 0),
    ("_:b1", "http://schema.org/name", "Blank", False, None, None, "u", 0),
    ("http://x.org/a", "http://schema.org/friend", "_:b1", True,
     None, None, "u", 0),
]


def test_rdfxml_blocks_well_formed_and_escaped(spark):
    from rdf_tabular_spark.sinks.rdfxml import _FOOTER, _HEADER, to_rdfxml_blocks
    blocks = [r["block"] for r in to_rdfxml_blocks(
        _triples_df(spark, ROWS)).collect()]
    doc = _HEADER + "\n" + "\n".join(blocks) + "\n" + _FOOTER
    root = ET.fromstring(doc)            # must parse as XML
    descs = list(root)
    assert len(descs) == 2               # two subjects
    by_about = {d.get(f"{{{RDF}}}about") or "_:" + d.get(f"{{{RDF}}}nodeID"):
                d for d in descs}
    a = by_about["http://x.org/a"]
    vals = {(_el_pred(p)): p for p in a}
    assert vals["http://schema.org/name"].text == 'T<o&m> "Q"'
    assert vals["http://schema.org/knows"].get(f"{{{RDF}}}resource") == \
        "http://x.org/b"
    assert vals["http://schema.org/age"].get(f"{{{RDF}}}datatype") \
        .endswith("#integer")
    assert vals["http://schema.org/motto"].get(
        "{http://www.w3.org/XML/1998/namespace}lang") == "fr"
    assert vals["http://schema.org/friend"].get(f"{{{RDF}}}nodeID") == "b1"


def _el_pred(el):
    tag = el.tag
    ns, local = tag[1:].split("}", 1)
    return ns + local


def test_rdfxml_rejects_unqnameable_predicate(spark):
    from rdf_tabular_spark.sinks.rdfxml import write_rdfxml
    bad = _triples_df(spark, [
        ("http://x.org/a", "http://x.org/p/", "v", False, None, None, "u", 0)])
    with pytest.raises(ValueError, match="QName"):
        write_rdfxml(bad, "/tmp/never-written")


def test_rdfxml_roundtrip_through_disk(spark, tmp_path):
    from rdf_tabular_spark.sinks.rdfxml import write_rdfxml
    from rdf_tabular_spark.sources.rdfxml_source import read_rdfxml
    out = str(tmp_path / "g.rdf")
    df = _triples_df(spark, ROWS)
    write_rdfxml(df, out)
    # every part file is a standalone well-formed document
    parts = [p for p in glob.glob(os.path.join(out, "part-*"))]
    assert parts
    for p in parts:
        ET.parse(p)
    back = read_rdfxml(spark, out)
    orig = {(r[0], r[1], r[2], r[3], r[4], r[5])
            for r in df.collect()}
    got = {(r["subj"], r["pred"], r["obj"], r["obj_is_iri"],
            r["obj_datatype"], r["obj_lang"]) for r in back.collect()}
    # blank labels are rewritten file-scoped on read; compare modulo labels
    def canon(s):
        return {(("_:B" if a.startswith("_:") else a), b,
                 ("_:B" if d and c.startswith("_:") else c), d, e, f)
                for a, b, c, d, e, f in s}
    assert canon(got) == canon(orig)
    assert back.count() == len(ROWS)


def test_rdfxml_typed_node_and_errors_view(spark, tmp_path):
    from rdf_tabular_spark.sources.rdfxml_source import (read_rdfxml,
                                                         read_rdfxml_errors)
    good = tmp_path / "good.rdf"
    good.write_text(
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:s="http://schema.org/">'
        f'<s:Person rdf:about="http://x.org/p"><s:name>Ada</s:name>'
        f'</s:Person></rdf:RDF>')
    bad = tmp_path / "bad.rdf"
    bad.write_text("<not-rdf/>")
    rows = {(r["subj"], r["pred"], r["obj"])
            for r in read_rdfxml(spark, str(tmp_path / "*.rdf")).collect()}
    assert ("http://x.org/p", RDF + "type", "http://schema.org/Person") in rows
    assert ("http://x.org/p", "http://schema.org/name", "Ada") in rows
    errs = read_rdfxml_errors(spark, str(tmp_path / "*.rdf")).collect()
    assert len(errs) == 1 and "rdf:RDF" in errs[0]["error"]
    with pytest.raises(Exception):
        read_rdfxml(spark, str(tmp_path / "*.rdf"), strict=True).collect()


def test_rdfxml_rejects_dtd_documents(spark, tmp_path):
    """Entity-expansion hardening (r5 advice): a document declaring a DTD
    is rejected BEFORE parsing (billion-laughs defense) and lands in the
    errors view; entities never expand into triples."""
    from rdf_tabular_spark.sources.rdfxml_source import (read_rdfxml,
                                                         read_rdfxml_errors)
    evil = tmp_path / "evil.rdf"
    evil.write_text(
        '<?xml version="1.0"?><!DOCTYPE rdf [<!ENTITY a "aaaaaaaa">'
        '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;">]>'
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:s="http://schema.org/">'
        '<s:Person rdf:about="http://x.org/p"><s:name>&b;</s:name>'
        '</s:Person></rdf:RDF>')
    assert read_rdfxml(spark, str(evil)).count() == 0
    errs = read_rdfxml_errors(spark, str(evil)).collect()
    assert len(errs) == 1 and "DTD" in errs[0]["error"]


def test_export_import_job_rdfxml(spark, tmp_path):
    """store → export --format rdfxml → import → identical statement set."""
    from rdf_tabular_spark.jobs.export import main as export_main
    from rdf_tabular_spark.jobs.extract import main as extract_main
    from rdf_tabular_spark.jobs.import_rdf import main as import_main
    from rdf_tabular_spark.sinks.graph_store import read_graph
    store = str(tmp_path / "store")
    extract_main(["--synth", "20", "--out", store, "--batch-id", "b1",
                  "--no-canonicalize"])
    out = str(tmp_path / "export-rdfxml")
    export_main(["--store", store, "--format", "rdfxml", "--out", out])
    store2 = str(tmp_path / "store2")
    import_main(["--in", out, "--format", "rdfxml", "--store", store2,
                 "--batch-id", "i1"])
    def rows_of(st):
        return [(r["subj"], r["pred"], r["obj"]) for r in
                read_graph(spark, st).select("subj", "pred", "obj")
                .collect()]

    def canon(rows):
        # blank labels are file-scoped-rewritten on import by design;
        # compare structure modulo labels
        def b(t):
            return "_:B" if t.startswith("_:") else t
        return sorted((b(s), p, b(o)) for s, p, o in rows)

    a, b2 = rows_of(store), rows_of(store2)
    assert canon(a) == canon(b2) and len(a) > 0


def test_convert_cli_rdfxml(tmp_path):
    """csvw -> rdfxml through the convert CLI: parseable parts, right
    triple count in the summary."""
    import json as _json

    from rdf_tabular_spark.jobs.convert import main as convert_main
    src = tmp_path / "d.csv"
    src.write_text("id,name\n1,alice\n2,bob\n")
    meta = tmp_path / "d.csv-metadata.json"
    meta.write_text(_json.dumps({
        "@context": "http://www.w3.org/ns/csvw", "url": str(src),
        "tableSchema": {"aboutUrl": "http://example.org/p/{id}",
                        "columns": [{"name": "id", "titles": "id"},
                                    {"name": "name", "titles": "name"}]}}))
    out = str(tmp_path / "out-rdfxml")
    summary = convert_main(["--in", str(meta), "--to", "rdfxml",
                            "--out", out, "--minimal"])
    assert summary["n_triples"] == 4
    parts = glob.glob(os.path.join(out, "part-*"))
    assert parts
    names = set()
    for p in parts:
        for desc in ET.parse(p).getroot():
            for el in desc:
                if _el_pred(el).endswith("name"):
                    names.add(el.text)
    assert names == {"alice", "bob"}
