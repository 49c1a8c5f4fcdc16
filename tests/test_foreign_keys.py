"""Data-level foreignKeys enforcement over a TableGroup — the check the
reference structurally validates but FIXMEs at the data tier
(reference: metadata.rb:517-541)."""

import json
import os

import pytest

from rdf_tabular_spark.csvw.model import load_metadata
from rdf_tabular_spark.pipeline import validate_foreign_keys

DATA = "/root/reference/spec/data"
BASE = "http://example.org/"


def resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(DATA, url[len(BASE):])
    return url


def test_countries_group_fks_valid(spark):
    """The reference's own countries fixture (spec/data/countries.json:30-40)
    declares countryRef → countries.countryCode; its data satisfies it."""
    group = load_metadata(os.path.join(DATA, "countries.json"),
                          base=BASE + "countries.json", resolver=resolver)
    viol = validate_foreign_keys(spark, group, resolver)
    assert viol.count() == 0


def _write_group(tmp_path, slice_rows):
    (tmp_path / "countries.csv").write_text(
        "countryCode,name\nAD,Andorra\nAE,UAE\n")
    (tmp_path / "slice.csv").write_text(
        "countryRef,year\n" + "".join(f"{c},{y}\n" for c, y in slice_rows))
    meta = tmp_path / "group.json"
    meta.write_text(json.dumps({
        "@context": "http://www.w3.org/ns/csvw",
        "tables": [
            {"url": "countries.csv", "tableSchema": {
                "columns": [{"name": "countryCode"}, {"name": "name"}],
                "primaryKey": "countryCode"}},
            {"url": "slice.csv", "tableSchema": {
                "columns": [{"name": "countryRef"}, {"name": "year"}],
                "foreignKeys": [{"columns": "countryRef", "reference": {
                    "resource": "countries.csv",
                    "columns": "countryCode"}}]}},
        ]}))
    return load_metadata(str(meta), base=str(meta), resolver=lambda u: u)


def test_broken_fk_reports_violating_rows(spark, tmp_path):
    group = _write_group(tmp_path, [("AD", 2000), ("ZZ", 2001), ("ZZ", 2002),
                                    ("AE", 2003), ("XX", 2004)])
    viol = validate_foreign_keys(spark, group, resolver=lambda u: u) \
        .orderBy("key").collect()
    assert [(list(r["key"]), r["n_rows"], list(r["source_nums"]))
            for r in viol] == [(["XX"], 1, [6]), (["ZZ"], 2, [3, 4])]
    assert all(r["child_url"].endswith("slice.csv") and r["fk_index"] == 0
               for r in viol)


def test_null_fk_component_exempt(spark, tmp_path):
    """SQL MATCH SIMPLE: a child key with a NULL component never violates —
    and CSVW-null spellings count as NULL: an empty cell (default null
    annotation ''), a short row's missing cell, and a blank row all exempt;
    a present non-null orphan ('ZZ') still violates."""
    group = _write_group(tmp_path, [("AD", 2000)])
    (tmp_path / "slice.csv").write_text(
        "countryRef,year\nAD,2000\n,2001\n\nZZ\n")
    viol = validate_foreign_keys(spark, group, resolver=lambda u: u).collect()
    keys = sorted(tuple(r["key"]) for r in viol)
    assert keys == [("ZZ",)]


def test_custom_null_token_exempt(spark, tmp_path):
    """A declared null token ('N/A') in the FK column is exempt like ''. """
    import json
    group = _write_group(tmp_path, [("AD", 2000)])
    meta = json.loads((tmp_path / "group.json").read_text())
    meta["tables"][1]["tableSchema"]["columns"][0]["null"] = ["N/A"]
    (tmp_path / "group.json").write_text(json.dumps(meta))
    (tmp_path / "slice.csv").write_text(
        "countryRef,year\nAD,2000\nN/A,2001\nZZ,2002\n")
    from rdf_tabular_spark.csvw.model import load_metadata
    g = load_metadata(str(tmp_path / "group.json"),
                      base=str(tmp_path / "group.json"), resolver=lambda u: u)
    viol = validate_foreign_keys(spark, g, resolver=lambda u: u).collect()
    assert sorted(tuple(r["key"]) for r in viol) == [("ZZ",)]


def test_unknown_fk_resource_raises(spark, tmp_path):
    group = _write_group(tmp_path, [("AD", 2000)])
    group.tables[1].schema.raw["foreignKeys"][0]["reference"]["resource"] = \
        "nope.csv"
    with pytest.raises(ValueError, match="unknown"):
        validate_foreign_keys(spark, group, resolver=lambda u: u)


def test_unknown_fk_column_raises(spark, tmp_path):
    group = _write_group(tmp_path, [("AD", 2000)])
    group.tables[1].schema.raw["foreignKeys"][0]["columns"] = "badcol"
    with pytest.raises(ValueError, match="badcol"):
        validate_foreign_keys(spark, group, resolver=lambda u: u)
