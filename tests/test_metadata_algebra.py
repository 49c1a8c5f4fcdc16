"""Metadata algebra tests: merge (M2/M3), normalize (M4), validate (M5).

Merge cases ported from the reference's spec data
(reference: spec/metadata_spec.rb:1084-1460); validation goldens run the
actual reference fixture files (spec/invalid_data/*) and require the exact
error strings from the matching *-errors.txt.
"""

import json
import os

import pytest

from rdf_tabular_spark.csvw.merge import merge_into, merge_metadata, normalize
from rdf_tabular_spark.csvw.validate import datatype_compatible, validate_metadata

INVALID = "/root/reference/spec/invalid_data"


def strip_ctx(d):
    if isinstance(d, dict):
        return {k: strip_ctx(v) for k, v in d.items() if k != "@context"}
    if isinstance(d, list):
        return [strip_ctx(v) for v in d]
    return d


# --- merge (promotion + fold), reference spec "#merge" --------------------

def test_merge_two_tables_same_url():
    a = {"@type": "Table", "url": "http://example.org/table"}
    b = {"@type": "Table", "url": "http://example.org/table"}
    r = merge_metadata(a, b)
    assert r == {"@type": "TableGroup", "@context": "http://www.w3.org/ns/csvw",
                 "resources": [{"@type": "Table", "url": "http://example.org/table"}]}


def test_merge_two_tables_different_url():
    a = {"@type": "Table", "url": "http://example.org/table1"}
    b = {"@type": "Table", "url": "http://example.org/table2"}
    r = merge_metadata(a, b)
    assert [t["url"] for t in r["resources"]] == \
        ["http://example.org/table1", "http://example.org/table2"]


def test_merge_table_into_group():
    a = {"@type": "Table", "url": "http://example.org/table1"}
    b = {"@type": "TableGroup",
         "resources": [{"@type": "Table", "url": "http://example.org/table2"}]}
    r = merge_metadata(a, b)
    assert [t["url"] for t in r["resources"]] == \
        ["http://example.org/table1", "http://example.org/table2"]


def test_merge_duplicate_common_property_first_wins():
    a = {"@type": "Table", "url": "http://example.org/t"}
    b1 = {"@type": "Table", "url": "http://example.org/t2", "dc:label": "foo"}
    b2 = {"@type": "Table", "url": "http://example.org/t2", "dc:label": "bar"}
    r = merge_metadata(a, b1, b2)
    assert r["resources"][1]["dc:label"] == {"@value": "foo"}


def test_merge_rejects_other_types():
    with pytest.raises(TypeError):
        merge_metadata({"@type": "Schema"}, {"@type": "TableGroup", "resources": []})


# --- merge! rules, reference spec "#merge!" -------------------------------

def merge_norm(a, b):
    return merge_into(normalize(a), normalize(b))


def test_mergeb_id_first_wins():
    r = merge_norm({"@id": "http://example.org/foo", "resources": []},
                   {"resources": [], "@type": "TableGroup"})
    assert r["@id"] == "http://example.org/foo"
    assert r["@type"] == "TableGroup"


def test_mergeb_matching_resources_combine():
    r = merge_norm(
        {"resources": [{"url": "http://example.org/foo", "dc:title": "foo"}]},
        {"resources": [{"url": "http://example.org/foo", "dc:description": "bar"}]})
    assert r["resources"] == [{
        "url": "http://example.org/foo",
        "dc:title": {"@value": "foo"},
        "dc:description": {"@value": "bar"}}]


def test_mergeb_differing_resources_append():
    r = merge_norm(
        {"resources": [{"url": "http://example.org/foo", "dc:title": "foo"}]},
        {"resources": [{"url": "http://example.org/bar", "dc:description": "bar"}]})
    assert [t["url"] for t in r["resources"]] == \
        ["http://example.org/foo", "http://example.org/bar"]


def test_mergeb_schema_columns_differing_name_takes_a():
    r = merge_norm(
        {"@type": "Table", "url": "u", "tableSchema": {"columns": [{"name": "foo"}]}},
        {"@type": "Table", "url": "u", "tableSchema": {"columns": [{"name": "bar"}]}})
    assert r["tableSchema"]["columns"] == [{"name": "foo"}]


def test_mergeb_table_direction_takes_a():
    r = merge_norm({"@type": "Table", "url": "u", "tableDirection": "ltr"},
                   {"@type": "Table", "url": "u", "tableDirection": "rtl"})
    assert r["tableDirection"] == "ltr"


def test_mergeb_dialect_merges_keywise():
    r = merge_norm({"@type": "Table", "url": "u", "dialect": {"encoding": "utf-8"}},
                   {"@type": "Table", "url": "u", "dialect": {"skipRows": 0}})
    assert r["dialect"] == {"encoding": "utf-8", "skipRows": 0}


def test_mergeb_equivalent_transformations_use_a():
    tr_a = {"url": "http://example.com/foo", "targetFormat": "t",
            "scriptFormat": "s", "source": "json"}
    tr_b = dict(tr_a, source="html")
    r = merge_norm({"@type": "Table", "url": "u", "transformations": [tr_a]},
                   {"@type": "Table", "url": "u", "transformations": [tr_b]})
    assert r["transformations"] == [tr_a]


def test_mergeb_differing_transformations_append():
    tr_a = {"targetFormat": "t1", "scriptFormat": "s1"}
    tr_b = {"targetFormat": "t2", "scriptFormat": "s2"}
    r = merge_norm({"@type": "Table", "url": "u", "transformations": [tr_a]},
                   {"@type": "Table", "url": "u", "transformations": [tr_b]})
    assert r["transformations"] == [tr_a, tr_b]


def test_mergeb_common_property_language_from_context():
    r = merge_norm(
        {"@context": {"@language": "en"}, "@type": "Table", "url": "u",
         "rdfs:label": "foo"},
        {"@context": {"@language": "fr"}, "@type": "Table", "url": "u",
         "rdfs:label": "foo"})
    assert r["rdfs:label"] == {"@value": "foo", "@language": "en"}


def test_mergeb_title_language_map_merge():
    r = merge_norm(
        {"@context": {"@language": "en"}, "@type": "Table", "url": "u",
         "tableSchema": {"columns": [{"title": "foo"}]}},
        {"@type": "Table", "url": "u",
         "tableSchema": {"columns": [{"title": "foo"}]}})
    # A's title is en:[foo]; B's und:[foo] is shadowed by the en entry
    assert r["tableSchema"]["columns"][0]["title"] == {"en": ["foo"]}


def test_mergeb_matching_column_titles_takes_name_from_b():
    r = merge_norm({"@type": "Schema", "columns": [{"title": "Foo"}]},
                   {"@type": "Schema", "columns": [{"name": "foo", "title": "Foo"}]})
    assert r["columns"] == [{"name": "foo", "title": {"und": ["Foo"]}}]


def test_mergeb_matching_columns_required_first_wins():
    r = merge_norm({"@type": "Schema", "columns": [{"name": "foo", "required": True}]},
                   {"@type": "Schema", "columns": [{"name": "foo", "required": False}]})
    assert r["columns"] == [{"name": "foo", "required": True}]


def test_mergeb_primary_key_takes_a():
    r = merge_norm({"@type": "Schema", "primaryKey": "foo"},
                   {"@type": "Schema", "primaryKey": "bar"})
    assert r["primaryKey"] == "foo"


def test_mergeb_foreign_keys_set_union():
    fk1 = {"columns": "foo", "reference": {"columns": "foo"}}
    fk2 = {"columns": "bar", "reference": {"columns": "bar"}}
    r = merge_norm({"@type": "Schema", "columns": [{"name": "foo"}], "foreignKeys": [fk1]},
                   {"@type": "Schema", "columns": [{"name": "foo"}], "foreignKeys": [fk1]})
    assert r["foreignKeys"] == [fk1]
    r = merge_norm({"@type": "Schema", "foreignKeys": [fk1]},
                   {"@type": "Schema", "foreignKeys": [fk2]})
    assert r["foreignKeys"] == [fk1, fk2]


def test_mergeb_notes_append():
    r = merge_norm({"@type": "Table", "url": "u", "notes": ["a"]},
                   {"@type": "Table", "url": "u", "notes": ["b"]})
    assert r["notes"] == [{"@value": "a"}, {"@value": "b"}]


# --- validation goldens (reference fixture files) --------------------------

@pytest.mark.parametrize("name", [
    "incompatible_datatype", "incompatible_default", "incompatible_lang",
    "incompatible_null", "incompatible_separator", "incompatible_textDirection",
])
def test_invalid_data_golden(name):
    # the reference asserts errors INCLUDE each golden line
    # (spec/metadata_spec.rb:351-353), not exact equality — validate! also
    # emits class-level findings (e.g. 'Table has unexpected keys:
    # ["columns"]' for fixtures that put columns directly on a Table)
    with open(os.path.join(INVALID, f"{name}.json")) as f:
        doc = json.load(f)
    with open(os.path.join(INVALID, f"{name}-errors.txt")) as f:
        expected = [ln for ln in f.read().splitlines() if ln.strip()]
    got = validate_metadata(doc)
    for err in expected:
        assert err in got, f"missing golden error {err!r}; got {got}"


def test_valid_metadata_has_no_errors():
    with open("/root/reference/spec/data/tree-ops.csv-metadata.json") as f:
        doc = json.load(f)
    assert validate_metadata(doc) == []


def test_reference_example_metadata_all_clean():
    """Mirror of the reference's 'parses example metadata' spec
    (spec/metadata_spec.rb:336-344): every spec/data/*.json example
    (excluding -atd/-standard/-minimal outputs) validates error-free —
    the false-positive guard for the class-level key checks."""
    import glob
    import re
    for fn in sorted(glob.glob("/root/reference/spec/data/*.json")):
        if re.search(r"-(atd|standard|minimal)\.json$", fn):
            continue
        with open(fn) as f:
            doc = json.load(f)
        errs = validate_metadata(doc)
        assert errs == [], f"{os.path.basename(fn)}: {errs}"


# --- datatype lattice ------------------------------------------------------

@pytest.mark.parametrize("child,parent,ok", [
    ("integer", "decimal", True),
    ("float", "integer", False),
    ("float", "double", True),
    ("unsignedByte", "nonNegativeInteger", True),
    ("negativeInteger", "nonNegativeInteger", False),
    ("token", "string", True),
    ("string", "token", False),
    ("dateTimeStamp", "dateTime", True),
    ("date", "anyAtomicType", True),
    ("integer", "integer", True),
])
def test_datatype_lattice(child, parent, ok):
    assert datatype_compatible({"base": child}, {"base": parent}) is ok


def test_transformation_validation():
    """metadata.rb:1343-1371: Transformation allows only its PROPERTIES and
    requires targetFormat/scriptFormat; error strings mirror validate!."""
    from rdf_tabular_spark.csvw.validate import validate_metadata
    ok = {"@type": "Table", "url": "t.csv", "transformations": [{
        "url": "t.xsl", "targetFormat": "http://x/f",
        "scriptFormat": "http://x/s", "title": "x", "source": "json"}]}
    assert validate_metadata(ok) == []

    bad_key = {"@type": "Table", "url": "t.csv", "transformations": [{
        "url": "t.xsl", "targetFormat": "http://x/f",
        "scriptFormat": "http://x/s", "bogus": 1}]}
    assert validate_metadata(bad_key) == [
        'Transformation has unexpected keys: ["bogus"]']

    missing = {"@type": "Table", "url": "t.csv", "transformations": [{
        "url": "t.xsl", "targetFormat": "http://x/f"}]}
    assert validate_metadata(missing) == [
        'Transformation missing required keys: ["targetFormat"]']

    # common properties (prefixed keys) are exempt from the unexpected-key
    # check, like the reference's keys.reject {|k| k.include?(':')} — but
    # url is still required (r5: W3C metadata sec 5.10.2; the reference's
    # REQUIRED at metadata.rb:1353 omits url, divergence kept W3C-correct)
    common = {"@type": "Table", "url": "t.csv", "transformations": [{
        "targetFormat": "f", "scriptFormat": "s", "dc:title": "x"}]}
    assert validate_metadata(common) == [
        'Transformation missing required keys: ["url"]']
    with_url = {"@type": "Table", "url": "t.csv", "transformations": [{
        "url": "t.xsl", "targetFormat": "f", "scriptFormat": "s",
        "dc:title": "x"}]}
    assert validate_metadata(with_url) == []
