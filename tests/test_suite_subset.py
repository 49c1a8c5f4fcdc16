"""Vendored CSVW conformance-suite subset (reference: spec/suite_spec.rb:10-74
runs the W3C suite over the network; these 302 entries are local fixtures
modeled on the same entry types — ToRdf eval, ToJson eval, normalization,
discovery, positive/negative validation — authored from the CSVW spec
semantics, in tests/suite/).

test249-302 (r5): encoding x dialect combinations (utf-16, iso-8859-1,
BOM+skipRows, tab delimiter, single-quote quoteChar, doubleQuote
escapes), the XML Name datatype family (Name/NCName/QName lexical
checks), fractional-second and exponent pictures, gMonthDay/gDay,
negative dayTimeDuration, {+var} reserved expansion, commentPrefix DATA
row semantics (W3C model sec 8 — implemented; the reference only strips
note prefixes), JSON-mode serializations (custom datatypes, valueUrl,
null/default, typed lexical strings, groups, fan-in, _col.N, ordered
lists, boolean formats), normalization corners (@language/@base/nested
node objects/notes), discovery precedence + the sec 5.3 ignore rule,
transformation url-required (W3C 5.10.2), boolean class properties, and
20 new negatives (101 total).

test206-208 (r4 cont.): headerColumnCount column skipping, and custom
lineTerminator support — distributed lineSep split for quote-free files,
quote-aware terminator scanning on the driver fallback when a quoted
terminator could split a field (Ruby CSV row_sep parity,
reference metadata.rb:1199).

test204-205 (r4 cont.): quoteChar:null disabling quote processing
(csv.QUOTE_NONE across all three reader paths), and normalization's
atomic string→bool/int coercion + link-property resolution against a
@context @base + @context collapse to the bare csvw namespace
(reference: metadata.rb:1061-1096 normalize!).

test177-182 (r4 cont.): _sourceRow/_name template variables under
skipRows, draft datatype aliases (number/datetime/binary), NAME_SYNTAX
column-name validation, and dialect value checks (multi-char delimiter,
negative skipRows, invalid trim enum, non-string titles).

test171-176 (r4 cont.): UTF-8 BOM stripping (header + headerless
distributed path), declared dialect.encoding (utf-16, iso-8859-1 on the
driver codec path), and negative dialect metadata (unknown encoding,
non-boolean header).

Round-4 additions (test084-155) target the previously untested classes:
metadata NORMALIZATION (language maps, datatype objects, JSON-LD common
properties, single-table promotion), rdf:XMLLiteral / rdf:HTML / csvw:JSON
literals, table/text direction, NAKED-CSV metadata discovery
({url}-metadata.json / sibling metadata.json / embedded-header fallback),
dialect corners (delimiter/quoteChar/skipRows/two header rows/skipColumns/
trim=start/skipBlankRows/quote escapes), number+date/time formats in both
the W3C-final nested `format` shape and the reference's draft-era
top-level-key shape, RFC 6570 operators ({+} {?} {.} {#}), lang tags,
default/null semantics, external tableSchema documents, composite PK/FK
cases, and 16 negative-metadata corners (transformations, duplicate column
names, facet values, inherited null/lang/datatype/textDirection
violations).

test064-075 (r3 cont.): hexBinary/base64Binary, string format regex
(positive + violation), doubleQuote=false backslash escapes, table-level
suppressOutput in a group, ordered separator lists as rdf:List chains,
anyURI typed literals, JSON array serialization of separator columns,
inherited-lang restriction validation, aboutUrl fan-in subjects,
minLength violations, percent-suffixed numerics.

Round-3 additions (test030+) target the previously untested corners:
datatype minimum/maximum facets on numerics AND dates/times (positive +
violation), more typed literals (time/duration/gYear/long), multi-valued
null arrays, lang inheritance, multi-table ToJson, virtual-column JSON
exclusion, notes arrays (standard mode), declared-foreignKey data checks
(positive + single and composite violations), composite primaryKey cases,
and metadata validity (textDirection, facet values, primaryKey references).

Entry types in manifest.json:
  rdf               minimal-mode triples deep-equal an expected .ttl
  rdf-contains      standard-mode triples CONTAIN the expected .ttl subset
  json              csvw_to_json deep-equals an expected .json
  negative-data     validate_table yields >= 1 error (substring asserted)
  negative-metadata validate_metadata yields >= 1 error
  positive-data     validate_table yields no errors
  positive-pk / negative-pk   validate_primary_key empty / exact duplicates
  positive-fk / negative-fk   validate_foreign_keys empty / exact orphans
"""

import json
import os

import pytest

from rdf_tabular_spark.csvw.model import load_metadata
from rdf_tabular_spark.csvw.validate import validate_metadata
from rdf_tabular_spark.pipeline import csvw_to_triples, validate_table
from rdf_tabular_spark.rdfio.compare import df_to_terms, triple_pr
from rdf_tabular_spark.rdfio.turtle import parse_turtle_file
from rdf_tabular_spark.sinks.json_rows import csvw_to_json

SUITE = os.path.join(os.path.dirname(__file__), "suite")
BASE = "http://example.org/suite/"

with open(os.path.join(SUITE, "manifest.json")) as f:
    MANIFEST = json.load(f)
ENTRIES = {e["id"]: e for e in MANIFEST}


def resolver(url: str) -> str:
    if url.startswith(BASE):
        return os.path.join(SUITE, url[len(BASE):])
    return url


def _ids(typ):
    return [e["id"] for e in MANIFEST if e["type"] == typ]


@pytest.mark.parametrize("tid", _ids("rdf"))
def test_suite_rdf(spark, tid):
    e = ENTRIES[tid]
    df = csvw_to_triples(spark, os.path.join(SUITE, e["action"]),
                         base=BASE + e["action"], resolver=resolver,
                         minimal=True)
    ours = df_to_terms(df.collect())
    expected = parse_turtle_file(os.path.join(SUITE, e["result"]))
    pr = triple_pr(ours, expected)
    assert pr.precision == 1.0 and pr.recall == 1.0, (
        f"{tid} ({e['comment']}): missing={pr.missing} extra={pr.extra}")


@pytest.mark.parametrize("tid", _ids("json"))
def test_suite_json(spark, tid):
    e = ENTRIES[tid]
    got = csvw_to_json(spark, os.path.join(SUITE, e["action"]),
                       base=BASE + e["action"], resolver=resolver)
    with open(os.path.join(SUITE, e["result"])) as f:
        expected = json.load(f)
    assert got == expected, f"{tid} ({e['comment']})"


def _table_for(e):
    with open(os.path.join(SUITE, e["action"])) as f:
        doc = json.load(f)
    return load_metadata(doc, base=BASE + e["action"], resolver=resolver)


@pytest.mark.parametrize("tid", _ids("negative-data"))
def test_suite_negative_data(spark, tid):
    e = ENTRIES[tid]
    errs = validate_table(spark, _table_for(e), resolver=resolver).collect()
    assert errs, f"{tid} ({e['comment']}): expected validation errors"
    if e.get("error_substring"):
        assert any(e["error_substring"] in r["error"] for r in errs), (
            f"{tid}: no error contains {e['error_substring']!r}: "
            f"{[r['error'] for r in errs]}")


@pytest.mark.parametrize("tid", _ids("negative-metadata"))
def test_suite_negative_metadata(tid):
    e = ENTRIES[tid]
    with open(os.path.join(SUITE, e["action"])) as f:
        doc = json.load(f)
    assert validate_metadata(doc), f"{tid} ({e['comment']})"


@pytest.mark.parametrize("tid", _ids("positive-data"))
def test_suite_positive_data(spark, tid):
    e = ENTRIES[tid]
    errs = validate_table(spark, _table_for(e), resolver=resolver).collect()
    assert errs == [], f"{tid}: unexpected errors {[r['error'] for r in errs]}"


@pytest.mark.parametrize("tid", _ids("negative-pk"))
def test_suite_negative_pk(spark, tid):
    """Data-level primaryKey uniqueness (the check the reference FIXMEs)."""
    from rdf_tabular_spark.pipeline import validate_primary_key
    e = ENTRIES[tid]
    dups = validate_primary_key(spark, _table_for(e), resolver=resolver) \
        .collect()
    assert len(dups) == 1
    assert dups[0]["n_rows"] == e.get("dup_n", 2)
    assert list(dups[0]["key"]) == e.get("dup_key", ["1"])


@pytest.mark.parametrize("tid", _ids("positive-pk"))
def test_suite_positive_pk(spark, tid):
    from rdf_tabular_spark.pipeline import validate_primary_key
    e = ENTRIES[tid]
    dups = validate_primary_key(spark, _table_for(e), resolver=resolver) \
        .collect()
    assert dups == [], f"{tid}: unexpected PK duplicates {dups}"


@pytest.mark.parametrize("tid", _ids("positive-fk"))
def test_suite_positive_fk(spark, tid):
    """Declared schema.foreignKeys hold at the data tier."""
    from rdf_tabular_spark.pipeline import validate_foreign_keys
    e = ENTRIES[tid]
    viol = validate_foreign_keys(spark, _table_for(e), resolver=resolver) \
        .collect()
    assert viol == [], f"{tid}: unexpected FK violations {viol}"


@pytest.mark.parametrize("tid", _ids("negative-fk"))
def test_suite_negative_fk(spark, tid):
    """Declared schema.foreignKeys are violated by the data — the exact
    orphan keys and their row counts come from the manifest entry."""
    from rdf_tabular_spark.pipeline import validate_foreign_keys
    e = ENTRIES[tid]
    viol = sorted(
        validate_foreign_keys(spark, _table_for(e), resolver=resolver)
        .collect(), key=lambda r: list(r["key"]))
    assert [list(r["key"]) for r in viol] == e["expect_keys"], tid
    assert [r["n_rows"] for r in viol] == e["expect_n_rows"], tid


@pytest.mark.parametrize("tid", _ids("rdf-contains"))
def test_suite_rdf_contains(spark, tid):
    """Standard-mode ToRdf SUBSET check: every expected triple must appear
    in the full output (ground triples exactly; bnode-subject expectations
    match any bnode with the same predicate/object). Used where the full
    standard-mode graph (row bnodes, csvw boilerplate) would be noise —
    e.g. the notes-array triples."""
    e = ENTRIES[tid]
    df = csvw_to_triples(spark, os.path.join(SUITE, e["action"]),
                         base=BASE + e["action"], resolver=resolver,
                         minimal=False)
    ours = df_to_terms(df.collect())
    expected = parse_turtle_file(os.path.join(SUITE, e["result"]))
    ours_ground = set(ours)
    ours_bnode_po = {t[1:] for t in ours if t[0].kind == "bnode"}
    for t in expected:
        if t[0].kind == "bnode":
            assert t[1:] in ours_bnode_po, f"{tid}: missing bnode triple {t}"
        else:
            assert t in ours_ground, f"{tid}: missing triple {t}"


@pytest.mark.parametrize("tid", _ids("normalize"))
def test_suite_normalize(tid):
    """M4 metadata normalization (csvw/merge.normalize) — action document
    deep-equals the expected normal form (modeled on the W3C suite's
    normalization entries; CSVW-metadata §6 normalization rules)."""
    from rdf_tabular_spark.csvw.merge import normalize
    e = ENTRIES[tid]
    with open(os.path.join(SUITE, e["action"])) as f:
        doc = json.load(f)
    with open(os.path.join(SUITE, e["result"])) as f:
        expected = json.load(f)
    assert normalize(doc) == expected, f"{tid} ({e['comment']})"


@pytest.mark.parametrize("tid", _ids("rdf-discover"))
def test_suite_rdf_discover(spark, tid):
    """Naked-CSV entry: the action is a CSV file; metadata (if any) must be
    DISCOVERED ({url}-metadata.json ▷ sibling metadata.json ▷ embedded
    header) — the S3 discovery path, not a direct metadata load. Fixtures
    live in per-test subdirectories so sibling metadata.json files don't
    cross-contaminate entries."""
    e = ENTRIES[tid]
    df = csvw_to_triples(spark, os.path.join(SUITE, e["action"]),
                         base=BASE + e["action"], resolver=resolver,
                         minimal=True)
    ours = df_to_terms(df.collect())
    expected = parse_turtle_file(os.path.join(SUITE, e["result"]))
    pr = triple_pr(ours, expected)
    assert pr.precision == 1.0 and pr.recall == 1.0, (
        f"{tid} ({e['comment']}): missing={pr.missing} extra={pr.extra}")
