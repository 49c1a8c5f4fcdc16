"""Vendored CSVW conformance-suite subset (reference: spec/suite_spec.rb:10-74
runs the W3C suite over the network; these 26 entries are local fixtures
modeled on the same entry types — ToRdf eval, ToJson eval, positive/negative
validation — authored from the CSVW spec semantics, in tests/suite/).

Entry types in manifest.json:
  rdf               minimal-mode triples deep-equal an expected .ttl
  json              csvw_to_json deep-equals an expected .json
  negative-data     validate_table yields >= 1 error (substring asserted)
  negative-metadata validate_metadata yields >= 1 error
  positive-data     validate_table yields no errors
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
    assert dups[0]["n_rows"] == 2 and list(dups[0]["key"]) == ["1"]
