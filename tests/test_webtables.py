"""Distributed datatype intuition over extracted web tables
(operators/webtables) — the no-metadata fallback of the CSVW kernel.

The reference intuits metadata classes from JSON keys (metadata.rb:198-254)
but types columns only when metadata declares them; these tests pin the
data-driven vote → lattice semantics and the scale shape (broadcast profile
join, no payload shuffle).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rdf_tabular_spark.operators.webtables import (
    XSD,
    apply_column_types,
    explode_cells,
    intuit_column_types,
    typed_cell_triples,
)


def _vrows(spark, rows):
    """rows: list of (url, table_index, row_num, source_num, values)."""
    return spark.createDataFrame(
        [Row(url=u, table_index=t, row_num=r, source_num=s, values=v)
         for u, t, r, s, v in rows],
        "url string, table_index int, row_num long, source_num long, "
        "values array<string>")


def _profile(spark, columns, **kw):
    """columns: list of per-column cell lists → {col_idx: datatype}."""
    n = max(len(c) for c in columns)
    rows = [("u", 0, i + 1, i + 2, [c[i] if i < len(c) else "" for c in columns])
            for i in range(n)]
    prof = intuit_column_types(explode_cells(_vrows(spark, rows)), **kw)
    return {r["col_idx"]: r.asDict() for r in prof.collect()}


def test_lattice_most_specific_type(spark):
    got = _profile(spark, [
        ["1", "2", "-3"],                     # integer
        ["1.5", "2", ".25"],                  # decimal (int promotes)
        ["1e3", "2.5", "7"],                  # double (sci notation)
        ["true", "FALSE", "True"],            # boolean, case-insensitive
        ["2024-01-02", "1999-12-31", "2000-02-29"],   # date
        ["2024-01-02T10:00:00", "2024-01-02 10:00:00.5", "2024-01-02T00:00:01"],
        ["abc", "1", "2"],                    # one word demotes to string
    ])
    want = ["integer", "decimal", "double", "boolean", "date", "dateTime",
            "string"]
    for i, dt in enumerate(want):
        assert got[i]["datatype"] == dt, (i, got[i])
        assert got[i]["datatype_iri"] == XSD + dt


def test_blanks_are_typeless_not_counterevidence(spark):
    got = _profile(spark, [["1", "", None, "2"], ["", "", "", ""]])
    assert got[0]["datatype"] == "integer"
    assert got[0]["n_blank"] == 2 and got[0]["n_cells"] == 4
    # all-blank column: nothing to vote → string fallback
    assert got[1]["datatype"] == "string" and got[1]["n_blank"] == 4


def test_min_frac_tolerates_dirty_cells(spark):
    cols = [["1", "2", "3", "4", "5", "6", "7", "8", "9", "oops"]]
    assert _profile(spark, cols)[0]["datatype"] == "string"       # strict
    assert _profile(spark, cols, min_frac=0.9)[0]["datatype"] == "integer"


def test_whitespace_trimmed_before_vote(spark):
    # space-trim only (Spark trim == DuckDB trim — the oracle contract);
    # a tab is data, so it demotes the column to string
    got = _profile(spark, [[" 42 ", " 7", "9 "], [" 1", "\t7", "2"]])
    assert got[0]["datatype"] == "integer"
    assert got[1]["datatype"] == "string"


def test_grouping_key_is_configurable(spark):
    rows = [("a", 0, 1, 2, ["1"]), ("b", 0, 1, 2, ["x"])]
    prof = intuit_column_types(
        explode_cells(_vrows(spark, rows)), group_cols=("url", "col_idx"))
    got = {(r["url"], r["col_idx"]): r["datatype"] for r in prof.collect()}
    assert got == {("a", 0): "integer", ("b", 0): "string"}


def test_apply_and_typed_triples(spark):
    rows = [("http://x/p", 0, 1, 2, ["7", "hi", ""]),
            ("http://x/q", 0, 1, 2, ["8", "", "2024-01-01"])]
    cells = explode_cells(_vrows(spark, rows))
    typed = apply_column_types(cells, intuit_column_types(cells))
    # blank cells carry NULL datatype and emit no triple
    assert typed.filter("cell = '' and datatype is not null").count() == 0
    trip = typed_cell_triples(typed)
    got = {(r.subj, r.pred): (r.obj, r.obj_datatype) for r in trip.collect()}
    assert got[("http://x/p#row-1", "http://x/p#col-0")] == \
        ("7", XSD + "integer")
    assert got[("http://x/p#row-1", "http://x/p#col-1")] == \
        ("hi", XSD + "string")
    assert got[("http://x/q#row-1", "http://x/q#col-2")] == \
        ("2024-01-01", XSD + "date")
    assert len(got) == 4  # two blanks suppressed
    assert trip.schema["obj_is_iri"].dataType.simpleString() == "boolean"


def test_header_named_predicates(spark):
    rows = [("http://x/p", 0, 1, 2, ["7"])]
    cells = explode_cells(_vrows(spark, rows))
    headers = spark.createDataFrame([(0, 0, "age")],
                                    "table_index int, col_idx int, name string")
    typed = apply_column_types(cells, intuit_column_types(cells))
    trip = typed_cell_triples(typed, headers=headers)
    assert trip.collect()[0].pred == "http://x/p#col-age"


def test_profile_join_is_broadcast_no_payload_shuffle(spark):
    """Scale shape: the profile comes back as a BroadcastHashJoin — the
    cell stream itself never exchanges."""
    rows = [("u%d" % i, 0, 1, 2, [str(i), "w"]) for i in range(50)]
    cells = explode_cells(_vrows(spark, rows))
    typed = apply_column_types(cells, intuit_column_types(cells))
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        typed.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


from rdf_tabular_spark.operators.webtables import (  # noqa: E402
    column_stats,
    entity_triples,
    pick_subject_column,
)


def test_column_stats_uniqueness(spark):
    # col0: 3 distinct ints over 4 non-blank; col1: 2 distinct over 3 (blank
    # excluded from both numerator and denominator)
    rows = [("u", 0, i + 1, i + 2, v) for i, v in enumerate(
        [["1", "a"], ["2", "b"], ["2", "a"], ["3", ""]])]
    stats = {r["col_idx"]: r.asDict()
             for r in column_stats(explode_cells(_vrows(spark, rows))).collect()}
    assert stats[0]["n_distinct"] == 3 and stats[0]["uniqueness"] == 0.75
    assert stats[1]["n_distinct"] == 2 and stats[1]["uniqueness"] == 2 / 3
    assert stats[1]["datatype"] == "string"


def test_pick_subject_column_prefers_unique_string(spark):
    # col0 integer (excluded though fully unique); col1 string 2-distinct;
    # col2 string fully distinct → the subject column
    rows = [("u", 0, i + 1, i + 2, v) for i, v in enumerate(
        [["1", "x", "alice"], ["2", "x", "bob"], ["3", "y", "carol"]])]
    stats = column_stats(explode_cells(_vrows(spark, rows)))
    pick = pick_subject_column(stats).collect()
    assert len(pick) == 1 and pick[0]["subject_col_idx"] == 2


def test_pick_subject_column_tie_breaks_leftmost(spark):
    rows = [("u", 0, i + 1, i + 2, v) for i, v in enumerate(
        [["a", "p"], ["b", "q"]])]
    pick = pick_subject_column(
        column_stats(explode_cells(_vrows(spark, rows)))).collect()
    assert pick[0]["subject_col_idx"] == 0


def test_pick_subject_column_per_group(spark):
    rows = [("u1", 0, 1, 2, ["1", "alice"]), ("u1", 0, 2, 3, ["2", "bob"]),
            ("u2", 0, 1, 2, ["x", "same"]), ("u2", 0, 2, 3, ["y", "same"])]
    stats = column_stats(explode_cells(_vrows(spark, rows)),
                         group_cols=("url", "col_idx"))
    pick = {r["url"]: r["subject_col_idx"]
            for r in pick_subject_column(stats, group_cols=("url",)).collect()}
    # u1: col0 is integer → col1 wins; u2: col0 unique strings beat col1
    assert pick == {"u1": 1, "u2": 0}


def test_entity_triples_subject_from_value(spark):
    rows = [("http://x/p", 0, 1, 2, ["7", "alice"]),
            ("http://x/p", 0, 2, 3, ["8", "bob"]),
            ("http://x/p", 0, 3, 4, ["9", ""])]   # blank subject → dropped
    vrows = _vrows(spark, rows)
    cells = explode_cells(vrows)
    pick = pick_subject_column(column_stats(cells))
    got = entity_triples(vrows, pick).collect()
    assert {r.subject_value for r in got} == {"alice", "bob"}
    import hashlib
    alice = [r for r in got if r.subject_value == "alice"][0]
    assert alice.subj == "http://x/p#e-" + hashlib.md5(b"alice").hexdigest()
    assert alice.pred == "http://x/p#col-0" and alice.obj == "7"
    # subject column itself is not re-emitted; blank-subject row dropped
    assert len(got) == 2


from rdf_tabular_spark.operators.webtables import (  # noqa: E402
    predicate_range_profile,
    schema_frequency,
    table_schema_fingerprints,
)


def test_schema_fingerprints_and_frequency(spark):
    # two tables share a header, one differs (extra col)
    rows = [("u1", 0, 1, 1, ["a", "b"]), ("u1", 0, 2, 2, ["1", "2"]),
            ("u2", 0, 1, 1, [" a", "b "]), ("u2", 0, 2, 2, ["3", "4"]),
            ("u3", 0, 1, 1, ["a", "b", "c"])]
    fps = table_schema_fingerprints(_vrows(spark, rows))
    freq = {r["header_names"]: (r["n_tables"], r["n_pages"], r["n_cols"])
            for r in schema_frequency(fps).collect()}
    # headers are trimmed before fingerprinting, so u1 and u2 stitch
    assert freq["a,b"] == (2, 2, 2)
    assert freq["a,b,c"] == (1, 1, 3)
    sigs = {r["url"]: r["schema_sig"] for r in fps.collect()}
    assert sigs["u1"] == sigs["u2"] != sigs["u3"]


def test_predicate_range_profile_dominant_type(spark):
    t = spark.createDataFrame(
        [("s1", "p", "1", XSD + "integer"), ("s2", "p", "2", XSD + "integer"),
         ("s3", "p", "x", XSD + "string"), ("s4", "q", "hi", XSD + "string")],
        "subj string, pred string, obj string, obj_datatype string")
    got = {r["pred_class"]: r.asDict()
           for r in predicate_range_profile(t).collect()}
    assert got["p"]["n_triples"] == 3
    assert got["p"]["dominant_datatype"] == XSD + "integer"
    assert got["p"]["dominant_frac"] == 2 / 3
    assert got["q"]["dominant_frac"] == 1.0


def test_predicate_range_profile_tie_breaks_lexicographic(spark):
    t = spark.createDataFrame(
        [("s1", "p", "1", XSD + "integer"), ("s2", "p", "x", XSD + "string")],
        "subj string, pred string, obj string, obj_datatype string")
    got = predicate_range_profile(t).collect()[0]
    assert got["dominant_datatype"] == XSD + "integer"  # asc tie-break


def test_entity_triples_ragged_row_yields_null_subject_not_error(spark):
    """ANSI mode (Spark 4 default) makes element_at throw on out-of-bounds;
    a scraped row shorter than the subject column index must simply drop."""
    rows = [("u", 0, 1, 2, ["1", "alice"]),
            ("u", 0, 2, 3, ["2", "bob"]),
            ("u", 0, 3, 4, ["9"])]   # ragged: no subject cell
    vrows = _vrows(spark, rows)
    pick = pick_subject_column(column_stats(explode_cells(vrows)))
    got = entity_triples(vrows, pick).collect()
    assert {r.subject_value for r in got} == {"alice", "bob"}
