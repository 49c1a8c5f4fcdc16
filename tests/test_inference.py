"""RDFS materialization (operators/inference.py): unit semantics per rule,
the one-level meta corner, and a hypothesis fuzz where BOTH engines (Spark
pipeline + DuckDB SQL emitter) must match a naive driver-side fixpoint —
a third independent implementation of the ρdf rules."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_tabular_spark.operators import inference as I

TYPE = I.RDF_TYPE
SUB_C = I.RDFS_SUBCLASS
SUB_P = I.RDFS_SUBPROP
DOM = I.RDFS_DOMAIN
RNG = I.RDFS_RANGE


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _values_sql(rows):
    if not rows:
        return ("select * from (values ('x','x','x')) v(subj, pred, obj) "
                "where 1=0")
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in rows)
    return f"select * from (values {vals}) v(subj, pred, obj)"


# ---------------------------------------------------------------------------
# naive reference: apply all six rules to a global fixpoint
# ---------------------------------------------------------------------------

def _naive(triples):
    g = set(triples)
    while True:
        new = set()
        sp = {(s, o) for s, p, o in g if p == SUB_P}
        sc = {(s, o) for s, p, o in g if p == SUB_C}
        dom = {(s, o) for s, p, o in g if p == DOM}
        rng = {(s, o) for s, p, o in g if p == RNG}
        for (a, b) in sp:                              # rdfs5
            for (c, d) in sp:
                if b == c:
                    new.add((a, SUB_P, d))
        for (a, b) in sc:                              # rdfs11
            for (c, d) in sc:
                if b == c:
                    new.add((a, SUB_C, d))
        for s, p, o in g:
            for (a, b) in sp:                          # rdfs7
                if p == a:
                    new.add((s, b, o))
            for (a, c) in dom:                         # rdfs2
                if p == a:
                    new.add((s, TYPE, c))
            for (a, c) in rng:                         # rdfs3
                if p == a:
                    new.add((o, TYPE, c))
            if p == TYPE:
                for (a, b) in sc:                      # rdfs9
                    if o == a:
                        new.add((s, TYPE, b))
        if new <= g:
            return g
        g |= new


# ---------------------------------------------------------------------------
# per-rule unit semantics
# ---------------------------------------------------------------------------

def test_rdfs7_subproperty_inheritance(spark):
    rows = [("p", SUB_P, "q"), ("x", "p", "y")]
    out = {tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()}
    assert ("x", "q", "y") in out


def test_rdfs2_3_domain_range_through_superproperty(spark):
    # dom/rng declared on the SUPERproperty must fire for the subproperty
    rows = [("p", SUB_P, "q"), ("q", DOM, "C"), ("q", RNG, "D"),
            ("x", "p", "y")]
    out = {tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()}
    assert ("x", TYPE, "C") in out and ("y", TYPE, "D") in out


def test_rdfs9_11_class_hierarchy(spark):
    rows = [("C", SUB_C, "D"), ("D", SUB_C, "E"), ("x", TYPE, "C")]
    out = {tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()}
    assert {("x", TYPE, "D"), ("x", TYPE, "E"),
            ("C", SUB_C, "E")} <= out


def test_derived_types_inherit_up(spark):
    # rdfs2 output feeds rdfs9: domain gives x type C, subclass lifts to D
    rows = [("p", DOM, "C"), ("C", SUB_C, "D"), ("x", "p", "y")]
    out = {tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()}
    assert {("x", TYPE, "C"), ("x", TYPE, "D")} <= out


def test_only_new_triples_by_default(spark):
    rows = [("C", SUB_C, "D"), ("x", TYPE, "C"), ("x", TYPE, "D")]
    out = [tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()]
    assert out == [("C", SUB_C, "D")] or out == []  # no re-assertions
    full = {tuple(r) for r in I.rdfs_materialize(
        _triples(spark, rows), include_input=True).collect()}
    assert set(map(tuple, rows)) <= full


def test_meta_one_level_self_reference(spark):
    # 'broader' declared a subproperty of rdfs:subClassOf: its statements
    # ARE subclass statements (one rewrite level), so types lift through it
    rows = [("broader", SUB_P, SUB_C), ("C", "broader", "D"),
            ("x", TYPE, "C")]
    out = {tuple(r) for r in
           I.rdfs_materialize(_triples(spark, rows)).collect()}
    assert ("C", SUB_C, "D") in out and ("x", TYPE, "D") in out


def test_schema_cap_raises(spark):
    rows = [(f"c{i}", SUB_C, f"c{i+1}") for i in range(10)]
    with pytest.raises(ValueError, match="schema_cap"):
        I.rdfs_materialize(_triples(spark, rows), schema_cap=5)


def test_no_instance_shuffle_joins_are_broadcast(spark):
    rows = [("p", SUB_P, "q"), ("C", SUB_C, "D"), ("p", DOM, "C"),
            ("x", "p", "y")]
    # include_input=True has no set-difference step: every RULE join must
    # be a broadcast — the scale contract (schema replicates, instances
    # never shuffle for a join)
    plan = I.rdfs_materialize(_triples(spark, rows), include_input=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # default mode adds exactly ONE big-big join: the LeftAnti diff vs the
    # input (inherently instance-vs-instance; SMJ is the right plan there)
    plan2 = I.rdfs_materialize(_triples(spark, rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("SortMergeJoin") <= 1
    assert "LeftAnti" in plan2 or "BroadcastHashJoin" in plan2


# ---------------------------------------------------------------------------
# fuzz: Spark == DuckDB == naive fixpoint (meta corners excluded — see
# module contract in operators/inference.py)
# ---------------------------------------------------------------------------

_INST = ["a", "b", "c", "d"]
_PROPS = ["p", "q", "r"]
_CLS = ["C1", "C2", "C3"]

_triple = st.one_of(
    st.tuples(st.sampled_from(_INST), st.sampled_from(_PROPS),
              st.sampled_from(_INST)),
    st.tuples(st.sampled_from(_INST), st.just(TYPE), st.sampled_from(_CLS)),
    st.tuples(st.sampled_from(_PROPS), st.just(SUB_P),
              st.sampled_from(_PROPS)),
    st.tuples(st.sampled_from(_CLS), st.just(SUB_C), st.sampled_from(_CLS)),
    st.tuples(st.sampled_from(_PROPS), st.just(DOM), st.sampled_from(_CLS)),
    st.tuples(st.sampled_from(_PROPS), st.just(RNG), st.sampled_from(_CLS)),
)

_graphs = st.lists(_triple, min_size=0, max_size=10, unique=True)


@settings(max_examples=120, deadline=None)
@given(_graphs)
def test_sql_emitter_matches_naive_fixpoint(rows):
    expected = _naive(rows) - set(rows)
    got = set(duckdb.sql(I.rdfs_sql(_values_sql(rows))).fetchall())
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(_graphs)
def test_spark_matches_naive_fixpoint(spark, rows):
    expected = _naive(rows) - set(rows)
    if rows:
        df = I.rdfs_materialize(_triples(spark, rows))
    else:
        df = I.rdfs_materialize(_triples(spark, [("x", "p", "y")]).limit(0))
    assert {tuple(r) for r in df.collect()} == expected


def test_infer_rdfs_batch_commits_lineage(spark, tmp_path):
    """Store maintenance surface: entailment lands as a lineage-tagged
    batch, idempotent per batch-id, and reads back with the graph."""
    from pyspark.sql import functions as F

    from rdf_tabular_spark.sinks.graph_store import (infer_rdfs_batch,
                                                     materialize, read_graph)
    root = str(tmp_path / "g")
    rows = [("C", SUB_C, "D"), ("x", TYPE, "C"), ("x", "p", "y")]
    base = _triples(spark, rows).select(
        "subj", "pred", "obj",
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit("t").alias("table_url"), F.lit(0).cast("long").alias("source_num"))
    materialize(base, root, "b1")
    m = infer_rdfs_batch(spark, root, "rdfs1")
    assert m["n_triples"] == 1          # x type D
    assert m["lineage"]["rule_id"] == "rdfs"
    g = {(r.subj, r.pred, r.obj) for r in read_graph(spark, root).collect()}
    assert ("x", TYPE, "D") in g
    # idempotent: same batch-id re-run is a committed no-op
    m2 = infer_rdfs_batch(spark, root, "rdfs1")
    assert m2["n_triples"] == m["n_triples"]
