"""Mirror of the driver's DuckDB cross-check: every oracle-backed query in
``__spark_entry__.queries()`` must match its ``oracle_sql()`` on row count,
column names, and order-insensitive values at sf0.001."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from rdf_tabular_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _assert_scalar_schema(qdf, name):
    # The driver canonicalizes via pandas sort_values, which raises
    # "unhashable type: 'list'" on array/map/struct cells — every
    # registered query must project scalar columns only.
    from pyspark.sql import types as ST
    complex_cols = [f.name for f in qdf.schema.fields
                    if isinstance(f.dataType,
                                  (ST.ArrayType, ST.MapType, ST.StructType))]
    assert not complex_cols, \
        f"{name}: complex-typed output columns {complex_cols} break the " \
        "driver's pandas canonicalizer — project scalars (concat_ws)"


@pytest.mark.parametrize("name", sorted(Q.oracle_sql()))
def test_query_matches_oracle(spark, ddb, name):
    qdf = Q.queries()[name](spark, SF_DIR)
    _assert_scalar_schema(qdf, name)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(Q.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == \
        sorted(c.lower() for c in ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count mismatch"
    a = _canon(spark_rows, [c.lower() for c in spark_cols])
    b = _canon(ddb_rows, [c.lower() for c in ddb_cols])
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


@pytest.mark.parametrize("name", sorted(set(Q.queries()) - set(Q.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = Q.queries()[name](spark, SF_DIR)
    _assert_scalar_schema(df, name)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() > 0


# The driver's correctness artifact sweeps exactly the FIRST 50 registry
# entries in order (round-3 verdict: the whole SPARQL/OWL/graph/curation
# tier once sat past the cutoff and had no hard-signal row). Pin the window
# so an append or refactor can never silently evict the risky tiers from
# the driver's gate — new queries belong PAST position 50.
_SWEEP_WINDOW = [
    "kg_bgp_star", "kg_bgp_path", "kg_bgp_optional", "kg_bgp_filter",
    "kg_bgp_union", "kg_bgp_minus", "kg_bgp_graph", "kg_bgp_having",
    "kg_bgp_values", "kg_bgp_bind", "kg_bgp_exists", "kg_bgp_agg",
    "kg_bgp_group_concat", "kg_bgp_subselect", "kg_sparql_select",
    "kg_sparql_agg", "kg_sparql_funcs", "kg_describe_docs", "kg_term_lang",
    "kg_term_datatype", "kg_term_sameterm", "graph_path_expr",
    "graph_path_star", "graph_path_opt", "graph_closure_doubling",
    "graph_closure_ancestors", "graph_pagerank", "kg_bgp_path_expr",
    "kg_construct_derived", "kg_rdfs_derived", "kg_owl_derived",
    "kg_sameas_mapping", "kg_sameas_canonical", "kg_entity_mentions_join",
    "kg_microdata_triples", "kg_canonicalized_triples", "kg_canonical_dupes",
    "kg_pred_stats", "kg_property_table", "text_pii_scrub",
    "sample_stratified", "pack_sequences", "text_decontaminate",
    "corpus_curated", "dedup_span_stats", "corpus_vocabulary",
    "corpus_length_quantiles", "fk_group_integrity", "corpus_stats",
    "ann_cosine_topk",
]


def test_driver_sweep_window_pinned():
    assert list(Q._QUERIES)[:50] == _SWEEP_WINDOW
