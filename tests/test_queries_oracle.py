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
# entries in order. ROTATION POLICY (r4 verdict, made mechanism in r5):
# queries.py composes _QUERIES from the explicit _DRIVER_WINDOW list —
# ~10 long-green sentinels + the newest / never-driver-swept tiers — so
# every tier earns a green CORRECTNESS row within a round of landing.
# This pin asserts the ROUND-5 composition: rotating next round means
# editing queries._DRIVER_WINDOW and this list together, consciously.
_SWEEP_WINDOW = [
    # sentinels (driver-green in earlier rounds)
    "csvw_triples_nation", "kg_pages_triples", "dedup_exact",
    "agg_pricing_summary", "fk_orders_customer", "kg_microdata_triples",
    "ann_cosine_topk",
    # round-5 additions
    "multimodal_decode", "multimodal_decode_audio",
    "ann_recall_ivf", "ann_recall_pq",
    # round-4 tiers never swept before round 5
    "webtables_type_profile", "webtables_typed_triples",
    "webtables_header_triples", "webtables_subject_column",
    "webtables_entity_triples", "webtables_schema_freq",
    "webtables_pred_induction",
    "kg_shacl_report", "kg_shacl_summary",
    "dedup_incremental_pairs", "dedup_incremental_keep",
    "dedup_winnow_fps", "dedup_winnow_pairs",
    "dedup_semantic_pairs", "dedup_semantic_keep",
    "kg_fused_triples", "kg_reified_triples", "kg_hearst_pairs",
    "kg_rdfa_triples",
    "graph_communities", "graph_kcore", "graph_hits", "graph_bfs_depths",
    "graph_sage_features",
    "crawl_frontier", "crawl_recrawl_schedule", "crawl_sitemap_frontier",
    "text_bm25", "text_c4_lines", "text_tfidf_terms", "text_readability",
    "ann_int8_topk", "ann_pq_rerank_topk", "ann_recall_lsh",
    "ann_cosine_batch_topk",
    "events_sessionize", "sample_mixture", "er_blocked_part_names",
    "kg_void_description",
]


def test_driver_sweep_window_pinned():
    assert list(Q._QUERIES)[:50] == _SWEEP_WINDOW
    # the window is the explicit rotation list, every entry oracle-backed
    assert Q._DRIVER_WINDOW == _SWEEP_WINDOW
    oracles = Q.oracle_sql()
    assert all(name in oracles for name in _SWEEP_WINDOW)
    # rotation must never DROP a query: the reordered view and the
    # registry hold exactly the same entries
    assert set(Q._QUERIES) == set(Q._REGISTRY)
    assert len(Q._QUERIES) == len(Q._REGISTRY)
