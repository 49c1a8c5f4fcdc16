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
