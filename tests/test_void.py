"""VoID dataset descriptions: summary counts, property partitions,
exact-vs-approx modes, and oracle parity via the registered query."""

from pyspark.sql import functions as F

from rdf_tabular_spark.operators.void import (RDF_TYPE, VOID,
                                              void_description)


def _triples(spark):
    rows = [("s1", "p1", "o1"), ("s1", "p1", "o2"), ("s2", "p1", "o1"),
            ("s2", "p2", "s1"), ("s3", "p2", "o3")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_void_summary_and_partitions(spark):
    ds = "http://ex.org/ds"
    out = void_description(_triples(spark), ds).collect()
    got = {(r.subj, r.pred): r.obj for r in out}
    assert got[(ds, RDF_TYPE)] == VOID + "Dataset"
    assert got[(ds, VOID + "triples")] == "5"
    assert got[(ds, VOID + "distinctSubjects")] == "3"
    assert got[(ds, VOID + "distinctObjects")] == "4"   # o1 o2 o3 s1
    assert got[(ds, VOID + "properties")] == "2"
    # one partition node per predicate, 3 triples each
    parts = [r for r in out if r.pred == VOID + "propertyPartition"]
    assert len(parts) == 2 and all(r.obj.startswith(ds + "#prop-")
                                   for r in parts)
    by_part = {r.subj: r for r in out if r.pred == VOID + "property"}
    ns = {by_part[p].obj: [r.obj for r in out
                           if r.subj == p and r.pred == VOID + "triples"]
          for p in (x.obj for x in parts)}
    assert ns == {"p1": ["3"], "p2": ["2"]}
    # typed integer literals
    dt = {r.pred: r.obj_datatype for r in out if r.subj == ds}
    assert dt[VOID + "triples"].endswith("integer")


def test_void_approx_mode_close(spark):
    ds = "http://ex.org/ds"
    t = spark.range(0, 2000).select(
        F.concat(F.lit("s"), (F.col("id") % 500).cast("string")).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("o"), F.col("id").cast("string")).alias("obj"))
    got = {r.pred: r.obj for r in
           void_description(t, ds, exact=False).collect() if r.subj == ds}
    assert got[VOID + "triples"] == "2000"          # plain count stays exact
    assert abs(int(got[VOID + "distinctSubjects"]) - 500) <= 25   # HLL ~5%
    assert abs(int(got[VOID + "distinctObjects"]) - 2000) <= 100


def test_void_plan_partial_aggregation(spark):
    plan = void_description(_triples(spark), "http://ex/d") \
        ._jdf.queryExecution().executedPlan().toString()
    # per-predicate counts partial-aggregate map-side before the exchange
    assert "partial_count" in plan
