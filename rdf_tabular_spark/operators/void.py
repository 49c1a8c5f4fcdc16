"""VoID dataset descriptions (W3C Vocabulary of Interlinked Datasets) —
the RDF-standard statistical self-description of a triple dataset:
void:triples / void:distinctSubjects / void:distinctObjects /
void:properties plus one void:propertyPartition node per predicate.

This is the KG analogue of the corpus-telemetry tier (queries.corpus_stats):
every ingestion run publishes these numbers so downstream users can size
joins and pick partitions without scanning the store. The reference has no
equivalent (its output is a single document); at web scale the description
is derived relationally — one aggregation pass over (subj, pred, obj).

Scale notes: the three COUNT(DISTINCT) each shuffle the full column at
exact precision; ``exact=False`` switches them to HyperLogLog
(approx_count_distinct, map-side partial, ~2% error) which is the right
default for 10^12-triple stores — exact mode exists for small stores and
for the DuckDB oracle parity check. The per-predicate partition table is a
plain groupBy(pred) with map-side combine (predicate cardinality is tiny
relative to the corpus; skewed predicates like rdf:type are exactly why
the count uses partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOID = "http://rdfs.org/ns/void#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"


def _triple_struct(subj, pred, obj, obj_is_iri: bool, datatype=None):
    return F.struct(
        subj.alias("subj"), pred.alias("pred"), obj.alias("obj"),
        F.lit(obj_is_iri).alias("obj_is_iri"),
        (F.lit(datatype) if datatype else F.lit(None)).cast("string")
        .alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("table_url"),
        F.lit(None).cast("long").alias("source_num"))


def void_description(triples: DataFrame, dataset_iri: str,
                     exact: bool = True) -> DataFrame:
    """→ VoID triples describing ``triples``: the dataset node with its
    four summary counts and one propertyPartition node per predicate
    (``<dataset>#prop-<md5(pred)[:8]>`` — deterministic, join-free names).

    ``exact=False`` uses HyperLogLog distinct counts (the 10^12-triple
    mode); ``exact=True`` matches the SQL oracle bit-for-bit."""
    t = triples.select("subj", "pred", "obj")
    d = F.approx_count_distinct if not exact else F.countDistinct
    ds = F.lit(dataset_iri)

    summary = t.agg(
        F.count("*").alias("n"),
        d("subj").alias("dsubj"),
        d("obj").alias("dobj"),
        d("pred").alias("npred"))
    s_int = lambda c: F.col(c).cast("long").cast("string")  # noqa: E731
    summary_triples = (summary.select(F.explode(F.array(
        _triple_struct(ds, F.lit(RDF_TYPE), F.lit(VOID + "Dataset"), True),
        _triple_struct(ds, F.lit(VOID + "triples"), s_int("n"),
                       False, XSD_INTEGER),
        _triple_struct(ds, F.lit(VOID + "distinctSubjects"), s_int("dsubj"),
                       False, XSD_INTEGER),
        _triple_struct(ds, F.lit(VOID + "distinctObjects"), s_int("dobj"),
                       False, XSD_INTEGER),
        _triple_struct(ds, F.lit(VOID + "properties"), s_int("npred"),
                       False, XSD_INTEGER),
    )).alias("t")).select("t.*"))

    parts = t.groupBy("pred").agg(F.count("*").alias("n"))
    part_iri = F.concat(F.lit(dataset_iri + "#prop-"),
                        F.substring(F.md5("pred"), 1, 8))
    part_triples = parts.select(F.explode(F.array(
        _triple_struct(ds, F.lit(VOID + "propertyPartition"), part_iri, True),
        _triple_struct(part_iri, F.lit(VOID + "property"), F.col("pred"),
                       True),
        _triple_struct(part_iri, F.lit(VOID + "triples"),
                       F.col("n").cast("string"), False, XSD_INTEGER),
    )).alias("t")).select("t.*")

    return summary_triples.unionByName(part_triples)


def void_sql(triples_sql: str, dataset_iri: str) -> str:
    """DuckDB mirror of :func:`void_description` (exact mode) over a
    triples-producing SQL query with columns (subj, pred, obj)."""
    ds = dataset_iri
    return f"""
with t as ({triples_sql}),
s as (select count(*) as n, count(distinct subj) as dsubj,
             count(distinct obj) as dobj, count(distinct pred) as npred
      from t),
p as (select pred, count(*) as n from t group by pred)
select '{ds}' as subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' as pred,
       '{VOID}Dataset' as obj from s
union all
select '{ds}', '{VOID}triples', cast(n as varchar) from s
union all
select '{ds}', '{VOID}distinctSubjects', cast(dsubj as varchar) from s
union all
select '{ds}', '{VOID}distinctObjects', cast(dobj as varchar) from s
union all
select '{ds}', '{VOID}properties', cast(npred as varchar) from s
union all
select '{ds}', '{VOID}propertyPartition',
       '{ds}#prop-' || substring(md5(pred), 1, 8) from p
union all
select '{ds}#prop-' || substring(md5(pred), 1, 8), '{VOID}property', pred
from p
union all
select '{ds}#prop-' || substring(md5(pred), 1, 8), '{VOID}triples',
       cast(n as varchar) from p
"""
