"""Truth-discovery fusion and statement reification over materialized
triples — the last KG-construction stage after canonicalization (stage 3)
merges subjects: once several sources assert values for the same
``(subj, pred)``, something must pick the value the graph publishes.

The reference stops at per-table triple emission (rdf_values,
``lib/rdf/tabular/reader.rb:199-269``) — a single CSV is internally
consistent so it never needs fusion.  A web-scale extractor does: the same
entity is described by thousands of pages that disagree, and the classic
answer (Dong et al., "Data Fusion: Resolving Conflicts from Multiple
Sources", VLDB 2009) is per-attribute voting.  ``fuse_majority`` is the
deterministic majority-vote tier of that design; source-trust weighting
drops in by replacing the vote count with a weight sum on the same plan.

Scale shape: one ``(subj, pred, obj)`` partial-aggregated count (map-side
combine collapses repeated assertions before the shuffle) followed by one
``(subj, pred)`` window — two keyed exchanges, payload-free, skew-bounded
by the number of *distinct* conflicting values per attribute (small by
construction), never by assertion multiplicity.

``reify_statements`` is the provenance face: RDF reification
(rdf:Statement / rdf:subject / rdf:predicate / rdf:object, RDF 1.1
Concepts §5.3) with a content-addressed statement IRI, so per-statement
annotations (source url, extraction confidence, crawl timestamp) can be
attached as ordinary triples in the same store.  A narrow 4× explode — no
shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def fuse_majority(assertions: DataFrame,
                  subj: str = "subj", pred: str = "pred",
                  obj: str = "obj") -> DataFrame:
    """Majority-vote data fusion → one ``(subj, pred)`` row carrying the
    winning object, its vote count, and the conflict cardinality.

    Ties break on the lexical-min object — the same determinism contract as
    stage 3's canonical-subject election, so reruns and resumed checkpoints
    publish identical graphs.

    Output: ``(subj, pred, obj, n_support, n_values)`` where ``n_support``
    is the winner's vote count and ``n_values`` the number of distinct
    objects that competed (1 = no conflict).
    """
    votes = (assertions
             .groupBy(F.col(subj).alias("subj"), F.col(pred).alias("pred"),
                      F.col(obj).alias("obj"))
             .agg(F.count("*").alias("n_support")))
    attr = Window.partitionBy("subj", "pred")
    ranked = votes.select(
        "subj", "pred", "obj", "n_support",
        F.row_number().over(
            attr.orderBy(F.col("n_support").desc(), F.col("obj").asc()))
        .alias("_rn"),
        F.count("*").over(attr).alias("n_values"))
    return (ranked.where(F.col("_rn") == 1)
            .select("subj", "pred", "obj",
                    F.col("n_support").cast("long").alias("n_support"),
                    F.col("n_values").cast("long").alias("n_values")))


def fuse_majority_sql(assertions_sql: str) -> str:
    """DuckDB oracle for :func:`fuse_majority` — identical vote/rank
    semantics spelled relationally."""
    return f"""
with votes as (
  select subj, pred, obj, count(*) as n_support
  from ({assertions_sql}) group by subj, pred, obj),
ranked as (
  select subj, pred, obj, n_support,
         row_number() over (partition by subj, pred
                            order by n_support desc, obj asc) as rn,
         count(*) over (partition by subj, pred) as n_values
  from votes)
select subj, pred, obj, n_support::bigint as n_support,
       n_values::bigint as n_values
from ranked where rn = 1
"""


def reify_statements(triples: DataFrame) -> DataFrame:
    """RDF-reify each distinct statement → 4 provenance-anchor triples.

    The statement IRI is content-addressed (``urn:stmt:md5(s|p|o)``) so it
    is stable across reruns, batches, and engines — annotation triples
    written in a later batch attach to the same anchor without coordination.
    ``md5`` is the cross-engine-stable choice (same reasoning as the dedup
    tier); swap ``xxhash64`` at production scale for the same plan.

    Plan: distinct → one narrow projection with a 4-element inline explode.
    The only exchange is the distinct's — nothing else moves.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    stmt = F.concat(F.lit("urn:stmt:"),
                    F.md5(F.concat_ws("|", "subj", "pred", "obj")))
    quad = F.array(
        F.struct(F.lit(RDF_NS + "type").alias("p"),
                 F.lit(RDF_NS + "Statement").alias("o")),
        F.struct(F.lit(RDF_NS + "subject").alias("p"), F.col("subj").alias("o")),
        F.struct(F.lit(RDF_NS + "predicate").alias("p"), F.col("pred").alias("o")),
        F.struct(F.lit(RDF_NS + "object").alias("p"), F.col("obj").alias("o")))
    return (t.select(stmt.alias("stmt"), F.explode(quad).alias("r"))
            .select("stmt", F.col("r.p").alias("pred"),
                    F.col("r.o").alias("obj")))


def reify_statements_sql(triples_sql: str) -> str:
    """DuckDB oracle for :func:`reify_statements` — the 4-way explode as a
    UNION ALL over the distinct statement set."""
    ns = RDF_NS
    return f"""
with t as (select distinct subj, pred, obj from ({triples_sql})),
s as (select 'urn:stmt:' || md5(subj || '|' || pred || '|' || obj) as stmt,
             subj, pred, obj from t)
select stmt, '{ns}type' as pred, '{ns}Statement' as obj from s
union all select stmt, '{ns}subject', subj from s
union all select stmt, '{ns}predicate', pred from s
union all select stmt, '{ns}object', obj from s
"""
