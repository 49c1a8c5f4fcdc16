"""OWL pD* (ter Horst) inference subset: owl:sameAs canonicalization and
the one-pass property rules (inverseOf, SymmetricProperty,
TransitiveProperty).

The reference emits plain RDF for downstream stores (README.md positions
rdf-tabular as an RDF.rb reader); entity-linked web extraction (stage 2/3
of the north-star pipeline) naturally produces ``owl:sameAs`` statements
between coreferent subjects — this module closes the graph over them the
way web-scale reasoners do (Urbani et al., "OWL reasoning with WebPIE",
ESWC 2010):

* **sameAs is NOT materialized as a closure.** A clique of n equivalent
  terms has n² sameAs triples and n× duplicated property triples; WebPIE's
  key result is that picking ONE canonical representative per equivalence
  class and rewriting the graph is semantically sufficient and linear.
  Equivalence classes are connected components over the (symmetric)
  sameAs edge set — :func:`sameas_mapping` reuses
  :func:`~rdf_tabular_spark.operators.components.canonical_mapping`
  (size-adaptive: driver union-find on sliver-sized edge sets, the
  batched min-label loop at scale).
* **Property rules run as ONE composition pass of broadcast joins** —
  the rule schema (inverseOf pairs, symmetric/transitive predicate sets)
  is vocabulary-sized, so it collects to the driver (``schema_cap``
  guarded) and instances never shuffle for it:
  rdfp8ax/bx  (p inverseOf q), (x p y) → (y q x)   [both directions]
  rdfp3       (p type SymmetricProperty), (x p y) → (y p x)
  rdfp4       (p type TransitiveProperty) → transitive closure of p
  Composition order inverse/symmetric → transitive (a symmetric
  transitive predicate closes over the symmetrized edge set). Deeper
  rule interleavings (transitive-derived edges re-entering inverse
  premises) need the full pD* fixpoint no one-pass cluster design runs —
  WebPIE makes the same cut.

Reference parity: rdf-tabular itself performs no inference (exhaustive
read of lib/ — reader.rb:86-221 streams asserted triples only); this is
part of the §2.9 web-scale extension tier, like rdfs_materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OWL = "http://www.w3.org/2002/07/owl#"
OWL_SAMEAS = _OWL + "sameAs"
OWL_INVERSE = _OWL + "inverseOf"
OWL_SYMMETRIC = _OWL + "SymmetricProperty"
OWL_TRANSITIVE = _OWL + "TransitiveProperty"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


# ---------------------------------------------------------------- sameAs

def sameas_mapping(triples: DataFrame,
                   driver_threshold: int = 200_000) -> DataFrame:
    """→ ``(term, canon)`` for every term in a sameAs statement.

    canon = lexicographic min of the equivalence class (deterministic;
    same convention as stage-3 canonicalization). Symmetry and
    transitivity are exactly connected components over the undirected
    sameAs edge set — no closure triples are ever materialized."""
    from .components import canonical_mapping
    edges = (triples.filter(F.col("pred") == OWL_SAMEAS)
             .filter(F.col("subj") != F.col("obj"))
             .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
             .distinct())
    return (canonical_mapping(edges, driver_threshold=driver_threshold)
            .select(F.col("id").alias("term"),
                    F.col("canonical_id").alias("canon")))


def sameas_rewrite(triples: DataFrame, mapping: DataFrame | None = None,
                   obj_is_iri_col: str | None = None,
                   broadcast: bool = True) -> DataFrame:
    """Canonicalized graph: subj/obj rewritten through the sameAs mapping,
    sameAs statements absorbed (their information now lives in the
    mapping), result deduplicated — rewriting coreferent subjects onto one
    term collapses their duplicate property triples, which is the point.

    ``mapping`` defaults to :func:`sameas_mapping` of the input. The
    mapping covers only terms that appear in sameAs statements — a sliver
    of the graph — so it broadcast-joins by default (two broadcast hash
    joins, the triple stream never shuffles); pass ``broadcast=False``
    when equivalence classes are corpus-sized. ``obj_is_iri_col`` guards
    object rewriting for frames that track literal-vs-IRI (a literal
    lexically equal to a mapped IRI must not be rewritten)."""
    if mapping is None:
        mapping = sameas_mapping(triples)
    m = F.broadcast(mapping) if broadcast else mapping
    t = triples.filter(F.col("pred") != OWL_SAMEAS)
    s_map = m.select(F.col("term").alias("subj"),
                     F.col("canon").alias("_s_canon"))
    t = (t.join(s_map, "subj", "left")
         .withColumn("subj", F.coalesce("_s_canon", "subj"))
         .drop("_s_canon"))
    o_map = m.select(F.col("term").alias("_o_key"),
                     F.col("canon").alias("_o_canon"))
    t = t.join(o_map, t["obj"] == o_map["_o_key"], "left")
    rewrite_ok = (F.col("_o_canon").isNotNull() if obj_is_iri_col is None
                  else F.col("_o_canon").isNotNull() & F.col(obj_is_iri_col))
    t = (t.withColumn("obj", F.when(rewrite_ok, F.col("_o_canon"))
                      .otherwise(F.col("obj")))
         .drop("_o_key", "_o_canon"))
    return t.distinct()


def sameas_mapping_sql(triples_sql: str) -> str:
    """:func:`sameas_mapping` as a DuckDB recursive CTE — symmetrize +
    reflexive-close the sameAs edges, then canon = min(reachable)."""
    return f"""
with recursive t as ({triples_sql}),
e as (
  select subj as a, obj as b from t
  where pred = '{OWL_SAMEAS}' and subj <> obj
  union
  select obj as a, subj as b from t
  where pred = '{OWL_SAMEAS}' and subj <> obj),
reach as (
  select a, a as b from e
  union
  select r.a, e.b from reach r join e on r.b = e.a)
select a as term, min(b) as canon from reach group by a
"""


def sameas_rewrite_sql(triples_sql: str,
                       obj_is_iri_sql: str | None = None) -> str:
    """:func:`sameas_rewrite` as DuckDB SQL (oracle emitter)."""
    guard = "" if obj_is_iri_sql is None else f" and {obj_is_iri_sql}"
    return f"""
with m as ({sameas_mapping_sql(triples_sql)}),
t as ({triples_sql})
select distinct
  coalesce(ms.canon, t.subj) as subj,
  t.pred,
  case when mo.canon is not null{guard} then mo.canon
       else t.obj end as obj
from t
left join m ms on ms.term = t.subj
left join m mo on mo.term = t.obj
where t.pred <> '{OWL_SAMEAS}'
"""


# --------------------------------------------- inverse / symmetric / transitive

def owl_horst_materialize(triples: DataFrame, include_input: bool = False,
                          schema_cap: int = 100_000,
                          max_closure_iter: int = 64) -> DataFrame:
    """Entailed ``(subj, pred, obj)`` under the one-pass pD* property
    rules (module docstring). ``include_input=False`` returns only NEW
    triples (set-minus the asserted input), mirroring
    :func:`~rdf_tabular_spark.operators.inference.rdfs_materialize`.

    Plan shape: ≤1 broadcast join for inverse, a predicate-pruned scan
    for symmetric, and one semi-naive closure per transitive predicate
    (predicate count is vocabulary-sized — the driver loop is over the
    SCHEMA, never the data)."""
    from .graph import transitive_closure
    spark = triples.sparkSession
    t = triples.select("subj", "pred", "obj")

    schema_rows = (t.filter(
        (F.col("pred") == OWL_INVERSE)
        | ((F.col("pred") == RDF_TYPE)
           & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)))
        .limit(schema_cap + 1).collect())
    if len(schema_rows) > schema_cap:
        raise ValueError(
            f"property-schema statements exceed schema_cap={schema_cap}")
    inv_pairs: set[tuple[str, str]] = set()
    symmetric: set[str] = set()
    transitive: set[str] = set()
    for r in schema_rows:
        if r.pred == OWL_INVERSE:
            inv_pairs.add((r.subj, r.obj))
            inv_pairs.add((r.obj, r.subj))
        elif r.obj == OWL_SYMMETRIC:
            symmetric.add(r.subj)
        else:
            transitive.add(r.subj)

    parts: list[DataFrame] = []
    # rdfp8ax/bx — one broadcast join over the symmetrized inverse pairs
    if inv_pairs:
        inv_df = F.broadcast(spark.createDataFrame(
            sorted(inv_pairs), ["pred", "inv_pred"]))
        parts.append(t.join(inv_df, "pred")
                     .select(F.col("obj").alias("subj"),
                             F.col("inv_pred").alias("pred"),
                             F.col("subj").alias("obj")))
    # rdfp3 — predicate-pruned scan, swap subject/object
    if symmetric:
        parts.append(t.filter(F.col("pred").isin(sorted(symmetric)))
                     .select(F.col("obj").alias("subj"), "pred",
                             F.col("subj").alias("obj")))
    # rdfp4 — closure over asserted ∪ inverse/symmetric-derived edges
    # (composition order: a symmetric transitive predicate closes over
    # the symmetrized edge set)
    if transitive:
        base = t
        for p in parts:
            base = base.unionByName(p)
        for pred in sorted(transitive):
            edges = (base.filter(F.col("pred") == pred)
                     .select(F.col("subj").alias("src"),
                             F.col("obj").alias("dst")))
            parts.append(transitive_closure(edges,
                                            max_iter=max_closure_iter)
                         .select(F.col("src").alias("subj"),
                                 F.lit(pred).alias("pred"),
                                 F.col("dst").alias("obj")))

    if not parts:
        return t.distinct() if include_input else t.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if include_input:
        out = out.unionByName(t)
    out = out.distinct()
    if not include_input:
        out = out.join(t.select("subj", "pred", "obj").distinct(),
                       ["subj", "pred", "obj"], "left_anti")
    return out


def owl_horst_sql(triples_sql: str, include_input: bool = False) -> str:
    """:func:`owl_horst_materialize` as DuckDB SQL. The transitive leg is
    one generic recursive CTE keyed by predicate over the same
    inverse/symmetric-extended edge set the operator closes over."""
    q = f"""
with recursive t as ({triples_sql}),
inv as (
  select subj as p, obj as q from t where pred = '{OWL_INVERSE}'
  union
  select obj as p, subj as q from t where pred = '{OWL_INVERSE}'),
sym as (select subj as p from t
        where pred = '{RDF_TYPE}' and obj = '{OWL_SYMMETRIC}'),
trans as (select subj as p from t
          where pred = '{RDF_TYPE}' and obj = '{OWL_TRANSITIVE}'),
d_inv as (select t.obj as subj, inv.q as pred, t.subj as obj
          from t join inv on inv.p = t.pred),
d_sym as (select t.obj as subj, t.pred, t.subj as obj
          from t join sym on sym.p = t.pred),
base as (select subj, pred, obj from t
         union all select * from d_inv
         union all select * from d_sym),
tedges as (select b.pred as p, b.subj as src, b.obj as dst
           from base b join trans on trans.p = b.pred),
reach as (
  select p, src, dst from tedges
  union
  select r.p, r.src, e.dst from reach r
  join tedges e on e.p = r.p and e.src = r.dst),
d_trans as (select src as subj, p as pred, dst as obj from reach),
allderived as (
  select distinct subj, pred, obj from (
    select * from d_inv
    union all select * from d_sym
    union all select * from d_trans))
"""
    if include_input:
        return q + ("select distinct subj, pred, obj from "
                    "(select subj, pred, obj from t "
                    "union all select * from allderived)")
    return q + ("select subj, pred, obj from allderived "
                "anti join (select subj, pred, obj from t) asserted "
                "using (subj, pred, obj)")
