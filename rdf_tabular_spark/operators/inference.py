"""RDFS inference: materialize the ρdf entailment rules over a triples
DataFrame.

The reference emits RDF meant for stores that apply RDFS semantics
(rdf-tabular README.md positions its output as standard RDF; csvw:
vocabulary terms carry rdfs:domain/range/subPropertyOf in the CSVW
ontology). This operator closes a graph under the practical RDFS subset —
the "minimal deductive system" ρdf fragment (Muñoz, Pérez, Gutierrez,
ESWC 2007): rules rdfs2 (domain), rdfs3 (range), rdfs5 (subPropertyOf
transitivity), rdfs7 (subproperty inheritance), rdfs9 (type inheritance),
rdfs11 (subClassOf transitivity). Axiomatic triples and the
literal/container rules (rdfs1/4/6/8/10/12/13) are intentionally out —
they add noise (every resource typed rdfs:Resource), not information.

Scale design (10^12 instance triples): the SCHEMA (subClassOf /
subPropertyOf / domain / range statements) is vocabulary-sized — hundreds
to low millions — while instances are the 10^12. So the fixpoint runs
DRIVER-SIDE over the schema only (including the self-referential corner
where subPropertyOf chains redefine schema predicates themselves), and
instance entailment is then a FIXED number of broadcast-joins over the
big data: one join per rule family, no iteration, no instance-level
shuffle beyond the final distinct. This is the standard cluster RDFS
design (cf. Urbani et al., WebPIE: a web-scale parallel inference
engine, ISWC 2009 — schema small enough to replicate, instance pass
join-only).

A ``schema_cap`` guards the driver collect: if the schema exceeds it the
operator raises instead of silently OOMing the driver.

Contract boundary: meta-statements that give ``rdf:type`` or the RDFS
predicates themselves superproperties / domains / ranges (so that derived
triples re-enter rule premises transitively through the meta level) are
supported for ONE rewrite level (``p rdfs:subPropertyOf rdfs:subClassOf``
works); deeper meta-towers are outside the contract — they require an
instance-level fixpoint that no one-pass cluster design performs (WebPIE
makes the same cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = _RDFS + "subClassOf"
RDFS_SUBPROP = _RDFS + "subPropertyOf"
RDFS_DOMAIN = _RDFS + "domain"
RDFS_RANGE = _RDFS + "range"

_SCHEMA_PREDS = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)


def _trans_close(pairs: set[tuple[str, str]]) -> set[tuple[str, str]]:
    closure = set(pairs)
    while True:
        new = {(a, d) for (a, b) in closure for (c, d) in pairs
               if b == c} - closure
        if not new:
            return closure
        closure |= new


def schema_fixpoint(schema: set[tuple[str, str, str]],
                    instance_preds: set[str] | None = None
                    ) -> dict[str, set[tuple[str, str]]]:
    """Driver-side fixpoint over schema triples → the four closed maps.

    Handles the self-referential corner: a predicate declared
    ``subPropertyOf rdfs:subClassOf`` (etc.) makes ITS statements schema
    statements too (rdfs7 rewrites them), so the schema set itself grows —
    ``instance_preds`` callers pass the distinct predicate set so the
    fixpoint knows which rewrites are possible. Returns
    ``{"spc", "scc", "dom", "rng"}`` where spc/scc are transitively closed
    pair sets and dom/rng are raw (property, class) pairs."""
    triples = set(schema)
    while True:
        spo = {(s, o) for s, p, o in triples if p == RDFS_SUBPROP}
        spc = _trans_close(spo)
        # rdfs7 applied within the schema: p subPropertyOf q where q is an
        # RDFS predicate turns every (x p y) schema-candidate into (x q y)
        derived = {(s, q, o) for s, p, o in triples
                   for (pp, q) in spc if pp == p and q in _SCHEMA_PREDS}
        new = derived - triples
        if not new:
            scc = _trans_close(
                {(s, o) for s, p, o in triples if p == RDFS_SUBCLASS})
            dom = {(s, o) for s, p, o in triples if p == RDFS_DOMAIN}
            rng = {(s, o) for s, p, o in triples if p == RDFS_RANGE}
            return {"spc": spc, "scc": scc, "dom": dom, "rng": rng}
        triples |= new


def rdfs_materialize(triples: DataFrame, include_input: bool = False,
                     schema_cap: int = 1_000_000) -> DataFrame:
    """Entailed ``(subj, pred, obj)`` triples under ρdf rules
    rdfs2/3/5/7/9/11 (distinct — entailment produces a graph, a SET).
    ``include_input=False`` (default) returns only the NEW triples; True
    unions the input's (subj, pred, obj) in.

    Plan shape: 3 broadcast joins + 1 distinct. The schema collect is
    bounded by ``schema_cap``."""
    spark = triples.sparkSession
    t = triples.select("subj", "pred", "obj")

    # -- 1. schema collect (vocabulary-sized) + the self-reference guard:
    # predicates that rdfs7-rewrite into schema predicates pull their
    # triples into the driver fixpoint too.
    base = t.filter(F.col("pred").isin(list(_SCHEMA_PREDS)))
    rows = base.limit(schema_cap + 1).collect()
    if len(rows) > schema_cap:
        raise ValueError(
            f"schema statements exceed schema_cap={schema_cap}; raise the "
            f"cap or split the vocabulary from the instance data")
    schema = {(r.subj, r.pred, r.obj) for r in rows}
    spc = _trans_close({(s, o) for s, p, o in schema if p == RDFS_SUBPROP})
    reach = {p for (p, q) in spc if q in _SCHEMA_PREDS}
    if reach:
        extra = t.filter(F.col("pred").isin(sorted(reach))) \
            .limit(schema_cap + 1).collect()
        if len(extra) > schema_cap:
            raise ValueError(
                f"schema-reaching statements exceed schema_cap="
                f"{schema_cap}")
        schema |= {(r.subj, r.pred, r.obj) for r in extra}
    maps = schema_fixpoint(schema)
    spc, scc, dom, rng = maps["spc"], maps["scc"], maps["dom"], maps["rng"]

    # -- 1b. rdfs5/rdfs11: the closed hierarchy pairs are themselves
    # entailed triples (driver-sized constant DataFrames).
    closure_parts = []
    if spc:
        closure_parts.append(spark.createDataFrame(
            sorted(spc), ["subj", "obj"])
            .select("subj", F.lit(RDFS_SUBPROP).alias("pred"), "obj"))
    if scc:
        closure_parts.append(spark.createDataFrame(
            sorted(scc), ["subj", "obj"])
            .select("subj", F.lit(RDFS_SUBCLASS).alias("pred"), "obj"))

    # -- 2. rdfs7 (one broadcast join): (x p y), (p spc q) => (x q y).
    # prop_ext = reflexive spc restricted to ACTUALLY useful rows — the
    # identity rows only matter where a domain/range lookup follows.
    derived7 = None
    if spc:
        spc_df = F.broadcast(spark.createDataFrame(
            sorted(spc), ["pred", "sup_pred"]))
        derived7 = (t.join(spc_df, "pred")
                    .select("subj", F.col("sup_pred").alias("pred"), "obj"))

    # -- 3. rdfs2/3 (one broadcast join over the extended property set):
    # dom/rng looked up through {p} ∪ sup(p).
    ext = {(p, p) for p in
           ({a for a, _ in spc} | {p for p, _ in dom} | {p for p, _ in rng})}
    ext |= spc
    dom_pairs = sorted({(p, c) for (p, q) in ext for (q2, c) in dom
                        if q == q2})
    rng_pairs = sorted({(p, c) for (p, q) in ext for (q2, c) in rng
                        if q == q2})
    typed_parts = []
    if dom_pairs:
        dom_df = F.broadcast(spark.createDataFrame(dom_pairs,
                                                   ["pred", "cls"]))
        typed_parts.append(t.join(dom_df, "pred")
                           .select(F.col("subj"),
                                   F.lit(RDF_TYPE).alias("pred"),
                                   F.col("cls").alias("obj")))
    if rng_pairs:
        rng_df = F.broadcast(spark.createDataFrame(rng_pairs,
                                                   ["pred", "cls"]))
        typed_parts.append(t.join(rng_df, "pred")
                           .select(F.col("obj").alias("subj"),
                                   F.lit(RDF_TYPE).alias("pred"),
                                   F.col("cls").alias("obj")))

    # -- 4. rdfs9/11 (one broadcast join): every type triple — asserted or
    # just derived — inherits up the closed class hierarchy.
    types = t.filter(F.col("pred") == RDF_TYPE)
    for part in typed_parts:
        types = types.unionByName(part)
    derived9 = None
    if scc:
        scc_df = F.broadcast(spark.createDataFrame(
            sorted(scc), ["obj", "sup_cls"]))
        derived9 = (types.join(scc_df, "obj")
                    .select("subj", F.col("pred"),
                            F.col("sup_cls").alias("obj")))

    parts = [p for p in ([derived7] + closure_parts + typed_parts
                         + [derived9])
             if p is not None]
    if include_input:
        parts = [t] + parts
    if not parts:
        return t.limit(0) if not include_input else t.distinct()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.distinct()
    if not include_input:
        # "new" = not asserted in the input (set difference, one anti-join)
        out = out.join(t.select("subj", "pred", "obj").distinct(),
                       ["subj", "pred", "obj"], "left_anti")
    return out


def rdfs_sql(triples_sql: str, include_input: bool = False) -> str:
    """``rdfs_materialize`` as DuckDB SQL (recursive CTEs for the schema
    closures, joins for the instance rules) — the oracle emitter. The
    schema self-reference corner is handled by ONE level of rdfs7 rewrite
    into schema position before the closures (sufficient for oracle
    fixtures; the Spark side iterates to a true fixpoint and the fuzz
    harness cross-checks both against a naive reference)."""
    q = f"""
with recursive t as ({triples_sql}),
sp0 as (select subj as a, obj as b from t
        where pred = '{RDFS_SUBPROP}'),
spc0 as (select a, b from sp0
         union select s.a, e.b from spc0 s join sp0 e on s.b = e.a),
-- one rdfs7 rewrite into schema predicates (self-reference corner)
schema1 as (
    select subj, pred, obj from t
    where pred in ('{RDFS_SUBCLASS}', '{RDFS_SUBPROP}',
                   '{RDFS_DOMAIN}', '{RDFS_RANGE}')
    union
    select t.subj, c.b as pred, t.obj from t
    join spc0 c on c.a = t.pred
    where c.b in ('{RDFS_SUBCLASS}', '{RDFS_SUBPROP}',
                  '{RDFS_DOMAIN}', '{RDFS_RANGE}')),
sp as (select subj as a, obj as b from schema1
       where pred = '{RDFS_SUBPROP}'),
spc as (select a, b from sp
        union select s.a, e.b from spc s join sp e on s.b = e.a),
sc as (select subj as a, obj as b from schema1
       where pred = '{RDFS_SUBCLASS}'),
scc as (select a, b from sc
        union select s.a, e.b from scc s join sc e on s.b = e.a),
dom as (select subj as p, obj as c from schema1
        where pred = '{RDFS_DOMAIN}'),
rng as (select subj as p, obj as c from schema1
        where pred = '{RDFS_RANGE}'),
ext as (select a as p, a as q from spc
        union select p, p from dom union select p, p from rng
        union select a as p, b as q from spc),
d7 as (select t.subj, c.b as pred, t.obj from t
       join spc c on c.a = t.pred),
d2 as (select t.subj, '{RDF_TYPE}' as pred, d.c as obj
       from t join ext e on e.p = t.pred join dom d on d.p = e.q),
d3 as (select t.obj as subj, '{RDF_TYPE}' as pred, r.c as obj
       from t join ext e on e.p = t.pred join rng r on r.p = e.q),
types as (select subj, obj from t where pred = '{RDF_TYPE}'
          union all select subj, obj from d2
          union all select subj, obj from d3),
d9 as (select y.subj, '{RDF_TYPE}' as pred, c.b as obj
       from types y join scc c on c.a = y.obj),
d5 as (select a as subj, '{RDFS_SUBPROP}' as pred, b as obj from spc),
d11 as (select a as subj, '{RDFS_SUBCLASS}' as pred, b as obj from scc),
allderived as (
    select distinct subj, pred, obj from (
        select * from d7 union all select * from d2
        union all select * from d3 union all select * from d9
        union all select * from d5 union all select * from d11))
"""
    if include_input:
        return q + ("select distinct subj, pred, obj from "
                    "(select subj, pred, obj from t "
                    "union all select * from allderived)")
    return q + ("select subj, pred, obj from allderived "
                "anti join (select subj, pred, obj from t) asserted "
                "using (subj, pred, obj)")
