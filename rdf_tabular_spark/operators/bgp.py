"""SPARQL-style basic-graph-pattern (BGP) matching over (subj, pred, obj)
triples — the query-side counterpart of the construction pipeline.

The reference emits RDF for downstream SPARQL stores (rdf-tabular
README.md: "Transform tabular data ... into RDF"); this module closes the
loop inside Spark: a BGP (a conjunction of triple patterns with shared
variables) compiles into a tree of self-joins over the triples DataFrame,
which is exactly how relational SPARQL engines execute BGPs (cf. Neumann &
Weikum, RDF-3X, VLDB 2008 — triple patterns as index scans joined on
shared variables).

Compilation model (single source of truth for Spark AND the DuckDB oracle):
``plan_bgp`` orders the patterns (most-constant-bound first, then greedily
by shared-variable connectivity so no join is ever a cartesian product);
``bgp_match`` executes the plan as DataFrame joins; ``bgp_sql`` emits the
identical plan as ANSI SQL. Because both paths consume the same plan, the
oracle checks the *semantics*, not a hand-transcribed copy.

Scale notes (10^12 triples):
- Each pattern is a filter over the triples scan — constant subject or
  predicate filters push down to the parquet/Iceberg scan (predicate
  columns are min/max-indexed in the graph store's pred_bucket layout,
  sinks/graph_store.py), so a pattern with any constant never reads the
  full graph.
- Joins shuffle on the shared variable(s) — the graph store buckets by
  subject, so subject-variable star joins (the common shape) co-locate and
  the exchange collapses on bucketed reads.
- ``broadcast_patterns`` marks patterns known to bind few rows (e.g. a
  scan over a vocabulary-sized predicate such as entity labels); those
  sides broadcast instead of shuffling the big side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]
_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _vars(pattern: Pattern) -> list[str]:
    """Variable names (without '?') in subj/pred/obj position order,
    deduplicated."""
    out: list[str] = []
    for term in pattern:
        if _is_var(term) and term[1:] not in out:
            out.append(term[1:])
    return out


def plan_bgp(patterns: Sequence[Pattern]) -> list[int]:
    """Join order as indices into ``patterns``: start from the pattern with
    the most constants (most selective under the classic bound-term
    heuristic), then repeatedly pick the most-constant pattern that shares
    at least one variable with the already-joined set. Raises ValueError if
    the BGP is disconnected (the join would be a cartesian product)."""
    if not patterns:
        raise ValueError("empty BGP")
    n_const = [sum(0 if _is_var(t) else 1 for t in p) for p in patterns]
    order = [max(range(len(patterns)),
                 key=lambda i: (n_const[i], -i))]
    bound = set(_vars(patterns[order[0]]))
    remaining = [i for i in range(len(patterns)) if i != order[0]]
    while remaining:
        connected = [i for i in remaining if bound & set(_vars(patterns[i]))]
        if not connected:
            raise ValueError(
                f"disconnected BGP: patterns {remaining} share no variable "
                f"with the joined set {sorted(bound)} (cartesian product)")
        nxt = max(connected, key=lambda i: (n_const[i], -i))
        order.append(nxt)
        bound |= set(_vars(patterns[nxt]))
        remaining.remove(nxt)
    return order


def _pattern_df(triples: DataFrame, pattern: Pattern) -> DataFrame:
    """One triple pattern → filter constants / same-variable equalities,
    project variable positions to variable-named columns."""
    df = triples
    first_pos: dict[str, str] = {}
    for pos, term in zip(_POS, pattern):
        if _is_var(term):
            var = term[1:]
            if var in first_pos:          # (?x, p, ?x) — join within the row
                df = df.filter(F.col(pos) == F.col(first_pos[var]))
            else:
                first_pos[var] = pos
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    return df.select(*[F.col(pos).alias(v) for v, pos in first_pos.items()])


def bgp_match(triples: DataFrame, patterns: Sequence[Pattern],
              broadcast_patterns: Sequence[int] = ()) -> DataFrame:
    """Match a BGP against the triples DataFrame; returns one column per
    variable (bag semantics, like SPARQL SELECT without DISTINCT).
    ``broadcast_patterns`` lists original pattern indices whose binding
    sets are known small (broadcast-join those sides)."""
    order = plan_bgp(patterns)
    result: DataFrame | None = None
    bound: set[str] = set()
    for idx in order:
        df = _pattern_df(triples, patterns[idx])
        if idx in broadcast_patterns:
            df = F.broadcast(df)
        if result is None:
            result, bound = df, set(_vars(patterns[idx]))
        else:
            shared = sorted(bound & set(_vars(patterns[idx])))
            result = result.join(df, on=shared, how="inner")
            bound |= set(_vars(patterns[idx]))
    out_vars: list[str] = []
    for p in patterns:
        for v in _vars(p):
            if v not in out_vars:
                out_vars.append(v)
    return result.select(*out_vars)


def bgp_sql(triples_sql: str, patterns: Sequence[Pattern]) -> str:
    """The same plan as ``bgp_match``, emitted as ANSI SQL over a triples
    relation (CTE) — the DuckDB oracle generator."""
    order = plan_bgp(patterns)
    subqs: list[str] = []
    for qi, idx in enumerate(order):
        sel: list[str] = []
        conds: list[str] = []
        first_pos: dict[str, str] = {}
        for pos, term in zip(_POS, patterns[idx]):
            if _is_var(term):
                var = term[1:]
                if var in first_pos:
                    conds.append(f"{pos} = {first_pos[var]}")
                else:
                    first_pos[var] = pos
                    sel.append(f"{pos} as {var}")
            else:
                conds.append(f"{pos} = '{term}'")
        where = (" where " + " and ".join(conds)) if conds else ""
        subqs.append(f"q{qi} as (select {', '.join(sel)} from t{where})")
    joins = ["q0"]
    bound = set(_vars(patterns[order[0]]))
    for qi, idx in enumerate(order[1:], start=1):
        shared = sorted(bound & set(_vars(patterns[idx])))
        joins.append(f"join q{qi} using ({', '.join(shared)})")
        bound |= set(_vars(patterns[idx]))
    out_vars: list[str] = []
    for p in patterns:
        for v in _vars(p):
            if v not in out_vars:
                out_vars.append(v)
    return (f"with t as ({triples_sql}),\n"
            + ",\n".join(subqs)
            + f"\nselect {', '.join(out_vars)} from {' '.join(joins)}")
