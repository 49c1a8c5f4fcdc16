"""Property-based checks for the property-path engine (operators/paths.py):
(1) unparse→parse round-trips every AST; (2) the SQL emitter agrees with an
independent driver-side reference evaluation of SPARQL §9.1 semantics on
random small graphs — a third implementation, so a shared bug in the two
shipped emitters can't hide."""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_tabular_spark.operators import paths as P

_PREDS = ["p", "q", "r"]

_atoms = st.one_of(
    st.sampled_from(_PREDS).map(P.Atom),
    st.lists(st.sampled_from(_PREDS), min_size=1, max_size=2, unique=True)
      .map(lambda ps: P.NegSet(tuple(ps))),
)


def _extend(children):
    return st.one_of(
        children.map(P.Inv),
        children.map(P.Plus),
        children.map(P.Star),
        children.map(P.Opt),
        st.tuples(children, children).map(lambda t: P.Seq(*t)),
        st.tuples(children, children).map(lambda t: P.Alt(*t)),
    )


_asts = st.recursive(_atoms, _extend, max_leaves=6)


def _unparse(node) -> str:
    """Fully-parenthesized text for ``node`` (parens preserve structure, so
    parse(unparse(x)) == x regardless of precedence)."""
    if isinstance(node, P.Atom):
        return node.pred
    if isinstance(node, P.NegSet):
        return "!(" + "|".join(node.preds) + ")"
    if isinstance(node, P.Inv):
        return f"^({_unparse(node.child)})"
    if isinstance(node, P.Plus):
        return f"({_unparse(node.child)})+"
    if isinstance(node, P.Star):
        return f"({_unparse(node.child)})*"
    if isinstance(node, P.Opt):
        return f"({_unparse(node.child)})?"
    if isinstance(node, P.Seq):
        return f"({_unparse(node.left)}/{_unparse(node.right)})"
    if isinstance(node, P.Alt):
        return f"({_unparse(node.left)}|{_unparse(node.right)})"
    raise TypeError(node)


@given(_asts)
def test_unparse_parse_roundtrip(ast):
    assert P.parse_path(_unparse(ast)) == ast


def _ref_eval(node, edges: list[tuple[str, str, str]]) -> Counter:
    """SPARQL §9.1 reference: bag for atom/^///|, set for +/*/?
    (ZeroLengthPath identity ranges over all graph terms)."""
    if isinstance(node, P.Atom):
        return Counter((s, o) for s, p, o in edges if p == node.pred)
    if isinstance(node, P.NegSet):
        return Counter((s, o) for s, p, o in edges if p not in node.preds)
    if isinstance(node, P.Inv):
        return Counter((d, s) for (s, d), n in
                       _ref_eval(node.child, edges).items()
                       for _ in range(n))
    if isinstance(node, P.Seq):
        a = _ref_eval(node.left, edges)
        b = _ref_eval(node.right, edges)
        out: Counter = Counter()
        for (s1, m1), n1 in a.items():
            for (m2, d2), n2 in b.items():
                if m1 == m2:
                    out[(s1, d2)] += n1 * n2
        return out
    if isinstance(node, P.Alt):
        return _ref_eval(node.left, edges) + _ref_eval(node.right, edges)
    if isinstance(node, P.Plus):
        base = set(_ref_eval(node.child, edges))
        closure = set(base)
        while True:
            new = {(s, d2) for (s, d) in closure for (s2, d2) in base
                   if d == s2} - closure
            if not new:
                return Counter(dict.fromkeys(closure, 1))
            closure |= new
    if isinstance(node, (P.Star, P.Opt)):
        ident = {(n, n) for s, p, o in edges for n in (s, o)}
        if isinstance(node, P.Star):
            child = set(_ref_eval(P.Plus(node.child), edges))
        else:
            child = set(_ref_eval(node.child, edges))
        return Counter(dict.fromkeys(ident | child, 1))
    raise TypeError(node)


_nodes = st.sampled_from(["a", "b", "c", "d"])
_edges = st.lists(
    st.tuples(_nodes, st.sampled_from(_PREDS), _nodes),
    min_size=0, max_size=8, unique=True)


@settings(max_examples=150, deadline=None)
@given(_asts, _edges)
def test_sql_emitter_matches_reference_semantics(ast, edges):
    path = _unparse(ast)
    if edges:
        vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in edges)
        tsql = f"select * from (values {vals}) v(subj, pred, obj)"
    else:
        tsql = ("select * from (values ('x','x','x')) v(subj, pred, obj) "
                "where 1=0")
    got = Counter(tuple(r) for r in
                  duckdb.sql(P.path_sql(tsql, path)).fetchall())
    assert got == _ref_eval(ast, edges)
