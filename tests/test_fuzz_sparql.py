"""Property-based checks for the SPARQL text front-end (sparql.py):
(1) render→parse round-trips randomly generated algebra specs; (2) on
random small graphs the two compilers (DataFrame program, DuckDB SQL)
agree on the result set for the full randomized feature mix — the same
engine-vs-engine contract the hand-written parity tests pin, but over a
combinatorial space no hand-written suite covers."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf_tabular_spark.sparql import parse_sparql, query_df, query_sql

_PREDS = ["p", "q", "r"]
_NODES = ["a", "b", "c", "d", "e"]
_VARS = ["x", "y", "z"]


@st.composite
def _pattern(draw, subj_var):
    pred = draw(st.sampled_from(_PREDS))
    obj = draw(st.one_of(st.sampled_from(_NODES),
                         st.sampled_from(_VARS).map(lambda v: "?" + v)))
    return ("?" + subj_var, pred, obj)


@st.composite
def _spec(draw):
    """A random query spec: required patterns all share ?x (so OPTIONAL/
    MINUS/EXISTS groups always share a variable, per the algebra's
    contract), plus a random mix of algebra features."""
    n_req = draw(st.integers(1, 3))
    patterns = [draw(_pattern("x")) for _ in range(n_req)]
    spec = {"patterns": patterns, "optionals": [], "minus": [],
            "exists": [], "filters": [], "values": None,
            "distinct": draw(st.booleans()),
            "func_filters": []}
    for kind in ("optionals", "minus", "exists"):
        if draw(st.booleans()):
            spec[kind].append([draw(_pattern("x"))])
    # a filter over a var that is definitely bound (?x)
    if draw(st.booleans()):
        lit = draw(st.sampled_from(_NODES))
        op = draw(st.sampled_from(["=", "!=", "<", ">"]))
        spec["filters"].append(("x", op, lit))
    # a FUNCTION filter over ?x (r4 shared-subset functions); rendered
    # verbatim — exercises the expression grammar + both compilers
    if draw(st.booleans()):
        lit = draw(st.sampled_from(_NODES))
        spec["func_filters"].append(draw(st.sampled_from([
            f'STRLEN(?x) > 1',
            f'CONTAINS(?x, "{lit[:1]}")',
            f'STRBEFORE(?x, "{lit[:1]}") != ?x',
            f'STRAFTER(?x, "{lit[:1]}") != ?x',
            f'MD5(?x) != MD5("{lit}")',
            f'!ISBLANK(?x)',
            f'SAMETERM(?x, "{lit}") || STRLEN(?x) >= 1',
            f'UCASE(LCASE(?x)) = UCASE(?x)',
        ])))
    if draw(st.booleans()):
        vals = draw(st.lists(st.sampled_from(_NODES), min_size=1,
                             max_size=3, unique=True))
        spec["values"] = ("x", vals)
    return spec


def _render(spec) -> str:
    parts = []
    for s, p, o in spec["patterns"]:
        parts.append(f"{s} {p} {o} .")
    for grp in spec["optionals"]:
        parts.append("OPTIONAL { " + " . ".join(
            f"{s} {p} {o}" for s, p, o in grp) + " }")
    for grp in spec["minus"]:
        parts.append("MINUS { " + " . ".join(
            f"{s} {p} {o}" for s, p, o in grp) + " }")
    for grp in spec["exists"]:
        parts.append("FILTER EXISTS { " + " . ".join(
            f"{s} {p} {o}" for s, p, o in grp) + " }")
    for var, op, lit in spec["filters"]:
        sparql_op = "!=" if op == "!=" else op
        parts.append(f'FILTER(?{var} {sparql_op} "{lit}")')
    for fx in spec.get("func_filters", []):
        parts.append(f"FILTER({fx})")
    if spec["values"]:
        var, vals = spec["values"]
        parts.append(f"VALUES ?{var} {{ " +
                     " ".join(f'"{v}"' for v in vals) + " }")
    d = "DISTINCT " if spec["distinct"] else ""
    return f"SELECT {d}* WHERE {{ " + " ".join(parts) + " }"


@given(_spec())
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip(spec):
    q = parse_sparql(_render(spec))
    assert q.patterns == spec["patterns"]
    assert q.optionals == [list(g) for g in spec["optionals"]]
    assert q.minus == [list(g) for g in spec["minus"]]
    assert q.exists == [list(g) for g in spec["exists"]]
    assert q.distinct == spec["distinct"]
    assert len(q.filters) == (len(spec["filters"])
                              + len(spec.get("func_filters", [])))
    if spec["values"]:
        cols, rows = q.values
        assert cols == [spec["values"][0]]
        assert [r[0] for r in rows] == spec["values"][1]


_graphs = st.lists(
    st.tuples(st.sampled_from(_NODES), st.sampled_from(_PREDS),
              st.sampled_from(_NODES)),
    min_size=3, max_size=12, unique=True)


@pytest.fixture(scope="module")
def fuzz_spark(spark):
    return spark


@given(_spec(), _graphs)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compilers_agree_on_random_graphs(fuzz_spark, spec, rows):
    text = _render(spec)
    g = fuzz_spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    try:
        df = query_df(g, text)
        spark_rows = sorted(tuple(r) for r in df.collect())
        cols = df.columns
    except ValueError:
        # the algebra legitimately rejects some generated shapes (e.g. an
        # OPTIONAL group whose only variable is a constant-closed ?x);
        # both compilers must then reject — the SQL path would too
        return
    con = duckdb.connect()
    vals = ", ".join("('%s','%s','%s')" % r for r in rows)
    rel = con.execute(query_sql(
        f"select * from (values {vals}) t(subj, pred, obj)", text))
    duck_cols = [d[0] for d in rel.description]
    duck_rows = sorted(tuple(r) for r in rel.fetchall())
    con.close()
    assert cols == duck_cols
    assert spark_rows == duck_rows, (
        f"query {text!r} over {rows}:\n{spark_rows}\nvs\n{duck_rows}")


@st.composite
def _update_spec(draw):
    op = draw(st.sampled_from(["insert_data", "delete_data",
                               "delete_where", "insert_where",
                               "delete_template"]))
    triples = [(draw(st.sampled_from(_NODES)), draw(st.sampled_from(_PREDS)),
                draw(st.sampled_from(_NODES)))
               for _ in range(draw(st.integers(1, 3)))]
    patterns = [draw(_pattern("x")) for _ in range(draw(st.integers(1, 2)))]
    template = [("?x", draw(st.sampled_from(_PREDS)),
                 draw(st.sampled_from(_NODES)))]
    return op, triples, patterns, template


def _render_update(spec) -> str:
    op, triples, patterns, template = spec
    data = " . ".join(f"{s} {p} {o}" for s, p, o in triples)
    pats = " . ".join(f"{s} {p} {o}" for s, p, o in patterns)
    tmpl = " . ".join(f"{s} {p} {o}" for s, p, o in template)
    return {
        "insert_data": f"INSERT DATA {{ {data} }}",
        "delete_data": f"DELETE DATA {{ {data} }}",
        "delete_where": f"DELETE WHERE {{ {pats} }}",
        "insert_where": f"INSERT {{ {tmpl} }} WHERE {{ {pats} }}",
        "delete_template": f"DELETE {{ {tmpl} }} WHERE {{ {pats} }}",
    }[op]


@given(_update_spec())
@settings(max_examples=150, deadline=None)
def test_update_render_parse_roundtrip(spec):
    from rdf_tabular_spark.sparql import parse_update
    op, triples, patterns, template = spec
    u = parse_update(_render_update(spec))
    assert u.op == op
    if op in ("insert_data", "delete_data"):
        assert u.data == triples
    elif op == "delete_where":
        assert u.patterns == patterns
    else:
        assert u.patterns == patterns and u.template == template
