"""Rendered-term graph mode (rdfio/terms.py + sparql term_graph=True).

The reference keeps full RDF terms end-to-end (rdf-tabular reader.rb
to_rdf emits RDF::Literal with language/datatype); the lexical 3-col
graph cannot answer LANG/DATATYPE/STRLANG/STRDT/LANGMATCHES. These
tests pin the rendered-term mode that restores them: rendering
round-trips exactly (including escape-sensitive lexicals), every
builtin agrees between the Spark DataFrame path and the DuckDB oracle
SQL emitted from the SAME parsed query, and pattern constants render
at parse time so constant-object filters stay pushdown-able."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.rdfio.terms import (XSD_INTEGER, XSD_STRING,
                                           render_object_terms,
                                           render_object_terms_sql,
                                           render_term)
from rdf_tabular_spark.sparql import (SparqlError, parse_sparql, query_df,
                                      query_sql)

ROWS = [
    ("u1", "http://schema.org/name", 'say "hi"\\now', False, None, "en"),
    ("u1", "http://schema.org/name", "chat", False, None, "fr-BE"),
    ("u1", "http://schema.org/name", "plain", False, None, None),
    ("u1", "http://example.org/wc", "42", False, XSD_INTEGER, None),
    ("u1", "http://example.org/see", "http://other.org/x", True, None, None),
    ("u1", "http://example.org/see", "_:b0", True, None, None),
    ("u2", "http://schema.org/name", "42", False, None, "en-GB"),
    ("u2", "http://example.org/wc", "7", False, XSD_INTEGER, None),
]
COLS = ("subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


@pytest.fixture(scope="module")
def graph(spark):
    return render_object_terms(spark.createDataFrame(ROWS, COLS)).cache()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    cells = ",".join(
        "(" + ",".join(
            "null" if v is None else
            ("true" if v is True else
             ("false" if v is False else
              "'" + str(v).replace("'", "''") + "'"))
            for v in r) + ")" for r in ROWS)
    con.execute(f"create table trm as select * from (values {cells}) "
                "v(subj,pred,obj,obj_is_iri,obj_datatype,obj_lang)")
    return con


def _parity(graph, oracle, qtext):
    """Run the SAME parsed query on Spark and DuckDB; assert equal rows."""
    pq = parse_sparql(qtext, term_graph=True)
    sp = sorted(tuple(r) for r in query_df(graph, pq).collect())
    tsql = render_object_terms_sql("select * from trm")
    od = sorted(tuple(r) for r in
                oracle.execute(
                    f"select * from ({query_sql(tsql, pq)})").fetchall())
    assert sp == od, f"engines diverge:\nspark : {sp}\nduckdb: {od}"
    return sp


# ------------------------------------------------------------ rendering

def test_render_term_shapes():
    assert render_term("http://x", is_iri=True) == "<http://x>"
    assert render_term("_:b7", is_iri=True) == "_:b7"
    assert render_term("plain") == '"plain"'
    assert render_term("plain", datatype=XSD_STRING) == '"plain"'
    assert render_term("chat", lang="en") == '"chat"@en'
    assert render_term("42", datatype=XSD_INTEGER) == \
        f'"42"^^<{XSD_INTEGER}>'
    # escape-sensitive: only backslash and quote escape
    assert render_term('a"b\\c') == '"a\\"b\\\\c"'


def test_dataframe_render_matches_python(graph):
    rendered = {(r.subj, r.pred, r.obj) for r in graph.collect()}
    expected = {(render_term(s, is_iri=True), p,
                 render_term(o, is_iri=i, datatype=d, lang=lg))
                for s, p, o, i, d, lg in ROWS}
    assert rendered == expected


def test_sql_render_matches_dataframe(graph, oracle):
    osql = render_object_terms_sql("select * from trm")
    duck = {tuple(r) for r in oracle.execute(osql).fetchall()}
    assert duck == {(r.subj, r.pred, r.obj) for r in graph.collect()}


# --------------------------------------------------------- term builtins

def test_lang_str_datatype_langmatches(graph, oracle):
    rows = _parity(graph, oracle, '''
        SELECT ?s (STR(?n) AS ?name) (LANG(?n) AS ?lg)
               (DATATYPE(?n) AS ?dt)
        WHERE { ?s <http://schema.org/name> ?n .
                FILTER LANGMATCHES(LANG(?n), "en") }''')
    # STR() recovered the exact lexical (escape round-trip), en-GB
    # matched the 'en' range, fr-BE and the untagged literal did not
    assert rows == [
        ("<u1>", 'say "hi"\\now', "en",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
        ("<u2>", "42", "en-GB",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")]


def test_datatype_of_typed_plain_and_iri(graph, oracle):
    rows = _parity(graph, oracle, '''
        SELECT ?v (DATATYPE(?v) AS ?dt) (ISIRI(?v) AS ?iri)
               (ISBLANK(?v) AS ?bn) (ISLITERAL(?v) AS ?lit)
        WHERE { <u1> ?p ?v . FILTER (!LANGMATCHES(LANG(?v), "*")) }''')
    by_term = {r[0]: r[1:] for r in rows}
    assert by_term['"plain"'] == (XSD_STRING, False, False, True)
    assert by_term[f'"42"^^<{XSD_INTEGER}>'] == \
        (XSD_INTEGER, False, False, True)
    assert by_term["<http://other.org/x>"] == (None, True, False, False)
    assert by_term["_:b0"] == (None, False, True, False)


def test_strdt_strlang_isnumeric(graph, oracle):
    rows = _parity(graph, oracle, '''
        SELECT ?s (STRDT(STR(?v), <http://www.w3.org/2001/XMLSchema#integer>)
                   AS ?t)
               (ISNUMERIC(?v) AS ?num) (STRLANG("bonjour", "fr") AS ?sl)
        WHERE { ?s <http://example.org/wc> ?v }''')
    assert rows == [
        ("<u1>", f'"42"^^<{XSD_INTEGER}>', True, '"bonjour"@fr'),
        ("<u2>", f'"7"^^<{XSD_INTEGER}>', True, '"bonjour"@fr')]


def test_strdt_xsd_string_folds_plain(graph, oracle):
    rows = _parity(graph, oracle, '''
        SELECT (STRDT("x", <http://www.w3.org/2001/XMLSchema#string>) AS ?t)
        WHERE { <u2> <http://example.org/wc> ?v }''')
    assert rows == [('"x"',)]


def test_sameterm_is_exact(graph, oracle):
    # "42"@en-GB and "42"^^xsd:integer are DIFFERENT terms — the lexical
    # graph could not tell them apart; the rendered graph can
    rows = _parity(graph, oracle, '''
        SELECT ?s ?v WHERE { ?s ?p ?v . FILTER sameTerm(?v,
            STRDT("42", <http://www.w3.org/2001/XMLSchema#integer>)) }''')
    assert rows == [("<u1>", f'"42"^^<{XSD_INTEGER}>')]


# ------------------------------------------------------ pattern constants

def test_pattern_constants_render(graph):
    # bare number → typed-literal render (SPARQL §4.1.2 xsd:integer)
    pq = parse_sparql(
        "SELECT ?s WHERE { ?s <http://example.org/wc> 42 }",
        term_graph=True)
    assert pq.patterns == [
        ("?s", "http://example.org/wc", f'"42"^^<{XSD_INTEGER}>')]
    assert sorted(r.s for r in query_df(graph, pq).collect()) == ["<u1>"]
    # lang-tagged literal constant
    pq = parse_sparql(
        'SELECT ?s WHERE { ?s <http://schema.org/name> "chat"@fr-BE }',
        term_graph=True)
    assert sorted(r.s for r in query_df(graph, pq).collect()) == ["<u1>"]
    # IRI constants gain angle brackets in subject AND object position
    pq = parse_sparql(
        "SELECT ?s WHERE { ?s <http://example.org/see> <http://other.org/x> }",
        term_graph=True)
    assert pq.patterns == [
        ("?s", "http://example.org/see", "<http://other.org/x>")]
    assert sorted(r.s for r in query_df(graph, pq).collect()) == ["<u1>"]


def test_single_quoted_literals(graph):
    pq = parse_sparql(
        "SELECT ?s WHERE { ?s <http://schema.org/name> 'plain' }",
        term_graph=True)
    assert sorted(r.s for r in query_df(graph, pq).collect()) == ["<u1>"]


def test_object_to_subject_chain_joins(graph, oracle):
    """Subjects render <...> like IRI objects, so the most common SPARQL
    shape — an object variable re-used in subject position — stays
    term-exact. Before subject rendering this silently returned zero
    rows (pattern 1 bound ?o to '<http://other.org/x>' while pattern 2's
    subj was bare)."""
    chain = ROWS + [("http://other.org/x", "http://schema.org/name",
                     "target", False, None, None)]
    g2 = render_object_terms(graph.sparkSession.createDataFrame(chain, COLS))
    pq = parse_sparql('''
        SELECT ?n WHERE { <u1> <http://example.org/see> ?o .
                          ?o <http://schema.org/name> ?n }''',
                      term_graph=True)
    assert [r.n for r in query_df(g2, pq).collect()] == ['"target"']


def test_values_cells_render(graph, oracle):
    """VALUES cells join subject/object bindings, so they render like
    pattern node constants — a lang-tagged cell must match the rendered
    object and an IRI cell the rendered subject."""
    rows = _parity(graph, oracle, '''
        SELECT ?s ?v WHERE { ?s <http://schema.org/name> ?v
                             VALUES ?v { "chat"@fr-BE } }''')
    assert rows == [("<u1>", '"chat"@fr-BE')]
    rows = _parity(graph, oracle, '''
        SELECT ?s ?v WHERE { ?s <http://example.org/wc> ?v
                             VALUES ?s { <u2> } }''')
    assert rows == [("<u2>", f'"7"^^<{XSD_INTEGER}>')]


def test_describe_constant_renders(graph):
    """DESCRIBE <iri> seeds must match the rendered subject column."""
    pq = parse_sparql("DESCRIBE <u2>", term_graph=True)
    out = sorted((r.subj, r.pred, r.obj)
                 for r in query_df(graph, pq).collect())
    assert out == [
        ("<u2>", "http://example.org/wc", f'"7"^^<{XSD_INTEGER}>'),
        ("<u2>", "http://schema.org/name", '"42"@en-GB')]


# ------------------------------------------------------------- contracts

def test_term_functions_require_term_graph():
    with pytest.raises(SparqlError, match="term_graph=True"):
        parse_sparql("SELECT ?s WHERE { ?s <p> ?v . FILTER(LANG(?v) = 'en') }")
    with pytest.raises(SparqlError, match="term_graph=True"):
        parse_sparql(
            'SELECT (STRDT("4", <x>) AS ?t) WHERE { ?s <p> ?v }')


def test_lexical_mode_unchanged():
    # default parse still drops literal suffixes (lexical 3-col contract)
    pq = parse_sparql('SELECT ?s WHERE { ?s <p> "chat"@en }')
    assert pq.patterns == [("?s", "p", "chat")]


def test_render_is_single_projection(graph, spark):
    # scale contract: rendering adds no Exchange (pure projection)
    df = render_object_terms(spark.createDataFrame(ROWS, COLS))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
