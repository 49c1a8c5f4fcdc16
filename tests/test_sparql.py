"""SPARQL text front-end (rdf_tabular_spark/sparql.py): parse standard
query strings into the existing algebra and check BOTH compilers — the
DataFrame program and the DuckDB SQL emission — produce identical results
on the same graph (engine-vs-engine parity on every feature, the same
contract the sf-level oracle harness enforces)."""

import duckdb
import pytest

from rdf_tabular_spark.sparql import (SparqlError, parse_sparql, query_df,
                                      query_sql)

ROWS = [
    ("d1", "rdf_type", "Doc"), ("d2", "rdf_type", "Doc"),
    ("d3", "rdf_type", "Doc"), ("img1", "rdf_type", "Image"),
    ("d1", "name", "alpha"), ("d2", "name", "beta"), ("d3", "name", "gamma"),
    ("d1", "lang", "en"), ("d2", "lang", "en"), ("d3", "lang", "de"),
    ("d1", "cites", "d2"), ("d2", "cites", "d3"),
    ("d1", "wc", "120"), ("d2", "wc", "80"),
]
PFX = "PREFIX ex: <http://ex.org/> "


@pytest.fixture(scope="module")
def graph(spark):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    return df.persist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    vals = ", ".join("('%s','%s','%s')" % r for r in ROWS)
    c.execute(f"create view g as select * from (values {vals}) "
              f"t(subj, pred, obj)")
    yield c
    c.close()


def both(graph, con, q):
    """Run the query through BOTH compilers; return (spark_set, duck_set)
    as order-insensitive row sets over identically-named columns."""
    df = query_df(graph, q)
    rel = con.execute(query_sql("select subj, pred, obj from g", q))
    dcols = [d[0] for d in rel.description]
    assert df.columns == dcols, (df.columns, dcols)
    s = sorted(tuple(r) for r in df.collect())
    d = sorted(tuple(r) for r in rel.fetchall())
    return s, d


def assert_parity(graph, con, q, n_rows=None):
    s, d = both(graph, con, q)
    assert s == d, f"engine mismatch for {q!r}:\n{s}\nvs\n{d}"
    if n_rows is not None:
        assert len(s) == n_rows, (len(s), n_rows)
    return s


def test_basic_bgp_semicolon_comma(graph, con):
    rows = assert_parity(graph, con, """
        SELECT ?s ?n WHERE { ?s rdf_type "Doc" ; name ?n . }""", 3)
    assert ("d1", "alpha") in rows


def test_prefix_a_and_iri_terms(spark, con):
    g = spark.createDataFrame(
        [("d1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
          "http://ex.org/Doc")], "subj string, pred string, obj string")
    c = duckdb.connect()
    c.execute("create view g as select 'd1' subj, "
              "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' pred, "
              "'http://ex.org/Doc' obj")
    q = PFX + "SELECT ?s WHERE { ?s a ex:Doc }"
    s, d = (sorted(query_df(g, q).collect()),
            sorted(c.execute(query_sql("select * from g", q)).fetchall()))
    assert [tuple(r) for r in s] == d == [("d1",)]


def test_filter_expression_translation(graph, con):
    # &&, STRLEN, CONTAINS, xsd:integer cast all in one filter
    q = ("PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
         'SELECT ?s WHERE { ?s name ?n ; wc ?w . '
         'FILTER(STRLEN(?n) >= 4 && xsd:integer(?w) > 100) }')
    assert assert_parity(graph, con, q, 1) == [("d1",)]


def test_optional_and_bound(graph, con):
    q = ('SELECT ?s ?w WHERE { ?s rdf_type "Doc" . '
         'OPTIONAL { ?s wc ?w } }')
    rows = assert_parity(graph, con, q, 3)
    assert ("d3", None) in rows


def test_minus_and_not_exists_agree(graph, con):
    m = assert_parity(graph, con,
                      'SELECT ?s WHERE { ?s rdf_type "Doc" . '
                      'MINUS { ?s wc ?w } }', 1)
    ne = assert_parity(graph, con,
                       'SELECT ?s WHERE { ?s rdf_type "Doc" . '
                       'FILTER NOT EXISTS { ?s wc ?w } }', 1)
    assert m == ne == [("d3",)]


def test_filter_exists(graph, con):
    assert assert_parity(graph, con,
                         'SELECT ?s WHERE { ?s rdf_type "Doc" . '
                         'FILTER EXISTS { ?s wc ?w } }', 2)


def test_bind_and_values(graph, con):
    q = ('SELECT ?s ?n ?lab WHERE { ?s name ?n . '
         'BIND(UCASE(?n) AS ?u) BIND(CONCAT(?u, "!") AS ?lab) '
         'VALUES ?n { "alpha" "beta" } }')
    rows = assert_parity(graph, con, q, 2)
    assert ("d1", "alpha", "ALPHA!") in rows


def test_values_undef_and_tuples(graph, con):
    q = ('SELECT ?s ?n ?tag WHERE { ?s name ?n . '
         'VALUES (?n ?tag) { ("alpha" "first") (UNDEF "none") } }')
    # UNDEF never joins (NULL semantics documented on bgp_match)
    assert assert_parity(graph, con, q, 1) == [("d1", "alpha", "first")]


def test_property_path_predicate(graph, con):
    rows = assert_parity(graph, con,
                         "SELECT ?a ?b WHERE { ?a cites+ ?b }", 3)
    assert ("d1", "d3") in rows


def test_plain_iri_predicate_not_a_path(spark):
    # '/' INSIDE <> must not trigger path parsing
    g = spark.createDataFrame([("s", "http://ex.org/p", "o")],
                              "subj string, pred string, obj string")
    out = query_df(g, "SELECT ?s WHERE { ?s <http://ex.org/p> ?o }")
    assert [tuple(r) for r in out.collect()] == [("s",)]


def test_union(graph, con):
    rows = assert_parity(graph, con, """
        SELECT ?s WHERE { { ?s rdf_type "Image" } UNION { ?s lang "de" } }""",
        2)
    assert rows == [("d3",), ("img1",)]


def test_aggregates_group_concat(graph, con):
    q = ('SELECT ?l (COUNT(*) AS ?n) (GROUP_CONCAT(?n2; SEPARATOR=";") '
         'AS ?names) WHERE { ?s lang ?l ; name ?n2 } GROUP BY ?l')
    rows = assert_parity(graph, con, q, 2)
    assert ("en", 2, "alpha;beta") in rows


def test_global_aggregate_no_group(graph, con):
    q = 'SELECT (COUNT(DISTINCT ?l) AS ?n) WHERE { ?s lang ?l }'
    assert assert_parity(graph, con, q, 1) == [(2,)]


def test_having(graph, con):
    q = ('SELECT ?l (COUNT(*) AS ?n) WHERE { ?s lang ?l } '
         'GROUP BY ?l HAVING(?n > 1)')
    assert assert_parity(graph, con, q, 1) == [("en", 2)]


def test_subquery(graph, con):
    q = ("""SELECT ?s ?l ?n WHERE { ?s lang ?l .
            { SELECT ?l (COUNT(*) AS ?n) WHERE { ?d lang ?l }
              GROUP BY ?l } }""")
    rows = assert_parity(graph, con, q, 3)
    assert ("d3", "de", 1) in rows


def test_order_limit_offset(graph, con):
    q = 'SELECT ?n WHERE { ?s name ?n } ORDER BY DESC(?n) LIMIT 2 OFFSET 1'
    df = query_df(graph, q)
    assert [r.n for r in df.collect()] == ["beta", "alpha"]
    d = con.execute(query_sql("select * from g", q)).fetchall()
    assert [r[0] for r in d] == ["beta", "alpha"]


def test_distinct(graph, con):
    assert assert_parity(graph, con,
                         "SELECT DISTINCT ?l WHERE { ?s lang ?l }", 2)


def test_construct(graph, con):
    q = ('CONSTRUCT { ?b cited_by ?a } WHERE { ?a cites ?b }')
    rows = assert_parity(graph, con, q, 2)
    assert ("d2", "cited_by", "d1") in rows


def test_ask(graph):
    assert query_df(graph, 'ASK { ?s lang "de" }') is True
    assert query_df(graph, 'ASK { ?s lang "fr" }') is False


def test_graph_quads(spark):
    quads = spark.createDataFrame(
        [("g1", "s", "p", "o"), ("g2", "s2", "p", "o2")],
        "graph string, subj string, pred string, obj string")
    out = query_df(quads, "SELECT ?g ?s WHERE { GRAPH ?g { ?s p ?o } }")
    assert sorted(tuple(r) for r in out.collect()) \
        == [("g1", "s"), ("g2", "s2")]


def test_comments_and_literal_suffixes(graph, con):
    q = ('SELECT ?s WHERE { # find the English docs\n'
         '  ?s lang "en"@en }')
    assert assert_parity(graph, con, q, 2)
    q2 = ('PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
          'SELECT ?s WHERE { ?s wc "120"^^xsd:integer }')
    assert assert_parity(graph, con, q2, 1) == [("d1",)]


def test_parse_errors():
    for bad in ["SELECT ?x WHERE { ?x }",            # incomplete triple
                "SELECT WHERE { ?s ?p ?o }",         # empty projection
                "PREFIX ex <http://x/> SELECT * WHERE { ?s ?p ?o }",
                "SELECT ?x WHERE { ?s ex:p ?o }",    # undeclared prefix
                "SELECT ?x WHERE { ?s ?p ?o } trailing"]:
        with pytest.raises(SparqlError):
            parse_sparql(bad)


def test_unsupported_function_rejected():
    # ENCODE_FOR_URI stays out (form- vs percent-encoding divergence)
    with pytest.raises(SparqlError, match="unsupported function"):
        parse_sparql('SELECT ?s WHERE { ?s name ?n . '
                     'FILTER(ENCODE_FOR_URI(?n) = "x") }')


def test_query_job_sparql_mode(spark, tmp_path):
    """CLI surface: --sparql runs a full query string against the graph
    store, including ASK and GRAPH (table_url exposed as ?g)."""
    from pyspark.sql import functions as F

    from rdf_tabular_spark.jobs.query import main as query_main
    from rdf_tabular_spark.sinks.graph_store import materialize
    root = str(tmp_path / "g")
    base = spark.createDataFrame(ROWS, "subj string, pred string, obj string") \
        .select("subj", "pred", "obj", F.lit(True).alias("obj_is_iri"),
                F.lit(None).cast("string").alias("obj_datatype"),
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit("http://t.example/corpus").alias("table_url"),
                F.lit(0).cast("long").alias("source_num"))
    materialize(base, root, "b1")
    res = query_main(["--store", root, "--sparql",
                      'SELECT ?s ?n WHERE { ?s rdf_type "Doc" ; name ?n } '
                      'ORDER BY ?n LIMIT 2'])
    assert res["n_rows"] == 2
    assert [r["n"] for r in res["sample"]] == ["alpha", "beta"]
    res_ask = query_main(["--store", root, "--sparql",
                          'ASK { ?s lang "de" }'])
    assert res_ask == {"ask": True}
    res_g = query_main(["--store", root, "--sparql",
                        'SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s name ?n } }'])
    assert res_g["sample"] == [{"g": "http://t.example/corpus"}]


def test_filter_in_and_not_in(graph, con):
    q = 'SELECT ?s WHERE { ?s name ?n . FILTER(?n IN ("alpha", "gamma")) }'
    assert assert_parity(graph, con, q, 2) == [("d1",), ("d3",)]
    q2 = ('SELECT ?s WHERE { ?s name ?n . '
          'FILTER(?n NOT IN ("alpha", "gamma")) }')
    assert assert_parity(graph, con, q2, 1) == [("d2",)]


def test_projection_expression(graph, con):
    q = ('PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
         'SELECT ?s (xsd:integer(?w) * 2 AS ?w2) WHERE { ?s wc ?w }')
    rows = assert_parity(graph, con, q, 2)
    assert ("d1", 240) in rows


def test_projection_expression_with_agg_rejected():
    with pytest.raises(SparqlError, match="projection expressions"):
        parse_sparql('SELECT (STRLEN(?n) AS ?l) (COUNT(*) AS ?c) '
                     'WHERE { ?s name ?n }')


def test_describe_constants_and_bnode_closure(spark):
    g = spark.createDataFrame(
        [("d1", "p", "_:x"), ("_:x", "q", "leaf"), ("d2", "p", "o")],
        "subj string, pred string, obj string")
    out = query_df(g, "DESCRIBE <d1>")
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    # CBD: seed's triples plus the reachable bnode subtree
    assert rows == {("d1", "p", "_:x"), ("_:x", "q", "leaf")}


def test_describe_variable_where(graph, con):
    q = 'DESCRIBE ?s WHERE { ?s lang "de" }'
    s = sorted(tuple(r) for r in query_df(graph, q).collect())
    d = sorted(con.execute(
        query_sql("select subj, pred, obj from g", q)).fetchall())
    assert s == d
    assert ("d3", "name", "gamma") in s and ("d1", "name", "alpha") not in s


def test_construct_with_bind_and_values(graph, con):
    q = ('CONSTRUCT { ?s hasLen ?l } WHERE { ?s name ?n . '
         'BIND(STRLEN(?n) AS ?l) VALUES ?n { "alpha" "beta" } }')
    rows = assert_parity(graph, con, q, 2)
    assert ("d1", "hasLen", 5) in rows or ("d1", "hasLen", "5") in rows


def test_scalar_subquery_cross_joins(graph, con):
    q = ('SELECT ?s ?total WHERE { ?s lang "en" . '
         '{ SELECT (COUNT(*) AS ?total) WHERE { ?d lang ?l } } }')
    rows = assert_parity(graph, con, q, 2)
    assert all(r[1] == 3 for r in rows)


def test_pname_trailing_dot_is_terminator():
    q = parse_sparql('PREFIX ex: <http://ex/> '
                     'SELECT * WHERE { ?s ex:p ex:b. }')
    assert q.patterns == [("?s", "http://ex/p", "http://ex/b")]


def test_zero_or_one_path_from_text(graph, con):
    rows = assert_parity(graph, con,
                         "SELECT ?a ?b WHERE { ?a cites? ?b }")
    assert ("d1", "d2") in rows            # one hop
    assert ("d1", "d1") in rows            # zero-length leg


def test_distinct_after_projection_over_union(graph, con):
    # both branches bind ?s=d1 via different second vars — DISTINCT must
    # dedup the PROJECTED rows, not the full branch rows
    q = ('SELECT DISTINCT ?s WHERE { { ?s name ?n } UNION { ?s wc ?w } }')
    rows = assert_parity(graph, con, q)
    assert rows == [("d1",), ("d2",), ("d3",)]


def test_group_concat_separator_quoting(graph, con):
    q = ("SELECT ?l (GROUP_CONCAT(?n; SEPARATOR=\"o'\") AS ?c) "
         "WHERE { ?s lang ?l ; name ?n } GROUP BY ?l")
    rows = assert_parity(graph, con, q, 2)
    assert ("en", "alphao'beta") in rows


def test_duplicate_values_and_subquery_rejected():
    with pytest.raises(SparqlError, match="one VALUES"):
        parse_sparql('SELECT * WHERE { ?s p ?o . VALUES ?o { "a" } '
                     'VALUES ?s { "b" } }')
    with pytest.raises(SparqlError, match="one subquery"):
        parse_sparql('SELECT * WHERE { ?s p ?o . '
                     '{ SELECT ?o (COUNT(*) AS ?n) WHERE { ?x p ?o } '
                     'GROUP BY ?o } '
                     '{ SELECT ?s (COUNT(*) AS ?m) WHERE { ?s p ?y } '
                     'GROUP BY ?s } }')


def test_ask_with_subquery_rejected():
    with pytest.raises(SparqlError, match="ASK does not support"):
        parse_sparql('ASK { ?s p ?o . '
                     '{ SELECT ?o (COUNT(*) AS ?n) WHERE { ?x p ?o } '
                     'GROUP BY ?o } }')


def test_r4_function_additions(graph, con):
    """r4 FILTER/BIND functions in the shared Spark∩DuckDB subset:
    STRBEFORE/STRAFTER, MD5, SAMETERM, ISBLANK, date-part extractors."""
    # STRBEFORE / STRAFTER (incl. the no-match → '' branch)
    rows = assert_parity(graph, con, """
      SELECT ?s ?b ?a WHERE {
        ?s name ?n .
        BIND(STRBEFORE(?n, "a") AS ?b)
        BIND(STRAFTER(?n, "mm") AS ?a)
      } ORDER BY ?s""", n_rows=3)
    assert rows[0][1] == "" and rows[2][2] == "a"  # alpha→'' ; gamma→'a'

    # MD5 digest parity
    assert_parity(graph, con, """
      SELECT ?s ?h WHERE { ?s name ?n . BIND(MD5(?n) AS ?h) }""", n_rows=3)

    # SAMETERM / ISBLANK (lexical-graph semantics)
    assert_parity(graph, con, """
      SELECT ?s WHERE { ?s cites ?o . FILTER(SAMETERM(?o, "d2")) }""",
                  n_rows=1)
    assert_parity(graph, con, """
      SELECT ?s WHERE { ?s name ?n . FILTER(!ISBLANK(?s)) }""", n_rows=3)


def test_replace_function(graph, con):
    """REPLACE via the neutral __replace_g__ marker: Spark regexp_replace
    is global natively, the DuckDB oracle gets the 'g' option — SPARQL
    fn:replace semantics (every occurrence) in both engines."""
    rows = assert_parity(graph, con, """
      SELECT ?s ?r WHERE { ?s name ?n . BIND(REPLACE(?n, "a", "_") AS ?r) }
      ORDER BY ?s""", n_rows=3)
    # 'alpha' → '_lph_' and 'gamma' → 'g_mm_': GLOBAL replacement — a
    # first-match engine would emit '_lpha' / 'g_mma'.
    assert [r[1] for r in rows] == ["_lph_", "bet_", "g_mm_"]
    # regex pattern + 'i' flag inline, and REPLACE inside a FILTER
    rows = assert_parity(graph, con, """
      SELECT ?r WHERE { ?s name ?n .
        BIND(REPLACE(?n, "[AEIOU]", "", "i") AS ?r) } ORDER BY ?r""",
        n_rows=3)
    assert [r[0] for r in rows] == ["bt", "gmm", "lph"]
    assert_parity(graph, con, """
      SELECT ?n WHERE { ?s name ?n .
        FILTER(REPLACE(?n, "m+", "m") = "gama") }""", n_rows=1)
    # arity and backreference restrictions enforced at parse time
    with pytest.raises(SparqlError, match="3 or 4"):
        parse_sparql('SELECT ?n WHERE { ?s name ?n . '
                     'BIND(REPLACE(?n, "a") AS ?r) }')
    with pytest.raises(SparqlError, match="backreference"):
        parse_sparql('SELECT ?n WHERE { ?s name ?n . '
                     'BIND(REPLACE(?n, "(a)", "$1$1") AS ?r) }')
    with pytest.raises(SparqlError, match="flags"):
        parse_sparql('SELECT ?n WHERE { ?s name ?n . '
                     'BIND(REPLACE(?n, "a", "b", "g") AS ?r) }')


def test_sha256_iri_functions(graph, con):
    """SHA256 through paired dialect markers (Spark sha2(x,256), DuckDB
    sha256(x)) — including a NESTED call, which exercises the pairwise
    marker rewrite; IRI/URI are identity under lexical-graph semantics."""
    rows = assert_parity(graph, con, """
      SELECT ?s ?h ?hh WHERE { ?s name ?n .
        BIND(SHA256(?n) AS ?h) BIND(SHA256(SHA256(?n)) AS ?hh) }
      ORDER BY ?s""", n_rows=3)
    import hashlib
    exp = hashlib.sha256(b"alpha").hexdigest()
    assert rows[0][1] == exp
    assert rows[0][2] == hashlib.sha256(exp.encode()).hexdigest()
    assert_parity(graph, con, """
      SELECT ?s WHERE { ?s cites ?o . FILTER(IRI(?o) = URI("d2")) }""",
                  n_rows=1)


def test_regex_function(graph, con):
    """REGEX via the shared regexp_extract spelling: anchors, character
    classes, alternation, the 'i' flag (inline (?i) in both engines),
    negation, and use inside BIND."""
    # ^..a matches alpha + gamma but not beta
    rows = assert_parity(graph, con, """
      SELECT ?n WHERE { ?s name ?n . FILTER(REGEX(?n, "^[ag]")) }
      ORDER BY ?n""", n_rows=2)
    assert [r[0] for r in rows] == ["alpha", "gamma"]
    # case-insensitive flag
    assert_parity(graph, con, """
      SELECT ?n WHERE { ?s name ?n . FILTER(REGEX(?n, "ALPHA|BETA", "i")) }
      """, n_rows=2)
    # negated + alternation; and REGEX as a BIND value
    assert_parity(graph, con, """
      SELECT ?n ?m WHERE { ?s name ?n .
        FILTER(!REGEX(?n, "a$")) BIND(REGEX(?n, "e") AS ?m) }""", n_rows=0)
    assert_parity(graph, con, """
      SELECT ?n ?m WHERE { ?s name ?n . BIND(REGEX(?n, "ph|mm") AS ?m) }
      """, n_rows=3)

    # bad flag rejected at parse time
    with pytest.raises(SparqlError):
        parse_sparql('SELECT ?n WHERE { ?s name ?n . '
                     'FILTER(REGEX(?n, "a", "g")) }')
    with pytest.raises(SparqlError):
        parse_sparql('SELECT ?n WHERE { ?s name ?n . FILTER(REGEX(?n)) }')


def test_r4_term_test_functions(spark):
    """ISNUMERIC/ISIRI/ISURI/ISLITERAL under lexical-graph semantics:
    IRIs carry a scheme, skolemized bnodes are _:, everything else is a
    literal; numeric = castable lexical form. Parity via the one shared
    SQL string through both compilers."""
    import duckdb
    rows = [("http://ex.org/d1", "val", "42"),
            ("http://ex.org/d1", "link", "https://ex.org/d2"),
            ("_:b0", "val", "3.5e1"),
            ("http://ex.org/d3", "val", "not-a-number"),
            ("http://ex.org/d3", "link", "urn:uuid:abc"),
            ("_:b1", "val", "_:b2")]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string")
    c = duckdb.connect()
    vals = ", ".join("('%s','%s','%s')" % r for r in rows)
    c.execute(f"create view g as select * from (values {vals}) "
              f"t(subj, pred, obj)")

    def parity(q, n_rows):
        s = sorted(tuple(r) for r in query_df(g, q).collect())
        d = sorted(tuple(r) for r in
                   c.execute(query_sql("select * from g", q)).fetchall())
        assert s == d, f"engine mismatch for {q!r}:\n{s}\nvs\n{d}"
        assert len(s) == n_rows, (len(s), n_rows)
        return s

    rows_n = parity("SELECT ?s ?o WHERE { ?s val ?o . "
                    "FILTER(ISNUMERIC(?o)) }", 2)
    assert {o for _, o in rows_n} == {"42", "3.5e1"}
    rows_i = parity("SELECT ?o WHERE { ?s link ?o . FILTER(ISIRI(?o)) }", 2)
    assert {o for (o,) in rows_i} == {"https://ex.org/d2", "urn:uuid:abc"}
    parity("SELECT ?o WHERE { ?s link ?o . FILTER(ISURI(?o)) }", 2)
    rows_l = parity("SELECT ?s ?o WHERE { ?s val ?o . "
                    "FILTER(ISLITERAL(?o)) }", 3)
    assert all(not o.startswith(("_:", "http", "urn:")) for _, o in rows_l)
    # subjects are never literals in this fixture
    parity("SELECT ?s WHERE { ?s val ?o . FILTER(ISLITERAL(?s)) }", 0)
    c.close()


def test_r4_datetime_extractors(spark):
    """YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS over xsd:dateTime lexicals."""
    import duckdb
    rows = [("e1", "at", "2024-03-14T01:02:03"),
            ("e2", "at", "1999-12-31T23:59:58")]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string")
    c = duckdb.connect()
    vals = ", ".join("('%s','%s','%s')" % r for r in rows)
    c.execute(f"create view g as select * from (values {vals}) "
              f"t(subj, pred, obj)")
    q = """SELECT ?s ?y ?mo ?d ?h ?mi ?se WHERE {
            ?s at ?t .
            BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo)
            BIND(DAY(?t) AS ?d) BIND(HOURS(?t) AS ?h)
            BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?se)
          } ORDER BY ?s"""
    s = [tuple(r) for r in query_df(g, q).collect()]
    d = c.execute(query_sql("select * from g", q)).fetchall()
    assert [tuple(map(str, r)) for r in s] == \
        [tuple(map(str, r)) for r in d]
    assert s[0][1:] == (2024, 3, 14, 1, 2, 3)
    c.close()


def test_order_by_expression_keys(graph, con):
    """ORDER BY with expression keys: DESC(STRLEN(?n)), a bracketted
    ascending expression, and mixed var+expr keys — identical row ORDER in
    both engines (order-sensitive comparison, unlike assert_parity)."""
    q = """SELECT ?s ?n WHERE { ?s name ?n } ORDER BY DESC(STRLEN(?n)) ?s"""
    df = query_df(graph, q)
    rel = con.execute(query_sql("select subj, pred, obj from g", q))
    s = [tuple(r) for r in df.collect()]
    d = [tuple(r) for r in rel.fetchall()]
    assert s == d and [r[1] for r in s] == ["alpha", "gamma", "beta"]

    q2 = """SELECT ?s ?n WHERE { ?s name ?n }
            ORDER BY (SUBSTR(?n, 2)) LIMIT 2"""
    df2 = [tuple(r) for r in query_df(graph, q2).collect()]
    d2 = [tuple(r) for r in
          con.execute(query_sql("select subj, pred, obj from g", q2))
             .fetchall()]
    assert df2 == d2 and [r[1] for r in df2] == ["gamma", "beta"]

    # dialect-marked function as an ORDER key (exercises render_dialect
    # on the order-by seam in both engines)
    q3 = """SELECT ?n WHERE { ?s name ?n } ORDER BY SHA256(?n)"""
    # bare builtin calls are not OrderConditions in this subset — must be
    # bracketted; unparenthesized fails the grammar
    with pytest.raises(SparqlError):
        parse_sparql(q3)
    q3 = """SELECT ?n WHERE { ?s name ?n } ORDER BY (SHA256(?n))"""
    df3 = [r[0] for r in query_df(graph, q3).collect()]
    d3 = [r[0] for r in
          con.execute(query_sql("select subj, pred, obj from g", q3))
             .fetchall()]
    assert df3 == d3 and sorted(df3) == ["alpha", "beta", "gamma"]
