"""Term-rendered graph mode — N-Triples-style object rendering.

The engine's default contract is the LEXICAL 3-column graph: ``obj``
carries the plain lexical form and language tags / datatypes live in
side columns (``obj_lang``/``obj_datatype``/``obj_is_iri``, the schema
every triple producer in this repo emits — operators/triples.py
TRIPLE_SCHEMA, sources/ntriples_source.py). That contract makes joins
and filters cheap but cannot answer SPARQL's term-introspection
builtins (LANG, DATATYPE, STRLANG, STRDT, LANGMATCHES, exact sameTerm):
the metadata is gone by the time the BGP engine sees one ``obj`` column.

This module closes that gap with a RENDERED-term mode: the object
column is rewritten to an N-Triples-shaped self-describing string —

    IRI            →  <http://example.org/x>
    blank node     →  _:b0                       (unchanged)
    plain literal  →  "chat"                     (xsd:string folds here,
                                                  RDF 1.1 simple-literal
                                                  identification)
    lang literal   →  "chat"@en
    typed literal  →  "42"^^<http://www.w3.org/2001/XMLSchema#integer>

Subject IRIs render to ``<...>`` as well (blank nodes stay ``_:``-bare)
so a rendered IRI object joins a rendered subject — object-to-subject
chain patterns, the most common SPARQL shape, stay term-exact.
Predicates stay bare (always plain IRIs; pattern predicate constants
match them directly). Joins over the rendered columns implement true
RDF term equality — ``"42"^^xsd:int``
no longer collides with ``"42"@en`` — and every term builtin becomes a
string expression in the ONE SQL subset Spark and DuckDB share, so the
SPARQL front-end (sparql.py, ``parse_sparql(text, term_graph=True)``)
compiles them once for both engines.

Escaping: ONLY backslash and double quote are escaped (``\\`` and
``\"``); control characters ride raw. This deliberately diverges from
full N-Triples serialization (sinks/ntriples.py escapes ``\n`` etc.)
so that STR() — a single-pass ``\\(.) → $1`` regexp unescape — is an
EXACT inverse in both engines. Rendered terms are an in-engine
representation, not a wire format; serialize through the sinks.

Reference parity: the reference keeps full RDF terms end-to-end
(rdf-tabular emits RDF::Literal with language/datatype, reader.rb
to_rdf); this mode restores the same introspection over the columnar
graph without widening every join to a 4-column key.

Scale: rendering is a single projection (no shuffle, whole-stage
codegen — one ``case`` over four columns); the rendered column is at
most a few bytes wider than the lexical one. Pattern constants render
at parse time, so constant-object filters still push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# ---------------------------------------------------------------------------
# shared-SQL fragments (valid verbatim in Spark SQL AND DuckDB).
#
# Backslash spelling diverges between the engines' string literals
# (Spark treats '\' as an escape character inside quotes, DuckDB does
# not), so every backslash is built with chr(92) — identical in both.
# Regex replacement groups diverge too (Java '$1' vs RE2 '\1') — those
# ride the __re_g1__ dialect marker (operators/bgp.render_dialect),
# alongside the existing __replace_g__ global-flag marker.

#: regex (as a SQL expression producing the pattern string) matching a
#: rendered literal's opening quote + escaped lexical + closing quote.
LEX_PAT_SQL = ("'^\"((?:[^\"'||chr(92)||chr(92)||']|'"
               "||chr(92)||chr(92)||'.)*)\"'")

#: regex extracting the datatype IRI from a rendered typed literal.
DT_PAT_SQL = "chr(92)||'^'||chr(92)||'^<([^>]*)>$'"

#: regex extracting the language tag from a rendered lang literal.
LANG_PAT_SQL = "'\"@([A-Za-z0-9-]+)$'"


def esc_sql(x: str) -> str:
    """Escape a plain string for embedding in a rendered literal."""
    return (f"replace(replace({x}, chr(92), chr(92)||chr(92)), "
            f"'\"', chr(92)||'\"')")


def unesc_sql(x: str) -> str:
    """Exact single-pass inverse of :func:`esc_sql` — ``\\(.)`` → group 1.
    Uses the __re_g1__ / __replace_g__ dialect markers; callers must be
    on a path that runs operators/bgp.render_dialect (every SPARQL
    evaluation seam does)."""
    return (f"regexp_replace({x}, chr(92)||chr(92)||'(.)', "
            f"__re_g1____replace_g__)")


def str_sql(x: str) -> str:
    """SPARQL STR() over a rendered term: literal → lexical form (exact
    unescape), IRI → the IRI string, blank node / bare token → itself."""
    return (f"(case when left({x}, 1) = '\"' then "
            f"{unesc_sql(f'regexp_extract({x}, {LEX_PAT_SQL}, 1)')} "
            f"when left({x}, 1) = '<' then substr({x}, 2, length({x}) - 2) "
            f"else {x} end)")


#: the rendering projection over TRIPLE_SCHEMA's term columns, as one
#: shared-SQL ``case`` (single source of truth: the DataFrame path runs
#: it through F.expr, the oracle embeds it as SQL text).
RENDER_OBJ_SQL = f"""(case
  when obj_is_iri and left(obj, 2) = '_:' then obj
  when obj_is_iri then '<' || obj || '>'
  when obj_lang is not null then '"' || {esc_sql('obj')} || '"@' || obj_lang
  when obj_datatype is not null and obj_datatype <> '{XSD_STRING}'
       then '"' || {esc_sql('obj')} || '"^^<' || obj_datatype || '>'
  else '"' || {esc_sql('obj')} || '"' end)"""

#: subjects are always IRIs or blank nodes — angle-bracket the IRIs so a
#: rendered IRI *object* joins a rendered *subject* (object-to-subject
#: chains, the most common SPARQL shape). Blank nodes stay ``_:``-bare.
RENDER_SUBJ_SQL = ("(case when left(subj, 2) = '_:' then subj "
                   "else '<' || subj || '>' end)")


def render_object_terms(df: DataFrame) -> DataFrame:
    """(subj, pred, obj, obj_is_iri, obj_datatype, obj_lang, ...) →
    the same relation with ``subj`` and ``obj`` rendered and the three
    term-metadata columns dropped. Extra columns (table_url, graph, ...)
    pass through. Predicates stay bare: they are always plain IRIs and
    pattern-position predicate constants match them directly (a
    predicate *variable* therefore binds the bare IRI — joining one
    against a subject/object variable is not term-exact, same as the
    lexical contract)."""
    out = (df.withColumn("obj", F.expr(RENDER_OBJ_SQL))
           .withColumn("subj", F.expr(RENDER_SUBJ_SQL)))
    return out.drop("obj_is_iri", "obj_datatype", "obj_lang")


def render_object_terms_sql(triples_sql: str) -> str:
    """Oracle twin of :func:`render_object_terms`: SQL over a relation
    carrying the term columns, emitting (subj-rendered, pred,
    obj-rendered)."""
    return (f"select {RENDER_SUBJ_SQL} as subj, pred, "
            f"{RENDER_OBJ_SQL} as obj from ({triples_sql})")


def render_term(lex: str, is_iri: bool = False, datatype: str | None = None,
                lang: str | None = None) -> str:
    """Python-side renderer (parse-time constants, tests) — must agree
    byte-for-byte with :data:`RENDER_OBJ_SQL`."""
    if is_iri:
        return lex if lex.startswith("_:") else f"<{lex}>"
    esc = lex.replace("\\", "\\\\").replace('"', '\\"')
    if lang is not None:
        return f'"{esc}"@{lang}'
    if datatype is not None and datatype != XSD_STRING:
        return f'"{esc}"^^<{datatype}>'
    return f'"{esc}"'
