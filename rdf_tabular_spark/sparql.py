"""SPARQL 1.1 text front-end: parse query strings into the algebra the
engine already executes (operators/bgp, operators/paths), and compile the
SAME parsed form to (a) a DataFrame program and (b) DuckDB oracle SQL.

The reference emits RDF for SPARQL stores (rdf-tabular README.md); the
BGP/path/aggregate tiers cover the algebra, and this module closes the
usability gap — a standard query string instead of hand-built pattern
tuples. One recursive-descent pass produces a :class:`SparqlQuery`;
``query_df`` routes it to bgp_match / bgp_agg / bgp_subselect /
bgp_union_match / construct / ask, so the text layer adds ZERO execution
paths — every plan property (broadcast subselects, predicate-pushdown
scans, anti-join MINUS) is inherited from the audited operators.

Supported subset (each feature maps 1:1 onto an existing operator):
  SELECT [DISTINCT] ?v... | * | (AGG(...) AS ?a)... | (expr AS ?v)...
  ASK / CONSTRUCT { template } WHERE / DESCRIBE <iri>...|?v WHERE (CBD)
  WHERE { triples ; , .  OPTIONAL{} MINUS{} FILTER(expr)
          FILTER [NOT] EXISTS{} BIND(expr AS ?v) VALUES ?v {...}
          GRAPH term {}  { SELECT ... } (subquery)  {A} UNION {B} }
  property paths in predicate position (operators/paths grammar)
  GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET
  PREFIX expansion; 'a' = rdf:type; UNDEF in VALUES

FILTER/BIND/HAVING expressions translate to the shared Spark∩DuckDB ANSI
subset (the bgp_match ``filters`` contract — one string, two engines):
&&/||/! → and/or/not, STRLEN→length, CONTAINS→instr, STRSTARTS/STRENDS→
left/right, STRBEFORE/STRAFTER→instr+substr, BOUND→is-not-null, IF→case,
MD5, SAMETERM/ISBLANK/ISIRI/ISURI/ISLITERAL (lexical-graph semantics),
ISNUMERIC→try_cast, YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS via
cast-to-timestamp, xsd:integer/double casts.
REGEX(x, p[, flags]) → regexp_extract(x, p, 0) <> '' — the one regex
spelling both engines share with identical search semantics; flags
i/s/m ride inline as (?ism), which Java regex and RE2 both honor.
Deviation: a pattern matching ONLY the empty string evaluates false.
Engine-divergent spellings compile to neutral markers rewritten per
engine at the evaluation seam (operators/bgp.render_dialect): REPLACE
(global in both — Spark natively, DuckDB via the 'g' option; '$'
backreferences rejected, the syntaxes diverge) and SHA256 (Spark
sha2(x,256) vs DuckDB sha256(x)). IRI/URI are identity under
lexical-graph semantics. Term-introspection builtins — LANG, DATATYPE,
LANGMATCHES, STRLANG, STRDT, exact sameTerm/isIRI/isLiteral — require
the RENDERED-term graph: parse with ``parse_sparql(text,
term_graph=True)`` over a graph rendered by
rdfio/terms.render_object_terms (objects in N-Triples shape); they
compile to shared-SQL string templates (_TERM_FUNCS below) and
object-position pattern constants render at parse time. In term-graph
mode, expression string literals stay PLAIN values — compare lexical
forms via STR(?x), or put the constant in the pattern. Still out:
SHA1/SHA512 (absent from this DuckDB build), ENCODE_FOR_URI (form- vs
percent-encoding divergence), NOW/UUID/STRUUID/RAND (nondeterministic
— no stable oracle).

ORDER BY accepts variables, (expr), and ASC/DESC(expr) — expression
keys compile through the same shared-SQL translator and see the
PROJECTED columns (the evaluation order both engines share under
DISTINCT).

Out of scope (documented contract, not oversights): named-graph datasets
via FROM (the graph store's ``batches=`` serves that role), federation
(SERVICE), property paths in CONSTRUCT templates.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.bgp import _sq, render_dialect

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_PATH_CHARS = set("/|^+*?!()")

_VAR_RE = re.compile(r"[?$]([A-Za-z_][A-Za-z0-9_]*)")
_IRI_RE = re.compile(r"<([^<>\s]*)>")
# PN_LOCAL may contain '.' but not END with one (SPARQL grammar) — a
# trailing dot is the triple terminator, not part of the IRI
_PNAME_RE = re.compile(
    r"([A-Za-z_][A-Za-z0-9_\-]*)?:"
    r"((?:[A-Za-z0-9_\-.]*[A-Za-z0-9_\-])?)")
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# SPARQL LANGTAG: primary subtag + optional '-' subtags (fr-BE, en-GB)
_LANGTAG_RE = re.compile(r"[A-Za-z]+(?:-[A-Za-z0-9]+)*")
_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?")
_STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')
# SPARQL also allows single-quoted string literals (grammar rule
# STRING_LITERAL1) — same escape rules, interchangeable with "..."
_SQ_STR_RE = re.compile(r"'((?:[^'\\]|\\.)*)'")
# a run of path-able elements with no whitespace: IRIs, pnames/bare words,
# and the path operators (used ONLY in predicate position)
_PATH_RE = re.compile(
    r"(?:<[^<>\s]*>|[A-Za-z_][A-Za-z0-9_\-]*(?::[A-Za-z0-9_\-.]*)?"
    r"|[/|^+*?!()])+")


@dataclass
class SparqlQuery:
    form: str                       # 'select' | 'ask' | 'construct'
    distinct: bool = False
    variables: list | None = None   # None = SELECT *
    patterns: list = field(default_factory=list)
    optionals: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    exists: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    binds: list = field(default_factory=list)
    values: tuple | None = None
    union_branches: list | None = None
    template: list | None = None    # CONSTRUCT
    group_by: list = field(default_factory=list)
    aggs: list = field(default_factory=list)
    having: list = field(default_factory=list)
    order_by: list = field(default_factory=list)   # (var, 'asc'|'desc')
    limit: int | None = None
    offset: int | None = None
    subselect: dict | None = None   # {patterns, group_by, aggs, having}
    describe_terms: list | None = None   # constants and/or ?vars


class SparqlError(ValueError):
    pass


class _Cursor:
    """Raw-text cursor: regex-anchored accept/expect with whitespace and
    comment skipping. Keyword matching is case-insensitive (SPARQL);
    terms are case-sensitive."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def _skip(self) -> None:
        t, n = self.text, len(self.text)
        p = self.pos
        while p < n:
            c = t[p]
            if c in " \t\r\n":
                p += 1
            elif c == "#":
                while p < n and t[p] != "\n":
                    p += 1
            else:
                break
        self.pos = p

    def eof(self) -> bool:
        self._skip()
        return self.pos >= len(self.text)

    def peek(self, lit: str) -> bool:
        self._skip()
        return self.text.startswith(lit, self.pos)

    def peek_kw(self, *kws: str) -> str | None:
        self._skip()
        m = _WORD_RE.match(self.text, self.pos)
        if m and m.group(0).upper() in kws:
            return m.group(0).upper()
        return None

    def accept(self, lit: str) -> bool:
        if self.peek(lit):
            self.pos += len(lit)
            return True
        return False

    def accept_kw(self, *kws: str) -> str | None:
        kw = self.peek_kw(*kws)
        if kw:
            self.pos += len(kw)
            return kw
        return None

    def expect(self, lit: str) -> None:
        if not self.accept(lit):
            raise SparqlError(
                f"expected {lit!r} at ...{self.text[self.pos:self.pos+40]!r}")

    def match(self, rx: re.Pattern) -> re.Match | None:
        self._skip()
        m = rx.match(self.text, self.pos)
        if m:
            self.pos = m.end()
        return m

    def fail(self, what: str):
        raise SparqlError(
            f"expected {what} at ...{self.text[self.pos:self.pos+40]!r}")


from .rdfio import terms as _terms  # noqa: E402

# ---- term-graph overrides (parse_sparql(text, term_graph=True)) —
# the rendered-term column (rdfio/terms.py) makes term introspection
# exact; every template stays inside the shared Spark∩DuckDB subset.
_DT_X = f"regexp_extract({{0}}, {_terms.DT_PAT_SQL}, 1)"
_LANG_X = f"regexp_extract({{0}}, {_terms.LANG_PAT_SQL}, 1)"
_NUMERIC_DTS = ", ".join(
    f"'{_terms.XSD}{n}'" for n in
    ("integer", "decimal", "double", "float", "int", "long", "short",
     "byte", "nonNegativeInteger", "positiveInteger",
     "nonPositiveInteger", "negativeInteger", "unsignedInt",
     "unsignedLong", "unsignedShort", "unsignedByte"))
_TERM_FUNCS = {
    "str": _terms.str_sql("{0}"),
    # LANG of a plain/typed literal or IRI → '' (SPARQL: '' for
    # untagged literals; IRI is a type error we map to '')
    "lang": _LANG_X,
    "datatype": ("(case when left({0}, 1) = '<' or left({0}, 2) = '_:'"
                 f" then null when {_DT_X} <> '' then {_DT_X}"
                 f" when {_LANG_X} <> ''"
                 f" then '{_terms.RDF_LANG_STRING}'"
                 " when left({0}, 1) = '\"'"
                 f" then '{_terms.XSD_STRING}' else null end)"),
    # LANGMATCHES basic filtering (RFC 4647 §3.3.1): '*' matches any
    # non-empty tag; otherwise exact or prefix-before-'-' match,
    # case-insensitive.
    "langmatches": ("(case when {1} = '*' then {0} <> '' else "
                    "lower({0}) = lower({1}) or "
                    "left(lower({0}), length({1}) + 1) = "
                    "lower({1}) || '-' end)"),
    # STRLANG(plain-string, tag) → rendered lang literal
    "strlang": "('\"' || " + _terms.esc_sql("{0}") + " || '\"@' || {1})",
    # IRI/URI over a rendered term: lexical form in angle brackets
    "iri": "('<' || " + _terms.str_sql("{0}") + " || '>')",
    "uri": "('<' || " + _terms.str_sql("{0}") + " || '>')",
    "isiri": "(left({0}, 1) = '<')",
    "isuri": "(left({0}, 1) = '<')",
    "isliteral": "(left({0}, 1) = '\"')",
    "isblank": "(left({0}, 2) = '_:')",
    # exact RDF term equality — the rendered string IS the term
    "sameterm": "({0} = {1})",
    "isnumeric": (f"({_DT_X} in ({_NUMERIC_DTS}) and try_cast("
                  + _terms.str_sql("{0}")
                  + " as double) is not null)"),
}
_TERM_ONLY = ("lang", "datatype", "langmatches", "strlang", "strdt")


class _Parser:
    def __init__(self, text: str, term_graph: bool = False):
        self.c = _Cursor(text)
        self.prefixes: dict[str, str] = {}
        # term_graph: the query targets a RENDERED-term graph (object
        # column in N-Triples shape, rdfio/terms.py) — object-position
        # constants render at parse time and the term-introspection
        # builtins (LANG/DATATYPE/STRLANG/STRDT/LANGMATCHES, exact
        # sameTerm/isIRI/isLiteral) become available. Default stays the
        # lexical 3-column contract.
        self.term_graph = term_graph
        self._funcs = dict(self._FUNCS)
        if term_graph:
            self._funcs.update(_TERM_FUNCS)

    # ---------------------------------------------------------- terms

    def _expand(self, pfx: str, local: str) -> str:
        if pfx not in self.prefixes:
            raise SparqlError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def term(self, allow_path: bool = False, node_pos: bool = False):
        """One RDF term: variable, IRI, prefixed name, literal, number,
        or 'a'. In predicate position (``allow_path``) a whitespace-free
        run containing path operators parses via operators/paths.

        ``node_pos`` marks subject/object (and VALUES-cell) position:
        under ``term_graph`` mode the constant renders to its N-Triples
        shape (rdfio/terms.render_term) so it matches the rendered
        subject/object columns — IRIs gain angle brackets, literals keep
        their language tag / datatype, bare numbers type as
        xsd:integer/xsd:decimal (SPARQL §4.1.2). Predicate and GRAPH
        positions stay bare (those columns are never rendered)."""
        c = self.c
        render_obj = self.term_graph and node_pos
        m = c.match(_VAR_RE)
        if m:
            return "?" + m.group(1)
        if allow_path:
            c._skip()
            m = _PATH_RE.match(c.text, c.pos)
            # path detection must ignore characters INSIDE <IRI> brackets
            # (every http IRI contains '/')
            if m and any(ch in _PATH_CHARS
                         for ch in re.sub(r"<[^>]*>", "", m.group(0))):
                c.pos = m.end()
                # '?' ends _PATH_RE only as an operator; expand pnames
                # inside the path string before handing to parse_path
                from .operators.paths import parse_path
                return parse_path(self._expand_path(m.group(0)))
        m = c.match(_IRI_RE)
        if m:
            return f"<{m.group(1)}>" if render_obj else m.group(1)
        m = c.match(_STR_RE) or c.match(_SQ_STR_RE)
        if m:
            lit = re.sub(r"\\(.)", r"\1", m.group(1))
            # language tags / datatypes on literals: the lexical 3-col
            # graph drops the suffix; term_graph mode keeps it rendered
            dt = lang = None
            if c.accept("^^"):
                mm = c.match(_IRI_RE)
                if mm:
                    dt = mm.group(1)
                else:
                    mm = c.match(_PNAME_RE)
                    if not mm:
                        c.fail("datatype IRI")
                    dt = self._expand(mm.group(1) or "", mm.group(2))
            elif c.accept("@"):
                mm = c.match(_LANGTAG_RE)
                if not mm:
                    c.fail("language tag")
                lang = mm.group(0)
            if render_obj:
                from .rdfio.terms import render_term
                return render_term(lit, datatype=dt, lang=lang)
            return lit
        m = c.match(_NUM_RE)
        if m:
            if render_obj:
                from .rdfio.terms import (XSD_DECIMAL, XSD_INTEGER,
                                          render_term)
                dt = XSD_DECIMAL if "." in m.group(0) else XSD_INTEGER
                return render_term(m.group(0), datatype=dt)
            return m.group(0)
        c._skip()
        m = _PNAME_RE.match(c.text, c.pos)
        if m:
            c.pos = m.end()
            iri = self._expand(m.group(1) or "", m.group(2))
            return f"<{iri}>" if render_obj else iri
        m = c.match(_WORD_RE)
        if m:
            # 'a' = rdf:type ONLY in predicate position (SPARQL grammar:
            # the keyword is a Verb production, never a subject/object)
            if m.group(0) == "a" and allow_path:
                return RDF_TYPE
            # extension: bare tokens as terms, matching the bare-token
            # atoms the rest of the engine uses (paths grammar, pattern
            # tuples over graphs with non-IRI predicates like 'parent')
            return m.group(0)
        c.fail("term")

    def _expand_path(self, s: str) -> str:
        def sub(m: re.Match) -> str:
            return "<" + self._expand(m.group(1) or "", m.group(2)) + ">"
        # IRIs pass through; pnames (with ':') expand to <IRI> atoms
        out, i = [], 0
        while i < len(s):
            if s[i] == "<":
                j = s.index(">", i) + 1
                out.append(s[i:j])
                i = j
                continue
            m = _PNAME_RE.match(s, i)
            if m and ":" in m.group(0):
                out.append(sub(m))
                i = m.end()
                continue
            out.append(s[i])
            i += 1
        return "".join(out)

    # ----------------------------------------------------- expressions

    _FUNCS = {
        "strlen": "length({0})",
        "ucase": "upper({0})",
        "lcase": "lower({0})",
        "contains": "(instr({0}, {1}) > 0)",
        "strstarts": "(left({0}, length({1})) = {1})",
        "strends": "(right({0}, length({1})) = {1})",
        "bound": "({0} is not null)",
        "abs": "abs({0})",
        "round": "round({0})",
        "ceil": "ceil({0})",
        "floor": "floor({0})",
        "str": "({0})",
        "if": "(case when {0} then {1} else {2} end)",
        "coalesce": None,     # variadic, emitted directly
        "concat": None,
        "substr": None,
        # r4 additions — still the shared Spark∩DuckDB spelling set
        "strbefore": "(case when instr({0}, {1}) > 0 "
                     "then left({0}, instr({0}, {1}) - 1) else '' end)",
        "strafter": "(case when instr({0}, {1}) > 0 "
                    "then substr({0}, instr({0}, {1}) + length({1})) "
                    "else '' end)",
        "md5": "md5({0})",
        # SHA256: Spark spells it sha2(x, 256), DuckDB sha256(x) — paired
        # neutral markers, rewritten per engine by bgp.render_dialect.
        "sha256": "__sha256__({0}__sha256_end__)",
        # IRI/URI under lexical-graph semantics: terms are already plain
        # strings, so constructing an IRI from a string is identity (the
        # graph carries no term metadata to attach).
        "iri": "({0})",
        "uri": "({0})",
        # the 3-col lexical graph makes term equality = string equality
        "sameterm": "({0} = {1})",
        "isblank": "(left({0}, 2) = '_:')",
        # ISNUMERIC: SPARQL says "is a numeric literal"; the lexical graph
        # keeps numbers as their lexical forms, so numeric = parseable.
        # try_cast is spelled identically in Spark SQL and DuckDB.
        "isnumeric": "(try_cast({0} as double) is not null)",
        # ISIRI/ISLITERAL under lexical-graph semantics: IRIs in KG output
        # always carry an http(s)/urn scheme (skolemized bnodes are _:).
        "isiri": "(left({0}, 7) = 'http://' or left({0}, 8) = 'https://'"
                 " or left({0}, 4) = 'urn:')",
        "isuri": "(left({0}, 7) = 'http://' or left({0}, 8) = 'https://'"
                 " or left({0}, 4) = 'urn:')",
        "isliteral": "(not (left({0}, 2) = '_:' or left({0}, 7) = 'http://'"
                     " or left({0}, 8) = 'https://'"
                     " or left({0}, 4) = 'urn:'))",
        "year": "year(cast({0} as timestamp))",
        "month": "month(cast({0} as timestamp))",
        "day": "day(cast({0} as timestamp))",
        "hours": "hour(cast({0} as timestamp))",
        "minutes": "minute(cast({0} as timestamp))",
        "seconds": "second(cast({0} as timestamp))",
    }
    _CASTS = {
        "http://www.w3.org/2001/XMLSchema#integer": "bigint",
        "http://www.w3.org/2001/XMLSchema#int": "bigint",
        "http://www.w3.org/2001/XMLSchema#long": "bigint",
        "http://www.w3.org/2001/XMLSchema#double": "double",
        "http://www.w3.org/2001/XMLSchema#decimal": "double",
        "http://www.w3.org/2001/XMLSchema#float": "double",
        "http://www.w3.org/2001/XMLSchema#boolean": "boolean",
    }

    def expr(self) -> str:
        """Translate a SPARQL expression to the shared SQL subset
        (precedence: || < && < ! < comparison < +- < */ < unary)."""
        return self._or()

    def _or(self) -> str:
        left = self._and()
        while self.c.accept("||"):
            left = f"({left} or {self._and()})"
        return left

    def _and(self) -> str:
        left = self._not()
        while self.c.accept("&&"):
            left = f"({left} and {self._not()})"
        return left

    def _not(self) -> str:
        self.c._skip()
        if (self.c.text.startswith("!", self.c.pos)
                and not self.c.text.startswith("!=", self.c.pos)):
            self.c.pos += 1
            return f"(not {self._not()})"
        return self._cmp()

    def _cmp(self) -> str:
        left = self._add()
        for op, sql in (("<=", "<="), (">=", ">="), ("!=", "<>"),
                        ("=", "="), ("<", "<"), (">", ">")):
            if self.c.accept(op):
                return f"({left} {sql} {self._add()})"
        neg = ""
        if self.c.peek_kw("NOT"):
            save = self.c.pos
            self.c.accept_kw("NOT")
            if not self.c.peek_kw("IN"):
                self.c.pos = save
                return left
            neg = "not "
        if self.c.accept_kw("IN"):
            items = self._args()
            return f"({left} {neg}in ({', '.join(items)}))"
        return left

    def _add(self) -> str:
        left = self._mul()
        while True:
            if self.c.accept("+"):
                left = f"({left} + {self._mul()})"
            elif self.c.accept("-"):
                left = f"({left} - {self._mul()})"
            else:
                return left

    def _mul(self) -> str:
        left = self._primary()
        while True:
            if self.c.accept("*"):
                left = f"({left} * {self._primary()})"
            elif self.c.accept("/"):
                left = f"({left} / {self._primary()})"
            else:
                return left

    def _args(self) -> list[str]:
        self.c.expect("(")
        args = [self.expr()]
        while self.c.accept(","):
            args.append(self.expr())
        self.c.expect(")")
        return args

    def _primary(self) -> str:
        c = self.c
        if c.accept("("):
            e = self.expr()
            c.expect(")")
            return f"({e})"
        m = c.match(_VAR_RE)
        if m:
            return m.group(1)
        m = c.match(_STR_RE) or c.match(_SQ_STR_RE)
        if m:
            return _sq(re.sub(r"\\(.)", r"\1", m.group(1)))
        m = c.match(_NUM_RE)
        if m:
            return m.group(0)
        c._skip()
        m = _PNAME_RE.match(c.text, c.pos)
        if m and m.group(0) not in ("", ":"):
            c.pos = m.end()
            iri = self._expand(m.group(1) or "", m.group(2))
            if iri in self._CASTS:
                args = self._args()
                return f"cast({args[0]} as {self._CASTS[iri]})"
            raise SparqlError(f"unsupported function IRI <{iri}>")
        m = c.match(_WORD_RE)
        if m:
            word = m.group(0)
            lw = word.lower()
            if lw in ("true", "false"):
                return lw
            if lw == "regex":
                # REGEX compiles to regexp_extract(x, p, 0) <> '' — the
                # one regex spelling Spark SQL and DuckDB share with
                # matching search (not full-match) semantics. Flags ride
                # inline as (?ism), supported identically by Java regex
                # and RE2. Documented deviation: a pattern that matches
                # ONLY the empty string (e.g. '^') evaluates false.
                args = self._args()
                if len(args) not in (2, 3):
                    raise SparqlError("REGEX takes 2 or 3 arguments")
                pat = args[1]
                if len(args) == 3:
                    fl = re.fullmatch(r"'([ism]*)'", args[2])
                    if not fl:
                        raise SparqlError(
                            "REGEX flags must be a literal subset of "
                            "'i', 's', 'm'")
                    if fl.group(1):
                        pat = f"concat('(?{fl.group(1)})', {pat})"
                return f"(regexp_extract({args[0]}, {pat}, 0) <> '')"
            if lw == "replace":
                # REPLACE (fn:replace) substitutes EVERY occurrence; Spark
                # regexp_replace is global, DuckDB first-match unless
                # flagged 'g' — so the call compiles to a neutral
                # __replace_g__ marker rewritten per engine at evaluation
                # (operators/bgp.render_dialect). Flags ride inline as
                # (?ism) exactly like REGEX. Documented restriction:
                # backreferences in the replacement are rejected in BOTH
                # spellings (Java '$1', RE2 '\\1' — no shared syntax; a
                # bare backslash also diverges: Java escape vs RE2
                # near-literal), so '$' and '\\' are both refused.
                args = self._args()
                if len(args) not in (3, 4):
                    raise SparqlError("REPLACE takes 3 or 4 arguments")
                if "$" in args[2] or "\\" in args[2]:
                    raise SparqlError(
                        "REPLACE: backreferences / backslashes in the "
                        "replacement are not supported (engine-divergent "
                        "syntax: Java '$1' vs RE2 '\\1')")
                pat = args[1]
                if len(args) == 4:
                    fl = re.fullmatch(r"'([ism]*)'", args[3])
                    if not fl:
                        raise SparqlError(
                            "REPLACE flags must be a literal subset of "
                            "'i', 's', 'm'")
                    if fl.group(1):
                        pat = f"concat('(?{fl.group(1)})', {pat})"
                return (f"regexp_replace({args[0]}, {pat}, "
                        f"{args[2]}__replace_g__)")
            if lw == "strdt" and self.term_graph:
                # STRDT(string-expr, <datatype-iri>) → rendered typed
                # literal; the datatype argument is an IRI term, not an
                # expression, so it parses here rather than via expr().
                c.expect("(")
                e = self.expr()
                c.expect(",")
                mm = c.match(_IRI_RE)
                if mm:
                    dtiri = mm.group(1)
                else:
                    c._skip()
                    mp = _PNAME_RE.match(c.text, c.pos)
                    if not mp or mp.group(0) in ("", ":"):
                        c.fail("datatype IRI")
                    c.pos = mp.end()
                    dtiri = self._expand(mp.group(1) or "", mp.group(2))
                c.expect(")")
                esc = _terms.esc_sql(e)
                if dtiri == _terms.XSD_STRING:
                    # xsd:string folds to the plain-literal rendering
                    # (RDF 1.1 simple-literal identification), matching
                    # rdfio/terms.render_term
                    return f"('\"' || {esc} || '\"')"
                return f"('\"' || {esc} || '\"^^<{dtiri}>')"
            if lw in self._funcs:
                args = self._args()
                tmpl = self._funcs[lw]
                if tmpl is None:
                    return f"{lw}({', '.join(args)})"
                return tmpl.format(*args)
            if lw in _TERM_ONLY:
                raise SparqlError(
                    f"{word.upper()} requires the rendered-term graph: "
                    "parse with parse_sparql(text, term_graph=True) and "
                    "query a graph rendered by "
                    "rdfio.terms.render_object_terms")
            raise SparqlError(f"unsupported function {word!r}")
        c.fail("expression")

    # ------------------------------------------------------- aggregates

    def _agg_spec(self, alias: str):
        """One aggregate call → a bgp_agg aggs entry."""
        c = self.c
        kw = c.accept_kw("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
                         "GROUP_CONCAT")
        if not kw:
            c.fail("aggregate function")
        c.expect("(")
        if kw == "COUNT" and c.accept("*"):
            c.expect(")")
            return (alias, "count(*)")
        distinct = bool(c.accept_kw("DISTINCT"))
        m = c.match(_VAR_RE)
        if not m:
            c.fail("aggregate variable")
        var = m.group(1)
        if kw == "GROUP_CONCAT":
            sep = " "
            if c.accept(";"):
                if not c.accept_kw("SEPARATOR"):
                    c.fail("SEPARATOR")
                c.expect("=")
                ms = c.match(_STR_RE) or c.match(_SQ_STR_RE)
                if not ms:
                    c.fail("separator string")
                sep = re.sub(r"\\(.)", r"\1", ms.group(1))
            c.expect(")")
            return (alias, "group_concat", var, sep)
        c.expect(")")
        d = "distinct " if distinct else ""
        fn = {"COUNT": "count", "SUM": "sum", "MIN": "min", "MAX": "max",
              "AVG": "avg", "SAMPLE": "min"}[kw]
        return (alias, f"{fn}({d}{var})")

    # ----------------------------------------------------- group graph

    def triples_block(self, sink: list, graph=None) -> None:
        """subject (predicate object (',' object)*) (';' ...)* '.'?"""
        subj = self.term(node_pos=True)
        while True:
            pred = self.term(allow_path=True)
            while True:
                obj = self.term(node_pos=True)
                sink.append((graph, subj, pred, obj) if graph is not None
                            else (subj, pred, obj))
                if not self.c.accept(","):
                    break
            if self.c.accept(";"):
                if self.c.peek("}") or self.c.peek("."):
                    break
                continue
            break
        self.c.accept(".")

    def group(self, q: SparqlQuery) -> None:
        c = self.c
        c.expect("{")
        while not c.accept("}"):
            if c.peek("{"):
                self._braced(q)
                continue
            kw = c.accept_kw("OPTIONAL", "MINUS", "FILTER", "BIND",
                             "VALUES", "GRAPH")
            if kw == "OPTIONAL":
                q.optionals.append(self._plain_group())
            elif kw == "MINUS":
                q.minus.append(self._plain_group())
            elif kw == "FILTER":
                if c.accept_kw("EXISTS"):
                    q.exists.append(self._plain_group())
                elif c.accept_kw("NOT"):
                    if not c.accept_kw("EXISTS"):
                        c.fail("EXISTS")
                    # FILTER NOT EXISTS: anti-join on shared variables —
                    # identical to MINUS whenever the group shares ≥1
                    # variable (bgp_match rejects the disjoint case both
                    # forms disagree on)
                    q.minus.append(self._plain_group())
                else:
                    q.filters.append(self.expr())
            elif kw == "BIND":
                c.expect("(")
                e = self.expr()
                if not c.accept_kw("AS"):
                    c.fail("AS")
                m = c.match(_VAR_RE)
                if not m:
                    c.fail("BIND variable")
                c.expect(")")
                q.binds.append((m.group(1), e))
            elif kw == "VALUES":
                if q.values is not None:
                    raise SparqlError("only one VALUES clause per group")
                q.values = self._values()
            elif kw == "GRAPH":
                g = self.term()
                quads: list = []
                c.expect("{")
                while not c.peek("}"):
                    self.triples_block(quads, graph=g)
                c.expect("}")
                q.patterns.extend(quads)
            else:
                self.triples_block(q.patterns)

    def _braced(self, q: SparqlQuery) -> None:
        """'{' ... — subquery, or a UNION chain of groups."""
        c = self.c
        save = c.pos
        c.expect("{")
        if c.peek_kw("SELECT"):
            if q.subselect is not None:
                raise SparqlError("only one subquery per group")
            q.subselect = self._subselect()
            c.expect("}")
            return
        c.pos = save
        branches = [self._plain_group()]
        while c.accept_kw("UNION"):
            branches.append(self._plain_group())
        if len(branches) == 1:
            q.patterns.extend(branches[0])
        else:
            if q.union_branches is not None:
                raise SparqlError("only one UNION chain per group")
            q.union_branches = branches

    def _plain_group(self) -> list:
        """A nested group restricted to triple patterns (the shape the
        algebra's optionals/minus/exists accept)."""
        sub = SparqlQuery(form="select")
        self.group(sub)
        if (sub.optionals or sub.minus or sub.filters or sub.binds
                or sub.values or sub.union_branches or sub.subselect
                or sub.exists):
            raise SparqlError(
                "nested groups support triple patterns only (wrap complex "
                "groups in a subquery)")
        return sub.patterns

    def _subselect(self) -> dict:
        c = self.c
        c.accept_kw("SELECT")
        group_vars: list[str] = []
        aggs: list = []
        while True:
            m = c.match(_VAR_RE)
            if m:
                group_vars.append(m.group(1))
                continue
            if c.peek("("):
                c.expect("(")
                aggs.append(self._agg_alias())
                continue
            break
        if not c.accept_kw("WHERE"):
            c.fail("WHERE")
        sub = SparqlQuery(form="select")
        self.group(sub)
        if (sub.optionals or sub.minus or sub.filters or sub.binds
                or sub.values or sub.union_branches or sub.subselect):
            raise SparqlError("subquery WHERE supports triple patterns only")
        group_by: list[str] = []
        if c.accept_kw("GROUP"):
            if not c.accept_kw("BY"):
                c.fail("BY")
            while True:
                m = c.match(_VAR_RE)
                if not m:
                    break
                group_by.append(m.group(1))
        having: list[str] = []
        if c.accept_kw("HAVING"):
            c.expect("(")
            having.append(self.expr())
            c.expect(")")
        if not group_by:
            group_by = group_vars
        if sorted(group_by) != sorted(group_vars):
            raise SparqlError(
                "subquery must project exactly its GROUP BY variables "
                "plus aggregate aliases")
        return {"patterns": sub.patterns, "group_by": group_by,
                "aggs": aggs, "having": having}

    def _agg_alias(self):
        spec = self._agg_spec("_")
        if not self.c.accept_kw("AS"):
            self.c.fail("AS")
        m = self.c.match(_VAR_RE)
        if not m:
            self.c.fail("alias variable")
        self.c.expect(")")
        return (m.group(1),) + tuple(spec[1:])

    def _values(self) -> tuple:
        c = self.c
        cols: list[str] = []
        if c.accept("("):
            while True:
                m = c.match(_VAR_RE)
                if not m:
                    break
                cols.append(m.group(1))
            c.expect(")")
        else:
            m = c.match(_VAR_RE)
            if not m:
                c.fail("VALUES variable")
            cols.append(m.group(1))
        rows: list[tuple] = []
        c.expect("{")
        while not c.accept("}"):
            if len(cols) == 1 and not c.peek("("):
                rows.append((self._values_cell(),))
                continue
            c.expect("(")
            row = []
            while not c.accept(")"):
                row.append(self._values_cell())
            if len(row) != len(cols):
                raise SparqlError("VALUES row arity mismatch")
            rows.append(tuple(row))
        return (cols, rows)

    def _values_cell(self):
        if self.c.accept_kw("UNDEF"):
            return None
        # VALUES cells join against subject/object bindings — under
        # term_graph they must render like pattern node constants or an
        # IRI/lang-literal cell would never match the rendered columns
        return self.term(node_pos=True)

    # ----------------------------------------------------------- query

    def parse(self) -> SparqlQuery:
        c = self.c
        while c.accept_kw("PREFIX"):
            c._skip()
            m = _PNAME_RE.match(c.text, c.pos)
            if not m or m.group(2):
                c.fail("prefix declaration")
            c.pos = m.end()
            mi = c.match(_IRI_RE)
            if not mi:
                c.fail("prefix IRI")
            self.prefixes[m.group(1) or ""] = mi.group(1)
        if c.accept_kw("ASK"):
            q = SparqlQuery(form="ask")
            c.accept_kw("WHERE")
            self.group(q)
        elif c.accept_kw("DESCRIBE"):
            # DESCRIBE <iri>... | DESCRIBE ?v WHERE {...} — answered as
            # Concise Bounded Description (operators/graph.describe)
            q = SparqlQuery(form="describe", describe_terms=[])
            while True:
                c._skip()
                m = _VAR_RE.match(c.text, c.pos)
                if m:
                    c.pos = m.end()
                    q.describe_terms.append("?" + m.group(1))
                    continue
                mi = c.match(_IRI_RE)
                if mi:
                    # term_graph: subjects are rendered <...>, so the CBD
                    # seed constant must render the same way to match
                    q.describe_terms.append(
                        f"<{mi.group(1)}>" if self.term_graph
                        else mi.group(1))
                    continue
                mp = _PNAME_RE.match(c.text, c.pos)
                if mp and mp.group(0) not in ("", ":"):
                    c.pos = mp.end()
                    iri = self._expand(mp.group(1) or "", mp.group(2))
                    q.describe_terms.append(
                        f"<{iri}>" if self.term_graph else iri)
                    continue
                break
            if not q.describe_terms:
                c.fail("DESCRIBE term")
            if c.accept_kw("WHERE"):
                self.group(q)
            vars_used = [t for t in q.describe_terms if t.startswith("?")]
            if vars_used and not q.patterns:
                c.fail("WHERE group binding the DESCRIBE variable")
        elif c.accept_kw("CONSTRUCT"):
            q = SparqlQuery(form="construct", template=[])
            c.expect("{")
            while not c.peek("}"):
                self.triples_block(q.template)
            c.expect("}")
            if not c.accept_kw("WHERE"):
                c.fail("WHERE")
            self.group(q)
        elif c.accept_kw("SELECT"):
            q = SparqlQuery(form="select")
            q.distinct = bool(c.accept_kw("DISTINCT"))
            c.accept_kw("REDUCED")
            proj_exprs = []
            if c.accept("*"):
                q.variables = None
            else:
                q.variables = []
                while True:
                    m = c.match(_VAR_RE)
                    if m:
                        q.variables.append(m.group(1))
                        continue
                    if c.peek("(") and not c.peek_kw("WHERE"):
                        c.expect("(")
                        if c.peek_kw("COUNT", "SUM", "MIN", "MAX", "AVG",
                                     "SAMPLE", "GROUP_CONCAT"):
                            spec = self._agg_alias()
                            q.aggs.append(spec)
                            q.variables.append(spec[0])
                        else:
                            # projection expression (expr AS ?v) — BIND
                            # sugar over each solution (pre-aggregation,
                            # so mixing with aggregates is rejected at
                            # the end of parse)
                            e = self.expr()
                            if not c.accept_kw("AS"):
                                c.fail("AS")
                            m = c.match(_VAR_RE)
                            if not m:
                                c.fail("alias variable")
                            c.expect(")")
                            q.binds.append((m.group(1), e))
                            q.variables.append(m.group(1))
                            proj_exprs.append(m.group(1))
                        continue
                    break
                if not q.variables:
                    c.fail("projection")
                if proj_exprs and q.aggs:
                    raise SparqlError(
                        "projection expressions cannot mix with "
                        "aggregates (they evaluate pre-aggregation "
                        "here); aggregate in a subquery instead")
            c.accept_kw("WHERE")
            self.group(q)
            if c.accept_kw("GROUP"):
                if not c.accept_kw("BY"):
                    c.fail("BY")
                while True:
                    m = c.match(_VAR_RE)
                    if not m:
                        break
                    q.group_by.append(m.group(1))
            if c.accept_kw("HAVING"):
                c.expect("(")
                q.having.append(self.expr())
                c.expect(")")
            if c.accept_kw("ORDER"):
                if not c.accept_kw("BY"):
                    c.fail("BY")
                # OrderCondition ::= (ASC|DESC) BrackettedExpression
                #                  | BrackettedExpression | Var
                # Keys are stored as compiled shared-SQL strings (a bare
                # variable compiles to its column name), so expression
                # keys ride the same (key, direction) tuples. Expression
                # keys see the PROJECTED columns (the one evaluation
                # order both engines share under DISTINCT).
                while True:
                    d = c.accept_kw("ASC", "DESC")
                    if d:
                        c.expect("(")
                        e = self.expr()
                        c.expect(")")
                        q.order_by.append((e, d.lower()))
                        continue
                    m = c.match(_VAR_RE)
                    if m:
                        q.order_by.append((m.group(1), "asc"))
                        continue
                    if c.accept("("):
                        e = self.expr()
                        c.expect(")")
                        q.order_by.append((e, "asc"))
                        continue
                    break
                if not q.order_by:
                    c.fail("ORDER BY condition")
            if c.accept_kw("LIMIT"):
                m = c.match(_NUM_RE)
                q.limit = int(m.group(0)) if m else c.fail("LIMIT count")
            if c.accept_kw("OFFSET"):
                m = c.match(_NUM_RE)
                q.offset = int(m.group(0)) if m else c.fail("OFFSET count")
        else:
            c.fail("SELECT, ASK or CONSTRUCT")
        if not c.eof():
            c.fail("end of query")
        if q.aggs and not q.group_by:
            q.group_by = [v for v in (q.variables or [])
                          if v not in {a[0] for a in q.aggs}]
        if q.form != "select" and (q.subselect is not None
                                   or q.union_branches is not None):
            # the ASK/CONSTRUCT/DESCRIBE compilers route straight to their
            # operators, which take a plain BGP — failing loudly beats
            # silently dropping the subquery/UNION constraint
            raise SparqlError(
                f"{q.form.upper()} does not support subqueries or UNION "
                f"groups (wrap in a SELECT and post-process)")
        return q


def parse_sparql(text: str, term_graph: bool = False) -> SparqlQuery:
    """Parse a SPARQL query. ``term_graph=True`` targets a rendered-term
    graph (rdfio/terms.render_object_terms): object-position constants
    render to N-Triples shape and the term-introspection builtins
    (LANG/DATATYPE/LANGMATCHES/STRLANG/STRDT, exact sameTerm/isIRI/
    isLiteral) become available. Expression string literals stay PLAIN
    values — compare against lexical forms via STR(?x), or put the
    constant in the pattern where it renders automatically."""
    return _Parser(text, term_graph=term_graph).parse()


@dataclass
class SparqlUpdate:
    op: str          # insert_data | delete_data | delete_where |
    #                  insert_where | delete_template
    data: list = field(default_factory=list)        # ground triples
    template: list = field(default_factory=list)
    patterns: list = field(default_factory=list)
    optionals: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    filters: list = field(default_factory=list)


def parse_update(text: str) -> SparqlUpdate:
    """SPARQL 1.1 Update subset: INSERT DATA, DELETE DATA, DELETE WHERE,
    INSERT {t} WHERE {p}, DELETE {t} WHERE {p}. Executed against the
    graph store by sinks/graph_store.update_store (inserts = materialized
    batches, deletes = retraction batches — the store is append-only)."""
    p = _Parser(text)
    c = p.c
    while c.accept_kw("PREFIX"):
        c._skip()
        m = _PNAME_RE.match(c.text, c.pos)
        if not m or m.group(2):
            c.fail("prefix declaration")
        c.pos = m.end()
        mi = c.match(_IRI_RE)
        if not mi:
            c.fail("prefix IRI")
        p.prefixes[m.group(1) or ""] = mi.group(1)
    kw = c.accept_kw("INSERT", "DELETE")
    if not kw:
        c.fail("INSERT or DELETE")

    def ground(triples: list) -> list:
        for t in triples:
            # every term must be a plain string: a non-str term is a
            # parsed property-path AST (e.g. '<a>/<b>' in predicate
            # position), which would reach spark.createDataFrame and
            # fail obscurely or infer a struct-typed pred
            if any(not isinstance(x, str) for x in t):
                raise SparqlError(
                    f"{kw} DATA requires ground triples — property paths "
                    f"are not allowed in DATA blocks: {t}")
            if any(x.startswith("?") for x in t):
                raise SparqlError(f"{kw} DATA requires ground triples: {t}")
        return triples

    def block() -> list:
        out: list = []
        c.expect("{")
        while not c.peek("}"):
            p.triples_block(out)
        c.expect("}")
        return out

    def where() -> SparqlQuery:
        sub = SparqlQuery(form="select")
        p.group(sub)
        if (sub.exists or sub.binds or sub.values or sub.union_branches
                or sub.subselect):
            raise SparqlError(
                "UPDATE WHERE supports patterns/OPTIONAL/MINUS/FILTER only")
        return sub

    if c.accept_kw("DATA"):
        u = SparqlUpdate(op="insert_data" if kw == "INSERT"
                         else "delete_data", data=ground(block()))
    elif kw == "DELETE" and c.accept_kw("WHERE"):
        sub = where()
        for t in sub.patterns:
            if not all(isinstance(x, str) for x in t):
                raise SparqlError(
                    "DELETE WHERE patterns double as the delete template —"
                    " property paths are not allowed; use DELETE {t} WHERE")
        u = SparqlUpdate(op="delete_where", patterns=sub.patterns,
                         optionals=sub.optionals, minus=sub.minus,
                         filters=sub.filters)
    else:
        tmpl = block()
        if not c.accept_kw("WHERE"):
            c.fail("WHERE")
        sub = where()
        u = SparqlUpdate(op="insert_where" if kw == "INSERT"
                         else "delete_template",
                         template=tmpl, patterns=sub.patterns,
                         optionals=sub.optionals, minus=sub.minus,
                         filters=sub.filters)
    if not c.eof():
        c.fail("end of update")
    return u


# ---------------------------------------------------------------------------
# compilation — route the parsed form to the existing operators
# ---------------------------------------------------------------------------

def _match_kwargs(q: SparqlQuery) -> dict:
    kw: dict = {}
    if q.optionals:
        kw["optionals"] = q.optionals
    if q.minus:
        kw["minus"] = q.minus
    if q.exists:
        kw["exists"] = q.exists
    if q.filters:
        kw["filters"] = q.filters
    if q.binds:
        kw["binds"] = q.binds
    if q.values:
        kw["values"] = q.values
    return kw


def query_df(triples: DataFrame, query, scan=None):
    """Execute a SPARQL query (string or parsed :class:`SparqlQuery`)
    over a (subj, pred, obj[, graph]) triples DataFrame. Returns a
    DataFrame (SELECT/CONSTRUCT) or bool (ASK). ``scan`` passes through
    to bgp_match for store-backed predicate-pruned scans."""
    from .operators.bgp import (ask, bgp_agg, bgp_match, bgp_subselect,
                                bgp_union_match, construct)
    q = parse_sparql(query) if isinstance(query, str) else query
    kw = _match_kwargs(q)
    if scan is not None:
        kw["scan"] = scan
    if q.form == "ask":
        return ask(triples, q.patterns, **kw)
    if q.form == "describe":
        from .operators.graph import describe
        consts = [t for t in q.describe_terms if not t.startswith("?")]
        seeds = None
        if consts:
            seeds = triples.sparkSession.createDataFrame(
                [(t,) for t in consts], "node string")
        for var in (t[1:] for t in q.describe_terms if t.startswith("?")):
            bound = bgp_match(triples, q.patterns, **kw) \
                .select(F.col(var).alias("node")).distinct()
            seeds = bound if seeds is None else seeds.unionByName(bound)
        return describe(triples.select("subj", "pred", "obj"), seeds)
    if q.form == "construct":
        return construct(triples, q.patterns, q.template, **kw)
    if q.union_branches is not None:
        if q.patterns or kw:
            raise SparqlError("UNION must be the whole WHERE group")
        # DISTINCT applies AFTER projection (SPARQL §18.2.5) — dedup of
        # full branch rows would leave duplicates when the projection
        # narrows the columns, so it is applied below like any SELECT
        out = bgp_union_match(triples, q.union_branches)
    elif q.aggs:
        out = bgp_agg(triples, q.patterns, q.group_by, q.aggs,
                      having=q.having, **kw)
    elif q.subselect is not None:
        s = q.subselect
        out = bgp_subselect(triples, q.patterns, s["patterns"],
                            s["group_by"], s["aggs"],
                            having=s["having"], **kw)
    else:
        out = bgp_match(triples, q.patterns, **kw)
    if q.variables is not None:
        out = out.select(*q.variables)
    if q.distinct:
        out = out.distinct()
    if q.order_by:
        # ONE orderBy over all keys — chained .orderBy calls each REPLACE
        # the previous sort, which silently reduced multi-key ORDER BY to
        # its last key
        cols = [F.expr(render_dialect(k, "spark")).desc()
                if d == "desc" else F.expr(render_dialect(k, "spark"))
                for k, d in q.order_by]
        out = out.orderBy(*cols)
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def query_sql(triples_sql: str, query) -> str:
    """The SAME parsed form as DuckDB SQL (oracle emitter) — SELECT and
    CONSTRUCT forms. Modifier clauses append in standard SQL order."""
    from .operators.bgp import (bgp_agg_sql, bgp_sql, bgp_subselect_sql,
                                bgp_union_sql, construct_sql)
    q = parse_sparql(query) if isinstance(query, str) else query
    kw = _match_kwargs(q)
    if q.form == "ask":
        raise SparqlError("ASK has no tabular oracle form")
    if q.form == "describe":
        from .operators.graph import describe_sql
        parts = [f"select {_sq(t)} as node"
                 for t in q.describe_terms if not t.startswith("?")]
        parts += [
            f"select distinct {t[1:]} as node from "
            f"({bgp_sql(triples_sql, q.patterns, **kw)})"
            for t in q.describe_terms if t.startswith("?")]
        return describe_sql(triples_sql, "\nunion all\n".join(parts))
    if q.form == "construct":
        return construct_sql(triples_sql, q.patterns, q.template, **kw)
    if q.union_branches is not None:
        body = bgp_union_sql(triples_sql, q.union_branches)
    elif q.aggs:
        body = bgp_agg_sql(triples_sql, q.patterns, q.group_by, q.aggs,
                           having=q.having, **kw)
    elif q.subselect is not None:
        s = q.subselect
        body = bgp_subselect_sql(triples_sql, q.patterns, s["patterns"],
                                 s["group_by"], s["aggs"],
                                 having=s["having"], **kw)
    else:
        body = bgp_sql(triples_sql, q.patterns, **kw)
    proj = "*" if q.variables is None else ", ".join(q.variables)
    d = "distinct " if q.distinct else ""
    sql = f"select {d}{proj} from ({body}) sparql_q"
    if q.order_by:
        keys = ", ".join(f"{render_dialect(v, 'duckdb')} {d2}"
                         for v, d2 in q.order_by)
        sql += f" order by {keys}"
    if q.limit is not None:
        sql += f" limit {q.limit}"
    if q.offset:
        sql += f" offset {q.offset}"
    return sql
