"""SPARQL 1.1 property-path evaluation over (subj, pred, obj) triples.

The reference emits RDF consumed by SPARQL stores (rdf-tabular README.md);
property paths are the navigational half of SPARQL the BGP tier
(operators/bgp.py) doesn't cover: ``p/q`` (sequence), ``p|q``
(alternation), ``^p`` (inverse), ``p+`` (one-or-more). A path expression
parses once into an AST, and the SAME AST compiles to (a) a DataFrame
program and (b) a DuckDB SQL string — one source of truth, two engines, so
the oracle checks semantics rather than a transcription.

Semantics follow SPARQL 1.1 §9.1 (path evaluation): ``/``, ``|``, ``^``
are bag-preserving (duplicates from multiple derivations survive), while
``+``, ``*``, ``?`` are SET semantics (distinct pairs — the W3C
duplicate-free definition that guarantees termination on cyclic graphs).
The zero-length leg of ``*``/``?`` follows ZeroLengthPath: it matches
every *term of the graph* paired with itself (all subjects and objects of
the input relation), so ``p*`` = identity-over-nodes ∪ ``p+``. Cost at
10^12 triples: the node domain is ONE two-column distinct over the scan
(subj ∪ obj) — linear, not a cross sweep — but it does read every
predicate bucket, so prefer ``+`` when reflexivity isn't needed.

Scale notes (10^12 triples):
- An atom ``p`` is a predicate-constant filter — it pushes to the
  parquet/Iceberg scan (pred min/max-indexed by the graph store's
  pred_bucket layout), so a path never reads the full graph.
- ``/`` is one shuffle join on the shared endpoint; ``|`` is a zero-shuffle
  bag concat; ``^`` is a projection (free).
- ``+`` delegates to operators/graph.transitive_closure — semi-naive
  delta iteration, localCheckpointed per round.

Grammar (whitespace-insensitive)::

    alt  := seq ('|' seq)*
    seq  := unary ('/' unary)*
    unary:= '^' unary | postfix
    postfix := primary ('+' | '*' | '?')*
    primary := '(' alt ')' | '!' negset | atom
    negset  := atom | '(' atom ('|' atom)* ')'
    atom    := '<' any-chars '>' | bare token (any run of chars except
               /|^+*?()! and whitespace)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import _sq


# ---------------------------------------------------------------------------
# AST + parser
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Atom:
    pred: str


@dataclass(frozen=True)
class NegSet:
    """SPARQL negated property set ``!(p1|p2|...)`` — any predicate NOT in
    the set (forward direction only; SPARQL's ^-inside-! form is not
    offered). Note this is the one path form that cannot push a positive
    predicate filter to the scan — it reads every predicate bucket."""
    preds: tuple


@dataclass(frozen=True)
class Inv:
    child: object


@dataclass(frozen=True)
class Seq:
    left: object
    right: object


@dataclass(frozen=True)
class Alt:
    left: object
    right: object


@dataclass(frozen=True)
class Plus:
    child: object


@dataclass(frozen=True)
class Star:
    """``p*`` — zero-or-more: identity over all graph terms ∪ ``p+``
    (SPARQL 1.1 ZeroOrMorePath, duplicate-free)."""
    child: object


@dataclass(frozen=True)
class Opt:
    """``p?`` — zero-or-one: identity over all graph terms ∪ ``p``
    (SPARQL 1.1 ZeroOrOnePath, duplicate-free)."""
    child: object


_SPECIAL = set("/|^+*?()!")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def _skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def _peek(self) -> str:
        self._skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _eat(self, ch: str) -> None:
        if self._peek() != ch:
            raise ValueError(
                f"path parse error at {self.pos}: expected {ch!r} in "
                f"{self.text!r}")
        self.pos += 1

    def parse(self):
        node = self._alt()
        if self._peek():
            raise ValueError(
                f"path parse error: trailing input at {self.pos} in "
                f"{self.text!r}")
        return node

    def _alt(self):
        node = self._seq()
        while self._peek() == "|":
            self._eat("|")
            node = Alt(node, self._seq())
        return node

    def _seq(self):
        node = self._unary()
        while self._peek() == "/":
            self._eat("/")
            node = Seq(node, self._unary())
        return node

    def _unary(self):
        if self._peek() == "^":
            self._eat("^")
            return Inv(self._unary())
        return self._postfix()

    def _postfix(self):
        node = self._primary()
        while self._peek() in ("+", "*", "?"):
            ch = self._peek()
            self._eat(ch)
            node = {"+": Plus, "*": Star, "?": Opt}[ch](node)
        return node

    def _atom(self) -> Atom:
        if self._peek() == "<":
            self.pos += 1
            end = self.text.find(">", self.pos)
            if end < 0:
                raise ValueError(
                    f"path parse error: unterminated <IRI> at {self.pos} "
                    f"in {self.text!r}")
            atom = Atom(self.text[self.pos:end])
            self.pos = end + 1
            return atom
        self._skip_ws()
        start = self.pos
        while (self.pos < len(self.text)
               and not self.text[self.pos].isspace()
               and self.text[self.pos] not in _SPECIAL):
            self.pos += 1
        if self.pos == start:
            raise ValueError(
                f"path parse error at {start}: expected predicate in "
                f"{self.text!r}")
        return Atom(self.text[start:self.pos])

    def _primary(self):
        if self._peek() == "!":
            self._eat("!")
            if self._peek() == "(":
                self._eat("(")
                preds = [self._atom().pred]
                while self._peek() == "|":
                    self._eat("|")
                    preds.append(self._atom().pred)
                self._eat(")")
                return NegSet(tuple(preds))
            return NegSet((self._atom().pred,))
        if self._peek() == "(":
            self._eat("(")
            node = self._alt()
            self._eat(")")
            return node
        return self._atom()


def parse_path(text: str):
    """Path expression string → AST (see module grammar)."""
    return _Parser(text).parse()


# ---------------------------------------------------------------------------
# DataFrame compiler
# ---------------------------------------------------------------------------

def _identity_df(triples: DataFrame) -> DataFrame:
    """ZeroLengthPath (SPARQL 1.1 §18.4): every term of the graph paired
    with itself — one two-column distinct over the scan, the linear-cost
    node sweep documented in the module header."""
    nodes = (triples.select(F.col("subj").alias("src"))
             .unionByName(triples.select(F.col("obj").alias("src")))
             .distinct())
    return nodes.select("src", F.col("src").alias("dst"))


def _compile_df(node, triples: DataFrame) -> DataFrame:
    if isinstance(node, Atom):
        return (triples.filter(F.col("pred") == F.lit(node.pred))
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")))
    if isinstance(node, NegSet):
        return (triples.filter(~F.col("pred").isin(list(node.preds)))
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")))
    if isinstance(node, Inv):
        e = _compile_df(node.child, triples)
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if isinstance(node, Seq):
        a = _compile_df(node.left, triples)
        b = _compile_df(node.right, triples)
        return (a.select(F.col("src"), F.col("dst").alias("mid"))
                .join(b.select(F.col("src").alias("mid"), F.col("dst")),
                      "mid")
                .select("src", "dst"))
    if isinstance(node, Alt):
        return _compile_df(node.left, triples).unionByName(
            _compile_df(node.right, triples))
    if isinstance(node, Plus):
        from .graph import transitive_closure
        return transitive_closure(_compile_df(node.child, triples))
    if isinstance(node, Star):
        from .graph import transitive_closure
        plus = transitive_closure(_compile_df(node.child, triples))
        return _identity_df(triples).unionByName(plus).distinct()
    if isinstance(node, Opt):
        child = _compile_df(node.child, triples).select("src", "dst")
        return _identity_df(triples).unionByName(child).distinct()
    raise TypeError(f"unknown path node {node!r}")


def path_match(triples: DataFrame, path) -> DataFrame:
    """Evaluate a property path → ``(src, dst)`` endpoint pairs (bag
    semantics except inside ``+``, per SPARQL 1.1 §9.1). ``path`` is an
    expression string or an already-parsed AST node."""
    ast = parse_path(path) if isinstance(path, str) else path
    return _compile_df(ast, triples)


# ---------------------------------------------------------------------------
# SQL emitter (DuckDB oracle)
# ---------------------------------------------------------------------------

def _compile_sql(node, ctes: list[str], counter: list[int]) -> str:
    """Compile one node into a CTE; returns the CTE name. ``ctes``
    accumulates definitions in dependency order."""
    name = f"p{counter[0]}"
    counter[0] += 1
    if isinstance(node, Atom):
        ctes.append(f"{name} as (select subj as src, obj as dst from t "
                    f"where pred = {_sq(node.pred)})")
    elif isinstance(node, NegSet):
        in_list = ", ".join(_sq(p) for p in node.preds)
        ctes.append(f"{name} as (select subj as src, obj as dst from t "
                    f"where pred not in ({in_list}))")
    elif isinstance(node, Inv):
        c = _compile_sql(node.child, ctes, counter)
        ctes.append(f"{name} as (select dst as src, src as dst from {c})")
    elif isinstance(node, Seq):
        a = _compile_sql(node.left, ctes, counter)
        b = _compile_sql(node.right, ctes, counter)
        ctes.append(f"{name} as (select a.src, b.dst from {a} a "
                    f"join {b} b on a.dst = b.src)")
    elif isinstance(node, Alt):
        a = _compile_sql(node.left, ctes, counter)
        b = _compile_sql(node.right, ctes, counter)
        ctes.append(f"{name} as (select src, dst from {a} "
                    f"union all select src, dst from {b})")
    elif isinstance(node, Plus):
        c = _compile_sql(node.child, ctes, counter)
        # UNION (not ALL) = the distinct/anti-join dedup of
        # transitive_closure; recursive CTE over the child CTE.
        ctes.append(f"{name} as (select src, dst from {c} "
                    f"union select r.src, e.dst from {name} r "
                    f"join {c} e on r.dst = e.src)")
    elif isinstance(node, (Star, Opt)):
        c = _compile_sql(node.child, ctes, counter)
        if isinstance(node, Star):
            closure = f"{name}_plus"
            ctes.append(f"{closure} as (select src, dst from {c} "
                        f"union select r.src, e.dst from {closure} r "
                        f"join {c} e on r.dst = e.src)")
            c = closure
        # ZeroLengthPath identity over every graph term, ∪ the child
        # (Opt) / its closure (Star); explicit DISTINCT over UNION ALL =
        # the duplicate-free W3C semantics shared with the DataFrame
        # compiler's distinct(). (Not chained UNION: inside WITH RECURSIVE,
        # DuckDB 1.0 gives any UNION-bearing CTE anchor/recursive-part
        # semantics and stops deduplicating across the branches.)
        ctes.append(f"{name} as (select distinct src, dst from ("
                    f"select subj as src, subj as dst from t "
                    f"union all select obj, obj from t "
                    f"union all select src, dst from {c}))")
    else:
        raise TypeError(f"unknown path node {node!r}")
    return name


def path_sql(triples_sql: str, path) -> str:
    """``path_match`` as SQL over a triples relation — the DuckDB oracle
    generator (same AST, second emitter). ``path`` is a string or AST."""
    ast = parse_path(path) if isinstance(path, str) else path
    ctes: list[str] = [f"t as ({triples_sql})"]
    final = _compile_sql(ast, ctes, [0])
    return ("with recursive " + ",\n".join(ctes)
            + f"\nselect src, dst from {final}")


# The AST node types, exported so BGP patterns can carry a parsed path in
# predicate position (operators/bgp accepts these as pattern terms).
PATH_NODE_TYPES = (Atom, NegSet, Inv, Seq, Alt, Plus, Star, Opt)
