"""Minimal Turtle parser — test oracle support.

Parses the subset of Turtle used by the reference's golden fixture files
(reference: spec/data/*-standard.ttl): @prefix/@base, IRIs, prefixed names,
string literals with @lang / ^^datatype, numeric/boolean shorthand, blank
node property lists, bnode labels, 'a', and ';'/','/'.' punctuation.
No external RDF library is available in this environment, so this is the
fixture-loading path for the golden P/R tests.
"""

from __future__ import annotations

import itertools
import re
from typing import NamedTuple, Optional
from urllib.parse import urljoin


class Term(NamedTuple):
    value: str
    kind: str                 # 'iri' | 'bnode' | 'literal'
    datatype: Optional[str] = None
    lang: Optional[str] = None


Triple = tuple[Term, Term, Term]

_TOKEN_RE = re.compile(r"""
      (?P<directive>@prefix|@base)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<lang>@[a-zA-Z][a-zA-Z0-9-]*)
    | (?P<dtsep>\^\^)
    | (?P<punct>[;,.\[\](){}])
    | (?P<bnode>_:[A-Za-z0-9_-]+)
    | (?P<pname>[A-Za-z][\w.-]*)?:(?P<local>(?:[\w.\-%~]|\\.)*)
    | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<kw>\ba\b|true|false|\bGRAPH\b|\bgraph\b|@prefix|@base)
    | (?P<ws>\s+)
""", re.VERBOSE)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2:i + 6], 16))); i += 6; continue
            if nxt == "U":
                out.append(chr(int(s[i + 2:i + 10], 16))); i += 10; continue
            out.append(_ESCAPES.get(nxt, nxt)); i += 2; continue
        out.append(c); i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str):
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[Triple] = []
        self._bn = itertools.count()
        self.tokens = self._tokenize(text)
        self.pos = 0

    @staticmethod
    def _tokenize(text: str) -> list[tuple[str, str]]:
        # handle """long strings""" first
        toks: list[tuple[str, str]] = []
        i = 0
        while i < len(text):
            if text.startswith('"""', i):
                j = text.index('"""', i + 3)
                toks.append(("string", '"' + text[i + 3:j].replace('"', '\\"') + '"'))
                i = j + 3
                continue
            m = _TOKEN_RE.match(text, i)
            if not m:
                raise ValueError(f"turtle tokenize error at {text[i:i+40]!r}")
            i = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            if kind == "local":
                toks.append(("pname", m.group(0)))
            else:
                toks.append((kind, m.group(0)))
        return toks

    # --- token helpers -----------------------------------------------------
    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def _next(self):
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    # --- parsing -----------------------------------------------------------
    def parse(self) -> list[Triple]:
        while self.pos < len(self.tokens):
            kind, val = self._peek()
            if kind == "directive" and val == "@prefix":
                self._next()
                _, pname = self._next()
                prefix = pname[:-1] if pname.endswith(":") else pname.split(":")[0]
                _, iri = self._next()
                self.prefixes[prefix] = iri[1:-1]
                self._expect(".")
            elif kind == "directive" and val == "@base":
                self._next()
                _, iri = self._next()
                self.base = iri[1:-1]
                self._expect(".")
            else:
                subj = self._term()
                if self._peek()[1] != ".":  # bare bnode-property-list statement
                    self._predicate_object_list(subj)
                self._expect(".")
        return self.triples

    def _expect(self, punct: str):
        kind, val = self._next()
        if val != punct:
            raise ValueError(f"expected {punct!r}, got {val!r}")

    def _new_bnode(self) -> Term:
        return Term(f"_:gen{next(self._bn)}", "bnode")

    def _predicate_object_list(self, subj: Term):
        while True:
            pred = self._term(as_predicate=True)
            while True:
                obj = self._term()
                self.triples.append((subj, pred, obj))
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                while self._peek()[1] == ";":
                    self._next()
                if self._peek()[1] in (".", "]", None):  # trailing ;
                    break
                continue
            break

    def _term(self, as_predicate: bool = False) -> Term:
        kind, val = self._next()
        if kind == "kw" and val == "a":
            return Term("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "iri")
        if kind == "kw" and val in ("true", "false"):
            return Term(val, "literal", datatype=_XSD + "boolean")
        if kind == "iri":
            iri = val[1:-1]
            if self.base and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", iri):
                iri = urljoin(self.base, iri)
            return Term(iri, "iri")
        if kind == "pname":
            prefix, _, local = val.partition(":")
            local = re.sub(r"\\(.)", r"\1", local)
            return Term(self.prefixes[prefix] + local, "iri")
        if kind == "bnode":
            return Term(val, "bnode")
        if kind == "number":
            if "e" in val.lower():
                dt = _XSD + "double"
            elif "." in val:
                dt = _XSD + "decimal"
            else:
                dt = _XSD + "integer"
            return Term(val, "literal", datatype=dt)
        if kind == "string":
            lex = _unescape(val[1:-1])
            nkind, nval = self._peek()
            if nkind == "lang":
                self._next()
                return Term(lex, "literal", lang=nval[1:].lower())
            if nkind == "dtsep":
                self._next()
                dt_term = self._term()
                return Term(lex, "literal", datatype=dt_term.value)
            return Term(lex, "literal")
        if val == "[":
            node = self._new_bnode()
            if self._peek()[1] != "]":
                self._predicate_object_list(node)
            self._expect("]")
            return node
        if val == "(":
            # RDF collection
            items = []
            while self._peek()[1] != ")":
                items.append(self._term())
            self._next()
            rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
            if not items:
                return Term(rdf + "nil", "iri")
            head = prev = self._new_bnode()
            for i, item in enumerate(items):
                self.triples.append((prev, Term(rdf + "first", "iri"), item))
                nxt = self._new_bnode() if i + 1 < len(items) else Term(rdf + "nil", "iri")
                self.triples.append((prev, Term(rdf + "rest", "iri"), nxt))
                prev = nxt
            return head
        raise ValueError(f"unexpected token {kind} {val!r}")


def parse_turtle(text: str) -> list[Triple]:
    return TurtleParser(text).parse()


class TrigParser(TurtleParser):
    """TriG = Turtle plus graph blocks: ``<g> { ... }``, an optional GRAPH
    keyword, and bare ``{ ... }`` for the default graph. Produces quads —
    (subj, pred, obj, graph) with graph None for the default graph."""

    def parse_quads(self) -> list[tuple]:
        quads: list[tuple] = []
        while self.pos < len(self.tokens):
            kind, val = self._peek()
            if kind == "directive" and val == "@prefix":
                self._next()
                _, pname = self._next()
                prefix = (pname[:-1] if pname.endswith(":")
                          else pname.split(":")[0])
                _, iri = self._next()
                self.prefixes[prefix] = iri[1:-1]
                self._expect(".")
            elif kind == "directive" and val == "@base":
                self._next()
                _, iri = self._next()
                self.base = iri[1:-1]
                self._expect(".")
            elif val == "{":
                self._next()
                self._graph_block(quads, None)
            else:
                if kind == "kw" and val.upper() == "GRAPH":
                    self._next()
                term = self._term()
                if self._peek()[1] == "{":
                    self._next()
                    self._graph_block(quads, term)
                else:           # top-level Turtle statement: default graph
                    before = len(self.triples)
                    if self._peek()[1] != ".":
                        self._predicate_object_list(term)
                    self._expect(".")
                    quads.extend((s, p, o, None)
                                 for s, p, o in self.triples[before:])
        return quads

    def _graph_block(self, quads: list, graph) -> None:
        while self._peek()[1] != "}":
            before = len(self.triples)
            subj = self._term()
            if self._peek()[1] not in (".", "}"):
                self._predicate_object_list(subj)
            if self._peek()[1] == ".":   # trailing '.' optional before '}'
                self._next()
            quads.extend((s, p, o, graph)
                         for s, p, o in self.triples[before:])
        self._expect("}")


def parse_trig(text: str) -> list[tuple]:
    return TrigParser(text).parse_quads()


def parse_turtle_file(path: str) -> list[Triple]:
    with open(path, "r", encoding="utf-8") as f:
        return parse_turtle(f.read())
