"""Stage 1c: embedded JSON-LD (``<script type="application/ld+json">``) →
triples.

Schema.org JSON-LD is the dominant structured-data format on the real web
(more common than microdata), so a KG-construction pipeline over
Common-Crawl-style pages needs it alongside the table and microdata paths.
The reference's JSON-LD handling is its common-property expansion
(metadata.rb:806-839 common_properties + metadata.rb:1129-1148
normalize_jsonld); this module re-expresses that recursive node walk as an
executor-side, dependency-free expander over script blocks the shared page
parser already captured — same one-pass Arrow stage as tables / microdata /
links.

Supported subset (the shapes that dominate crawled pages):
  @context as vocab string, prefix/@vocab/@language map, or list of both;
  @graph; @id (relative ids resolve against the page URL); @type (string or
  list); nested node objects (deterministic per-page bnodes); value arrays;
  @value objects with @language / @type; JSON scalars with xsd typing.
Unparseable JSON or non-object roots yield zero triples (a crawler must
never fail a page on a malformed publisher block).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator, Optional
from urllib.parse import urljoin

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


class _Ctx:
    """Flattened @context: vocab IRI, prefix map, default language."""

    __slots__ = ("vocab", "prefixes", "language")

    def __init__(self):
        self.vocab: Optional[str] = None
        self.prefixes: dict[str, str] = {}
        self.language: Optional[str] = None

    def absorb(self, raw) -> None:
        if raw is None:
            return
        if isinstance(raw, list):
            for item in raw:
                self.absorb(item)
            return
        if isinstance(raw, str):
            # bare-string context == vocabulary base (the schema.org idiom);
            # terms concatenate, so make sure a separator exists
            self.vocab = raw if raw.endswith(("/", "#")) else raw + "/"
            return
        if isinstance(raw, dict):
            for k, v in raw.items():
                if k == "@vocab" and isinstance(v, str):
                    self.vocab = v
                elif k == "@language":
                    self.language = v if isinstance(v, str) else None
                elif isinstance(v, str) and not k.startswith("@"):
                    self.prefixes[k] = v

    def expand(self, term: str, base_url: str) -> str:
        if "://" in term:
            return term
        if ":" in term:
            pfx, local = term.split(":", 1)
            if pfx in self.prefixes:
                return self.prefixes[pfx] + local
        if self.vocab:
            return self.vocab + term
        # no vocabulary declared: fall back to a page-local property IRI,
        # mirroring the microdata path's vocab-less fallback (web.py)
        return base_url + "#" + term

    def resolve_id(self, value: str, base_url: str) -> str:
        if value.startswith("_:"):
            return value
        if "://" in value:
            return value
        return urljoin(base_url, value)


def _scalar(value, ctx: _Ctx) -> tuple[str, bool, Optional[str], Optional[str]]:
    """JSON scalar → (lexical, is_iri, datatype, lang) — same typing rule as
    the driver-side common-property expansion (pipeline._literal)."""
    if isinstance(value, bool):
        return ("true" if value else "false", False, XSD + "boolean", None)
    if isinstance(value, int):
        return (str(value), False, XSD + "integer", None)
    if isinstance(value, float):
        return (repr(value), False, XSD + "double", None)
    return (str(value), False, None, ctx.language)


class _Expander:
    def __init__(self, url: str):
        self.url = url
        self.counter = 0
        self.bnode_prefix = "_:jl-" + hashlib.sha1(url.encode()).hexdigest()[:10]
        self.out: list[tuple] = []

    def bnode(self) -> str:
        label = f"{self.bnode_prefix}-{self.counter}"
        self.counter += 1
        return label

    def node(self, obj: dict, ctx: _Ctx) -> Optional[str]:
        """Expand one node object; returns its subject term."""
        local = _Ctx()
        local.vocab, local.prefixes, local.language = \
            ctx.vocab, dict(ctx.prefixes), ctx.language
        local.absorb(obj.get("@context"))
        raw_id = obj.get("@id")
        subject = (local.resolve_id(raw_id, self.url)
                   if isinstance(raw_id, str) else self.bnode())
        types = obj.get("@type")
        for t in (types if isinstance(types, list) else
                  [types] if isinstance(types, str) else []):
            if isinstance(t, str):
                self.out.append((subject, RDF_TYPE,
                                 local.expand(t, self.url), True, None, None))
        for key, value in obj.items():
            if not isinstance(key, str) or key.startswith("@"):
                continue
            self.prop(subject, local.expand(key, self.url), value, local)
        return subject

    def prop(self, subject: str, pred: str, value, ctx: _Ctx) -> None:
        if isinstance(value, list):
            for v in value:
                self.prop(subject, pred, v, ctx)
            return
        if isinstance(value, dict):
            if "@value" in value:
                # only JSON scalars are valid literal bodies — a null or
                # object @value (templating glitches) must emit NOTHING,
                # not a Python-repr literal
                if value["@value"] is None or \
                        isinstance(value["@value"], (dict, list)):
                    return
                lang = value.get("@language")
                dt = (ctx.expand(value["@type"], self.url)
                      if isinstance(value.get("@type"), str) else None)
                lex, _, sdt, slang = _scalar(value["@value"], ctx)
                self.out.append((subject, pred, lex, False,
                                 dt or sdt, None if (dt or sdt) else
                                 (lang if isinstance(lang, str) else None)))
                return
            if set(value) == {"@id"} and isinstance(value["@id"], str):
                self.out.append((subject, pred,
                                 ctx.resolve_id(value["@id"], self.url),
                                 True, None, None))
                return
            child = self.node(value, ctx)
            if child is not None:
                self.out.append((subject, pred, child, True, None, None))
            return
        if value is None:
            return
        lex, is_iri, dt, lang = _scalar(value, ctx)
        self.out.append((subject, pred, lex, is_iri, dt, lang))


def expand_jsonld(block: str, url: str) -> list[tuple]:
    """One ``application/ld+json`` script body → list of
    (subj, pred, obj, obj_is_iri, obj_datatype, obj_lang). Malformed input
    yields [] — never an exception (crawl-robustness contract)."""
    try:
        doc = json.loads(block)
    except (ValueError, RecursionError):
        return []
    exp = _Expander(url)
    roots = doc if isinstance(doc, list) else [doc]
    for root in roots:
        if not isinstance(root, dict):
            continue
        ctx = _Ctx()
        ctx.absorb(root.get("@context"))
        if isinstance(root.get("@graph"), list):
            for n in root["@graph"]:
                if isinstance(n, dict):
                    exp.node(n, ctx)
            # a @graph wrapper with its own properties is rare; node() would
            # re-absorb @context harmlessly, so just expand the remainder
            rest = {k: v for k, v in root.items()
                    if k not in ("@graph", "@context")}
            if any(not k.startswith("@") for k in rest):
                exp.node(rest, ctx)
        else:
            exp.node(root, ctx)
    return exp.out
