"""Graph comparison: bnode-insensitive canonicalization + precision/recall.

The reference compares output graphs isomorphically (rdf-spec
``be_equivalent_graph``, reference: spec/reader_spec.rb:50-80). We canonicalize
blank nodes by iterative signature refinement (Weisfeiler-Leman style hashing
over adjacent triples) — for the fixture graphs (tree-shaped bnode structures)
this converges to a stable labeling, making set equality ≡ isomorphism.

Literal comparison is numeric-value-aware: the golden Turtle writes e.g.
``42.546245`` (xsd:decimal per Turtle grammar) where the pipeline types CSVW
``number`` as xsd:double; both denote the same value, so numeric literals
compare by (float value) across the numeric XSD family.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, NamedTuple, Optional

from .turtle import Term, Triple

_XSD = "http://www.w3.org/2001/XMLSchema#"
_NUMERIC = {_XSD + n for n in ("integer", "decimal", "double", "float", "long", "int",
                               "short", "byte", "nonNegativeInteger", "positiveInteger",
                               "nonPositiveInteger", "negativeInteger", "unsignedLong",
                               "unsignedInt", "unsignedShort", "unsignedByte")}


def _norm_literal(value: str, datatype: Optional[str], lang: Optional[str]) -> tuple:
    if lang:
        return ("lit", value, "@" + lang.lower())
    if datatype in (None, _XSD + "string"):
        return ("lit", value, "")
    if datatype in _NUMERIC:
        try:
            f = float(value)
            # NaN != NaN would make the same term compare unequal in the
            # set diff — xsd:double NaN is ONE value, so key it by name
            return ("num", "NaN") if f != f else ("num", f)
        except ValueError:
            pass
    if datatype == _XSD + "boolean":
        return ("lit", "true" if value in ("true", "1") else "false", datatype)
    return ("lit", value, datatype)


def _term_key(t: Term):
    if t.kind == "literal":
        return _norm_literal(t.value, t.datatype, t.lang)
    if t.kind == "bnode" or t.value.startswith("_:"):
        return ("bnode",)
    return ("iri", t.value)


def canonicalize(triples: Iterable[Triple], rounds: int = 8) -> frozenset:
    """→ frozenset of canonical triple keys with bnodes relabeled by structure."""
    triples = list(triples)
    bnodes = set()
    for s, p, o in triples:
        for t in (s, o):
            if t.kind == "bnode" or t.value.startswith("_:"):
                bnodes.add(t.value)

    sig = {b: "b" for b in bnodes}

    def tsig(t: Term, me: str):
        if (t.kind == "bnode" or t.value.startswith("_:")):
            return "self" if t.value == me else sig[t.value]
        return repr(_term_key(t))

    for _ in range(rounds):
        new_sig = {}
        for b in bnodes:
            parts = []
            for s, p, o in triples:
                if s.value == b and (s.kind == "bnode" or s.value.startswith("_:")):
                    parts.append(("out", p.value, tsig(o, b)))
                if o.value == b and (o.kind == "bnode" or o.value.startswith("_:")):
                    parts.append(("in", p.value, tsig(s, b)))
            parts.sort()
            new_sig[b] = hashlib.sha1(repr(parts).encode()).hexdigest()[:16]
        if new_sig == sig:
            break
        sig = new_sig

    # disambiguate identical signatures deterministically by sorted order
    groups: dict[str, list[str]] = {}
    for b, s in sig.items():
        groups.setdefault(s, []).append(b)
    final = dict(sig)
    for s, members in groups.items():
        if len(members) > 1:
            # identical structure ⇒ interchangeable; shared label is fine for
            # set comparison (they produce identical triple keys)
            pass

    def key(t: Term):
        if t.kind == "bnode" or t.value.startswith("_:"):
            return ("bnode", final[t.value])
        return _term_key(t)

    return frozenset((key(s), ("iri", p.value), key(o)) for s, p, o in triples)


class PRResult(NamedTuple):
    precision: float
    recall: float
    n_ours: int
    n_expected: int
    missing: list
    extra: list


def triple_pr(ours: Iterable[Triple], expected: Iterable[Triple]) -> PRResult:
    a = canonicalize(ours)
    b = canonicalize(expected)
    inter = a & b
    precision = len(inter) / len(a) if a else 1.0
    recall = len(inter) / len(b) if b else 1.0
    return PRResult(precision, recall, len(a), len(b),
                    missing=sorted(map(repr, b - a))[:20],
                    extra=sorted(map(repr, a - b))[:20])


def df_to_terms(rows) -> list[Triple]:
    """Triples-DataFrame rows (Row or tuple with subj/pred/obj/obj_is_iri/
    obj_datatype/obj_lang) → Term triples."""
    out = []
    for r in rows:
        subj = Term(r["subj"], "bnode" if r["subj"].startswith("_:") else "iri")
        pred = Term(r["pred"], "iri")
        if r["obj_is_iri"]:
            obj = Term(r["obj"], "bnode" if r["obj"].startswith("_:") else "iri")
        else:
            obj = Term(r["obj"], "literal", datatype=r["obj_datatype"], lang=r["obj_lang"])
        out.append((subj, pred, obj))
    return out
