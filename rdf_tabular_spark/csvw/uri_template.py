"""RFC 6570 URI-template expansion (levels 1-3 + explode/prefix modifiers).

Pure Python, dependency-free, picklable — designed to run inside Arrow-batched
pandas UDFs on executors. Mirrors the expansion behavior the reference gets from
Addressable::Template (reference: lib/rdf/tabular/metadata.rb:1576-1586,
Cell#set_urls), restricted to the operators CSVW metadata actually uses
({x}, {+x}, {#x}, {?x}, {&x}, {.x}, {/x}).

Templates are compiled once on the driver into a list of tokens; expansion on
executors is string concatenation + percent-encoding only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# RFC 3986 character classes
_UNRESERVED = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
_RESERVED = ":/?#[]@!$&'()*+,;="

_SAFE_U = frozenset(_UNRESERVED)
_SAFE_UR = frozenset(_UNRESERVED + _RESERVED + "%")

# all-safe fast path: one C-level regex search instead of a per-character
# Python loop — the overwhelmingly common case for CSVW bindings (numeric
# ids, simple names); measured ~9% of the whole stage-1+2 kernel (r5)
_UNSAFE_U_RE = re.compile(f"[^{re.escape(_UNRESERVED)}]")
_UNSAFE_UR_RE = re.compile(f"[^{re.escape(_UNRESERVED + _RESERVED + '%')}]")


def _pct_encode(value: str, allow_reserved: bool) -> str:
    if allow_reserved:
        if _UNSAFE_UR_RE.search(value) is None:
            return value
        safe = _SAFE_UR
    else:
        if _UNSAFE_U_RE.search(value) is None:
            return value
        safe = _SAFE_U
    out = []
    for ch in value:
        if ch in safe:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


@dataclass(frozen=True)
class _VarSpec:
    name: str
    explode: bool = False
    prefix: int | None = None


@dataclass(frozen=True)
class _Expr:
    operator: str  # one of '', '+', '#', '.', '/', ';', '?', '&'
    varspecs: tuple[_VarSpec, ...]


# operator → (first-prefix, separator, named, ifemp, allow-reserved)
_OP_TABLE = {
    "": ("", ",", False, "", False),
    "+": ("", ",", False, "", True),
    "#": ("#", ",", False, "", True),
    ".": (".", ".", False, "", False),
    "/": ("/", "/", False, "", False),
    ";": (";", ";", True, "", False),
    "?": ("?", "&", True, "=", False),
    "&": ("&", "&", True, "=", False),
}

_EXPR_RE = re.compile(r"\{([+#./;?&]?)((?:[A-Za-z0-9_%.]|%[0-9A-Fa-f]{2})+(?:(?::\d+)|\*)?(?:,(?:[A-Za-z0-9_%.]|%[0-9A-Fa-f]{2})+(?:(?::\d+)|\*)?)*)\}")


class URITemplate:
    """A compiled RFC 6570 template. ``expand(bindings)`` → str."""

    __slots__ = ("template", "tokens", "variables")

    def __init__(self, template: str):
        self.template = template
        self.tokens: list[object] = []  # str literals or _Expr
        self.variables: list[str] = []
        pos = 0
        for m in _EXPR_RE.finditer(template):
            if m.start() > pos:
                self.tokens.append(template[pos : m.start()])
            op = m.group(1)
            specs = []
            for raw in m.group(2).split(","):
                explode, prefix = False, None
                if raw.endswith("*"):
                    explode, raw = True, raw[:-1]
                elif ":" in raw:
                    raw, _, plen = raw.partition(":")
                    prefix = int(plen)
                specs.append(_VarSpec(raw, explode, prefix))
                if raw not in self.variables:
                    self.variables.append(raw)
            self.tokens.append(_Expr(op, tuple(specs)))
            pos = m.end()
        if pos < len(template):
            self.tokens.append(template[pos:])

    def expand(self, bindings: dict) -> str:
        out: list[str] = []
        for tok in self.tokens:
            if isinstance(tok, str):
                out.append(tok)
                continue
            first, sep, named, ifemp, allow_r = _OP_TABLE[tok.operator]
            parts: list[str] = []
            for spec in tok.varspecs:
                if spec.name not in bindings:
                    continue
                value = bindings[spec.name]
                if value is None:
                    continue
                parts.extend(self._expand_one(spec, value, named, ifemp, allow_r, sep))
            if parts:
                out.append(first + sep.join(parts))
        return "".join(out)

    @staticmethod
    def _expand_one(spec, value, named, ifemp, allow_r, sep):
        enc = _pct_encode
        if isinstance(value, (list, tuple)):
            items = [str(v) for v in value if v is not None]
            if not items:
                return []
            if spec.explode:
                if named:
                    return [f"{spec.name}={enc(i, allow_r)}" if i
                            else f"{spec.name}{ifemp}" for i in items]
                return [enc(i, allow_r) for i in items]
            joined = ",".join(enc(i, allow_r) for i in items)
            if named:
                return [f"{spec.name}={joined}"]
            return [joined]
        if isinstance(value, bool):
            s = "true" if value else "false"
        else:
            s = str(value)
        if spec.prefix is not None:
            s = s[: spec.prefix]
        if named:
            if s == "":
                return [spec.name + ifemp]
            return [f"{spec.name}={enc(s, allow_r)}"]
        return [enc(s, allow_r)]


_CACHE: dict[str, URITemplate] = {}


def compile_template(template: str) -> URITemplate:
    t = _CACHE.get(template)
    if t is None:
        t = _CACHE[template] = URITemplate(template)
    return t


def expand(template: str, bindings: dict) -> str:
    return compile_template(template).expand(bindings)
