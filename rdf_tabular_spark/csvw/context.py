"""Minimal JSON-LD-style context for CSVW metadata.

The reference resolves terms through the published W3C CSVW ``@context``
(http://www.w3.org/ns/csvw), which bundles the RDFa 1.1 initial-context prefix
set (reference usage: lib/rdf/tabular/metadata.rb:806-839 common_properties,
:1582 expand_iri documentRelative). We reproduce the prefix table (public, from
the W3C csvw context document / RDFa initial context) and the two expansion
modes the reference uses: ``vocab`` (terms/pnames → IRIs) and
``documentRelative`` (join against base).
"""

from __future__ import annotations

from urllib.parse import urljoin

CSVW = "http://www.w3.org/ns/csvw#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
PROV = "http://www.w3.org/ns/prov#"
DCAT = "http://www.w3.org/ns/dcat#"

# RDFa 1.1 initial context + csvw (the prefix set the W3C csvw @context carries)
PREFIXES: dict[str, str] = {
    "csvw": CSVW,
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dcat": DCAT,
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "oa": "http://www.w3.org/ns/oa#",
    "og": "http://ogp.me/ns#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": PROV,
    "qb": "http://purl.org/linked-data/cube#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rev": "http://purl.org/stuff/rev#",
    "rif": "http://www.w3.org/2007/rif#",
    "rr": "http://www.w3.org/ns/r2rml#",
    "schema": "http://schema.org/",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "void": "http://rdfs.org/ns/void#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "cc": "http://creativecommons.org/ns#",
    "ctag": "http://commontag.org/ns#",
    "earl": "http://www.w3.org/ns/earl#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
}


_SCHEME_RE = __import__("re").compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _looks_absolute(iri: str) -> bool:
    # one C-level regex match (was 3 str.replace + isalnum per call — a
    # measured hot spot at 144k calls/batch on the web kernel)
    return _SCHEME_RE.match(iri) is not None


class Context:
    """base IRI + default language + prefix expansion."""

    __slots__ = ("base", "default_language", "_base_defrag")

    def __init__(self, base: str = "", default_language: str | None = None):
        self.base = base
        self.default_language = default_language
        # fragment-join fast path: urljoin(base, '#f') == defrag(base) + '#f'
        # — the kernel's dominant case (aboutUrl '#...' + default propertyUrl
        # '{#_name}'), worth ~2x on the whole triple kernel
        self._base_defrag = base.partition("#")[0] if base else base

    def copy(self, base: str | None = None) -> "Context":
        return Context(base if base is not None else self.base, self.default_language)

    def expand_iri(self, value: str, vocab: bool = False, document_relative: bool = False) -> str:
        """Mirror of the reference's context.expand_iri for the modes it uses."""
        value = str(value)
        if value.startswith("_:"):
            return value
        prefix, sep, suffix = value.partition(":")
        if sep and prefix in PREFIXES and not suffix.startswith("//"):
            return PREFIXES[prefix] + suffix
        if _looks_absolute(value):
            return value
        if vocab and not document_relative:
            # bare terms in vocab position resolve against the csvw vocabulary
            return CSVW + value
        if document_relative and self.base:
            if value.startswith("#"):
                return self._base_defrag + value
            if value == "":
                return self._base_defrag
            return urljoin(self.base, value)
        return value


def parse_context(ctx_value) -> Context:
    """Parse a CSVW ``@context`` value: str | [str, {"@language":..,"@base":..}]."""
    base = ""
    lang = None
    if isinstance(ctx_value, list):
        for item in ctx_value:
            if isinstance(item, dict):
                lang = item.get("@language", lang)
                base = item.get("@base", base)
    return Context(base=base, default_language=lang)
