"""RDF/XML source: .rdf documents → triples DataFrame.

Read side of :mod:`..sinks.rdfxml` (write → read is isomorphic on the
logical triple columns) covering the ``rdf:Description`` subset every
mainstream writer emits: ``rdf:about`` / ``rdf:nodeID`` subjects, typed
node elements (element name ≠ Description → one rdf:type triple),
property elements with ``rdf:resource`` / ``rdf:nodeID`` object
attributes or literal text content, ``rdf:datatype`` and ``xml:lang``.
Out of subset (fails the file, reported via errors view): rdf:parseType,
rdf:li / containers, striped nesting deeper than one property level.

Spark shape: RDF/XML is document-scoped (namespaces bind at arbitrary
ancestors), so like Turtle the unit of parallelism is the FILE — a
``binaryFile`` scan feeds an Arrow kernel running stdlib
``xml.etree`` once per document; exports are many self-contained part
files, so a 1000-executor cluster still saturates.  Blank-node labels
are file-scoped on read (``_:x`` in two files are distinct nodes),
rewritten to the same ``_:f<pathhash>-x`` convention as the Turtle
source.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.triples import TRIPLE_SCHEMA

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang",
         "table_url", "source_num"]


def _split_tag(tag: str) -> str:
    """ElementTree '{ns}local' → absolute IRI."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _file_rows(path: str, text: str) -> list[tuple]:
    import xml.etree.ElementTree as ET
    # stdlib etree expands internal entities, so a crafted document with a
    # DTD can mount a billion-laughs / quadratic-blowup attack on an
    # executor. The accepted RDF/XML subset never needs a DTD — reject any
    # document that declares one before parsing (defusedxml-equivalent
    # hardening without the dependency).
    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        raise ValueError("documents with a DTD are rejected "
                         "(entity-expansion hardening; out of subset)")
    root = ET.fromstring(text)
    if _split_tag(root.tag) != RDF_NS + "RDF":
        raise ValueError(f"root element is not rdf:RDF: {root.tag}")
    ph = hashlib.sha1(path.encode()).hexdigest()[:10]

    def bnode(label: str) -> str:
        return f"_:f{ph}-{label}"

    rows: list[tuple] = []
    n_anon = 0
    for node in root:
        node_iri = _split_tag(node.tag)
        about = node.get(f"{{{RDF_NS}}}about")
        node_id = node.get(f"{{{RDF_NS}}}nodeID")
        if about is not None:
            subj = about
        elif node_id is not None:
            subj = bnode(node_id)
        else:
            subj = bnode(f"anon{n_anon}")
            n_anon += 1
        if node_iri != RDF_NS + "Description":
            rows.append((subj, RDF_NS + "type", node_iri, True, None, None,
                         path, 0))
        for prop in node:
            pred = _split_tag(prop.tag)
            if prop.get(f"{{{RDF_NS}}}parseType") is not None:
                raise ValueError("rdf:parseType is out of subset")
            if len(prop) > 0:
                raise ValueError("nested node elements are out of subset")
            res = prop.get(f"{{{RDF_NS}}}resource")
            obj_node = prop.get(f"{{{RDF_NS}}}nodeID")
            if res is not None:
                rows.append((subj, pred, res, True, None, None, path, 0))
            elif obj_node is not None:
                rows.append((subj, pred, bnode(obj_node), True, None, None,
                             path, 0))
            else:
                dt = prop.get(f"{{{RDF_NS}}}datatype")
                lang = prop.get(_XML_LANG)
                rows.append((subj, pred, prop.text or "", False, dt, lang,
                             path, 0))
    return rows


def read_rdfxml(spark: SparkSession, path: str,
                strict: bool = False) -> DataFrame:
    """.rdf file/dir/glob → triples DataFrame (TRIPLE_SCHEMA; table_url =
    source file, per-file lineage).  ``strict=True`` raises on the first
    unparseable document; the default skips it whole (inspect via
    :func:`read_rdfxml_errors`)."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(_file_rows(path_,
                                           bytes(content).decode("utf-8")))
                except (ValueError, KeyError, IndexError, UnicodeDecodeError,
                        SyntaxError) as e:  # ET.ParseError is a SyntaxError
                    if strict:
                        raise ValueError(f"{path_}: {e}") from e
            yield pd.DataFrame(rows, columns=_COLS)

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(kernel, schema=TRIPLE_SCHEMA))


def read_rdfxml_errors(spark: SparkSession, path: str) -> DataFrame:
    """(file, error) for every document read_rdfxml would skip."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    _file_rows(path_, bytes(content).decode("utf-8"))
                except (ValueError, KeyError, IndexError, UnicodeDecodeError,
                        SyntaxError) as e:
                    rows.append((path_, str(e)))
            yield pd.DataFrame(rows, columns=["file", "error"])

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(kernel, schema="file string, error string"))
