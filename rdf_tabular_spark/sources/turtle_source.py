"""Turtle source: .ttl documents → triples DataFrame.

Completes the read side of :mod:`..sinks.turtle_sink` (write_turtle →
read_turtle is isomorphic on TRIPLE_SCHEMA's logical columns) and covers
the reference's human-facing format (rdf-tabular script/parse:16-25 picks
the RDF.rb writer by extension; its spec goldens are .ttl).

Spark shape: Turtle is NOT line-splittable — prefixes bind at the top of
the document and statements continue across lines via ';'/',' — so the
unit of parallelism is the FILE, exactly like gzip members in the WARC
source (sources/warc.py): a ``binaryFile`` scan feeds an Arrow kernel
that runs the driver-tested TurtleParser (rdfio/turtle.py) once per
document. A graph export is many part files (each sink part is a
complete, self-contained Turtle document), so a 1000-executor cluster
still saturates; one giant single .ttl file is inherently serial in ANY
engine and should be N-Triples instead.

Blank-node labels are file-scoped on read (``_:x`` in two files are
distinct RDF nodes): each label is rewritten to ``_:f<pathhash>-x``,
deterministic per file so re-reads are stable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.triples import TRIPLE_SCHEMA

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang",
         "table_url", "source_num"]


def _file_rows(path: str, text: str) -> list[tuple]:
    """Parse ONE Turtle document into TRIPLE_SCHEMA rows. Blank-node labels
    get a per-file prefix so labels never collide across documents."""
    from ..rdfio.turtle import parse_turtle
    scope = "_:f" + hashlib.md5(path.encode("utf-8")).hexdigest()[:8] + "-"

    def name(term) -> str:
        if term.kind == "bnode":
            return scope + term.value[2:]
        return term.value

    rows = []
    for s, p, o in parse_turtle(text):
        if o.kind == "literal":
            dt = None if o.datatype in (None, _XSD_STRING) else o.datatype
            rows.append((name(s), name(p), o.value, False, dt, o.lang,
                         path, 0))
        else:
            rows.append((name(s), name(p), name(o), True, None, None,
                         path, 0))
    return rows


def read_turtle(spark: SparkSession, path: str,
                strict: bool = False) -> DataFrame:
    """.ttl file/dir/glob → triples DataFrame (TRIPLE_SCHEMA; table_url =
    the source file — per-file lineage for free). ``strict=True`` raises
    on the first unparseable document; the default skips it whole (a
    Turtle syntax error poisons everything after it in THAT file only —
    inspect via :func:`read_turtle_errors`)."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(_file_rows(path_, bytes(content)
                                           .decode("utf-8")))
                except (ValueError, KeyError, IndexError,
                        UnicodeDecodeError):
                    if strict:
                        raise
            yield pd.DataFrame(rows, columns=_COLS)

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(kernel, schema=TRIPLE_SCHEMA))


def read_turtle_errors(spark: SparkSession, path: str) -> DataFrame:
    """(file, error) for every document read_turtle would skip — the
    validation view (same split as read_ntriples_errors)."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    _file_rows(path_, bytes(content).decode("utf-8"))
                except (ValueError, KeyError, IndexError,
                        UnicodeDecodeError) as e:
                    rows.append((path_, str(e)))
            yield pd.DataFrame(rows, columns=["file", "error"])

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(kernel, schema="file string, error string"))


def _file_rows_trig(path: str, text: str) -> list[tuple]:
    """Parse ONE TriG document into TRIPLE_SCHEMA rows; each quad's graph
    label lands in ``table_url`` (the store's per-statement provenance
    column — the inverse of sinks/turtle_sink.write_trig). Default-graph
    statements fall back to the source file path, matching read_turtle."""
    from ..rdfio.turtle import parse_trig
    scope = "_:f" + hashlib.md5(path.encode("utf-8")).hexdigest()[:8] + "-"

    def name(term) -> str:
        if term.kind == "bnode":
            return scope + term.value[2:]
        return term.value

    rows = []
    for s, p, o, g in parse_trig(text):
        graph = name(g) if g is not None else path
        if o.kind == "literal":
            dt = None if o.datatype in (None, _XSD_STRING) else o.datatype
            rows.append((name(s), name(p), o.value, False, dt, o.lang,
                         graph, 0))
        else:
            rows.append((name(s), name(p), name(o), True, None, None,
                         graph, 0))
    return rows


def read_trig(spark: SparkSession, path: str,
              strict: bool = False) -> DataFrame:
    """.trig file/dir/glob → triples DataFrame with ``table_url`` = the
    named graph (provenance round-trips through export --format trig).
    Same per-file error isolation contract as :func:`read_turtle`."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(_file_rows_trig(path_, bytes(content)
                                                .decode("utf-8")))
                except (ValueError, KeyError, IndexError,
                        UnicodeDecodeError):
                    if strict:
                        raise
            yield pd.DataFrame(rows, columns=_COLS)

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(kernel, schema=TRIPLE_SCHEMA))
