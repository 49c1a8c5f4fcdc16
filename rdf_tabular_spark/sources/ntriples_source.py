"""N-Triples source: serialized .nt lines → triples DataFrame.

Completes the round trip with :mod:`..sinks.ntriples` (write_ntriples →
read_ntriples is identity on TRIPLE_SCHEMA's logical columns — property-
tested). Parsing is a narrow Arrow kernel: N-Triples is line-delimited, so
``spark.read.text`` splits the file into byte-range partitions and each line
parses independently — embarrassingly parallel at any corpus size, no
shuffle. String unescaping needs real state (\\\\ vs \\" ordering), which is
why this is a (vectorized, per-batch) Python kernel and not a regex Column
expression; throughput is bounded by the scan, not the parse.

Malformed lines go to an ``_error`` column instead of killing the job
(``strict=False``) — at web scale a crawl-derived dump always carries a few
bad lines, and a full-job abort at 99% is the expensive failure mode.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.triples import TRIPLE_SCHEMA

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# one N-Triples term: IRI | bnode | literal (with optional @lang / ^^<dt>)
_TERM = r"""(?:<(?P<iri{i}>[^>]*)>|(?P<bn{i}>_:[^\s]+)|"(?P<lit{i}>(?:[^"\\]|\\.)*)"(?:@(?P<lang{i}>[A-Za-z0-9-]+)|\^\^<(?P<dt{i}>[^>]*)>)?)"""
_LINE_RE = re.compile(
    r"^\s*" + _TERM.format(i=1) + r"\s+" + _TERM.format(i=2) + r"\s+"
    + _TERM.format(i=3) + r"\s*\.\s*$")

_UNESC = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t",
          "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _UNESC:
                out.append(_UNESC[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def parse_ntriples_line(line: str) -> Optional[tuple]:
    """One N-Triples statement → (subj, pred, obj, obj_is_iri, obj_datatype,
    obj_lang), or None for blank/comment lines. Raises ValueError on a
    malformed statement."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"not an N-Triples statement: {line[:120]!r}")
    g = m.groupdict()
    subj = g["iri1"] if g["iri1"] is not None else g["bn1"]
    if subj is None or g["lit1"] is not None:
        raise ValueError(f"literal subject: {line[:120]!r}")
    pred = g["iri2"]
    if pred is None:
        raise ValueError(f"predicate must be an IRI: {line[:120]!r}")
    if g["lit3"] is not None:
        dt = g["dt3"]
        return (_unescape(subj), _unescape(pred), _unescape(g["lit3"]),
                False, None if dt == _XSD_STRING else dt, g["lang3"])
    obj = g["iri3"] if g["iri3"] is not None else g["bn3"]
    return (_unescape(subj), _unescape(pred), _unescape(obj),
            True, None, None)


def nt_lines_kernel(strict: bool = False):
    """Arrow kernel: a batch of raw ``value`` lines → TRIPLE_SCHEMA rows.
    Shared by the batch reader and the streaming ingest (the kernel is
    engine-agnostic: mapInPandas applies it to static and streaming
    DataFrames alike)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype",
                "obj_lang", "table_url", "source_num"]
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                try:
                    t = parse_ntriples_line(line)
                except ValueError:
                    if strict:
                        raise
                    continue
                if t is not None:
                    out.append(t + (None, 0))
            yield pd.DataFrame(out, columns=cols)
    return kernel


def read_ntriples(spark: SparkSession, path: str,
                  strict: bool = False) -> DataFrame:
    """.nt file/dir/glob → triples DataFrame (TRIPLE_SCHEMA; table_url =
    the source line's file is not tracked — callers needing lineage wrap
    with ``input_file_name`` upstream). ``strict=True`` raises on the first
    malformed line; the default skips them (count them via
    :func:`read_ntriples_errors`)."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    return spark.read.text(path).mapInPandas(nt_lines_kernel(strict),
                                             schema=TRIPLE_SCHEMA)


def read_ntriples_errors(spark: SparkSession, path: str) -> DataFrame:
    """(line, error) for every malformed statement — the validation view."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                try:
                    parse_ntriples_line(line)
                except ValueError as e:
                    rows.append((line, str(e)))
            yield pd.DataFrame(rows, columns=["line", "error"])

    return spark.read.text(path).mapInPandas(
        kernel, schema="line string, error string")


# --------------------------------------------------------------- N-Quads

# N-Quads = N-Triples + an optional 4th term (graph label: IRI or bnode).
# A 3-term line is a default-graph statement (W3C N-Quads §2).
_GRAPH = r"(?:<(?P<giri>[^>]*)>|(?P<gbn>_:[^\s]+))"
_QUAD_RE = re.compile(
    r"^\s*" + _TERM.format(i=1) + r"\s+" + _TERM.format(i=2) + r"\s+"
    + _TERM.format(i=3) + r"(?:\s+" + _GRAPH + r")?\s*\.\s*$")


def parse_nquads_line(line: str) -> Optional[tuple]:
    """One N-Quads statement → (subj, pred, obj, obj_is_iri, obj_datatype,
    obj_lang, graph-or-None). None for blank/comment lines; ValueError on
    a malformed statement."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _QUAD_RE.match(line)
    if not m:
        raise ValueError(f"not an N-Quads statement: {line[:120]!r}")
    g = m.groupdict()
    subj = g["iri1"] if g["iri1"] is not None else g["bn1"]
    if subj is None or g["lit1"] is not None:
        raise ValueError(f"literal subject: {line[:120]!r}")
    pred = g["iri2"]
    if pred is None:
        raise ValueError(f"predicate must be an IRI: {line[:120]!r}")
    graph = g["giri"] if g["giri"] is not None else g["gbn"]
    if graph is not None:
        graph = _unescape(graph)
    if g["lit3"] is not None:
        dt = g["dt3"]
        return (_unescape(subj), _unescape(pred), _unescape(g["lit3"]),
                False, None if dt == _XSD_STRING else dt, g["lang3"], graph)
    obj = g["iri3"] if g["iri3"] is not None else g["bn3"]
    return (_unescape(subj), _unescape(pred), _unescape(obj),
            True, None, None, graph)


def nq_lines_kernel(strict: bool = False):
    """Arrow kernel: raw ``value`` lines → TRIPLE_SCHEMA rows with the
    graph label carried in ``table_url`` — the same column the store's
    GRAPH quad tier exposes as ?g, so imported named graphs are queryable
    with `GRAPH ?g { ... }` with zero extra plumbing."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype",
                "obj_lang", "table_url", "source_num"]
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                try:
                    t = parse_nquads_line(line)
                except ValueError:
                    if strict:
                        raise
                    continue
                if t is not None:
                    out.append(t[:6] + (t[6], 0))
            yield pd.DataFrame(out, columns=cols)
    return kernel


def read_nquads(spark: SparkSession, path: str,
                strict: bool = False) -> DataFrame:
    """.nq file/dir/glob → triples DataFrame; graph label → table_url
    (None for default-graph statements). Same byte-range parallelism as
    :func:`read_ntriples`."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    return spark.read.text(path).mapInPandas(nq_lines_kernel(strict),
                                             schema=TRIPLE_SCHEMA)
