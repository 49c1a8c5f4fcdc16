"""Dialect-parameterized CSV source (reference: metadata.rb:1196-1203
csv_options, :786-795 each_row, :726-779 embedded_metadata).

Design: the data path is Spark-native — ``spark.read.text`` + zipWithIndex for
stable 1-based source line numbers (partition order = byte-offset order, so
numbering matches file order without a shuffle), then one Arrow-batched
``mapInPandas`` stage that applies the dialect (delimiter/quote/doubleQuote/
trim/skip*) per line batch. The header region (skipRows + headerRowCount
lines, O(KB)) is read driver-side for embedded-metadata extraction, mirroring
the reference's streaming header consumption.

Known limitation (documented): quoted fields spanning physical lines are not
supported on this fast path; web-scale inputs arrive as pages (html binary)
where rows are page-local and never split.
"""

from __future__ import annotations

import csv as _csv
import io
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from ..csvw.model import Dialect

ROWS_SCHEMA = StructType([
    StructField("values", ArrayType(StringType()), False),
    StructField("row_num", LongType(), False),
    StructField("source_num", LongType(), False),
])


def _parse_lines(lines: list[str], dialect: Dialect) -> list[list[Optional[str]]]:
    rdr = _csv.reader(
        lines,
        delimiter=dialect.delimiter,
        quotechar=dialect.quoteChar or '"',
        doublequote=bool(dialect.doubleQuote),
        escapechar=None if dialect.doubleQuote else "\\",
        strict=False,
    )
    return [row for row in rdr]


def read_header(path: str, dialect: Dialect) -> tuple[list[str], list[str]]:
    """Driver-side: → (header titles, skipped-row notes).
    Mirrors reference embedded_metadata (metadata.rb:726-779)."""
    notes: list[str] = []
    titles: list[str] = []
    n_head = int(dialect.skipRows) + int(dialect.headerRowCount)
    if n_head == 0:
        return titles, notes
    with open(path, "r", encoding=dialect.encoding or "utf-8", newline="") as f:
        head_lines = []
        for _ in range(n_head):
            line = f.readline()
            if not line:
                break
            head_lines.append(line.rstrip("\r\n"))
    rows = _parse_lines(head_lines, dialect)
    trim = dialect.effective_trim
    skipc = int(dialect.skipColumns) + int(dialect.headerColumnCount)
    for i, row in enumerate(rows):
        if i < int(dialect.skipRows):
            value = dialect.delimiter.join(v if v is not None else "" for v in row)
            if trim in ("true", "start"):
                value = value.lstrip()
            if trim in ("true", "end"):
                value = value.rstrip()
            if dialect.commentPrefix and value.startswith(dialect.commentPrefix):
                value = value[len(dialect.commentPrefix):]
            if value:
                notes.append(value)
        else:
            for j, value in enumerate(row):
                if j < skipc:
                    continue
                if trim in ("true", "start"):
                    value = value.lstrip()
                if trim in ("true", "end"):
                    value = value.rstrip()
                idx = j - int(dialect.skipColumns)
                while len(titles) <= idx:
                    titles.append("")
                titles[idx] = value if not titles[idx] else titles[idx]
    return titles, notes


def read_rows(spark: SparkSession, path: str, dialect: Dialect) -> DataFrame:
    """CSV file → DataFrame(values: array<string>, row_num, source_num).

    row_num is 1-based after skipped/header rows; source_num is the 1-based
    physical line number (reference: each_row, metadata.rb:786-795).
    """
    skipped = dialect.skipped_rows
    skipc = int(dialect.skipColumns) + int(dialect.headerColumnCount)
    delim, quote, dq = dialect.delimiter, dialect.quoteChar, bool(dialect.doubleQuote)
    skip_blank = bool(dialect.skipBlankRows)

    reader = spark.read
    if dialect.lineTerminator and dialect.lineTerminator != "auto":
        reader = reader.option("lineSep", dialect.lineTerminator)
    lines = reader.text(path)
    # zipWithIndex: deterministic, contiguous, file-order line numbers; narrow
    indexed = lines.rdd.zipWithIndex().map(lambda t: (t[0][0], t[1] + 1)).toDF(["line", "source_num"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["source_num"] > skipped]
            if keep.empty:
                yield pd.DataFrame({"values": [], "row_num": pd.Series([], dtype="int64"),
                                    "source_num": pd.Series([], dtype="int64")})
                continue
            vals = []
            for line in keep["line"]:
                row = next(_csv.reader(
                    io.StringIO(line), delimiter=delim, quotechar=quote or '"',
                    doublequote=dq, escapechar=None if dq else "\\"), [])
                vals.append(row[skipc:] if skipc else row)
            out = pd.DataFrame({
                "values": vals,
                "row_num": (keep["source_num"] - skipped).astype("int64"),
                "source_num": keep["source_num"].astype("int64"),
            })
            if skip_blank:
                mask = out["values"].map(lambda r: any((c or "").strip() for c in r))
                out = out[mask]
            yield out

    return indexed.mapInPandas(parse, schema=ROWS_SCHEMA)
