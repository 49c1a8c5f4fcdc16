"""WARC source: Common-Crawl-style web archives → the pages table.

The north-star input is "an Iceberg table of Common-Crawl pages", but crawl
data is DELIVERED as WARC (ISO 28500) — this source closes the loop:
``read_warc(spark, path_glob)`` parses WARC/1.0 ``response`` records into
the standard pages schema (url, warc_ts, html, text, lang), extracting text
with the SAME html_extract rule as the rest of the pipeline so the
byte-identical-text invariant holds from raw archives onward.

Spark shape: ``binaryFile`` scan (one row per archive; crawl archives are
~1 GB each, so file-level parallelism is the natural split — a 64 000-file
crawl segment fans out across the cluster) → one Arrow kernel that walks
records. Plain ``.warc`` and gzipped ``.warc.gz`` are handled; Common
Crawl's member-per-record gzip concatenation decompresses transparently
(Python zlib consumes concatenated members).

Parser notes (public WARC 1.0/1.1 spec):
  record  = "WARC/1.x" CRLF *(name ":" value CRLF) CRLF block CRLF CRLF
  Content-Length counts the block's bytes; response blocks are full HTTP
  messages (status line + headers + CRLF CRLF + payload).
"""

from __future__ import annotations

import datetime
import gzip
import io
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_SCHEMA


def _iter_warc_records(raw: bytes):
    """→ (headers: dict, block: bytes) per record. Tolerates trailing
    garbage/truncation by stopping at the first malformed record."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if not raw[pos:pos + 5] == b"WARC/":
            return
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = hdr_end + 4
        block = raw[block_start:block_start + length]
        if len(block) < length:
            return  # truncated archive: keep the records we have
        yield headers, block
        pos = block_start + length


def _http_payload(block: bytes) -> bytes:
    """HTTP response message → payload bytes (after the header section)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        return block[sep + 2:] if sep >= 0 else block
    return block[sep + 4:]


def _parse_warc_ts(value: str) -> datetime.datetime:
    try:
        return datetime.datetime.fromisoformat(value.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    except ValueError:
        return datetime.datetime(1970, 1, 1)


def parse_warc_bytes(raw: bytes) -> list[tuple]:
    """One archive's bytes → pages rows (url, warc_ts, html, text, lang).
    Gzip (whole-file or concatenated per-record members) is detected by
    magic; only ``WARC-Type: response`` records with an http(s) target
    produce rows."""
    from .html_extract import _decode, extract_page
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # zlib consumes concatenated members
    out = []
    for headers, block in _iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url.startswith(("http://", "https://")):
            continue
        html = _http_payload(block)
        page = extract_page(_decode(html))
        out.append((url, _parse_warc_ts(headers.get("warc-date", "")),
                    bytearray(html), page.text, "und"))
    return out


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archive(s) → pages DataFrame (url, warc_ts, html, text, lang).

    ``binaryFile`` gives (path, content) rows — archives stay whole (they
    are not line-splittable), parallelism is across archives, which is how
    crawl segments ship (thousands of ~1 GB files).
    """
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    files = spark.read.format("binaryFile").load(path_glob) \
        .select("content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(kernel, schema=PAGES_SCHEMA)


def write_warc(pages_rows: list[tuple], path: str,
               compress: bool = False) -> None:
    """Tiny WARC writer for tests/round-trips: pages rows → a spec-shaped
    archive (warcinfo record + one response record per page)."""
    buf = io.BytesIO()

    def record(rtype: str, target: Optional[str], date: datetime.datetime,
               block: bytes, extra: dict[str, str] | None = None) -> None:
        h = [f"WARC/1.0", f"WARC-Type: {rtype}",
             f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}",
             f"WARC-Record-ID: <urn:uuid:{rtype}-{buf.tell()}>"]
        if target:
            h.append(f"WARC-Target-URI: {target}")
        for k, v in (extra or {}).items():
            h.append(f"{k}: {v}")
        h.append(f"Content-Length: {len(block)}")
        buf.write(("\r\n".join(h) + "\r\n\r\n").encode())
        buf.write(block)
        buf.write(b"\r\n\r\n")

    record("warcinfo", None, datetime.datetime(2024, 1, 1),
           b"software: rdf-tabular-spark test writer\r\n")
    for url, ts, html, _text, _lang in pages_rows:
        body = bytes(html)
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        record("response", url, ts, http,
               {"Content-Type": "application/http; msgtype=response"})
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
