"""JSON-lines pages source/sink — the other common crawl-dump delivery
format (one JSON object per line: url, ISO-8601 timestamp, base64 HTML
bytes, extracted text, language).

WARC (sources/warc.py) is the archive-native format; JSONL is what
downstream crawl processors and dataset dumps actually exchange. Both
land in the same PAGES_SCHEMA so every stage-1..4 operator runs
unchanged.

Scale shape: ``spark.read.json`` with an EXPLICIT schema — schema
inference would scan the corpus twice; decode is ``unbase64`` /
``to_timestamp`` Column expressions (JVM codegen, no Python). JSONL is
line-splittable, so a 100 TB dump parallelizes file-block-wise like any
text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

JSONL_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", StringType(), False),
    StructField("html_b64", StringType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL dump → pages table (url, warc_ts, html, text, lang)."""
    raw = spark.read.schema(JSONL_SCHEMA).json(path)
    return raw.select(
        "url",
        F.to_timestamp("warc_ts", _TS_FMT).alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        "text", "lang")


def write_pages_jsonl(pages: DataFrame, path: str,
                      mode: str = "error") -> None:
    """Pages table → JSONL dump (html base64-encoded, timestamp ISO-8601).
    Inverse of :func:`read_pages_jsonl`; round-trips byte-identically."""
    (pages.select(
        "url",
        F.date_format("warc_ts", _TS_FMT).alias("warc_ts"),
        F.base64("html").alias("html_b64"),
        "text", "lang")
     .write.mode(mode).json(path))
