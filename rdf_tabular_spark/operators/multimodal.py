"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; all decode /
feature-extract runs as Arrow-batched ``mapInPandas`` kernels so a batch of
blobs crosses the JVM↔Python boundary once (Arrow), never per-row.

The decode step itself is STUBBED — PIL/ffmpeg are not in this container —
behind ``decode_image``/``decode_audio`` raising NotImplementedError, with a
deterministic fake (:func:`fake_features`) standing in so the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested end-to-end.

Scale notes: blobs dominate bytes, so the scan partitioning is by
``maxPartitionBytes`` not row count; feature extraction is embarrassingly
parallel (narrow); only the (tiny) feature vectors ever shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("content", BinaryType(), False),
    StructField("mime", StringType(), False),
    StructField("meta_json", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("digest", StringType(), False),
    StructField("feat16", LongType(), False),
    StructField("features", ArrayType(DoubleType()), False),
])


def decode_image(blob: bytes) -> "object":
    """Real decoder slot — wire PIL/turbojpeg here on a full cluster image."""
    raise NotImplementedError("image decode requires PIL/libjpeg — not in this container")


def decode_audio(blob: bytes) -> "object":
    raise NotImplementedError("audio decode requires ffmpeg — not in this container")


def fake_features(blob: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in feature vector: n doubles derived from the md5
    digest (keeps tests and the DuckDB oracle reproducible)."""
    d = hashlib.md5(blob).hexdigest()
    return [int(d[4 * i:4 * i + 4], 16) / 65535.0 for i in range(n)]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → opaque media table (text bytes as the blob): the plumbing
    fixture used where real media assets aren't available."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime"),
        F.to_json(F.struct("lang", "source")).alias("meta_json"))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs → FEATURE_SCHEMA.

    ``feat16`` = first 16 bits of md5 (matches the SQL oracle exactly);
    ``features`` = the deterministic fake vector (same bytes → same vector).
    A real pipeline swaps :func:`fake_features` for decode+CNN inside this
    same kernel; the plan does not change.
    """
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "digest": [], "feat16": [],
                   "features": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                d = hashlib.md5(b).hexdigest()
                out["media_id"].append(int(mid))
                out["n_bytes"].append(len(b))
                out["digest"].append(d)
                out["feat16"].append(int(d[:4], 16))
                out["features"].append(fake_features(b))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)
