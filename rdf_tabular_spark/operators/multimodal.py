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


def _find_spec(name: str):
    import importlib.util
    try:
        return importlib.util.find_spec(name)
    except (ImportError, ValueError):
        return None


def decode_image(blob: bytes) -> "object":
    """Real decoder: uses PIL when the cluster image provides it (zero code
    change to enable — just install Pillow); raises the honest stub error
    otherwise. Returns a PIL.Image."""
    if _find_spec("PIL") is not None:
        import io
        from PIL import Image
        return Image.open(io.BytesIO(blob))
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not in this container")


def decode_audio(blob: bytes) -> "object":
    """Real decoder: uses soundfile when available (→ (samples ndarray,
    sample_rate)); raises the honest stub error otherwise."""
    if _find_spec("soundfile") is not None:
        import io
        import soundfile
        return soundfile.read(io.BytesIO(blob))
    raise NotImplementedError(
        "audio decode requires ffmpeg/libsndfile — not in this container")


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


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("content", BinaryType(), False),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("content", BinaryType(), False),
])


def _fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode: digest-seeded bytes
    of the target size's digest (NOT width*height bytes — the point is the
    plumbing, not shipping fake megapixels through the shuffle)."""
    return hashlib.md5(blob + f":{width}x{height}".encode()).digest()


def resize_images(media: DataFrame, width: int, height: int,
                  use_stub: bool = True) -> DataFrame:
    """Image resize as an Arrow-batched kernel → RESIZED_SCHEMA.

    ``use_stub=False`` calls the real :func:`decode_image` slot (raises in
    this container); the stub keeps the batch shape, schema, and
    determinism real so the operator is testable end-to-end.
    """
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                if not use_stub:
                    img = decode_image(b)  # pragma: no cover (env-limited)
                    b = img
                out["media_id"].append(int(mid))
                out["width"].append(width)
                out["height"].append(height)
                out["content"].append(_fake_resize(b, width, height)
                                      if use_stub else b)
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_interval_ms: int = 1000,
                  use_stub: bool = True) -> DataFrame:
    """Video frame sampling — the UDTF shape (1 blob → N frame rows) done
    the Spark way: one Arrow kernel yields the multi-row batch directly
    (never a Python generator per row). Frame content is the decode slot;
    the stub derives deterministic per-frame bytes from (blob, frame_idx).
    """
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "content": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                if not use_stub:
                    decode_audio(b)  # pragma: no cover (ffmpeg slot)
                for i in range(n_frames):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * frame_interval_ms)
                    out["content"].append(
                        hashlib.md5(b + f":frame{i}".encode()).digest())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


EMBED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("embedding", ArrayType(DoubleType()), False),
])


def pseudo_embeddings(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic content-addressed pseudo-embedding per blob →
    ``(media_id, embedding: array<double>)`` — the PLUMBING of a CLIP-
    style media-embedding stage with the model swapped for md5 bytes
    (``e[i] = digest_byte_i / 255``): batch shape, Arrow transfer,
    schema, and the hand-off into the ANN tier are all real; replacing
    the digest with an ONNX/torch call is a one-line kernel change on
    the same partitioning.  Deterministic → oracle-checkable end-to-end
    (DuckDB reproduces the bytes), unlike a real model."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for blob in pdf["content"]:
                d = hashlib.md5(bytes(blob)).hexdigest()
                embs.append([int(d[2 * i:2 * i + 2], 16) / 255.0
                             for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "embedding": embs})

    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)
    return media.mapInPandas(kernel, schema=EMBED_SCHEMA)
