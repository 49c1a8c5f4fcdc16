"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; all decode /
feature-extract runs as Arrow-batched ``mapInPandas`` kernels so a batch of
blobs crosses the JVM↔Python boundary once (Arrow), never per-row.

Decode tiers (round 5 — the stub is gone for common containers):

- **stdlib fallback, always available**: 24-bit BI_RGB BMP and binary PPM
  (P6) images (:func:`decode_bmp` / :func:`decode_ppm`, pure ``struct``),
  and PCM WAV audio via the stdlib ``wave`` module (:func:`decode_wav`).
  These run un-skipped in CI and back the registered
  ``multimodal_decode`` / ``multimodal_decode_audio`` oracle queries
  (:func:`image_stats` / :func:`audio_stats`).
- **production fast path**: PIL / soundfile auto-activate when the cluster
  image provides them (JPEG/PNG/FLAC/...); same kernel, zero code change.
- formats outside both tiers raise the honest ``NotImplementedError``.

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


# --- stdlib decoders (round 5): BMP / PPM / WAV, no optional deps ----------

def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB BMP encoder (bottom-up rows, 4-byte row padding).
    ``rgb`` is row-major top-down RGB — the inverse of :func:`decode_bmp`.
    Pixel shuffling is vectorized (numpy is a core dependency); the
    container framing stays plain ``struct``."""
    import struct

    import numpy as np
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]                   # bottom-up rows, BGR on disk
    pad = (-(width * 3)) % 4
    if pad:
        padded = np.zeros((height, width * 3 + pad), dtype=np.uint8)
        padded[:, :width * 3] = bgr.reshape(height, width * 3)
        pixels = padded.tobytes()
    else:
        pixels = bgr.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """24-bit BI_RGB BMP → (width, height, row-major top-down RGB bytes).
    Handles both bottom-up (positive height) and top-down storage; rejects
    compressed / non-24-bit variants (out of subset). Vectorized pixel
    unshuffle — at curation scale the decode loop is the hot path."""
    import struct

    import numpy as np
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP document")
    offset = struct.unpack_from("<I", blob, 10)[0]
    dib_size, width, height = struct.unpack_from("<Iii", blob, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP is in subset")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if offset + stride * height > len(blob):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(blob, dtype=np.uint8,
                         count=stride * height, offset=offset) \
        .reshape(height, stride)[:, :width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return width, height, rows[:, :, ::-1].tobytes()   # BGR → RGB


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) encoder."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6) → (width, height, RGB bytes). Tolerates comments
    and arbitrary whitespace in the header per the netpbm grammar."""
    if not blob.startswith(b"P6"):
        raise ValueError("not a P6 PPM document")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":                 # comment to EOL
            while pos < len(blob) and blob[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1                                          # single ws after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM is in subset")
    need = width * height * 3
    if len(blob) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return width, height, bytes(blob[pos:pos + need])


def decode_image_rgb(blob: bytes) -> tuple[int, int, bytes]:
    """Decode ANY supported image container → (width, height, RGB bytes,
    row-major top-down). PIL fast path when installed; stdlib BMP/PPM
    fallback otherwise — this is the slot :func:`image_stats` calls, so
    the decode→feature path runs for real in every environment."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if _find_spec("PIL") is not None:
        img = decode_image(blob).convert("RGB")
        return img.size[0], img.size[1], img.tobytes()
    raise NotImplementedError(
        "only BMP/PPM decode without PIL — install Pillow for this format")


def encode_wav(samples: "list[int]", sample_rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV encoder (stdlib ``wave``)."""
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[int, "list[int]"]:
    """PCM WAV → (sample_rate, int samples, channels interleaved→averaged
    to mono). 16-bit and 8-bit PCM via stdlib ``wave`` — no soundfile
    needed; wider formats raise ValueError."""
    import io
    import struct
    import wave
    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            nch, sw, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                      w.getframerate(), w.getnframes())
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV document: {e}") from None
    if sw == 2:
        vals = struct.unpack(f"<{len(raw) // 2}h", raw)
    elif sw == 1:                       # 8-bit WAV is unsigned, offset 128
        vals = [b - 128 for b in raw]
    else:
        raise ValueError("only 8/16-bit PCM WAV is in subset")
    if nch > 1:                         # average channels to mono
        vals = [sum(vals[i:i + nch]) // nch
                for i in range(0, len(vals), nch)]
    return rate, list(vals)


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


IMAGE_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("mean_r", DoubleType(), False),
    StructField("mean_g", DoubleType(), False),
    StructField("mean_b", DoubleType(), False),
    StructField("max_lum", LongType(), False),
])

AUDIO_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("mean_sample", DoubleType(), False),
    StructField("max_abs", LongType(), False),
])


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decode → per-image pixel statistics, Arrow-batched.

    Each blob is decoded by :func:`decode_image_rgb` (stdlib BMP/PPM, PIL
    when installed) and reduced to channel means + max luminance — a
    deterministic integer aggregate, so a SQL oracle that knows the pixel
    formula reproduces it exactly. Narrow kernel: blobs never shuffle,
    only the 7-column stats rows leave the stage.
    """
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "mean_r",
                                   "mean_g", "mean_b", "max_lum")}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w, h, rgb = decode_image_rgb(bytes(blob))
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                sums = px.sum(axis=0, dtype=np.int64)
                n = w * h
                # integer luminance (r+g+b per pixel) keeps the oracle exact
                lum = px.sum(axis=1, dtype=np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(sums[0] / n)
                out["mean_g"].append(sums[1] / n)
                out["mean_b"].append(sums[2] / n)
                out["max_lum"].append(int(lum.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=IMAGE_STATS_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL decode → per-clip sample statistics via the stdlib ``wave``
    fallback (:func:`decode_wav`); same narrow Arrow discipline as
    :func:`image_stats`."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_samples",
                                   "mean_sample", "max_abs")}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                rate, vals = decode_wav(bytes(blob))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(vals))
                out["mean_sample"].append(sum(vals) / len(vals))
                out["max_abs"].append(max(abs(v) for v in vals))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=AUDIO_STATS_SCHEMA)


def synth_bmp_media(docs: DataFrame, width: int = 8,
                    height: int = 8) -> DataFrame:
    """Deterministic BMP-per-document media table: pixel i of doc d is
    ``r=(7d+13i)%256, g=(11d+17i)%256, b=(13d+19i)%256`` — a formula a SQL
    oracle can aggregate without decoding. Arrow kernel; content is REAL
    BMP bytes, so :func:`image_stats` exercises the true decode path."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(docs.sparkSession)
    n = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        i = np.arange(n, dtype=np.int64)
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = np.empty((n, 3), dtype=np.uint8)
                rgb[:, 0] = (7 * d + 13 * i) % 256
                rgb[:, 1] = (11 * d + 17 * i) % 256
                rgb[:, 2] = (13 * d + 19 * i) % 256
                ids.append(d)
                blobs.append(encode_bmp(width, height, rgb.tobytes()))
            yield pd.DataFrame({"media_id": ids, "content": blobs,
                                "mime": ["image/bmp"] * len(ids),
                                "meta_json": [None] * len(ids)})

    return docs.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synth_wav_media(docs: DataFrame, n_samples: int = 64,
                    sample_rate: int = 8000) -> DataFrame:
    """Deterministic WAV-per-document media table: sample i of doc d is
    ``((31d + 97i) % 4001) - 2000`` (16-bit PCM). Same oracle-mirrorable
    construction as :func:`synth_bmp_media`."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(docs.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = ((31 * d + 97 * i) % 4001 - 2000).tolist()
                ids.append(d)
                blobs.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame({"media_id": ids, "content": blobs,
                                "mime": ["audio/wav"] * len(ids),
                                "meta_json": [None] * len(ids)})

    return docs.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)
