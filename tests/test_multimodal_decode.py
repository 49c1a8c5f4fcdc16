"""Multimodal decode: the stdlib BMP/PPM/WAV decoders run the REAL
decode→feature path un-skipped in every environment (round 5 — no more
perpetual skips); PIL/soundfile remain the production fast path for other
containers and auto-activate when installed."""

import importlib.util

import pytest

from rdf_tabular_spark.operators import multimodal as M

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_SF = importlib.util.find_spec("soundfile") is not None


# --- stdlib decoders: always-on real paths ----------------------------------

def test_bmp_roundtrip_exact():
    import random
    rnd = random.Random(7)
    for w, h in [(1, 1), (3, 2), (8, 8), (5, 7)]:   # odd widths hit padding
        rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        assert M.decode_bmp(M.encode_bmp(w, h, rgb)) == (w, h, rgb)
        assert M.decode_image_rgb(M.encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bmp_rejects_out_of_subset():
    with pytest.raises(ValueError, match="not a BMP"):
        M.decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    ok = M.encode_bmp(2, 2, bytes(12))
    bad = bytearray(ok)
    bad[28] = 8                       # bpp 24 → 8
    with pytest.raises(ValueError, match="24-bit"):
        M.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_bmp(ok[:-4])


def test_ppm_roundtrip_and_comments():
    rgb = bytes(range(18))
    assert M.decode_ppm(M.encode_ppm(3, 2, rgb)) == (3, 2, rgb)
    with_comment = b"P6\n# a comment\n 3 2\n255\n" + rgb
    assert M.decode_ppm(with_comment) == (3, 2, rgb)


def test_wav_roundtrip_8bit_and_stereo():
    import io
    import struct
    import wave
    samples = [((31 * 5 + 97 * i) % 4001) - 2000 for i in range(64)]
    rate, out = M.decode_wav(M.encode_wav(samples, 8000))
    assert rate == 8000 and out == samples
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<8h", 10, 20, 30, 40, -50, -60, 0, 100))
    rate, mono = M.decode_wav(buf.getvalue())
    assert rate == 16000 and mono == [15, 35, -55, 50]
    with pytest.raises(ValueError, match="not a PCM WAV"):
        M.decode_wav(b"RIFF....WAVE")


def test_decode_image_rgb_unknown_format_without_pil():
    if HAS_PIL:
        pytest.skip("PIL installed: fallback error not reachable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


# --- stats kernels over synthesized media (real decode in the kernel) -------

def _docs(spark, n=4):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_image_stats_matches_pixel_formula(spark):
    stats = {r["media_id"]: r for r in
             M.image_stats(M.synth_bmp_media(_docs(spark), 8, 8)).collect()}
    for d in range(4):
        rs = [(7 * d + 13 * i) % 256 for i in range(64)]
        gs = [(11 * d + 17 * i) % 256 for i in range(64)]
        bs = [(13 * d + 19 * i) % 256 for i in range(64)]
        row = stats[d]
        assert (row["width"], row["height"]) == (8, 8)
        assert row["mean_r"] == sum(rs) / 64
        assert row["mean_g"] == sum(gs) / 64
        assert row["mean_b"] == sum(bs) / 64
        assert row["max_lum"] == max(r + g + b
                                     for r, g, b in zip(rs, gs, bs))


def test_audio_stats_matches_sample_formula(spark):
    stats = {r["media_id"]: r for r in
             M.audio_stats(M.synth_wav_media(_docs(spark), 64, 8000))
             .collect()}
    for d in range(4):
        s = [((31 * d + 97 * i) % 4001) - 2000 for i in range(64)]
        row = stats[d]
        assert row["sample_rate"] == 8000 and row["n_samples"] == 64
        assert row["mean_sample"] == sum(s) / 64
        assert row["max_abs"] == max(abs(v) for v in s)


def test_decode_feature_ann_path(spark):
    """decode → pixel-stat feature vector → brute-force cosine top-k: the
    full multimodal retrieval path with a REAL decode stage."""
    from pyspark.sql import functions as F

    from rdf_tabular_spark.operators.similarity import cosine_topk
    # center the channel means so the vectors actually differ in DIRECTION
    # (raw means cluster near 120, which cosine cannot discriminate)
    feats = (M.image_stats(M.synth_bmp_media(_docs(spark, 8), 8, 8))
             .select(F.col("media_id").alias("vec_id"),
                     F.array(F.col("mean_r") - 120, F.col("mean_g") - 120,
                             F.col("mean_b") - 120).alias("embedding")))
    d = 3
    q = [sum((7 * d + 13 * i) % 256 for i in range(64)) / 64 - 120,
         sum((11 * d + 17 * i) % 256 for i in range(64)) / 64 - 120,
         sum((13 * d + 19 * i) % 256 for i in range(64)) / 64 - 120]
    qdf = spark.createDataFrame([(999, q)],
                                "vec_id long, embedding array<double>")
    top = cosine_topk(feats.unionByName(qdf), 999, k=1,
                      extra_cols=()).collect()
    assert top[0]["vec_id"] == d and top[0]["sim"] >= 0.9999


# --- optional-lib fast paths (gated, not load-bearing) ----------------------

def test_decode_image_fast_path_gate():
    """Runs in EVERY environment (no skip): with PIL installed the fast
    path decodes a PNG; without it the honest error fires — either way
    the gate itself is exercised."""
    if HAS_PIL:
        import io

        from PIL import Image
        buf = io.BytesIO()
        Image.new("RGB", (2, 2), (255, 0, 0)).save(buf, format="PNG")
        assert M.decode_image(buf.getvalue()).size == (2, 2)
    else:
        with pytest.raises(NotImplementedError, match="PIL"):
            M.decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_audio_fast_path_gate():
    if HAS_SF:
        import io

        import numpy as np
        import soundfile
        buf = io.BytesIO()
        soundfile.write(buf, np.zeros(8, dtype="float32"), 8000,
                        format="WAV")
        samples, rate = M.decode_audio(buf.getvalue())
        assert rate == 8000 and len(samples) == 8
    else:
        with pytest.raises(NotImplementedError, match="ffmpeg|libsndfile"):
            M.decode_audio(b"\x00not audio")


def test_pseudo_embeddings_deterministic_unit_range(spark):
    from rdf_tabular_spark.operators.multimodal import (media_from_documents,
                                                        pseudo_embeddings)
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "other text", "de", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long")
    media = media_from_documents(docs)
    e1 = {r["media_id"]: r["embedding"]
          for r in pseudo_embeddings(media, dim=8).collect()}
    assert all(len(v) == 8 for v in e1.values())
    assert all(0.0 <= x <= 1.0 for v in e1.values() for x in v)
    # content-addressed: rerun identical; distinct content -> distinct vec
    e2 = {r["media_id"]: r["embedding"]
          for r in pseudo_embeddings(media, dim=8).collect()}
    assert e1 == e2 and e1[1] != e1[2]
    import hashlib
    d = hashlib.md5(b"hello world").hexdigest()
    assert e1[1] == [int(d[2 * i:2 * i + 2], 16) / 255.0 for i in range(8)]


# --- hypothesis fuzz: decoders never crash, roundtrips are identity ---------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.binary(min_size=0,
                                                         max_size=600))
def test_bmp_roundtrip_property(w, h, blob):
    need = w * h * 3
    rgb = (blob * (need // max(len(blob), 1) + 1))[:need] if blob \
        else b"\x00" * need
    assert M.decode_bmp(M.encode_bmp(w, h, rgb)) == (w, h, rgb)
    assert M.decode_ppm(M.encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_decoders_reject_garbage_cleanly(blob):
    """Arbitrary bytes either decode or raise ValueError — never any
    other exception, never a hang (executors see crawl garbage)."""
    for fn in (M.decode_bmp, M.decode_ppm, M.decode_wav):
        try:
            fn(blob)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    got_rate, got = M.decode_wav(M.encode_wav(samples, rate))
    assert got_rate == rate and got == samples
