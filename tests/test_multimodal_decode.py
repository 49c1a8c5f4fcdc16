"""Decode-slot gating: real decoders activate when the optional libs are
installed (cluster image), and the honest stub error fires when absent —
no code change needed between environments."""

import importlib.util

import pytest

from rdf_tabular_spark.operators import multimodal as M

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_SF = importlib.util.find_spec("soundfile") is not None


@pytest.mark.skipif(HAS_PIL, reason="PIL installed: stub path not reachable")
def test_decode_image_stub_raises_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_image(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(not HAS_PIL, reason="real path needs PIL")
def test_decode_image_real_path():
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (2, 2), (255, 0, 0)).save(buf, format="PNG")
    img = M.decode_image(buf.getvalue())
    assert img.size == (2, 2)


@pytest.mark.skipif(HAS_SF, reason="soundfile installed: stub not reachable")
def test_decode_audio_stub_raises_without_soundfile():
    with pytest.raises(NotImplementedError, match="ffmpeg|libsndfile"):
        M.decode_audio(b"RIFF....WAVE")


@pytest.mark.skipif(not HAS_SF, reason="real path needs soundfile")
def test_decode_audio_real_path():
    import io

    import numpy as np
    import soundfile
    buf = io.BytesIO()
    soundfile.write(buf, np.zeros(8, dtype="float32"), 8000, format="WAV")
    samples, rate = M.decode_audio(buf.getvalue())
    assert rate == 8000 and len(samples) == 8


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
