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
