"""Real multimodal decode (round 4): the decode seam is no longer a
stub for PNG and PCM-WAV — pure-stdlib codecs with encoder round-trips
so every scanline filter / PCM shape is exercised deterministically.
Unsupported formats (JPEG, video) stay an explicit quarantine path,
never a crash.
"""

from __future__ import annotations

import numpy as np
import pytest

from zensearch_spark.operators.multimodal import (
    decode_media_features,
    decode_png,
    decode_real,
    decode_wav,
    encode_png,
    encode_wav_pcm16,
)

# ---------------------------------------------------------- driver-side


@pytest.mark.parametrize("shape", [(7, 5), (6, 4, 3), (9, 3, 4)])
def test_png_roundtrip_all_filters(shape):
    """Encoder cycles filter types 0..4 per row, so any image with
    ≥5 rows round-trips every filter's reconstruction path."""
    rng = np.random.default_rng(sum(shape))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    meta = decode_png(encode_png(arr))
    want = arr if arr.ndim == 3 else arr[:, :, None]
    assert meta["width"] == shape[1] and meta["height"] == shape[0]
    assert meta["channels"] == (shape[2] if len(shape) == 3 else 1)
    np.testing.assert_array_equal(meta["pixels"], want)
    assert meta["mean_val"] == pytest.approx(float(want.mean()))


def test_wav_roundtrip():
    rate = 16_000
    t = np.arange(rate)  # 1 second
    samples = 0.5 * np.sin(2 * np.pi * 440.0 * t / rate)
    meta = decode_wav(encode_wav_pcm16(samples, rate))
    assert meta["sample_rate"] == rate
    assert meta["n_frames"] == rate
    assert meta["duration_sec"] == pytest.approx(1.0)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert meta["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)


def test_decode_real_dispatch_and_honest_seam():
    png = encode_png(np.zeros((5, 4), np.uint8))
    wav = encode_wav_pcm16(np.zeros(16), 8000)
    assert decode_real(png)["kind"] == "image"
    assert decode_real(wav)["kind"] == "audio"
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0JFIF-this-is-jpeg")


# ------------------------------------------------------------ spark-side


def test_decode_media_features_mixed_batch(spark):
    """Mixed PNG/WAV/garbage payloads through the Arrow batch path:
    exact features for decodable rows, quarantine for the rest."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    rate = 8000
    samples = 0.25 * np.sin(2 * np.pi * 100.0 * np.arange(rate // 2) / rate)
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(encode_wav_pcm16(samples, rate, n_channels=1))),
        (3, bytearray(b"\xff\xd8\xffJFIF not decodable here")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in decode_media_features(media).collect()}
    assert got[1]["kind"] == "image"
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 10, 3)
    assert got[1]["feat_val"] == pytest.approx(float(img.mean()))
    assert got[2]["kind"] == "audio"
    assert got[2]["sample_rate"] == rate
    assert got[2]["duration_sec"] == pytest.approx(0.5)
    assert got[2]["feat_val"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)
    assert got[3]["kind"] == "unsupported"


def test_truncated_png_signature_is_quarantined(spark):
    """A payload that STARTS with the valid 8-byte PNG signature but
    carries a truncated/garbage chunk stream must be quarantined as
    kind='unsupported', not kill the task (round-4 ADVICE: the chunk
    parser's struct.unpack_from raises struct.error, which the except
    tuple previously let escape)."""
    png_sig = b"\x89PNG\r\n\x1a\n"
    rows = [
        (1, bytearray(png_sig)),                   # signature only
        (2, bytearray(png_sig + b"\x00\x00")),     # truncated mid-length
        (3, bytearray(png_sig + b"\x00\x00\x00\x0dIHDR\x01")),  # cut header
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["kind"] for r in decode_media_features(media).collect()}
    assert got == {1: "unsupported", 2: "unsupported", 3: "unsupported"}
