"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed via Arrow-batched mapInPandas.

Round 4: the decode step is REAL for the two formats the Python
standard library can decode — WAV (PCM, via ``wave``) and PNG (8-bit
gray/RGB/RGBA, all five scanline filters, via ``zlib`` + ``struct``) —
with matching encoders so tests synthesize payloads deterministically
and round-trip them. ``decode_real`` dispatches on magic bytes and
keeps the clearly-marked NotImplementedError seam ONLY for formats
that genuinely need external libs in this container (JPEG, video);
``decode_meta``'s deterministic fake path remains for the
oracle-checked driver entry. Everything Spark-side — schema, binary
column handling, partition sizing, UDF batch shape — is real and
tested either way; that is the part that must hold at 100 TB.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("fake_width", T.IntegerType(), False),
        T.StructField("fake_height", T.IntegerType(), False),
        T.StructField("fake_n_frames", T.IntegerType(), False),
    ]
)


def as_media_table(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Treat each doc's utf-8 bytes as an opaque media payload —
    (media_id long, payload binary, media_type string). The synthetic
    stand-in for an images/audio table."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


# ---------------------------------------------------------------- codecs
#
# Pure-stdlib codecs. These exist so the decode seam is REAL, not to
# win decode benchmarks — at 100 TB the per-payload decode plugs in
# libjpeg-turbo/ffmpeg here; the Spark-side batch shape is identical.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # colortype -> channels (8-bit only)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: "np.ndarray") -> bytes:
    """8-bit PNG encoder (gray HxW, RGB HxWx3, RGBA HxWx4). Each row's
    filter type cycles 0..4 so decode_png's whole filter matrix is
    exercised by any image taller than 4 rows."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    colortype = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = a[y].reshape(-1).astype(np.int64)
        ft = y % 5
        raw.append(ft)
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - (left + prev) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(l_), int(u), int(ul))
                 for l_, u, ul in zip(left, prev, upleft)),
                np.int64, count=len(cur),
            )
            filt = cur - pred
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit non-interlaced PNG (gray/RGB/RGBA): parse the
    chunk stream, inflate IDAT, reconstruct all five scanline filters.
    Returns image features, including the full pixel array under
    "pixels" (callers extracting features only can drop it)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or colortype not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    "png decoder handles 8-bit gray/RGB/RGBA, "
                    "non-interlaced only"
                )
            ch = _PNG_CHANNELS[colortype]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        cur = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            recon = cur
        elif ft == 2:
            recon = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):
            recon = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + prev[i]) // 2
                else:
                    upleft = prev[i - ch] if i >= ch else 0
                    pred = _paeth(int(left), int(prev[i]), int(upleft))
                recon[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    pixels = out.reshape(h, w, ch)
    return {
        "kind": "image",
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "mean_val": float(pixels.mean()),
        "pixels": pixels,
    }


def encode_wav_pcm16(
    samples: "np.ndarray", sample_rate: int, n_channels: int = 1
) -> bytes:
    """PCM16 WAV encoder (stdlib wave); samples in [-1, 1] float or
    already-int16."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        s = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_channels)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV payload: header via stdlib wave, PCM frames
    via NumPy. Returns audio features (rms over normalized samples)."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n_channels = wv.getnchannels()
        rate = wv.getframerate()
        n_frames = wv.getnframes()
        width = wv.getsampwidth()
        frames = wv.readframes(n_frames)
    if width != 2:
        raise NotImplementedError("wav decoder handles PCM16 only")
    s = np.frombuffer(frames, np.int16).astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(s * s))) if len(s) else 0.0
    return {
        "kind": "audio",
        "channels": int(n_channels),
        "sample_rate": int(rate),
        "n_frames": int(n_frames),
        "duration_sec": float(n_frames / rate) if rate else 0.0,
        "rms": rms,
    }


def decode_real(payload: bytes) -> dict:
    """Real decode, dispatched on magic bytes: PNG and WAV are decoded
    with the pure-stdlib codecs above; formats that need external
    decoders in this container (JPEG, video) keep the honest seam."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "decoder for this payload format is not available in this "
        "environment (PNG and PCM WAV are supported); wire "
        "PIL/libjpeg/ffmpeg here for JPEG/video"
    )


MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("feat_val", T.DoubleType(), True),
    ]
)


def decode_media_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction over binary payloads via mapInPandas:
    PNG rows yield (width, height, channels, feat_val=mean pixel),
    WAV rows yield (channels, sample_rate, duration_sec, feat_val=rms),
    undecodable rows are kept with kind='unsupported' (a 100 TB
    pipeline quarantines bad payloads, it does not die on them)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = {
                    "media_id": int(mid), "width": None, "height": None,
                    "channels": None, "sample_rate": None,
                    "duration_sec": None, "feat_val": None,
                }
                try:
                    m = decode_real(bytes(payload))
                except (NotImplementedError, ValueError, wave.Error,
                        zlib.error, struct.error, KeyError, IndexError,
                        EOFError):
                    # struct.error: a payload with a valid PNG signature
                    # but a truncated chunk stream makes struct.unpack_from
                    # raise it; KeyError/IndexError/EOFError cover other
                    # malformed-container shapes. Quarantine, never die
                    # (round-4 ADVICE).
                    rows.append({**base, "kind": "unsupported"})
                    continue
                if m["kind"] == "image":
                    rows.append({
                        **base, "kind": "image", "width": m["width"],
                        "height": m["height"], "channels": m["channels"],
                        "feat_val": m["mean_val"],
                    })
                else:
                    rows.append({
                        **base, "kind": "audio", "channels": m["channels"],
                        "sample_rate": m["sample_rate"],
                        "duration_sec": m["duration_sec"],
                        "feat_val": m["rms"],
                    })
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=MEDIA_FEATURES_SCHEMA
    )


def decode_meta(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Batch shape: Arrow batches of (media_id, payload); output is the
    typed MEDIA_META_SCHEMA. The fake decode is deterministic in the
    payload bytes so tests and the DuckDB oracle can assert exact
    values (the driver's documents table carries text, not media
    bytes). decode_media_features is the REAL-decode twin over actual
    PNG/WAV payloads.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            # deterministic pseudo-decode from payload content
            head = pdf["payload"].map(lambda b: (b[0] if len(b) else 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": (64 + (n_bytes % 577)).astype("int32"),
                    "fake_height": (64 + ((n_bytes * 31 + head) % 421)).astype("int32"),
                    "fake_n_frames": (1 + (head % 24)).astype("int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=MEDIA_META_SCHEMA
    )
