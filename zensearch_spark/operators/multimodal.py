"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed via Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libs in this
container): ``fake_decode_meta`` derives deterministic pseudo
width/height/duration from the payload bytes, and ``decode_real`` is
the clearly-marked NotImplementedError seam where PIL/torchaudio/
ffmpeg decoding plugs in. Everything Spark-side — schema, binary
column handling, partition sizing, UDF batch shape — is real and
tested; that is the part that must hold at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_real(payload: bytes) -> dict:
    """Plug point for a real decoder (PIL.Image.open etc.)."""
    raise NotImplementedError(
        "media decoding libraries are not available in this environment; "
        "wire PIL/torchaudio here and route decode_meta(use_real=True)"
    )


def decode_meta(media: DataFrame, use_real: bool = False) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Batch shape: Arrow batches of (media_id, payload); output is the
    typed MEDIA_META_SCHEMA. The fake decode is deterministic in the
    payload bytes so tests can assert exact values.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                metas = [decode_real(p) for p in pdf["payload"]]
                raise AssertionError("unreachable", metas)
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
