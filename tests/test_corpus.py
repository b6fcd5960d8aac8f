"""Corpus generator: determinism, schema, skew shape (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from zensearch_spark.sources.corpus import (
    build_vocab,
    generate_transcripts_pandas,
)


def test_deterministic_regeneration():
    a = generate_transcripts_pandas(50, seed=42)
    b = generate_transcripts_pandas(50, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_partition_independence():
    """Generating convs [0,50) at once == generating [0,25)+[25,50)."""
    whole = generate_transcripts_pandas(50, seed=42)
    from zensearch_spark.sources.corpus import _gen_convs

    parts = pd.concat(
        [_gen_convs(np.arange(0, 25), 42), _gen_convs(np.arange(25, 50), 42)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_schema_and_invariants(small_corpus_pdf):
    pdf = small_corpus_pdf
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # contiguous stable turn ordering per conv
    for _, g in pdf.groupby("conv_id"):
        assert list(g["turn_idx"]) == list(range(len(g)))
    assert (pdf.loc[pdf.role == "tool", "tool"] != "").all()
    assert (pdf.loc[pdf.role != "tool", "tool"] == "").all()
    assert pdf["ts"].is_monotonic_increasing
    assert (pdf.groupby("conv_id").head(1)["role"] == "user").all()


def test_zipf_head_skew(small_corpus_pdf):
    toks = np.concatenate(small_corpus_pdf["text"].str.split().to_numpy())
    words, _ = build_vocab(42)
    counts = pd.Series(toks).value_counts()
    # the hottest term should dominate (Zipf head) — drives salting path
    assert counts.iloc[0] > 20 * counts.iloc[min(100, len(counts) - 1)]


def test_spark_generation_matches_pandas(spark, small_corpus_pdf):
    sdf = __import__(
        "zensearch_spark.sources.corpus", fromlist=["generate_transcripts"]
    ).generate_transcripts(spark, 200, seed=42, partitions=7)
    got = (
        sdf.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = small_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype(np.int32)
    want["turn_idx"] = want["turn_idx"].astype(np.int32)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
