"""Structured-Streaming ingest: availableNow over parquet appends,
posting deltas + running stats, checkpoint-resume on new arrivals."""

from __future__ import annotations

import os

import pytest

from zensearch_spark.sources.corpus import generate_transcripts_pandas
from zensearch_spark.streaming.ingest import stream_ingest_postings


@pytest.fixture()
def landing(spark, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    pdf = generate_transcripts_pandas(30, seed=42)
    first = pdf[pdf.conv_id < "c00000020"]
    spark.createDataFrame(first).write.mode("append").parquet(land)
    return land, pdf, first


def test_stream_ingest_and_resume(spark, tmp_path, landing):
    land, pdf, first = landing
    out = str(tmp_path / "stream_out")

    stats1 = stream_ingest_postings(spark, land, out)
    assert stats1["n_docs"] == len(first)

    # per-turn invariant on the delta postings: token totals match
    deltas = spark.read.parquet(os.path.join(out, "postings_delta"))
    got_len = {
        (r["conv_id"], r["turn_idx"]): r["dl"]
        for r in deltas.groupBy("conv_id", "turn_idx")
        .agg({"tf": "sum"})
        .withColumnRenamed("sum(tf)", "dl")
        .collect()
    }
    for _, row in first.iterrows():
        assert got_len[(row["conv_id"], row["turn_idx"])] == len(row["text"].split())

    # append late data → resume from checkpoint picks up ONLY the new files
    rest = pdf[pdf.conv_id >= "c00000020"]
    spark.createDataFrame(rest).write.mode("append").parquet(land)
    stats2 = stream_ingest_postings(spark, land, out)
    assert stats2["n_docs"] == len(pdf)
    assert stats2["batches"] > stats1["batches"]

    # idempotent when nothing new arrived
    stats3 = stream_ingest_postings(spark, land, out)
    assert stats3["n_docs"] == len(pdf)
