"""Structured-Streaming ingest of transcript appends.

The reference has NO streaming operators (SURVEY.md §2.8) — its
"streaming" is AMQP consumption with manual acks (reference:
search-engine/main.go:90-137). Its *ingest* path, though — crawler
appends webpages while the index serves queries — maps naturally to:

    transcripts landing dir (parquet appends)
        → readStream → tokenize → per-microbatch postings delta
        → append to a delta area the next index compaction folds in

This module implements that thin, honest slice: a file-source stream
that maintains (a) a running corpus-stats sink and (b) per-batch
posting-delta parquet, both via foreachBatch so each micro-batch
reuses the SAME batch operators as the main build (no second
implementation to drift). Trigger(availableNow=True) makes it testable
and checkpoint-resumable without a long-lived daemon.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zensearch_spark.functions.tokenizer import with_tokens
from zensearch_spark.sources.corpus import TRANSCRIPT_SCHEMA


def stream_ingest_postings(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> dict:
    """Consume all currently-available transcript parquet appends from
    ``landing_dir``; for each micro-batch write posting deltas
    (term, conv_id, turn_idx, tf, doc_len) and fold running corpus
    stats into ``out_dir``/stream_stats.json. Returns the final stats.

    Note docIDs are NOT assigned here — global ranks can't be stamped
    incrementally; deltas keep the natural key and the next index
    compaction run assigns ids (the same late-binding the batch build
    uses).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    deltas_dir = os.path.join(out_dir, "postings_delta")
    stats_path = os.path.join(out_dir, "stream_stats.json")

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # Idempotence under micro-batch REPLAY (crash between the side
        # effects below and the streaming checkpoint commit → Spark
        # re-delivers the same batch_id): already-counted batches are
        # skipped via last_batch_id, and deltas land in a per-batch_id
        # directory written with overwrite, so a half-written replay
        # rewrites the same files instead of double-appending.
        prev = {"n_docs": 0, "total_len": 0, "batches": 0, "last_batch_id": -1}
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                prev = {**prev, **json.load(f)}
        if batch_id <= prev["last_batch_id"]:
            return
        toks = batch.withColumn("tokens", with_tokens("text")).withColumn(
            "doc_len", F.size("tokens")
        )
        postings = (
            toks.select(
                "conv_id", "turn_idx", "doc_len",
                F.explode("tokens").alias("term"),
            )
            .groupBy("term", "conv_id", "turn_idx")
            .agg(F.count("*").alias("tf"), F.first("doc_len").alias("doc_len"))
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(deltas_dir, f"batch_id={batch_id}")
        )
        row = toks.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("total_len")
        ).collect()[0]
        new = {
            "n_docs": prev["n_docs"] + int(row["n"] or 0),
            "total_len": prev["total_len"] + int(row["total_len"] or 0),
            "batches": prev["batches"] + 1,
            "last_batch_id": batch_id,
        }
        new["avgdl"] = new["total_len"] / new["n_docs"] if new["n_docs"] else 0.0
        with open(stats_path + ".tmp", "w") as f:
            json.dump(new, f)
        os.replace(stats_path + ".tmp", stats_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            return json.load(f)
    return {"n_docs": 0, "total_len": 0, "batches": 0, "avgdl": 0.0}
