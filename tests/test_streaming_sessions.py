"""Stateful streaming sessionization (streaming/sessions.py,
applyInPandasWithState): converges to the batch twin across
checkpoint-resumed availableNow runs, and per-user state carries the
session ordinal across micro-batch boundaries."""

from __future__ import annotations

from datetime import datetime

from zensearch_spark.operators.sessions import sessionize_events
from zensearch_spark.streaming.sessions import run_sessionize_once

D = datetime


def _write(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(path)


def _sink(spark, path: str) -> dict[int, int]:
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return {}
    return {r["event_id"]: r["session_seq"] for r in df.collect()}


def test_streaming_sessionize_matches_batch_across_restarts(spark, tmp_path):
    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sessions_out")

    # batch 1: user 1 starts a session, user 2 one event
    _write(spark, events, [
        (1, 1, "e", D(2024, 1, 1, 0, 0, 0), 0.0),
        (2, 1, "e", D(2024, 1, 1, 0, 10, 0), 0.0),
        (3, 2, "e", D(2024, 1, 1, 0, 5, 0), 0.0),
    ])
    run_sessionize_once(spark, events, ckpt, sink)
    assert _sink(spark, sink) == {1: 1, 2: 1, 3: 1}

    # batch 2 (restart — state from checkpoint): user 1 continues the
    # SAME session (10 min gap) then a 40-min gap opens session 2;
    # user 2's 31-min gap opens session 2
    _write(spark, events, [
        (4, 1, "e", D(2024, 1, 1, 0, 20, 0), 0.0),
        (5, 1, "e", D(2024, 1, 1, 1, 0, 0), 0.0),
        (6, 2, "e", D(2024, 1, 1, 0, 36, 30), 0.0),
    ])
    run_sessionize_once(spark, events, ckpt, sink)
    got = _sink(spark, sink)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2}

    # convergence oracle: identical to the batch twin over all files
    want = {
        r["event_id"]: r["session_seq"]
        for r in sessionize_events(
            spark.read.parquet(events), gap_sec=1800
        ).collect()
    }
    assert got == want
