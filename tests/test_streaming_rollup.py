"""Watermarked windowed streaming rollup (streaming/rollup.py).

Covers the two §2.8 semantics that matter at scale:
- complete-mode streaming state converges to the batch aggregate
  (same plan, same numbers);
- append mode emits a window exactly when the persisted watermark
  passes its end, drops later-than-watermark rows, and resumes the
  watermark across query restarts from the checkpoint (availableNow
  restarts ≙ successive micro-batches of a long-lived job).
"""

from __future__ import annotations

from datetime import datetime

from zensearch_spark.streaming.rollup import (
    batch_rollup,
    run_rollup_once,
)

D = datetime


def _write(spark, path: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _rows(spark, table: str) -> set[tuple]:
    return {
        (r["window_start"], r["event_type"], r["n_events"], float(r["sum_value"]))
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    }


def _sink_rows(spark, path: str) -> set[tuple]:
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:  # sink exists but holds no data files yet
        return set()
    return {
        (r["window_start"], r["event_type"], r["n_events"], float(r["sum_value"]))
        for r in df.collect()
    }


def test_complete_mode_matches_batch(spark, tmp_path):
    events = str(tmp_path / "events")
    _write(spark, events, [
        (1, 1, "click", D(2024, 1, 1, 0, 10), 1.0),
        (2, 1, "click", D(2024, 1, 1, 0, 50), 2.0),
        (3, 2, "view", D(2024, 1, 1, 1, 5), 3.0),
        (4, 2, "click", D(2024, 1, 1, 2, 30), 4.0),
    ])
    run_rollup_once(
        spark, events, str(tmp_path / "ckpt"), sink_table="rollup_complete",
        mode="complete",
    )
    got = _rows(spark, "rollup_complete")
    want = {
        (r["window_start"], r["event_type"], r["n_events"], float(r["sum_value"]))
        for r in batch_rollup(spark, events).collect()
    }
    assert got == want and len(want) == 3


def test_append_mode_watermark_closes_windows_and_drops_late(spark, tmp_path):
    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "rollup_out")

    # phase 1: two open windows, max ts 01:30 → watermark well before
    # any window end; nothing can be emitted yet
    _write(spark, events, [
        (1, 1, "click", D(2024, 1, 1, 0, 10), 1.0),
        (2, 1, "click", D(2024, 1, 1, 0, 20), 1.0),
        (3, 1, "click", D(2024, 1, 1, 0, 40), 1.0),
        (4, 1, "click", D(2024, 1, 1, 0, 55), 1.0),
        (5, 2, "view", D(2024, 1, 1, 1, 15), 2.0),
        (6, 2, "view", D(2024, 1, 1, 1, 30), 2.0),
    ])
    run_rollup_once(spark, events, ckpt, sink_dir=sink, mode="append")
    assert _sink_rows(spark, sink) == set()

    # phase 2: a 05:00 event advances the watermark to 03:00; the
    # availableNow run's trailing no-data micro-batch then emits the
    # two windows that closed — emission happens as soon as the
    # watermark passes, within the same run. [5,6) stays open.
    closed = {
        (D(2024, 1, 1, 0, 0), "click", 4, 4.0),
        (D(2024, 1, 1, 1, 0), "view", 2, 4.0),
    }
    _write(spark, events, [(7, 3, "view", D(2024, 1, 1, 5, 0), 5.0)])
    run_rollup_once(spark, events, ckpt, sink_dir=sink, mode="append")
    assert _sink_rows(spark, sink) == closed

    # phase 3 (restart — watermark resumes from the checkpoint): the
    # 00:30 straggler is LATER than the 03:00 watermark → dropped
    # silently; the already-emitted [0,1) window is NOT re-emitted
    # with 5 events, and no new window closes (max ts 06:10 →
    # watermark 04:10 < 06:00).
    _write(spark, events, [
        (8, 4, "click", D(2024, 1, 1, 6, 10), 6.0),
        (9, 9, "click", D(2024, 1, 1, 0, 30), 99.0),  # late beyond watermark
    ])
    run_rollup_once(spark, events, ckpt, sink_dir=sink, mode="append")
    assert _sink_rows(spark, sink) == closed


def test_sink_mode_defaults_and_guards(spark, tmp_path):
    """ADVICE r3: sink_dir defaults to append (the only mode the
    parquet sink supports), no-sink and incompatible combos raise a
    clear ValueError instead of failing inside stream start."""
    import pytest

    events = str(tmp_path / "events")
    _write(spark, events, [(1, 1, "click", D(2024, 1, 1, 0, 10), 1.0)])
    sink = str(tmp_path / "sink")
    # default mode for a file sink: append — must just work
    run_rollup_once(spark, events, str(tmp_path / "ckpt"), sink_dir=sink)
    assert spark.read.parquet(sink).count() >= 0
    with pytest.raises(ValueError, match="sink_dir or sink_table"):
        run_rollup_once(spark, events, str(tmp_path / "ckpt2"))
    with pytest.raises(ValueError, match="append"):
        run_rollup_once(
            spark, events, str(tmp_path / "ckpt3"), sink_dir=sink,
            mode="update",
        )
