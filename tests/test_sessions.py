"""Gap-based sessionization (operators/sessions.py) on handcrafted
events with exact expected ordinals — gap boundary inclusive/exclusive
semantics and the per-session rollup."""

from __future__ import annotations

from datetime import datetime

D = datetime


def test_sessionize_gap_semantics(spark):
    from zensearch_spark.operators.sessions import (
        session_stats, sessionize_events,
    )

    rows = [
        # user 1: events at t=0, +10min (same sess), +40min gap (new),
        # +exactly 30min gap (SAME session — gap > 1800 strictly)
        (1, 1, "e", D(2024, 1, 1, 0, 0, 0), 0.0),
        (2, 1, "e", D(2024, 1, 1, 0, 10, 0), 0.0),
        (3, 1, "e", D(2024, 1, 1, 0, 50, 0), 0.0),
        (4, 1, "e", D(2024, 1, 1, 1, 20, 0), 0.0),
        # user 2: single event
        (5, 2, "e", D(2024, 1, 1, 9, 0, 0), 0.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize_events(ev, gap_sec=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(ev, gap_sec=1800).collect()
    }
    assert stats == {
        (1, 1): (2, 600),
        (1, 2): (2, 1800),
        (2, 1): (1, 0),
    }
