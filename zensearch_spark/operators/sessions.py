"""Gap-based sessionization over an event stream (training-data /
analytics staple; no reference counterpart — the reference's nearest
shape is its oldest-first crawl dequeue, SURVEY §2 W3).

A session = maximal run of a user's events with inter-event gaps ≤
``gap_sec``. Classic two-window formulation, all JVM-side:
lag(ts) per user → new-session flag → running sum = session ordinal.
Shuffle: ONE hash partition by user_id serves both windows (same key,
same ordering — Spark reuses the exchange); work per user is O(events
log events) locally. At 10^12 events the key is uniform (user_id) and
no state beyond the window buffer exists — the streaming twin would be
applyInPandasWithState keyed the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_events(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, ts, session_seq): each user's events tagged
    with a 1-based session ordinal; a new session starts when the gap
    from the previous event exceeds ``gap_sec``."""
    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(order_tiebreak)
    )
    # unix_timestamp, not cast("long"): handles TIMESTAMP_NTZ columns
    # (the testdata's type) and floors to whole seconds — mirrored by
    # the oracle's floor(epoch(ts)) under the session's UTC timeZone
    sec = F.unix_timestamp(F.col(ts_col))
    gap = sec - F.lag(sec).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(order_tiebreak)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        order_tiebreak, user_col, ts_col, new_sess.alias("_ns")
    ).withColumn("session_seq", F.sum("_ns").over(run)).drop("_ns")


def session_stats(
    events: DataFrame, gap_sec: int = 1800
) -> DataFrame:
    """Per-session rollup over sessionize_events: event count and
    duration — the per-group agg rides the same user_id partitioning."""
    s = sessionize_events(events, gap_sec=gap_sec)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.unix_timestamp("ts"))
             - F.min(F.unix_timestamp("ts"))).alias("duration_sec"),
        )
    )
