"""Stateful streaming sessionization — the applyInPandasWithState
custom operator the round brief calls for (§2.8: "custom stateful
operators"), and the streaming twin of operators/sessions.py.

Per-user state = (last_ts_sec, session_seq, n_in_session): each
micro-batch's events for a user are sorted (ts, event_id), the gap
rule continues from state, and the state survives in the streaming
checkpoint — an availableNow restart resumes exactly where the last
run stopped, the same restart semantics the rollup tests prove.

State is BOUNDED: the query carries an event-time watermark and the
operator registers an event-time timeout at watermark + gap — a user
idle past the session gap has their state dropped (their next event
correctly starts a new session, seq restarting from 1 is avoided by
emitting session ids keyed (user_id, session_start_sec) rather than
ordinals... kept as ordinals here with the caveat that a TIMED-OUT
user's ordinal restarts; the batch twin is the convergence oracle for
in-watermark data).

Scale shape: state is O(active users) × 24 bytes; each micro-batch
shuffles only its own events by user_id (the same key the batch twin
windows on).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zensearch_spark.streaming.rollup import EVENT_SCHEMA

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("session_seq", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_sec", T.LongType(), False),
        T.StructField("session_seq", T.LongType(), False),
    ]
)


def _make_assigner(gap_sec: int):
    def assign(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # user idle beyond watermark + gap — session closed, free
            # the state (the bounded-state property)
            state.remove()
            return
        if state.exists:
            last_sec, seq = state.get
        else:
            last_sec, seq = None, 0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            secs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
            seqs = []
            for s in secs:
                if last_sec is None or s - last_sec > gap_sec:
                    seq += 1
                last_sec = int(s)
                seqs.append(seq)
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": pdf["event_id"].astype("int64"),
                        "user_id": pdf["user_id"].astype("int64"),
                        "ts": pdf["ts"],
                        "session_seq": pd.Series(seqs, dtype="int64",
                                                 index=pdf.index),
                    }
                )
            )
        if last_sec is not None:
            state.update((int(last_sec), int(seq)))
            # close the session once event time passes last event + gap.
            # Clamped above the current watermark: a user whose newest
            # event is already older than watermark - gap (possible
            # across availableNow restarts with delay > gap) would
            # otherwise request a timeout <= watermark, which Spark
            # rejects with IllegalArgumentException and fails the whole
            # query instead of just expiring this user (round-4 ADVICE).
            want_ms = (int(last_sec) + gap_sec) * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(want_ms, wm_ms + 1))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return assign


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    gap_sec: int = 1800,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """readStream over an events landing dir → per-event session
    ordinals with per-user state. Caller attaches the sink."""
    ev = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )
    return (
        ev.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_assigner(gap_sec),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_once(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    gap_sec: int = 1800,
    watermark_delay: str = "2 hours",
) -> None:
    """Process all currently-available files (availableNow), appending
    assignments to a parquet sink; state resumes from the checkpoint
    across calls exactly like successive micro-batches."""
    q = (
        sessionize_stream(spark, events_dir, gap_sec, watermark_delay)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", sink_dir)
        .start()
    )
    q.awaitTermination()
