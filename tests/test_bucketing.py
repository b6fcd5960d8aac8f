"""Bucketed co-located joins (plans/bucketing.py): the join of two
tables bucketed by the same key into the same bucket count must plan
with ZERO Exchange operators — the write-once-join-shuffle-free
property the brief's bucketing lever is for — and return exactly the
rows of the plain (shuffling) join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    from zensearch_spark.plans.bucketing import write_bucketed

    users = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment"),
    )
    events = spark.range(0, 10_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2000).alias("user_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    # DROP alone can't clean orphan dirs left by an earlier session
    # (each test session has a fresh in-memory catalog)
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("zs_users_b", "zs_events_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    write_bucketed(users, "zs_users_b", "user_id", n_buckets=8,
                   sort_col="user_id")
    write_bucketed(events, "zs_events_b", "user_id", n_buckets=8,
                   sort_col="user_id")
    return users, events


def test_colocated_join_plans_without_exchange(spark, bucketed_pair):
    from zensearch_spark.plans.bucketing import colocated_join

    # force_merge: at this toy size the planner correctly prefers a
    # broadcast join and ignores bucketing; the huge-by-huge regime
    # bucketing exists for plans as sort-merge — pin it and assert
    # co-location removed BOTH the exchanges and the per-task sorts
    joined = colocated_join(
        spark, "zs_events_b", "zs_users_b", "user_id", force_merge=True
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    # and the big-side aggregation on the bucket key is shuffle-free too
    agg = spark.table("zs_events_b").groupBy("user_id").agg(
        F.sum("value").alias("s")
    )
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan, agg_plan[:2000]


def test_colocated_join_matches_plain_join(spark, bucketed_pair):
    from zensearch_spark.plans.bucketing import colocated_join

    users, events = bucketed_pair
    got = (
        colocated_join(spark, "zs_events_b", "zs_users_b", "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
    )
    want = (
        events.join(users, "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
