"""Bucketized interval join (ops/joins.py::lookback_count): window
boundary semantics, bucket straddling, NULL keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from snowav_spark.ops import joins


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 5, h, m, s)


def test_lookback_boundaries_and_straddle(spark):
    anchors = spark.createDataFrame(
        [(1, 100, _ts(12, 0, 0))], ["event_id", "user_id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    lookups = spark.createDataFrame(
        [
            (100, _ts(11, 0, 0)),   # exactly -1h: INSIDE (inclusive lower)
            (100, _ts(12, 0, 0)),   # exactly t:  OUTSIDE (exclusive upper)
            (100, _ts(11, 0, 1)),   # just inside
            (100, _ts(10, 59, 59)), # just outside
            (100, _ts(11, 30, 0)),  # same bucket as anchor
            (999, _ts(11, 30, 0)),  # other user
        ],
        ["user_id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = joins.lookback_count(
        anchors, lookups, ["user_id"], "ts", "ts", 3600, ["event_id"]
    ).collect()
    assert len(out) == 1
    # 11:00:00 (straddles into previous hour bucket), 11:00:01, 11:30:00
    assert out[0].n_in_window == 3


def test_lookback_subsecond_boundaries(spark):
    """Comparisons are µs-exact: a lookup 300 ms before the anchor is in;
    one 100 ms before the window start is out (a second-truncating
    implementation gets both wrong)."""
    us = dt.timedelta
    anchor = dt.datetime(2024, 1, 5, 12, 0, 0, 500_000)
    anchors = spark.createDataFrame(
        [(1, 100, anchor)], "event_id long, user_id long, ts timestamp_ntz"
    )
    lookups = spark.createDataFrame(
        [
            (100, anchor - us(milliseconds=300)),       # in
            (100, anchor),                              # exact t: out
            (100, anchor - us(seconds=3600)),           # exact -1h: in
            (100, anchor - us(seconds=3600, milliseconds=100)),  # out
        ],
        "user_id long, ts timestamp_ntz",
    )
    out = joins.lookback_count(
        anchors, lookups, ["user_id"], "ts", "ts", 3600, ["event_id"]
    ).collect()
    assert out[0].n_in_window == 2


def test_lookback_zero_matches_and_null_key(spark):
    anchors = spark.createDataFrame(
        [(1, 100, _ts(12)), (2, None, _ts(12)), (3, 100, None)],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    lookups = spark.createDataFrame(
        [(100, _ts(23))], "user_id long, ts timestamp_ntz"
    )
    rows = {
        r.event_id: r.n_in_window
        for r in joins.lookback_count(
            anchors, lookups, ["user_id"], "ts", "ts", 3600, ["event_id"]
        ).collect()
    }
    # every anchor keeps a row; NULL key / NULL ts / no-match all count 0
    assert rows == {1: 0, 2: 0, 3: 0}


def test_lookback_plan_is_band_equijoin(spark):
    """The physical plan must be a hash equi-join on (key, bucket) —
    never a nested-loop theta join (the thing this operator exists to
    avoid)."""
    anchors = spark.createDataFrame(
        [(1, 100, _ts(12))], "event_id long, user_id long, ts timestamp_ntz"
    )
    lookups = spark.createDataFrame(
        [(100, _ts(11))], "user_id long, ts timestamp_ntz"
    )
    plan = (
        joins.lookback_count(
            anchors, lookups, ["user_id"], "ts", "ts", 3600, ["event_id"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
