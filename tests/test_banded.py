"""Unit tests for the banded zonal-statistics operator — semantics match
``np.digitize`` with the reference's clamping (SURVEY.md §1.3)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from snowav_spark.ops import banded


def test_digitize_matches_numpy(spark):
    edges = [0.0, 10.0, 25.0, 50.0, 100.0]
    vals = [-5.0, 0.0, 9.99, 10.0, 24.9, 25.0, 49.0, 50.0, 99.0, 100.0, 250.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [
        r.band
        for r in df.select(banded.digitize(F.col("x"), edges).alias("band"))
        .orderBy("x")  # input is distinct+sorted ascending already
        .collect()
    ]
    # np.digitize returns 1-based insertion points; reference clamps to
    # [0, n_bands-1] where n_bands = len(edges)-1.
    want = np.clip(np.digitize(sorted(vals), edges) - 1, 0, len(edges) - 2)
    assert got == list(want)


def test_digitize_uniform_matches_general(spark):
    edges = [0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0, 45.0, 1e18]
    df = spark.range(0, 60).select((F.col("id").cast("double")).alias("x"))
    both = df.select(
        banded.digitize(F.col("x"), edges).alias("a"),
        banded.digitize_uniform(F.col("x"), 5.0, 10).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in both)


def test_rollup_has_totals(spark):
    df = spark.createDataFrame(
        [("A", 0, 1.0), ("A", 1, 2.0), ("B", 0, 4.0)], ["z", "b", "v"]
    )
    out = banded.zonal_stats(
        df, "z", "b", {"s": F.sum("v")}, rollup=True
    ).collect()
    rows = {(r.zone, r.band): r.s for r in out}
    assert rows[("A", None)] == 3.0  # per-zone total
    assert rows[(None, None)] == 7.0  # grand total
    assert rows[("A", 0)] == 1.0


def test_retention_daily_planted(spark):
    import datetime

    from snowav_spark.ops import windows as w

    t = lambda d, h=9: datetime.datetime(2024, 1, d, h)
    rows = [
        # user 1 active days 1,2,3  -> retained on 2 and 3
        (1, t(1)), (1, t(2)), (1, t(2, 15)), (1, t(3)),
        # user 2 active days 1 and 3 -> never retained
        (2, t(1)), (2, t(3)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r.day.isoformat(): (r.active, r.retained)
           for r in w.retention_daily(df, "ts", "user_id").collect()}
    assert got == {
        "2024-01-01": (2, 0),
        "2024-01-02": (1, 1),
        "2024-01-03": (2, 1),
    }


def test_funnel_stages_planted(spark):
    import datetime

    from snowav_spark.ops import joins as j

    t = lambda h: datetime.datetime(2024, 1, 1, h)
    rows = [
        # user 1 completes the funnel in order
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2 clicks BEFORE viewing -> stops at stage 0
        (2, "click", t(1)), (2, "view", t(2)),
        # user 3 views and clicks, never purchases
        (3, "view", t(1)), (3, "click", t(5)),
        # user 4 purchases without viewing -> not in funnel at all
        (4, "purchase", t(1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = j.funnel_stages(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    ).collect()[0]
    assert (got.n_stage0, got.n_stage1, got.n_stage2) == (3, 2, 1)


def test_cohort_matrix_planted(spark):
    import datetime

    from snowav_spark.ops import windows as w

    t = lambda d: datetime.datetime(2024, 1, d, 12)
    rows = [
        # cohort Jan-1: users 1,2; user 1 returns day 2; both return day 3
        (1, t(1)), (1, t(2)), (1, t(3)),
        (2, t(1)), (2, t(3)),
        # cohort Jan-2: user 3, returns day 4
        (3, t(2)), (3, t(4)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r.cohort_day.isoformat(), r.offset_days): r.n_users
           for r in w.cohort_matrix(df, "ts", "user_id").collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 2,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_asof_within_keeps_unmatched(spark):
    import datetime

    from pyspark.sql import functions as F

    from snowav_spark.ops import joins as j

    d = lambda day: datetime.date(2024, 1, day)
    left = spark.createDataFrame([(1, d(10)), (2, d(20))], ["k", "anchor"])
    right = spark.createDataFrame(
        [(1, d(12), 100.0), (1, d(1), 200.0), (2, d(5), 300.0)],
        ["k2", "obs_day", "val"],
    )
    dist = F.abs(F.datediff(F.col("obs_day"), F.col("anchor")))
    got = {
        r.k: r.val
        for r in j.asof_within(
            left, right, F.col("k") == F.col("k2"), "k",
            dist, F.col("val"), {"val": F.col("val")}, tolerance=3,
        ).collect()
    }
    assert got[1] == 100.0  # nearest within 3 days
    assert got[2] is None   # nothing within tolerance -> kept, null payload
