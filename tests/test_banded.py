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
