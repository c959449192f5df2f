"""Property-based tests (hypothesis) for operator semantics.

Each property generates one batch of data per example and runs a single
Spark job over it (per-row examples would pay Spark's job latency per
case).  Examples are capped — these guard invariants, not performance."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowav_spark.ops import banded, dedup, windows

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    edges=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=8, unique=True
    ).map(sorted),
    vals=st.lists(st.floats(-1e7, 1e7, allow_nan=False), min_size=1, max_size=200),
)
@SET
def test_digitize_always_matches_numpy(spark, edges, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = [
        r.band
        for r in df.select(banded.digitize(F.col("x"), edges).alias("band"))
        .collect()
    ]
    want = list(np.clip(np.digitize(vals, edges) - 1, 0, len(edges) - 2))
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=30
    )
)
@SET
def test_jaccard_pairs_bounded_and_symmetric_input_order(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    pairs = dedup.jaccard_pairs(df, "doc_id", "text", n=2).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


@given(
    gaps=st.lists(st.integers(1, 120), min_size=1, max_size=50),
    gap_minutes=st.integers(5, 60),
)
@SET
def test_sessionize_counts_gaps(spark, gaps, gap_minutes):
    """Session count == 1 + number of inter-event gaps > timeout."""
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows, expected_sessions = [], 1
    for i, g in enumerate(gaps):
        if i > 0:
            t = t + datetime.timedelta(minutes=g)
            if g > gap_minutes:
                expected_sessions += 1
        rows.append((1, t, i))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = windows.sessionize(
        df, "user_id", "ts", gap_minutes=gap_minutes, tiebreak="event_id"
    )
    got = out.agg(F.max("session_id")).collect()[0][0]
    assert got == expected_sessions


@given(
    vals=st.lists(
        st.floats(0, 1e6, allow_nan=False), min_size=2, max_size=100
    )
)
@SET
def test_rollup_total_equals_sum_of_bands(spark, vals):
    df = spark.createDataFrame(
        [("z", float(v)) for v in vals], ["zone", "v"]
    ).withColumn("band", banded.digitize_uniform(F.col("v"), 1e5, 10))
    out = banded.zonal_stats(
        df, "zone", "band", {"s": F.round(F.sum("v"), 4)}, rollup=True
    ).collect()
    per_band = sum(r.s for r in out if r.band is not None and r.zone is not None)
    total = [r.s for r in out if r.zone is not None and r.band is None][0]
    assert total == pytest.approx(per_band, abs=1e-3)
