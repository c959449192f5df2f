"""Sketch rollups: error bounds asserted against the EXACT operators on
the same data (q_rolling_active's windows.rolling_active, exact distinct,
exact percentile), plus the mergeability property that justifies them —
union of per-partition sketches equals the one-shot sketch's answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.ops import sketches, windows


def test_rolling_sketch_tracks_exact_rolling_active(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["day"]: r["active_users"]
        for r in windows.rolling_active(ev, "ts", "user_id", days=7).collect()
    }
    daily = sketches.daily_distinct_sketches(ev, "ts", "user_id")
    est = {
        r["day"]: r["active_users_est"]
        for r in sketches.rolling_distinct_approx(daily, days=7).collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(0.05 * n, 2), (day, est[day], n)


def test_total_distinct_matches_exact_within_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    daily = sketches.daily_distinct_sketches(ev, "ts", "user_id")
    est = sketches.total_distinct_approx(daily).collect()[0]["n_distinct_est"]
    assert abs(est - exact) <= max(0.05 * exact, 2)


def test_sketch_union_is_partition_invariant(spark, sf_dir):
    """The point of mergeable sketches: building per-day then unioning
    answers the same as sketching everything at once."""
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.daily_distinct_sketches(ev, "ts", "user_id")
    merged = sketches.total_distinct_approx(daily).collect()[0][0]
    oneshot = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("e")
        ).collect()[0]["e"]
    )
    assert merged == oneshot


def test_theta_segment_overlap_vs_exact_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = sketches.segment_overlap(
        ev, "user_id", "event_type", "view", "purchase"
    ).collect()[0]
    viewers = {
        r.user_id
        for r in ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .collect()
    }
    buyers = {
        r.user_id
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    for est, exact in [
        (got.n_a, len(viewers)),
        (got.n_b, len(buyers)),
        (got.n_both, len(viewers & buyers)),
        (got.n_only_a, len(viewers - buyers)),
    ]:
        assert abs(est - exact) <= max(0.06 * exact, 3), (est, exact)


def test_kll_quantiles_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sk = sketches.grouped_quantile_sketches(ev, "event_type", "value")
    got = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in sketches.quantiles_from_sketches(
            sk, "event_type", [0.5, 0.9]
        ).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for t in exact:
        for g, e in zip(got[t], exact[t]):
            # KLL guarantees RANK error, which for a smooth value
            # distribution maps to a small value error; 10% is generous.
            assert abs(g - e) <= 0.1 * abs(e) + 1e-6, (t, g, e)


def test_sketch_table_persists_and_appends_incrementally(
    spark, sf_dir, tmp_path
):
    """The persistable-rollup claim end to end: write the first half of
    the stream's day sketches to parquet, append the second half later
    (disjoint days — the daily-ingest pattern), and answer the global
    distinct question from the FILES, matching a from-scratch sketch of
    the full corpus exactly."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date") + 14
    ).collect()[0][0]
    day = F.date_trunc("day", "ts").cast("date")
    path = str(tmp_path / "sketch_store")

    sketches.daily_distinct_sketches(
        ev.filter(day <= F.lit(cut)), "ts", "user_id"
    ).write.mode("overwrite").parquet(path)
    sketches.daily_distinct_sketches(
        ev.filter(day > F.lit(cut)), "ts", "user_id"
    ).write.mode("append").parquet(path)

    stored = spark.read.parquet(path)
    est = sketches.total_distinct_approx(stored).collect()[0][0]
    full = sketches.total_distinct_approx(
        sketches.daily_distinct_sketches(ev, "ts", "user_id")
    ).collect()[0][0]
    assert est == full
    # and the rolling series from the stored table matches the
    # from-scratch one row for row (estimates, but identical inputs)
    a = sorted(
        map(tuple, sketches.rolling_distinct_approx(stored, 7).collect())
    )
    b = sorted(
        map(
            tuple,
            sketches.rolling_distinct_approx(
                sketches.daily_distinct_sketches(ev, "ts", "user_id"), 7
            ).collect(),
        )
    )
    assert a == b


# ------------------------------------------------------------------ CMS


def test_cms_estimates_bound_exact_counts(spark, sf_dir):
    """CMS never undercounts, and at these sizes (eps·N ≪ 1 collision
    expected) the per-key estimates should match exact counts."""
    ev = load_table(spark, sf_dir, "events")
    sk = sketches.daily_frequency_sketches(ev, "ts", "event_type")
    exact = {
        r.event_type: r.n
        for r in ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_total = sum(exact.values())
    est = dict(
        sketches.frequency_estimates(spark, sk, list(exact))
    )
    for k, n in exact.items():
        assert est[k] >= n  # CMS overestimates only
        assert est[k] <= n + max(1, int(0.001 * n_total) + 1)


def test_cms_merge_equals_oneshot(spark):
    """Counter addition is exact: merging per-day sketches must give the
    SAME estimates as one sketch over the whole frame."""
    rows = [(i, f"k{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, ["i", "key"]).select(
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_interval(days=F.col("i") % 10)).alias("ts"),
        "key",
    )
    per_day = sketches.daily_frequency_sketches(df, "ts", "key")
    assert per_day.count() == 10
    one = sketches.daily_frequency_sketches(
        df.withColumn("ts", F.lit("2024-01-01").cast("timestamp")), "ts", "key"
    )
    keys = [f"k{j}" for j in range(7)]
    assert sketches.frequency_estimates(
        spark, per_day, keys
    ) == sketches.frequency_estimates(spark, one, keys)


def test_cms_empty_table(spark):
    df = spark.createDataFrame([], "ts timestamp, key string")
    sk = sketches.daily_frequency_sketches(df, "ts", "key")
    assert sketches.frequency_estimates(spark, sk, ["a"]) == [("a", 0)]
