"""Scalar/conditional expression layer — unit conversion, water-year math,
conditional splits, JSON props, percentiles, snow-line detection.

Reference parity (SURVEY.md §2.2/§2.3): these are the per-grid numpy
expressions inside the reference's process loop (ref:snowav/framework/
process.py) and its date/label helpers (ref:snowav/utils/utilities.py).
Everything here is a pure Catalyst expression — no UDFs, fully inside
whole-stage codegen, and trivially pushed down/pruned by the optimizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def water_year(date_col: Column) -> Column:
    """Water-year of a date: Oct 1 anchor (SURVEY §1.3 — the reference
    expresses dates as water-year day/hour, ref:snowav/utils/utilities.py)."""
    return F.when(
        F.month(date_col) >= 10, F.year(date_col) + 1
    ).otherwise(F.year(date_col))


def water_year_day(date_col: Column) -> Column:
    """Day-of-water-year (1-based from Oct 1) — the reference's ``wyhr``
    expressed in days."""
    wy_start = F.make_date(water_year(date_col) - 1, F.lit(10), F.lit(1))
    return F.datediff(date_col.cast("date"), wy_start) + 1


def conditional_split(
    value: Column, cond: Column, names: tuple[str, str] = ("met", "unmet")
) -> list[Column]:
    """Two complementary conditional sums — the reference's rain/snow and
    available/unavailable SWE splits (ref:process.py) are both this shape.
    Both sums come out of ONE aggregation pass."""
    met = F.sum(F.when(cond, value).otherwise(F.lit(0.0))).alias(names[0])
    unmet = F.sum(F.when(~cond, value).otherwise(F.lit(0.0))).alias(names[1])
    return [met, unmet]


def json_field(props: Column, field: str, cast_to: str = "int") -> Column:
    """Extract a scalar from a JSON-text column (events.props).
    ``get_json_object`` is JVM-side — no Python in the loop."""
    return F.get_json_object(props, f"$.{field}").cast(cast_to)


def exact_percentiles(
    df: DataFrame, groups: list[str], value: str, qs: list[float]
) -> DataFrame:
    """Exact interpolated percentiles per group (the reference summarizes
    smrf forcing inputs with mean/percentile tables via its tablizer dep,
    ref:snowav/plotting/inputs.py).

    Exact ``percentile`` hash-matches DuckDB's ``quantile_cont``.  At
    100 TB the scale path is ``approx_percentile`` (t-digest sketch,
    mergeable map-side) — see q_approx_percentile (rows-only).

    NULL *and NaN* inputs are filtered up front: engines disagree on
    where NaN sorts in a percentile (Spark treats it as largest, DuckDB
    quantile_cont errors or excludes) — every oracle twin carries the
    identical ``IS NOT NULL AND NOT isnan(x)`` predicate."""
    clean = df.filter(F.col(value).isNotNull() & ~F.isnan(F.col(value)))
    aggs = [
        F.round(F.percentile(value, q), 6).alias(f"p{int(q * 100)}") for q in qs
    ]
    return clean.groupBy(*groups).agg(*aggs)


def snow_line(
    banded_means: DataFrame,
    zone: str,
    band: str,
    mean_col: str,
    threshold: float,
) -> DataFrame:
    """Lowest band whose mean exceeds a threshold, per zone
    (ref:snowav/utils/utilities.py snow-line estimate).  Input is the
    already-banded means frame; the pick is ``min(when(cond, band))`` —
    one tiny aggregation, no window."""
    return banded_means.groupBy(zone).agg(
        F.min(
            F.when(F.col(mean_col) > F.lit(threshold), F.col(band))
        ).alias("snow_line")
    )


def zscore_outlier_stats(
    df: DataFrame, group: str, value: str, threshold: float = 3.0
) -> DataFrame:
    """Per-group z-score outlier screen: count values beyond ``threshold``
    standard deviations of their group, plus the group's mean/stddev —
    the anomaly gate of a metrics pipeline.

    Hash-parity design: naive mean/stddev are summation-order-dependent
    doubles, so the z of a value sitting near the threshold could flip
    between engines/partitionings.  Instead both moments come from the
    contract's fixed-point sums (ops/windows.fixed_micros — per-row
    floor(x·1e6), exact integer accumulation): mean = Σ̂x/n and
    E[x²] = Σ̂x²/n are then bit-identical doubles everywhere, and the
    per-row flag (x−mean)² > t²·var is the same IEEE comparison in every
    engine.  Semantics: moments of the micro-unit-truncated values.

    Scale shape: one map-side-combined agg produces the per-group moment
    table (|groups| rows), broadcast back onto a second scan for the
    flag count — the raw table is never shuffled on data volume.
    """
    from snowav_spark.ops import windows as _w

    sc = float(_w.FIXED_POINT_SCALE)
    v = F.col(value)
    stats = (
        df.filter(v.isNotNull())
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            (F.sum(_w.fixed_micros(v)).cast("double") / sc).alias("_s1"),
            (F.sum(_w.fixed_micros(v * v)).cast("double") / sc).alias("_s2"),
        )
    )
    mean = F.col("_s1") / F.col("n")
    var = F.greatest(
        F.col("_s2") / F.col("n") - mean * mean, F.lit(0.0)
    )
    moments = stats.select(group, "n", mean.alias("_mean"), var.alias("_var"))
    flagged = (
        df.filter(v.isNotNull())
        .join(F.broadcast(moments), group)
        .select(
            group,
            "n",
            "_mean",
            "_var",
            # when/otherwise, not a bare boolean cast: a NULL comparison
            # (all-NaN / out-of-domain group → NULL moments) must count
            # as 0, matching the oracle's CASE ... ELSE 0 — a NULL here
            # would propagate through sum() into a NULL n_outliers on
            # the Spark side only.
            F.when(
                (v - F.col("_mean")) * (v - F.col("_mean"))
                > F.lit(threshold * threshold) * F.col("_var"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_is_out"),
        )
    )
    return flagged.groupBy(group, "n", "_mean", "_var").agg(
        F.sum("_is_out").alias("n_outliers")
    ).select(
        group,
        "n",
        "n_outliers",
        F.round("_mean", 6).alias("mean_value"),
        F.round(F.sqrt("_var"), 6).alias("stddev_value"),
    )
