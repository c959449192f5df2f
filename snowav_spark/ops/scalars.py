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
    mergeable map-side) — see q_approx_percentile (rows-only)."""
    aggs = [
        F.round(F.percentile(value, q), 6).alias(f"p{int(q * 100)}") for q in qs
    ]
    return df.groupBy(*groups).agg(*aggs)


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
