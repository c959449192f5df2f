"""The reference's ``collect(method=...)`` query surface.

Reference parity: ref:snowav/database/database.py::collect is the single
query entry point every figure and report table goes through.  It filters
the long-format Results store by (run_name, basins, date range, variable)
and reduces with one of four methods:

- ``end``        : value at the latest date ≤ end, per group
- ``sum``        : accumulate flux variables (SWI, precip) over the range
- ``difference`` : end value − start value per group (e.g. SWE change)
- ``daily``      : per-day time series per group

Spark-first mapping: each method is a single groupBy aggregation.  ``end``
and ``difference`` use ``max_by``/``min_by`` (Spark 3.3+) rather than a
window + filter — one hash aggregate with partial aggregation instead of a
full sort per partition, which is the difference between one shuffle and a
sort-heavy plan at 100 TB.  Ties are broken deterministically by packing a
struct ordered (ts, tiebreak) — both engines then agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(groups: list[str | Column]) -> list[Column]:
    return [F.col(g) if isinstance(g, str) else g for g in groups]


def end_value(
    df: DataFrame,
    groups: list[str | Column],
    value: str | Column,
    ts: str | Column,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """collect(method='end'): latest value per group.

    ``max_by(value, struct(ts, tiebreak))`` — struct comparison is
    lexicographic, so equal timestamps resolve on the tiebreak column and
    the result is deterministic across engines and partitionings.
    """
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    key = F.struct(ts, F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak) if tiebreak is not None else ts
    return df.groupBy(*_cols(groups)).agg(
        F.max_by(value, key).alias("end_value"),
        F.max(ts).alias("end_ts"),
    )


def range_sum(
    df: DataFrame,
    groups: list[str | Column],
    value: str | Column,
    ts: str | Column,
    start,
    end,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """collect(method='sum'): accumulate a flux variable over [start, end).

    The date filter is a plain predicate → pushed to the parquet scan
    (PushedFilters + row-group min/max skipping); with the results store
    partitioned by date this is partition pruning, i.e. the 100 TB scan
    reads only the requested days.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    value = F.col(value) if isinstance(value, str) else value
    filtered = df.filter((ts >= F.lit(start)) & (ts < F.lit(end)))
    exprs = (
        [c.alias(n) for n, c in aggs.items()]
        if aggs
        else [F.sum(value).alias("sum_value")]
    )
    return filtered.groupBy(*_cols(groups)).agg(*exprs)


def difference(
    df: DataFrame,
    groups: list[str | Column],
    value: str | Column,
    ts: str | Column,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """collect(method='difference'): end − start per group, one shuffle."""
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    key = F.struct(ts, F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak) if tiebreak is not None else ts
    return df.groupBy(*_cols(groups)).agg(
        (F.max_by(value, key) - F.min_by(value, key)).alias("delta")
    )


def daily_series(
    df: DataFrame,
    groups: list[str | Column],
    ts: str | Column,
    aggs: dict[str, Column],
) -> DataFrame:
    """collect(method='daily'): per-day series per group.

    ``date_trunc('day', ts)`` is a pure projection, so the aggregation is
    still a single hash shuffle keyed on (day, groups).
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    day = F.date_trunc("day", ts).cast("date").alias("day")
    exprs = [c.alias(n) for n, c in aggs.items()]
    return df.groupBy(day, *_cols(groups)).agg(*exprs)


def pivot_frame(
    df: DataFrame,
    row_key: str,
    pivot_key: str,
    pivot_values: list[str],
    agg: Column,
) -> DataFrame:
    """Long → wide report frame (rows = bands, columns = basins).

    Reference parity: collect() returns a pandas frame indexed by band
    edges with one column per basin.  Passing the explicit ``pivot_values``
    list skips Spark's extra distinct-scan job — at scale that's one fewer
    pass over the store; the reference always knows its basin list
    (``plotorder``) anyway.
    """
    return df.groupBy(row_key).pivot(pivot_key, pivot_values).agg(agg)


def unpivot_frame(
    df: DataFrame,
    row_key: str,
    var_name: str,
    value_name: str,
    cols: list[str],
) -> DataFrame:
    """Wide → long (melt): the inverse of pivot_frame, for re-ingesting
    report frames into the long-format store.  ``DataFrame.unpivot`` is
    a zero-shuffle Expand projection (each input row fans to |cols|
    output rows in place).  NULL cells are dropped — a wide frame's NULL
    means "no value for this (row, column)", which in long format is the
    absence of the row (and SQL UNPIVOT agrees: it excludes NULLs by
    default)."""
    out = df.unpivot(
        ids=[row_key],
        values=cols,
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
    return out.filter(F.col(value_name).isNotNull())
