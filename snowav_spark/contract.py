"""The graded query contract: every SURVEY.md §2 query key, implemented as
a Spark DataFrame plan with a matching DuckDB oracle SQL string.

Conventions (SURVEY.md §5.2 — these are what make hash-matching work):

- every computed column is aliased identically in both dialects;
- float measure columns produced by sums/averages are ``round(x, 6)`` in
  BOTH dialects (parallel summation order differs between engines; raw
  per-row doubles are identical so non-aggregated floats are left exact);
- ``max_by``/top-k carry deterministic tie-break keys;
- banding uses floor arithmetic (DuckDB 1.0.0 has no ``width_bucket``);
- event timestamps compare at day/µs level (ns→µs conversion is exact).

Each query's docstring cites the reference operation it re-expresses
(ref:<path> per SURVEY.md §0 — the reference tree was empty at survey time,
so citations point into the public USDA-ARS-NWRC/snowav package).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowav_spark.io import load_table
from snowav_spark.ops import banded, methods

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a contract query (and its DuckDB oracle, if expressible)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def r6(col):
    """round(x, 6): identical in both dialects; absorbs summation-order ulps."""
    return F.round(col, 6)


# The fixture analog of the reference's elevation banding: l_quantity is the
# "DEM", bands are uniform width 5 with 10 bands (SURVEY §2 legend).
def _band():
    return banded.digitize_uniform(F.col("l_quantity"), 5.0, 10).alias("band")


_BAND_SQL = "cast(least(floor(l_quantity/5), 9) as int)"


# ---------------------------------------------------------------------------
# §2.3 Aggregations — the reference's process.py day loop + database.collect()
# ---------------------------------------------------------------------------


@q(
    "q_zonal_mean",
    f"""
    SELECT l_returnflag AS zone, {_BAND_SQL} AS band,
           round(avg(l_extendedprice), 6) AS mean_price,
           count(*) AS n_px
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_zonal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked zonal mean per basin×band (ref:snowav/framework/process.py).

    One hash aggregation, map-side combine; banding is pure arithmetic in
    whole-stage codegen.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return banded.zonal_stats(
        li,
        F.col("l_returnflag"),
        _band(),
        {"mean_price": r6(F.avg("l_extendedprice")), "n_px": F.count("*")},
    )


@q(
    "q_zonal_volume",
    f"""
    SELECT l_returnflag AS zone, {_BAND_SQL} AS band,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS volume
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_zonal_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal volume sum — sum(swe × px_area) analog (ref:process.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return banded.zonal_stats(
        li,
        F.col("l_returnflag"),
        _band(),
        {"volume": r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))},
    )


@q(
    "q_rollup_total",
    f"""
    SELECT l_returnflag AS zone, {_BAND_SQL} AS band,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS volume,
           count(*) AS n_px
    FROM lineitem GROUP BY ROLLUP(1, 2)
    """,
)
def q_rollup_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band rows + synthetic 'total' rows in ONE shuffle via ROLLUP
    (ref:process.py computes band rows and mask totals as separate numpy
    passes; ref:database.py::collect appends the 'total' row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return banded.zonal_stats(
        li,
        F.col("l_returnflag"),
        _band(),
        {
            "volume": r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
            "n_px": F.count("*"),
        },
        rollup=True,
    )


@q(
    "q_end_last",
    """
    SELECT o_custkey,
           max(CASE WHEN rn = 1 THEN o_totalprice END) AS end_value,
           cast(max(o_orderdate) AS DATE) AS end_date
    FROM (
        SELECT o_custkey, o_totalprice, o_orderdate,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) GROUP BY o_custkey
    """,
)
def q_end_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect(method='end'): latest value per group
    (ref:snowav/database/database.py::collect).  ``max_by`` over a
    (ts, unique-key) struct — one hash agg, no sort, deterministic ties."""
    orders = load_table(spark, sf_dir, "orders")
    out = methods.end_value(
        orders,
        ["o_custkey"],
        "o_totalprice",
        "o_orderdate",
        tiebreak="o_orderkey",
    )
    return out.select(
        "o_custkey",
        "end_value",
        F.col("end_ts").cast("date").alias("end_date"),
    )


@q(
    "q_sum_range",
    """
    SELECT event_type, round(sum(value), 6) AS sum_value, count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY event_type
    """,
)
def q_sum_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect(method='sum'): flux accumulation over a date range
    (ref:database.py::collect).  The range predicate is pushed to the scan
    (partition pruning on a date-partitioned store)."""
    ev = load_table(spark, sf_dir, "events")
    return methods.range_sum(
        ev,
        ["event_type"],
        "value",
        "ts",
        "2024-01-10",
        "2024-01-20",
        aggs={"sum_value": r6(F.sum("value")), "n": F.count("*")},
    )


@q(
    "q_difference",
    """
    SELECT event_type,
           max(CASE WHEN r_last = 1 THEN value END)
             - max(CASE WHEN r_first = 1 THEN value END) AS delta
    FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS r_last,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts ASC, event_id ASC) AS r_first
        FROM events
    ) GROUP BY event_type
    """,
)
def q_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect(method='difference'): end − start per group (SWE change,
    ref:database.py::collect).  Subtraction of two raw stored doubles —
    exact in both engines, no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    return methods.difference(ev, ["event_type"], "value", "ts", tiebreak="event_id")


@q(
    "q_daily_series",
    """
    SELECT cast(date_trunc('day', ts) AS DATE) AS day, event_type,
           round(sum(value), 6) AS sum_value,
           round(avg(value), 6) AS avg_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect(method='daily'): per-day series per basin
    (ref:database.py::collect)."""
    ev = load_table(spark, sf_dir, "events")
    return methods.daily_series(
        ev,
        ["event_type"],
        "ts",
        {
            "sum_value": r6(F.sum("value")),
            "avg_value": r6(F.avg("value")),
            "n": F.count("*"),
        },
    )


@q(
    "q_distinct",
    """
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct run names / dates present (re-run detection,
    ref:database.py existing-records check)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@q(
    "q_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N report rows (ref:snowav/report/report.py tables).  Spark plans
    this as TakeOrderedAndProject — per-partition top-k then a k-row merge
    on the driver; no full sort, no shuffle of the table."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@q(
    "q_sort_multi",
    f"""
    SELECT l_returnflag AS zone, {_BAND_SQL} AS band,
           round(sum(l_quantity), 6) AS qty
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic band/basin ordering of report output
    (ref:database.py::collect sorts the pivot frame)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("zone"), _band())
        .agg(r6(F.sum("l_quantity")).alias("qty"))
        .orderBy("zone", "band")
    )


@q(
    "q_pivot",
    f"""
    SELECT {_BAND_SQL} AS band,
           round(sum(CASE WHEN l_returnflag = 'A'
                          THEN l_extendedprice * (1 - l_discount) END), 6) AS A,
           round(sum(CASE WHEN l_returnflag = 'N'
                          THEN l_extendedprice * (1 - l_discount) END), 6) AS N,
           round(sum(CASE WHEN l_returnflag = 'R'
                          THEN l_extendedprice * (1 - l_discount) END), 6) AS R
    FROM lineitem GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long → wide report frame: rows = bands, columns = basins
    (ref:database.py::collect output shape).  Explicit pivot values skip
    the extra distinct scan (the reference knows plotorder up front)."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return methods.pivot_frame(
        li.select(_band(), F.col("l_returnflag"), vol.alias("vol")),
        "band",
        "l_returnflag",
        ["A", "N", "R"],
        r6(F.sum("vol")),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end slice the driver smoke-checks (SURVEY §7 phase 0):
    scan → filter → band digitize → ROLLUP zonal stats → broadcast dim join
    → ordered report frame.  Exercises scan/filter/project/band/agg/rollup/
    join/sort in one plan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    enriched = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    banded_rollup = banded.zonal_stats(
        enriched,
        F.col("n_name"),
        _band(),
        {
            "swe_vol": r6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ),
            "mean_depth": r6(F.avg("l_quantity")),
            "n_px": F.count("*"),
        },
        rollup=True,
    )
    return banded_rollup.orderBy(
        F.col("zone").asc_nulls_last(), F.col("band").asc_nulls_last()
    )
