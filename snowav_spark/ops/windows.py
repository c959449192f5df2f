"""Window/time-series operators — cumulative accumulation, day-over-day
deltas, moving averages, ranking, sessionization, tumbling/sliding windows.

Reference parity (SURVEY.md §2.5/§2.7): the reference computes all of these
in pandas on driver-sized frames (``cumsum`` in basin_total.py, diffs in
diagnostics.py).  Here they are Spark window functions over *pre-aggregated*
daily frames: the expensive reduction (raw rows → one row per day per group)
is a hash aggregate with map-side combine, and only the tiny daily frame
flows into the sorted window — so the sort that windows require never sees
the raw 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_then_window(
    df: DataFrame,
    ts: str,
    groups: list[str],
    value: str,
) -> DataFrame:
    """Shared first stage: reduce raw rows to (day, groups, sum) — the only
    pass over the big table."""
    day = F.date_trunc("day", F.col(ts)).cast("date").alias("day")
    return df.groupBy(day, *[F.col(g) for g in groups]).agg(
        F.sum(value).alias("_s")
    )


# The engine's ONE fixed-point sum convention (shared by contract.msum /
# msum_sql, the windowed sums below, and every oracle that needs an
# order-independent money-scale sum).  Change it HERE only — a clamp or
# scale that drifts between any Spark/SQL pair is an instant engine
# divergence.
FIXED_POINT_SCALE = 1_000_000
# Per-row domain bound: beyond this the micro-unit value overflows int64
# (DuckDB's BIGINT cast throws, Spark's floor-to-long wraps).
FIXED_POINT_DOMAIN = 9.2e12


def fixed_micros(col: Column) -> Column:
    """Per-row fixed-point micro-units: floor(x·1e6) as decimal(38,0).

    The contract's msum convention (contract.msum) applied at the row
    level so it can feed *windowed* sums: every engine floors the same
    double identically, the integer accumulation is exact (order- and
    partitioning-independent), and one final int→double conversion
    rounds the same way everywhere.  |x| ≥ FIXED_POINT_DOMAIN and NaN
    map to NULL in both engines (NaN compares false here everywhere)."""
    return F.when(
        F.abs(col) < FIXED_POINT_DOMAIN, F.floor(col * FIXED_POINT_SCALE)
    ).cast("decimal(38,0)")


def fixed_micros_sql(expr: str) -> str:
    """DuckDB twin of :func:`fixed_micros` — keep the pair adjacent so
    the clamp/scale can never drift apart."""
    return (
        f"CASE WHEN abs({expr}) < {FIXED_POINT_DOMAIN!r} THEN "
        f"cast(floor(({expr}) * {FIXED_POINT_SCALE}) AS BIGINT) END"
    )


def fixed_point_mean(col: Column) -> Column:
    """Bit-deterministic mean: exact micro-unit integer sum ÷ exact count
    of in-domain rows, then exactly two IEEE double ops (÷scale, ÷n) that
    every engine executes identically.  Out-of-domain rows (|x| ≥
    FIXED_POINT_DOMAIN, NaN) are NULL under fixed_micros and fall out of
    both the sum and the count, so the mean is over the same row set in
    both engines.  All-out-of-domain groups yield NULL (NULL sum
    propagates)."""
    fx = fixed_micros(col)
    return (F.sum(fx).cast("double") / float(FIXED_POINT_SCALE)) / F.count(fx)


def fixed_point_mean_sql(expr: str) -> str:
    """DuckDB twin of :func:`fixed_point_mean` — identical op sequence:
    exact HUGEINT sum → one correctly-rounded cast to double → ÷scale →
    ÷count (left-associative, same two IEEE divisions as Spark)."""
    fx = fixed_micros_sql(expr)
    return (
        f"cast(sum({fx}) AS DOUBLE) / {FIXED_POINT_SCALE}.0 / count({fx})"
    )


def cumulative(df: DataFrame, ts: str, groups: list[str], value: str) -> DataFrame:
    """Running total across days (ref:snowav/plotting/basin_total.py uses
    pandas cumsum on the collected frame).

    Fixed-point form: a running DOUBLE sum re-executes the float
    additions in window order, so two engines (or two partitionings)
    can drift a ulp per prefix and round(,6) stops absorbing it once
    the running total passes ~1e7.  Summing exact micro-unit integers
    and converting once at the end is bit-deterministic at any
    magnitude (fuzz_fixtures float_mag variant)."""
    day = F.date_trunc("day", F.col(ts)).cast("date").alias("day")
    daily = df.groupBy(day, *[F.col(g) for g in groups]).agg(
        F.sum(fixed_micros(F.col(value))).alias("_m")
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        *groups,
        (F.sum("_m").over(w).cast("double") / float(FIXED_POINT_SCALE)).alias(
            "cum_value"
        ),
    )


def lag_delta(df: DataFrame, ts: str, value: str) -> DataFrame:
    """Day-over-day change — daily melt = SWE(t) − SWE(t−1)
    (ref:snowav/plotting/basin_total.py / diagnostics.py)."""
    daily = daily_then_window(df, ts, [], value)
    w = Window.orderBy("day")
    return daily.select(
        "day",
        F.round(F.col("_s") - F.lag("_s").over(w), 6).alias("delta"),
    )


def moving_average(
    df: DataFrame, ts: str, groups: list[str], value: str, days: int = 7
) -> DataFrame:
    """Smoothed diagnostics series (ref:snowav/plotting/diagnostics.py).

    ROWS frame over the daily series — equivalent to a day-RANGE frame here
    because the daily aggregation guarantees one row per day per group.
    """
    daily = daily_then_window(df, ts, groups, value)
    w = Window.partitionBy(*groups).orderBy("day").rowsBetween(-(days - 1), 0)
    return daily.select(
        "day", *groups, F.round(F.avg("_s").over(w), 6).alias(f"ma{days}")
    )


def rank_within(
    df: DataFrame, part: list[str], order: list[Column], out: str = "rnk"
) -> DataFrame:
    """Ranked report rows (ref:snowav/report/report.py tables).  Callers
    must pass a deterministic total order (round floats, add tie-breaks)."""
    w = Window.partitionBy(*part).orderBy(*order)
    return df.withColumn(out, F.rank().over(w))


def sessionize(
    df: DataFrame,
    user: str,
    ts: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch sessionization with a gap timeout — the batch-expressible twin
    of Structured Streaming's ``session_window`` (SURVEY §2.7).

    Classic gaps-and-islands: flag rows whose gap from the previous event
    exceeds the timeout, running-sum the flags into session ids.  Both the
    lag and the cumulative sum share ONE window partitioning (user, ordered
    by ts) → a single shuffle + per-partition sort.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    prev = F.lag(ts).over(w)
    # Interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ inputs
    # (unix_micros rejects NTZ, and the fixture's parquet physical type has
    # flipped between the two across regenerations).  Microsecond interval
    # so fractional gap_minutes (1.5 → 90 s, 0.005 → 300 ms) keep their
    # exact threshold — same precision as the event time itself.
    gap = F.expr(
        f"INTERVAL {int(round(gap_minutes * 60 * 1_000_000))} MICROSECOND"
    )
    new_session = F.when(
        prev.isNull() | ((F.col(ts) - prev) > gap),
        1,
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(new_session).over(w))


def tumbling(
    df: DataFrame, ts: str, width: str, groups: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Tumbling-window aggregation via ``F.window`` — the same call shape
    works on a streaming DataFrame with a watermark (snowav_spark.streaming);
    in batch it compiles to a plain hash aggregate on the window bucket."""
    exprs = [c.alias(n) for n, c in aggs.items()]
    out = df.groupBy(F.window(ts, width), *groups).agg(*exprs)
    # NTZ: a raw TIMESTAMP (LTZ) column collects in the JVM's default
    # timezone regardless of spark.sql.session.timeZone; NTZ pins the wall
    # time (session tz is UTC) so results are host-tz-independent.
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("ws"),
        *groups,
        *[n for n in aggs],
    )


def sliding(
    df: DataFrame,
    ts: str,
    width: str,
    slide: str,
    groups: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding-window aggregation (``F.window`` with a slide): each row
    lands in width/slide buckets; Spark expands them JVM-side (no UDF,
    no explode of user code)."""
    exprs = [c.alias(n) for n, c in aggs.items()]
    out = df.groupBy(F.window(ts, width, slide), *groups).agg(*exprs)
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("ws"),
        *groups,
        *[n for n in aggs],
    )


def retention_daily(df: DataFrame, ts: str, user: str) -> DataFrame:
    """Next-day retention: per day, how many active users were also
    active the previous day — the cohort/engagement diagnostic of an
    events pipeline.

    Shape at 100 TB: distinct (user, day) collapses the raw stream
    map-side, then ONE window over the per-user day sequence (lag) —
    a single shuffle on the user key, no self-join, no second pass —
    and a small hash aggregate on day.  Counts are exact integers, so
    the output is hash-stable across engines and partitionings.
    """
    d = df.select(
        F.col(user), F.date_trunc("day", F.col(ts)).cast("date").alias("day")
    ).distinct()
    prev = F.lag("day").over(Window.partitionBy(user).orderBy("day"))
    flagged = d.withColumn(
        "was_active_yesterday",
        F.when(F.datediff(F.col("day"), prev) == 1, 1).otherwise(0),
    )
    return flagged.groupBy("day").agg(
        F.count("*").alias("active"),
        F.sum("was_active_yesterday").alias("retained"),
    )


def cohort_matrix(df: DataFrame, ts: str, user: str) -> DataFrame:
    """Cohort activity matrix: users grouped by their first active day
    (the cohort), counted at each day-offset they return — the classic
    cohort-retention triangle.

    Shape at 100 TB: distinct (user, day), then the cohort day is an
    unbounded ``min`` window over the SAME user partitioning — one
    shuffle, no join back — and the triangle is a small hash aggregate
    on (cohort_day, offset).  Exact integer counts: hash-stable.
    """
    d = df.select(
        F.col(user), F.date_trunc("day", F.col(ts)).cast("date").alias("day")
    ).distinct()
    cohort = F.min("day").over(Window.partitionBy(user))
    return (
        d.select(
            cohort.alias("cohort_day"),
            F.datediff(F.col("day"), cohort).cast("long").alias("offset_days"),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count("*").alias("n_users"))
    )


def rolling_active(
    df: DataFrame, ts: str, user: str, days: int = 7
) -> DataFrame:
    """Trailing-N-day distinct active users per day (rolling WAU/MAU).

    Exact rolling COUNT(DISTINCT) is not a window function in any SQL
    engine (distinct state per frame), and the naive form is a range
    self-join between the full activity table and the day dimension.
    Scale shape here: raw events collapse to distinct (user, day)
    map-side FIRST (≪ raw rows), each user-day is then fanned out to the
    ≤``days`` window-days it supports (a bounded ×N ``sequence``+
    ``explode`` on the already-collapsed table — JVM-side, no UDF), and
    one distinct+count per day finishes it.  The day dimension used to
    clip the fan-out to observed days is broadcast (it is tiny by
    construction).  Counts are exact integers → hash-stable.
    """
    # NULL user is not a user: filtered BEFORE the day collapse, so an
    # "observed day" means a day with ≥1 real user — a day whose events
    # are all NULL-user emits no row.  The SQL twin must apply the same
    # WHERE user_id IS NOT NULL in its innermost CTE (count(DISTINCT)
    # alone would still emit such days, with other users' window
    # counts).  NULL ts needs no filter: a NULL day survives no
    # BETWEEN / no sequence() fan-out in either engine.
    ud = (
        df.filter(F.col(user).isNotNull())
        .select(
            F.col(user),
            F.date_trunc("day", F.col(ts)).cast("date").alias("day"),
        )
        .distinct()
    )
    obs = ud.select("day").distinct()
    spread = ud.select(
        F.col(user),
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), days - 1))
        ).alias("day"),
    )
    clipped = spread.join(F.broadcast(obs), "day", "left_semi").distinct()
    return clipped.groupBy("day").agg(F.count("*").alias("active_users"))


def transition_counts(
    df: DataFrame, user: str, ts: str, typ: str, tiebreak: str
) -> DataFrame:
    """Per-user event-type transition matrix (Markov edge counts): for
    each consecutive pair of events in a user's timeline, count
    (from_type → next_type).  One window shuffle keyed on the user, then
    a small hash aggregate on the (from, to) pair — the raw stream is
    shuffled exactly once.  Ordering ties broken by ``tiebreak`` so the
    sequence (and therefore the counts) is engine-reproducible.
    """
    # NULL order keys pinned LAST: Spark's ASC default is nulls FIRST,
    # DuckDB's is nulls LAST — an unpinned sort would hand the two
    # engines different event sequences the moment a fixture grows a
    # NULL timestamp.
    w = Window.partitionBy(user).orderBy(
        F.col(ts).asc_nulls_last(), F.col(tiebreak).asc_nulls_last()
    )
    nxt = df.select(
        F.col(typ).alias("from_type"),
        F.lead(typ).over(w).alias("next_type"),
    )
    return (
        nxt.filter(F.col("next_type").isNotNull())
        .groupBy("from_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


def topk_per_group(
    df: DataFrame, group: str, order_col: str, k: int, tiebreak: str
) -> DataFrame:
    """Top-k rows per group by ``order_col`` descending (ties broken by
    ``tiebreak`` ascending, NULL order keys last — pinned explicitly so
    every engine agrees).  row_number + filter: one shuffle on the group
    key, per-group sort bounded by the group's size; with AQE a skewed
    group splits across reducers only at the exchange, the rank itself
    needs the group co-located — for pathological single-key skew,
    pre-filter with an approximate per-group threshold first.
    Adds ``rnk`` (1-based)."""
    w = Window.partitionBy(group).orderBy(
        F.col(order_col).desc_nulls_last(),
        F.col(tiebreak).asc_nulls_last(),
    )
    return df.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def gap_fill_daily(
    df: DataFrame, ts: str, group: str, value: str
) -> DataFrame:
    """Daily series per group with calendar gaps filled: build each
    group's full day spine (min..max observed day), left-join the
    observed daily aggregate onto it, and forward-fill the last
    observation into the holes — pandas ``resample('D').ffill()`` as a
    distributed plan.

    Scale shape: the raw table collapses to (group, day) map-side first;
    the spine is generated from a |groups|-row bounds aggregate via
    ``sequence``+``explode`` (JVM-side, bounded by the calendar span,
    NOT by raw rows); the fill is one window over the tiny daily frame
    sharing the join's (group) partitioning.  Days before a group's
    first observation keep NULL (nothing to carry forward).
    Output: (group, day, mean_value nullable, filled_value)."""
    daily = (
        df.groupBy(
            F.col(group),
            F.date_trunc("day", F.col(ts)).cast("date").alias("day"),
        )
        .agg(F.round(F.avg(value), 6).alias("mean_value"))
    )
    bounds = daily.groupBy(group).agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    spine = bounds.select(
        group,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("day"),
    )
    joined = spine.join(daily, [group, "day"], "left")
    w = Window.partitionBy(group).orderBy("day")
    return joined.withColumn(
        "filled_value", F.last("mean_value", ignorenulls=True).over(w)
    )


def first_per_burst(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap_minutes: float,
    tiebreak: str,
) -> DataFrame:
    """Batch burst-dedup: keep only the FIRST event of each burst — rows
    with the same ``keys`` arriving within ``gap_minutes`` of the
    previous kept-or-dropped row collapse to their opener (client
    retries, double-clicks, sensor chatter).  The batch twin of
    streaming's dropDuplicatesWithinWatermark, sharing sessionize's
    gaps-and-islands shape: one window partitioning on the keys, a lag,
    and a codegen interval comparison (µs-exact, like sessionize).
    NULL order keys pinned LAST in both dialects."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts).asc_nulls_last(), F.col(tiebreak).asc_nulls_last()
    )
    prev = F.lag(ts).over(w)
    gap = F.expr(
        f"INTERVAL {int(round(gap_minutes * 60 * 1_000_000))} MICROSECOND"
    )
    return (
        df.withColumn(
            "_opener", prev.isNull() | ((F.col(ts) - prev) > gap)
        )
        .filter("_opener")
        .drop("_opener")
    )


def scd2_segments(
    df: DataFrame,
    key: str,
    ts: str,
    attr: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change/event log:
    per ``key`` ordered by ``ts``, consecutive rows with the same
    ``attr`` collapse into one validity segment — the CDC→dimension
    build every warehouse pipeline runs.

    Gaps-and-islands, fully key-partitioned (no global window): a lag
    compare marks attribute changes (NULL-safe: NULL→NULL is NOT a
    change), a running count of change marks numbers the segments, and
    one aggregate per (key, segment) takes valid_from/n_events;
    valid_to = the next segment's valid_from via lead (NULL = current).
    Every window partitions on ``key``, so a 100 TB log shuffles once
    on the key and each group sorts locally — skewed keys split only at
    the exchange (AQE), never serialize globally.  NULL order keys
    pinned LAST in both dialects.

    Output: (key, attr, valid_from, valid_to nullable, n_events).
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts).asc_nulls_last(), F.col(tiebreak).asc_nulls_last()
    )
    seg = (
        df.withColumn(
            "_chg",
            F.when(
                F.lag(attr).over(w).eqNullSafe(F.col(attr)), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("_seg", F.sum("_chg").over(w))
        .groupBy(key, "_seg")
        .agg(
            # attr is constant within a segment; min() (not first()) so
            # the pick is order-independent and matches the oracle
            F.min(attr).alias(attr),
            F.min(ts).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key).orderBy(F.col("_seg").asc())
    return seg.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    ).select(key, attr, "valid_from", "valid_to", "n_events")
