"""Join operators — dim enrichment, run comparison, validation metrics,
as-of matching, semi/anti incremental checks, nearest-point extraction.

Reference parity (SURVEY.md §2.4): the reference does all of these as
SQLAlchemy relationship loads or pandas merges on driver-sized frames.
Here each is a declarative join whose physical strategy Catalyst/AQE picks:
tiny dims broadcast (BroadcastHashJoin), big-big equi-joins sort-merge with
AQE skew splitting, and the two genuinely non-equi shapes (as-of, nearest
point) are expressed as equi-join + ``min_by`` over a composite ordering
struct — one shuffle, no window sort, no cross product beyond the
candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import fixed_point_mean


def enrich_dims(
    fact: DataFrame, dims: list[tuple[DataFrame, Column]], broadcast: bool = True
) -> DataFrame:
    """Star-schema enrichment: fact ⋈ dim₁ ⋈ dim₂ … with explicit broadcast.

    Reference parity: Results × RunMetadata × Basin lookups
    (ref:snowav/database/database.py).  Dims at 100 TB scale are still tiny
    (basins, runs, units) — broadcasting keeps the fact table un-shuffled.
    """
    out = fact
    for dim, cond in dims:
        out = out.join(F.broadcast(dim) if broadcast else dim, cond)
    return out


def compare_runs(
    df: DataFrame,
    key: str,
    run_col: str,
    run_a: str,
    run_b: str,
    value: Column,
) -> DataFrame:
    """Compare two model runs on a shared key
    (ref:snowav/plotting/compare_runs.py).

    Aggregates each run *before* the join, so the self-join operands are
    one-row-per-key — at scale this is agg(shuffle on key) twice + a
    co-partitioned join on the same key, which AQE plans without an extra
    shuffle (both sides already hash-partitioned by the groupBy key).
    """
    a = (
        df.filter(F.col(run_col) == run_a)
        .groupBy(key)
        .agg(F.round(F.sum(value), 6).alias("v_cur"))
    )
    b = (
        df.filter(F.col(run_col) == run_b)
        .groupBy(key)
        .agg(F.round(F.sum(value), 6).alias("v_prev"))
    )
    return a.join(b, key).select(
        key, "v_cur", "v_prev", F.round(F.col("v_cur") - F.col("v_prev"), 6).alias("delta")
    )


def validation_metrics(
    model: DataFrame,
    obs: DataFrame,
    on: list[str],
    model_val: str,
    obs_val: str,
    groups: list[str],
) -> DataFrame:
    """Model-vs-observation validation: bias / MAE / RMSE per group
    (ref:snowav/plotting/stn_validate.py joins pixel series to station
    observations and plots residuals).

    Equi-join on (station, date)-like keys then ONE aggregation computing
    all three metrics — a single shuffle; the reference loops stations in
    Python.

    Every mean here is a fixed-point mean (exact micro-unit integer sum ÷
    exact count, windows.fixed_micros): a plain double avg re-executes the
    float additions in partition order, so at |x|≈1e13 two engines drift
    past what round(,6) absorbs (SCALE.md float_mag residual, fixed r06).
    Rows whose value falls outside the fixed-point domain (|x| ≥ 9.2e12 or
    NaN) map to NULL identically in both engines and drop out of that
    metric's sum AND count.
    """
    diff = F.col(model_val) - F.col(obs_val)
    joined = model.join(obs, on)
    # `+ 0.0` normalizes IEEE signed zero: when a metric is mathematically
    # zero, rounding can yield ±0.0 with engine-dependent sign and
    # -0.0 != 0.0 under a bitwise value hash.  -0.0 + 0.0 == +0.0.
    zn = lambda c: c + F.lit(0.0)  # noqa: E731
    fpmean = lambda c: fixed_point_mean(c)  # noqa: E731
    return joined.groupBy(*groups).agg(
        zn(F.round(fpmean(diff), 6)).alias("bias"),
        zn(F.round(fpmean(F.abs(diff)), 6)).alias("mae"),
        zn(F.round(F.sqrt(fpmean(diff * diff)), 6)).alias("rmse"),
        F.count("*").alias("n"),
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_key: str,
    distance: Column,
    tiebreak: Column,
    payload: dict[str, Column],
    tolerance: int | None = None,
) -> DataFrame:
    """As-of / nearest-date join (ref:snowav/plotting/flt_image_change.py
    matches each ASO flight date to the nearest model output date).

    Spark SQL has no native ASOF JOIN; the scalable composition is
    equi-join on the coarse key + ``min_by(payload, struct(distance,
    tiebreak))`` — one hash aggregation instead of a per-group sort, and
    the struct tie-break keeps the pick deterministic across engines.

    ``tolerance`` bounds the match distance; keys whose candidates are
    all out of tolerance simply drop out of the grouped result (see
    :func:`asof_within` for the unmatched-keys-preserved variant).
    """
    matched = left.join(right, on)
    if tolerance is not None:
        matched = matched.filter(distance <= tolerance)
    key = F.struct(distance.alias("d"), tiebreak.alias("t"))
    aggs = [F.min_by(col, key).alias(name) for name, col in payload.items()]
    return matched.groupBy(left_key).agg(*aggs)


def missing_keys(
    incoming: DataFrame, existing: DataFrame, on: Column
) -> DataFrame:
    """Anti-join: incoming rows not yet in the store — the reference's
    incremental re-run check (ref:snowav/database/database.py
    existing-records scan drives 'skip dates already processed')."""
    return incoming.join(existing, on, "left_anti")


def present_keys(
    incoming: DataFrame, existing: DataFrame, on: Column
) -> DataFrame:
    """Semi-join twin of :func:`missing_keys`."""
    return incoming.join(existing, on, "left_semi")


def nearest_point(
    df: DataFrame,
    targets: DataFrame,
    groups: list[str],
    value: str,
    target: str,
    tiebreak: str,
) -> DataFrame:
    """Nearest-value extraction per (group, target)
    (ref:snowav/plotting/point_values.py pulls the grid value at the pixel
    nearest each station coordinate).

    The target list is tiny → ``crossJoin(broadcast(targets))`` is a
    broadcast nested-loop that never shuffles the big side; the pick is a
    ``min_by`` over (|value − target|, tiebreak).

    NULL measurement rows are dropped: they have no distance, and the
    engines order a NULL sort key oppositely (Spark struct-min puts NULL
    first, DuckDB ORDER BY puts it last — fuzz_fixtures nulls variant),
    so keeping them makes the "nearest" pick engine-dependent.
    """
    joined = df.filter(F.col(value).isNotNull()).crossJoin(
        F.broadcast(targets)
    )
    dist = F.abs(F.col(value) - F.col(target))
    key = F.struct(dist.alias("d"), F.col(tiebreak).alias("t"))
    return joined.groupBy(*groups, target).agg(
        F.min_by(F.col(value), key).alias("nearest_value")
    )


def funnel_stages(
    df: DataFrame,
    user: str,
    type_col: str,
    ts: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel conversion: one row of per-stage user counts, where
    a user reaches stage k only with an event of type ``stages[k]``
    strictly AFTER their stage-k−1 time (first qualifying occurrence).

    Shape at 100 TB: per stage one filtered aggregate (map-side combined
    min) joined to the previous stage's (user, time) frame — every
    groupBy/join keys on the user column, so AQE plans one co-partitioned
    exchange chain and the stage frames shrink monotonically.  No window
    over raw events, no self-join of the full table.
    """
    base = df.select(F.col(user), F.col(type_col), F.col(ts))
    cur = (
        base.filter(F.col(type_col) == stages[0])
        .groupBy(user)
        .agg(F.min(ts).alias("t0"))
    )
    frames = [cur]
    for k, stage in enumerate(stages[1:], start=1):
        cur = (
            base.filter(F.col(type_col) == stage)
            .join(cur.select(user, f"t{k - 1}"), user)
            .filter(F.col(ts) > F.col(f"t{k - 1}"))
            .groupBy(user)
            .agg(F.min(ts).alias(f"t{k}"))
        )
        frames.append(cur)
    joined = frames[0]
    for k in range(1, len(frames)):
        joined = joined.join(frames[k].select(user, f"t{k}"), user, "left")
    aggs = [F.count("*").alias("n_stage0")] + [
        F.count(f"t{k}").alias(f"n_stage{k}") for k in range(1, len(stages))
    ]
    return joined.agg(*aggs)


def asof_within(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_key: str,
    distance: Column,
    tiebreak: Column,
    payload: dict[str, Column],
    tolerance: int,
) -> DataFrame:
    """Tolerance-bounded as-of join: like :func:`asof_nearest` but a match
    only counts within ``tolerance`` of the anchor, and LEFT keys with no
    in-tolerance candidate are KEPT with null payload (pandas
    ``merge_asof(tolerance=...)`` semantics — the caller sees which
    anchors went unmatched instead of silently losing them).

    Composes :func:`asof_nearest` (same equi-join + min_by shape, with
    its tolerance bound) plus a left join of the (small) per-key result
    back onto the distinct key set."""
    best = asof_nearest(
        left, right, on, left_key, distance, tiebreak, payload, tolerance
    )
    return left.select(left_key).distinct().join(best, left_key, "left")


def lookback_count(
    anchors: DataFrame,
    lookups: DataFrame,
    keys: list[str],
    anchor_ts: str,
    lookup_ts: str,
    window_seconds: int,
    id_cols: list[str],
) -> DataFrame:
    """Bucketized interval (range) join: for every anchor row, count
    lookup rows with the same keys whose timestamp falls in
    ``[anchor_ts − window, anchor_ts)`` — the error-attribution /
    "events preceding a conversion" shape.

    Spark has no native range join, and the naive form (equi-join on
    keys + theta predicate on time) degenerates to a per-key cartesian
    product — quadratic in the hottest key.  The scale-safe expression
    is the classic **band join**: bucket both sides by
    ``floor(epoch / window)``; a half-open window of length ``window``
    can only overlap TWO consecutive buckets, so each anchor probes
    exactly buckets b−1 and b.  The join becomes an equi-join on
    (keys…, bucket) — hash-shuffled, AQE-skew-splittable — whose
    candidate set per anchor is bounded by two buckets of same-key
    traffic, never the whole key history.  The exact interval predicate
    then filters candidates, and a map-side-combinable integer count
    aggregates per anchor.

    Rows with NULL keys or NULL timestamps count zero matches in both
    engines (NULL equi-keys never join; NULL comparisons are false).
    The comparison runs on integer MICROSECOND epochs (``unix_micros``),
    never second-truncated ``unix_timestamp``: fixture timestamps carry
    sub-second precision, and truncating would count boundary rows
    differently from an oracle comparing full-precision timestamps
    (found in review — both divergence directions reproduce).
    """
    window_us = int(window_seconds) * 1_000_000
    a_ep = F.unix_micros(F.col(anchor_ts).cast("timestamp"))
    l_ep = F.unix_micros(F.col(lookup_ts).cast("timestamp"))
    a_bk = F.floor(a_ep / window_us)
    look = lookups.select(
        *[F.col(k) for k in keys],
        l_ep.alias("_le"),
        F.floor(l_ep / window_us).alias("_bk"),
    )
    probe = anchors.select(
        *[F.col(c) for c in id_cols],
        *[F.col(k) for k in keys],
        a_ep.alias("_ae"),
        F.explode(F.array(a_bk - 1, a_bk)).alias("_bk"),
    )
    hit = (F.col("_le") >= F.col("_ae") - window_us) & (
        F.col("_le") < F.col("_ae")
    )
    joined = probe.join(look, [*keys, "_bk"], "left")
    return joined.groupBy(*id_cols).agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_in_window")
    )


def lookback_pairs(
    anchors: DataFrame,
    lookups: DataFrame,
    keys: list[str],
    anchor_ts: str,
    lookup_ts: str,
    window_seconds: int,
    anchor_cols: list[str],
    lookup_cols: list[str],
) -> DataFrame:
    """The band-join candidate stage of :func:`lookback_count`, returning
    the matched (anchor, lookup) PAIRS instead of counts — the input
    shape for attribution, enrichment, and per-pair credit splitting.

    Same scale argument: bucket both sides by ``floor(epoch/window)``,
    each anchor probes exactly two consecutive buckets (a half-open
    window of length ``window`` cannot span three), the join is a pure
    equi-join on (keys…, bucket), and the exact µs-epoch interval
    predicate ``[anchor − window, anchor)`` filters candidates.  Output
    carries ``anchor_cols`` + ``lookup_cols`` + the integer µs epochs
    ``_ae``/``_le`` for downstream exact time math.  Column names in
    ``anchor_cols``/``lookup_cols`` must be disjoint (caller-controlled).
    """
    window_us = int(window_seconds) * 1_000_000
    a_ep = F.unix_micros(F.col(anchor_ts).cast("timestamp"))
    l_ep = F.unix_micros(F.col(lookup_ts).cast("timestamp"))
    a_bk = F.floor(a_ep / window_us)
    look = lookups.select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in lookup_cols],
        l_ep.alias("_le"),
        F.floor(l_ep / window_us).alias("_bk"),
    )
    probe = anchors.select(
        *[F.col(c) for c in anchor_cols],
        *[F.col(k) for k in keys],
        a_ep.alias("_ae"),
        F.explode(F.array(a_bk - 1, a_bk)).alias("_bk"),
    )
    hit = (F.col("_le") >= F.col("_ae") - window_us) & (
        F.col("_le") < F.col("_ae")
    )
    return probe.join(look, [*keys, "_bk"], "inner").filter(hit).drop("_bk")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Approximate string join: match rows whose names are within
    ``max_dist`` edits — station/basin name reconciliation, entity
    resolution across feeds.  A direct theta-join on levenshtein() is a
    full cartesian product; this is the scale form:

    1. **block** on shared character trigrams (equi-join on the gram —
       linear shuffle; candidate pairs ≈ Σ df(g)² over grams, not n·m),
    2. **verify** candidates with the exact levenshtein predicate
       (codegen, both engines implement classic edit distance).

    Trigram blocking has no false negatives for strings longer than
    ~3·max_dist (an edit touches ≤3 trigrams, so ≤3·max_dist of the
    min(len)−2 grams can differ); for very short strings pad or lower
    max_dist.  ``max_df`` drops grams hot on EITHER side from BLOCKING
    only (stopword-ish prefixes shared by everything — a gram hot only
    in the big canonical corpus would otherwise still produce
    df_l·df_r candidate pairs) — that re-introduces possible false
    negatives, so an oracle-matched caller must apply the same cap on
    both sides.

    Every input role is aliased internally, so any combination of
    colliding names across the four columns (both keys "id", value ==
    other side's key, …) is legal; colliding OUTPUT names get l_/r_
    prefixes.  Output: (left_key, right_key, left_col, right_col,
    dist) under those resolved names.
    """
    def grams(df, key, col, kname):
        t = df.select(
            F.col(key).alias(kname), F.lower(F.col(col)).alias("_s")
        ).withColumn(
            "_g",
            F.explode(
                F.when(
                    F.length("_s") >= 3,
                    F.transform(
                        F.sequence(F.lit(1), F.length("_s") - 2),
                        lambda i: F.col("_s").substr(i, F.lit(3)),
                    ),
                ).otherwise(F.array(F.col("_s"))),
            ),
        )
        return t.select(kname, "_g").distinct()

    lg = grams(left, left_key, left_col, "_lk")
    rg = grams(right, right_key, right_col, "_rk")
    if max_df is not None:
        def hot_of(g):
            return (
                g.groupBy("_g")
                .agg(F.count("*").alias("_df"))
                .filter(F.col("_df") > max_df)
                .select("_g")
            )

        hot = hot_of(lg).union(hot_of(rg)).distinct()
        lg = lg.join(F.broadcast(hot), "_g", "left_anti")
        rg = rg.join(F.broadcast(hot), "_g", "left_anti")
    cands = lg.join(rg, "_g").select("_lk", "_rk").distinct()
    lf = left.select(
        F.col(left_key).alias("_lk"), F.col(left_col).alias("_lval")
    )
    rf = right.select(
        F.col(right_key).alias("_rk"), F.col(right_col).alias("_rval")
    )
    # resolve output-name collisions: equal pairs get l_/r_ prefixes,
    # then any residual key-vs-value clash prefixes the value column.
    out_lk, out_rk = left_key, right_key
    if left_key == right_key:
        out_lk, out_rk = f"l_{left_key}", f"r_{right_key}"
    out_lv, out_rv = left_col, right_col
    if left_col == right_col:
        out_lv, out_rv = f"l_{left_col}", f"r_{right_col}"
    taken = {out_lk, out_rk}
    while out_lv in taken:
        out_lv = "l_" + out_lv
    taken.add(out_lv)
    while out_rv in taken:
        out_rv = "r_" + out_rv
    return (
        cands.join(lf, "_lk")
        .join(rf, "_rk")
        .withColumn(
            "dist",
            F.levenshtein(F.lower(F.col("_lval")), F.lower(F.col("_rval"))),
        )
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("_lk").alias(out_lk),
            F.col("_rk").alias(out_rk),
            F.col("_lval").alias(out_lv),
            F.col("_rval").alias(out_rv),
            "dist",
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    ivl_id: str,
    ivl_start: str,
    ivl_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Point-in-interval (range-containment) join: every point row is
    matched to the intervals whose half-open ``[start, end)`` span
    contains its timestamp — maintenance windows over an event stream,
    ad campaigns over impressions, outage windows over telemetry.

    The naive theta-join is a cartesian product; this is the band-join
    generalization for ARBITRARY-LENGTH intervals: each interval
    explodes into the time buckets it covers (fan-out bounded by
    ceil(len/bucket)+1 — pick ``bucket_seconds`` near the typical
    interval length so most intervals emit 1-2 rows), points carry
    exactly one bucket, and the join becomes an equi-join on the bucket
    with the exact containment predicate filtering candidates.  Each
    (point, interval) candidate arises at most once — a point has ONE
    bucket and an interval lists each bucket once — so no dedup stage
    is needed.  Overlapping intervals multi-match by design.

    Microsecond-epoch comparisons end-exclusive; NULL timestamps and
    degenerate intervals (end ≤ start) match nothing in both engines.
    Output: all point columns + ``ivl_id``.
    """
    w_us = int(bucket_seconds) * 1_000_000
    s_ep = F.unix_micros(F.col(ivl_start).cast("timestamp"))
    e_ep = F.unix_micros(F.col(ivl_end).cast("timestamp"))
    ivl = (
        intervals.select(
            F.col(ivl_id), s_ep.alias("_s"), e_ep.alias("_e")
        )
        .filter(F.col("_e") > F.col("_s"))  # also guards desc sequence()
        .withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.floor(F.col("_s") / w_us),
                    F.floor((F.col("_e") - 1) / w_us),
                )
            ),
        )
    )
    p_ep = F.unix_micros(F.col(point_ts).cast("timestamp"))
    pts = points.withColumn("_pe", p_ep).withColumn(
        "_bk", F.floor(F.col("_pe") / w_us)
    )
    return (
        pts.join(ivl, "_bk")
        .filter((F.col("_pe") >= F.col("_s")) & (F.col("_pe") < F.col("_e")))
        .drop("_bk", "_pe", "_s", "_e")
    )
