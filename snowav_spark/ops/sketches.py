"""Mergeable sketch rollups (Apache DataSketches via Spark 4 built-ins):
HLL distinct counting, Theta set algebra, KLL quantiles (EXT — the
"novel sketch" operator class; no reference analog, the reference counts
exactly on driver-sized frames).

Why sketches at 100 TB: an exact distinct/quantile is a full shuffle of
the key column EVERY time the question is asked, and window variants
(rolling distinct, audience overlap) multiply that.  A sketch is a small
mergeable state: build it ONCE per (group, day) partition — map-side
combinable, linear scan — persist the binary column next to the rollup,
and answer any later union/intersection/quantile question from the
sketch table alone (KBs per group-day) without rescanning the corpus.
Estimates are engine-specific (rows-only in the contract; the exact
twins are q_rolling_active / q_distinct / q_percentiles), with
relative-error bounds asserted against the exact operators in tests.

All functions are JVM aggregates — no UDFs, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    df: DataFrame, ts: str, key: str, lg_k: int = 12
) -> DataFrame:
    """Per-day HLL sketch of distinct ``key`` values — the persistable
    incremental-rollup state.  One map-side-combined aggregate; the
    output is |days| rows of ≤ 2^lg_k-byte binaries, appendable per
    ingest batch and unionable ever after (no corpus rescan).
    lg_k=12 → ~1.6% relative standard error."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.date_trunc("day", F.col(ts)).cast("date").alias("day"))
        .agg(F.hll_sketch_agg(F.col(key), F.lit(lg_k)).alias("sketch"))
    )


def rolling_distinct_approx(
    daily: DataFrame, days: int = 7
) -> DataFrame:
    """Rolling N-day distinct estimate from the per-day sketch table —
    the sketch twin of windows.rolling_active, but its input is |days|
    sketch rows instead of the corpus: each day-sketch is fanned out to
    the ≤N window days it supports (same bounded sequence/explode shape,
    now over KB-sized rows) and unioned per day.  Estimates only; union
    is lossless for HLL (no accuracy decay from merging)."""
    obs = daily.select("day").distinct()
    spread = daily.select(
        "sketch",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), days - 1))
        ).alias("day"),
    )
    clipped = spread.join(F.broadcast(obs), "day", "left_semi")
    return clipped.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "active_users_est"
        )
    )


def total_distinct_approx(daily: DataFrame) -> DataFrame:
    """Global distinct estimate from the stored day sketches — one scan
    of the sketch table, zero corpus access."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est")
    )


def segment_overlap(
    df: DataFrame, key: str, segment: str, a: str, b: str
) -> DataFrame:
    """Audience set algebra via Theta sketches: |A|, |B|, |A ∩ B|,
    |A \\ B| of the distinct ``key`` sets in segments ``a`` and ``b``
    (e.g. viewers ∩ purchasers).  HLL cannot intersect; Theta keeps a
    key sample so intersection/difference stay estimable.  One scan
    builds both sketches (conditional aggregates — no self-join, no
    second pass); the algebra happens on two driver-sized binaries."""
    sk = df.filter(F.col(key).isNotNull()).agg(
        F.theta_sketch_agg(
            F.when(F.col(segment) == a, F.col(key))
        ).alias("_sa"),
        F.theta_sketch_agg(
            F.when(F.col(segment) == b, F.col(key))
        ).alias("_sb"),
    )
    return sk.select(
        F.theta_sketch_estimate("_sa").alias("n_a"),
        F.theta_sketch_estimate("_sb").alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("_sa", "_sb")
        ).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_difference("_sa", "_sb")
        ).alias("n_only_a"),
    )


def grouped_quantile_sketches(
    df: DataFrame, group: str, value: str, k: int = 200
) -> DataFrame:
    """Per-group KLL quantile sketch over a DOUBLE column — the
    mergeable state for later quantile queries (persist per group-day,
    merge across any slice).  k=200 → ~1% rank error."""
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(group)
        .agg(
            F.kll_sketch_agg_double(
                F.col(value).cast("double"), F.lit(k)
            ).alias("qsketch")
        )
    )


def quantiles_from_sketches(
    sketches: DataFrame, group: str, qs: list[float]
) -> DataFrame:
    """Evaluate quantiles per group from stored KLL sketches; to answer
    for a coarser grouping, merge first with kll_sketch_merge_double."""
    out = sketches.select(
        group,
        *[
            F.kll_sketch_get_quantile_double("qsketch", F.lit(q)).alias(
                f"p{int(q * 100)}"
            )
            for q in qs
        ],
    )
    return out


def daily_frequency_sketches(
    df: DataFrame,
    ts: str,
    key: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-day Count-Min sketch of ``key`` frequencies — the mergeable
    heavy-hitter state completing the sketch suite (HLL: distinct,
    Theta: set algebra, KLL: quantiles, CMS: frequencies).  One
    map-side-combined JVM aggregate per day; each row is a
    ceil(e/eps) × ceil(ln(1/(1-conf))) counter grid (~2.7 k counters at
    the defaults) that answers "how often did X occur" for ANY later
    x without rescanning — overestimates only, by ≤ eps·N with
    probability ``confidence``.

    All sketches MUST share (eps, confidence, seed): CMS merge is exact
    counter addition only across identically-shaped grids (enforced by
    the JVM library at merge time)."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.date_trunc("day", F.col(ts)).cast("date").alias("day"))
        .agg(
            F.count_min_sketch(
                F.col(key), F.lit(eps), F.lit(confidence), F.lit(seed)
            ).alias("cms")
        )
    )


def frequency_estimates(spark, sketches: DataFrame, keys: list) -> list:
    """Merge stored CMS blobs and estimate each key's total frequency.

    Spark ships no SQL-side CMS reader, so evaluation decodes the
    binary column through the JVM sketch library
    (org.apache.spark.util.sketch.CountMinSketch) on the DRIVER — the
    right side of the driver-size line: the sketch table is |days| rows
    of KB blobs (the corpus never moves), and merge is exact counter
    addition, so merged-then-estimate equals one-shot-then-estimate
    bit-for-bit (pinned by test).  Returns [(key, estimate), ...]."""
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for row in sketches.select("cms").collect():
        sk = jcms.readFrom(bytes(row.cms))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    if merged is None:
        return [(k, 0) for k in keys]
    return [(k, merged.estimateCount(k)) for k in keys]
