"""Deterministic sampling and train/test splits for training-data
pipelines (EXT — no reference analog; the reference processes every pixel).

Random sampling (``df.sample``) is seed-and-partitioning dependent — a
re-run or repartition changes the sample.  Pipelines that must be
reproducible (and auditable) sample on a *content hash* instead: the
decision for a row depends only on its key.  md5 is used because it is
bit-identical in every engine (murmur3/xxhash are not), so the same split
can be recomputed anywhere — including the DuckDB oracle.

The md5-prefix trick: the first hex digits of md5(key) are uniform over
[0, 16^k); comparing them lexicographically against a threshold string
selects a deterministic fraction with NO numeric conversion (portable
across engines that disagree on hex→int casting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column, digits: int = 4) -> Column:
    """First `digits` hex chars of md5(key) — a uniform [0, 16^digits)
    label usable for sampling, splitting, and stratification."""
    return F.substring(F.md5(key.cast("string")), 1, digits)


def hash_sample(
    df: DataFrame, key: str, fraction: float, digits: int = 4
) -> DataFrame:
    """Keep ≈``fraction`` of rows, decided per-row by content hash.

    Threshold = the hex string at the fraction point of the [0, 16^d)
    space; a pure filter, pushed down like any predicate, shuffle-free.
    """
    if fraction >= 1.0:
        return df  # a full-space cut would be a (digits+1)-char string,
        # which compares lexicographically BELOW most prefixes — clamp.
    cut = format(max(int(fraction * (16 ** digits)), 0), f"0{digits}x")
    return df.filter(hash_bucket(F.col(key), digits) < F.lit(cut))


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.1, digits: int = 4
) -> DataFrame:
    """Label every row 'train' or 'test' deterministically by key hash —
    re-runs, repartitions, and other engines produce the identical split
    (the property that keeps eval sets leak-free across pipeline runs)."""
    if test_fraction >= 1.0:
        return df.withColumn("split", F.lit("test"))
    cut = format(max(int(test_fraction * (16 ** digits)), 0), f"0{digits}x")
    split = F.when(
        hash_bucket(F.col(key), digits) < F.lit(cut), F.lit("test")
    ).otherwise(F.lit("train"))
    return df.withColumn("split", split)


def expectations_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Data-quality expectations in ONE aggregation pass: each check is a
    boolean column expression counting violations (training pipelines gate
    ingestion on these).  Output: one row, one violation-count per check,
    plus total row count."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs, F.count("*").alias("n_rows"))


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column data profile in ONE aggregation pass: row count, nulls,
    exact distinct count, min and max (stringified so heterogeneous
    column types share an output schema) — the ingest-time profiling step
    of a training-data pipeline.

    One wide agg then an unpivot: Catalyst plans the multiple
    COUNT(DISTINCT)s as a single Expand-based pass over the data (one
    scan, map-side partials).  String casts are dialect-stable for
    int/string/date columns; profile floating-point columns through a
    rounded expression if oracle parity matters.
    """
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_val"),
            F.col(f"{c}__mx").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default: float = 0.0,
    digits: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-fraction (corpus rebalancing — e.g. downsample the dominant
    language, keep all of the rare ones).

    Same md5-prefix mechanism as hash_sample, so the decision is per-row
    content, reproducible across engines/re-runs/partitionings, and a
    pure filter (no shuffle, no sampleBy RNG).  The per-stratum cut is a
    small CASE chain — broadcast-free since it compiles into the
    predicate.
    """
    def cut(f: float) -> str:
        if f >= 1.0:
            return "g" * digits  # above every hex string → keep all
        return format(max(int(f * (16 ** digits)), 0), f"0{digits}x")

    expr = F.lit(cut(default))
    for val, frac in sorted(fractions.items()):
        expr = F.when(F.col(strata) == val, F.lit(cut(frac))).otherwise(expr)
    return df.filter(hash_bucket(F.col(key), digits) < expr)


def shuffle_key(key: Column, seed: str = "42") -> Column:
    """Deterministic shuffle key: md5(seed || '-' || key).  Uniform,
    collision-free in practice, and bit-identical across engines and
    re-runs — the reproducible global shuffle every training run needs
    (epoch ordering must be auditable and re-creatable)."""
    return F.md5(F.concat_ws("-", F.lit(seed), key.cast("string")))


def shuffled(df: DataFrame, key: str, seed: str = "42") -> DataFrame:
    """Globally shuffle a corpus deterministically: range-partition on the
    hash key, then sort within partitions.  Output files read in partition
    order form a total order WITHOUT a single-reducer global sort — the
    scale-safe way to write an epoch at 100 TB (repartitionByRange samples
    split points; each partition sorts locally)."""
    out = df.withColumn("_shuffle_key", shuffle_key(F.col(key), seed))
    return out.repartitionByRange("_shuffle_key").sortWithinPartitions(
        "_shuffle_key"
    )


def balance_groups(
    df: DataFrame, key: str, group: str, digits: int = 4
) -> DataFrame:
    """Deterministically downsample every group to ≈ the smallest group's
    size — mixture balancing for skewed training corpora (web sources
    dominate; balancing keeps the tail's share).

    Per-group rate = min_count / count, applied via the md5-prefix filter
    (hash_sample's trick) with the hex cut computed IN-PLAN from the
    group counts: counts are one map-side-combined agg (≤|groups| rows),
    broadcast back onto the corpus — the corpus itself is scanned once
    and never shuffled.  Membership depends only on (key, group counts),
    so re-runs and other engines reproduce the same sample.

    Adds ``_rate`` (the group's sampling rate) to the surviving rows.
    """
    return _balance_by_rate(
        df,
        key,
        group,
        F.col("_min_n").cast("double") / F.col("_n"),
        digits,
    )


def _balance_by_rate(
    df: DataFrame, key: str, group: str, rate: Column, digits: int
) -> DataFrame:
    """Shared md5-cut scaffolding for the mixture balancers: per-group
    counts (one tiny agg), ``rate`` evaluated against `_min_n`/`_n`,
    the hex cut derived from the SAME rate expression (never a second
    formula that could drift), broadcast back onto one corpus scan.
    The rate >= 1.0 short-circuit keeps the smallest group exact (its
    floor()'d cut would otherwise need digits+1 hex chars)."""
    counts = df.groupBy(group).agg(F.count("*").alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        group,
        rate.alias("_rate"),
        F.format_string(
            f"%0{digits}x",
            F.floor(rate * (16 ** digits)).cast("int"),
        ).alias("_cut"),
    )
    tagged = df.join(F.broadcast(rates), group)
    kept = tagged.filter(
        (F.col("_rate") >= 1.0)
        | (hash_bucket(F.col(key), digits) < F.col("_cut"))
    )
    return kept.drop("_cut")


def temperature_balance(
    df: DataFrame, key: str, group: str, digits: int = 4
) -> DataFrame:
    """Temperature-weighted mixture balancing (α = 0.5): each group's
    keep-rate is sqrt(min_count / count) — between full balancing
    (balance_groups, α→0 behavior of keeping every group equal) and no
    balancing (α=1).  The square-root law is the standard
    low-resource-boosting temperature used for multilingual corpus
    mixing; α is pinned to 0.5 here because sqrt is an IEEE
    correctly-rounded primitive — both engines compute bit-identical
    rates and hex cuts, so membership is engine-reproducible.  (A free
    α would need pow(), which is libm-dependent and can flip the
    floor() at a cut boundary.)

    Same scale shape as balance_groups: one tiny count agg, rates/cuts
    computed in-plan and broadcast back onto a single corpus scan; the
    corpus itself is never shuffled.  Adds ``_rate`` to survivors.
    """
    return _balance_by_rate(
        df,
        key,
        group,
        F.sqrt(F.col("_min_n").cast("double") / F.col("_n")),
        digits,
    )


def global_quantile_cuts(
    df: DataFrame, value: str, q: int = 10, max_domain: int = 1_000_000
) -> DataFrame:
    """Exact global q-quantile cut points, computed WITHOUT a global
    sort: collapse to a value-frequency table (bounded by the value
    domain, not the row count — document lengths, scores, token counts
    all have small domains), running-sum it, and take cut_k = min value
    whose cumulative count reaches ceil(k·N/q).  All arithmetic is
    integer (thresholds via (k·N + q−1) div q), so every engine lands on
    the SAME cut values — no interpolation, no float quantile-definition
    drift.  Output: (k, cut) for k = 1..q−1.

    The frequency table is tiny, so its ordering window running on one
    reducer is the correct plan; the 100 TB input only ever sees the
    initial map-side-combined groupBy.  That plan is ONLY safe while the
    value domain stays small — the running-sum window is unpartitioned —
    so a ``max_domain`` guard (in-plan ``assert_true``) fails the job
    loudly if the frequency table exceeds it; for genuinely
    high-cardinality values (raw floats, ids) use ``approx_percentile``
    cuts instead of this exact path.

    The frequency table is lazily localCheckpoint'ed because THREE
    consumers read it (running sum, total count, domain guard) —
    Catalyst duplicates unshared subtrees, so without the checkpoint
    each consumer would re-scan the full corpus (the q_coverage /
    q_market_basket single-scan pattern)."""
    f = (
        df.filter(F.col(value).isNotNull())
        .groupBy(value)
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    n = f.agg(F.sum("_c").alias("_n"))
    guard = f.agg(
        F.assert_true(
            F.count("*") <= max_domain,
            F.lit(
                f"global_quantile_cuts: distinct '{value}' values exceed "
                f"max_domain={max_domain}; the exact frequency-table plan "
                "would funnel them through one reducer — use "
                "approx_percentile cuts for high-cardinality domains"
            ),
        ).alias("_guard")
    )
    # the filter (always true on pass: assert_true yields NULL) pins the
    # guard into the plan — a bare drop would let column pruning
    # eliminate the assertion entirely.
    cum = (
        f.withColumn("_cc", F.sum("_c").over(Window.orderBy(value)))
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(guard))
        .filter(F.col("_guard").isNull())
        .drop("_guard")
    )
    ks = n.select(
        F.explode(F.sequence(F.lit(1), F.lit(q - 1))).alias("k"), "_n"
    ).select(
        "k",
        F.expr(f"(k * _n + {q - 1}) div {q}").alias("_thr"),
    )
    return (
        cum.join(F.broadcast(ks), F.col("_cc") >= F.col("_thr"))
        .groupBy("k")
        .agg(F.min(value).alias("cut"))
    )


def global_decile_assign(
    df: DataFrame, value: str, q: int = 10
) -> DataFrame:
    """Assign each row its exact global q-tile (1..q) by comparing
    against the broadcast cut array from :func:`global_quantile_cuts` —
    the scale path for global NTILE, which would otherwise need the
    entire table ordered on one reducer.  tile = 1 + #{cuts < x}:
    boundary mass (x == cut) stays in the lower tile, and the comparison
    is pure integer/IEEE equality — engine-reproducible.  Adds ``tile``.
    """
    cuts = (
        global_quantile_cuts(df, value, q)
        .agg(F.sort_array(F.collect_list("cut")).alias("_cuts"))
    )
    tagged = df.filter(F.col(value).isNotNull()).crossJoin(
        F.broadcast(cuts)
    )
    tile = F.lit(1) + F.size(
        F.filter(F.col("_cuts"), lambda c: c < F.col(value))
    )
    return tagged.withColumn("tile", tile.cast("int")).drop("_cuts")


def reservoir_per_group(
    df: DataFrame, group: str, key: str, k: int, seed: str = "42"
) -> DataFrame:
    """Deterministic k-row sample per group — the distributed stand-in
    for per-group reservoir sampling: rank rows by md5(key‖seed) within
    the group and keep the first k.  Every engine, run, and
    partitioning picks the SAME rows (md5 is bit-identical everywhere),
    so train/eval carve-outs are reproducible and append-only corpora
    re-sample consistently.

    One window partitioned by the group key (shuffle on group, local
    sort of each group — never a global sort); for pathologically hot
    groups pre-thin with a hash_sample at rate ≈ k·10/|group| first.
    Adds ``rk`` (1-based hash rank).
    """
    w = Window.partitionBy(group).orderBy(
        F.md5(
            F.concat(F.col(key).cast("string"), F.lit(seed))
        ).asc_nulls_last(),
        F.col(key).asc_nulls_last(),
    )
    return df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
