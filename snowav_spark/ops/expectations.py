"""Declarative data-quality expectations, verified in ONE scan.

The pre-training gate every corpus pipeline needs (and the engine analog
of the reference's input sanity checks scattered through
ref:snowav/framework/outputs.py — date alignment, non-empty grids,
finite values): declare rules, get back one row per rule with
pass/fail + the observed statistic.

Scale design: every rule compiles to an *aggregate expression*, and the
whole suite evaluates as a SINGLE ``df.agg(...)`` — one map-side-combined
pass over the table no matter how many rules (a rule-per-scan loop at
100 TB is how validation jobs end up costing more than the pipeline they
guard).  Uniqueness uses ``count vs approx/count_distinct`` rather than
a self-join; bounds/regex/set rules count violations, so the report says
HOW wrong a failing table is, not just that it failed.

Usage::

    from snowav_spark.ops import expectations as ex
    report = ex.check(df, [
        ex.not_null("doc_id"),
        ex.unique("doc_id"),
        ex.in_range("quality", 0.0, 1.0),
        ex.in_set("lang", ["en", "de", "fr"]),
        ex.matches("doc_id_str", r"^d[0-9]+$"),
        ex.min_rows(1000),
    ])
    bad = [r for r in report.collect() if not r.passed]
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str  # unique label in the report
    violations: Column  # aggregate: how many rows break the rule
    observed: Column  # aggregate: the statistic worth reporting
    description: str


def not_null(col: str) -> Rule:
    return Rule(
        f"not_null({col})",
        F.count_if(F.col(col).isNull()),
        F.count_if(F.col(col).isNull()),
        f"{col} must never be NULL",
    )


def unique(col: str, approx: bool = False, rsd: float = 0.05) -> Rule:
    """Exact by default; ``approx=True`` swaps in HLL distinct counting
    for the 100 TB pre-check where estimator error is fine and the
    exact distinct shuffle is not.  Approx mode counts only duplicates
    BEYOND the estimator's error band: the HLL estimate wobbles BOTH
    ways with relative std ≈ rsd, so the band is ``3·rsd·n`` (≈3σ —
    a truly-unique column false-alarms with probability ~0.1%, not the
    ~16% a 1σ band leaves).  The honest flip side: up to 3·rsd·n real
    duplicate rows pass undetected — approx mode is a smoke alarm for
    GROSS duplication, never an exactness gate; anything needing the
    exact answer uses approx=False."""
    if approx:
        distinct = F.approx_count_distinct(col, rsd)
        n = F.count(F.col(col))
        dupes = F.greatest(
            n - distinct - F.ceil(F.lit(3.0 * rsd) * n).cast("long"),
            F.lit(0),
        )
    else:
        n = F.count(F.col(col))
        dupes = F.greatest(n - F.count_distinct(F.col(col)), F.lit(0))
    return Rule(
        f"unique({col})",
        dupes,
        dupes,
        f"{col} must be unique ({'approx' if approx else 'exact'})",
    )


def in_range(col: str, lo: float, hi: float) -> Rule:
    c = F.col(col)
    bad = F.count_if(c.isNotNull() & (F.isnan(c) | (c < lo) | (c > hi)))
    return Rule(
        f"in_range({col},{lo:g},{hi:g})",
        bad,
        bad,
        f"{col} must lie in [{lo:g}, {hi:g}] (NaN counts as out)",
    )


def in_set(col: str, allowed: list) -> Rule:
    c = F.col(col)
    bad = F.count_if(c.isNotNull() & ~c.isin(allowed))
    return Rule(
        f"in_set({col})",
        bad,
        bad,
        f"{col} must be one of {allowed!r}",
    )


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    bad = F.count_if(c.isNotNull() & ~c.rlike(pattern))
    return Rule(
        f"matches({col})",
        bad,
        bad,
        f"{col} must match /{pattern}/",
    )


def min_rows(n: int) -> Rule:
    return Rule(
        f"min_rows({n})",
        F.when(F.count(F.lit(1)) < n, F.lit(1)).otherwise(F.lit(0)),
        F.count(F.lit(1)),
        f"table must have at least {n} rows",
    )


def max_null_fraction(col: str, frac: float) -> Rule:
    nulls = F.count_if(F.col(col).isNull())
    total = F.count(F.lit(1))
    return Rule(
        f"max_null_fraction({col},{frac:g})",
        F.when(nulls > total * frac, nulls).otherwise(F.lit(0)),
        nulls,
        f"NULL fraction of {col} must be ≤ {frac:g}",
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass.  Returns a report
    DataFrame (rule, description, passed, violations, observed) — one
    row per rule, driver-sized by construction."""
    if not rules:
        raise ValueError("check() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = []
    for i, r in enumerate(rules):
        aggs.append(r.violations.cast("long").alias(f"_v{i}"))
        aggs.append(r.observed.cast("long").alias(f"_o{i}"))
    row = df.agg(*aggs)
    reports = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.lit(r.description).alias("description"),
            (F.col(f"_v{i}") == 0).alias("passed"),
            F.col(f"_v{i}").alias("violations"),
            F.col(f"_o{i}").alias("observed"),
        )
        for i, r in enumerate(rules)
    ]
    return row.select(
        F.explode(F.array(*reports)).alias("r")
    ).select("r.*")


def enforce(df: DataFrame, rules: list[Rule]) -> None:
    """Hard gate: raise ValueError listing every failed rule.  The
    one-collect shape makes this safe inside a pipeline — it costs the
    single validation scan and nothing else."""
    failed = [r for r in check(df, rules).collect() if not r.passed]
    if failed:
        msg = "; ".join(
            f"{r.rule}: {r.violations} violation(s) ({r.description})"
            for r in failed
        )
        raise ValueError(f"expectations failed: {msg}")
