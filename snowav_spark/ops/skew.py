"""Skew-handling primitives: salting for hot keys (SURVEY §4 physical
configs; SCALE.md joins section).

AQE's skew-join splitting (engine default) handles most skew at runtime by
splitting oversized partitions.  Salting is the *plan-level* tool for the
cases AQE can't fix:

- a hot key in a shuffle **aggregation** whose per-key state is large
  (e.g. collect_list-style buffers) — AQE can't split one key's hash
  bucket;
- a **join** where one key dominates and the build side for that key still
  fits memory when replicated.

Both helpers are deterministic (hash-based salt, not random) so results
are reproducible and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    finals: dict[str, Column],
    salt_n: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Two-phase aggregation through a salt: groupBy(keys + salt) then
    groupBy(keys).

    ``aggs`` computes per-salt partials; ``finals`` merges them (e.g.
    partial ``sum`` → final ``sum``, partial ``count`` → final ``sum``).
    The salt derives from a hash of ``salt_src`` (default: whole-row
    monotonically increasing id is avoided — nondeterministic across
    runs — so pass a real column).
    """
    if salt_src is None:
        raise ValueError("salted_agg needs a salt_src column for determinism")
    salt = F.pmod(F.hash(F.col(salt_src)), F.lit(salt_n)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(n) for n, c in finals.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side across all salt values, join on (key, salt).

    The hot key's rows spread across ``salt_n`` reducers instead of one.
    Cost: the small side is shuffled ``salt_n``× (or broadcast once if it
    fits — in which case you don't need salting at all; this is for the
    mid-size dim that can't broadcast but has a hot join key).
    """
    if salt_src is None:
        raise ValueError("salted_join needs a salt_src column for determinism")
    b = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(salt_n))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_n - 1))
    ).alias("_salt")
    s = small.select("*", salts)
    return b.join(s, [key, "_salt"]).drop("_salt")
