"""Distributed 2-D Pareto frontier (skyline) — "best tradeoff" queries:
cheapest-and-smallest part, shortest-and-freshest document, highest
quality at lowest token cost.  The naive form is a NOT-EXISTS
anti-self-join (quadratic); this module computes the identical answer
from one aggregation plus bucket-partitioned windows.

Plan shape (both dimensions MINIMIZED; negate a column to maximize):

1. collapse rows to the per-x frontier candidate ``g = (x, min_y)`` —
   a map-side-combined groupBy, linear in the input, output bounded by
   |distinct x|;
2. range-bucket g on x (fixed-width buckets from a broadcast 1-row
   min/max agg — any consistent bucketing gives the same answer);
3. the strictly-left running minimum m1(x) = min{min_y(x′) : x′ < x}
   decomposes as min(per-bucket prefix, best of all PRIOR buckets):
   the per-bucket prefix is a window PARTITIONED BY bucket (never one
   reducer), and the prior-bucket term is a running min over the
   ≤``buckets``-row bucket-minimum frame — constant-bounded, the only
   single-reducer step;
4. a point is on the skyline iff m1 is NULL or m1 > min_y (a point
   with equal y strictly left dominates; equal x is handled by step
   1's min).

Dominance definition (ties): s dominates r iff s.x ≤ r.x ∧ s.y ≤ r.y
∧ (s.x < r.x ∨ s.y < r.y).  Coincident duplicate points do not
dominate each other — all rows at a surviving (x, y) are kept (the
aggregate form reports their count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_points(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Skyline of distinct (x, y) points, both dimensions minimized.

    Output: (x, y, n_rows, min_id) — every input row whose point is on
    the frontier is accounted for in ``n_rows``; ``min_id`` is a
    deterministic representative.  Ordered plans should sort on (x, y)
    outside.  NULL x or y rows are excluded (NULL is not comparable
    under dominance).
    """
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    # step 1: per-x candidate (also carries per-(x,y) row stats so the
    # final join-back is against a frontier-sized frame, not the corpus).
    # per_xy and gb (below) are each referenced twice downstream;
    # Catalyst duplicates unshared subtrees, so WITHOUT the lazy
    # localCheckpoints the corpus would be scanned five times (caught by
    # tools/audit_plans.py).  Lazy (eager=False): nothing runs at plan
    # build; the first action materializes the |distinct (x,y)|-sized
    # frame once and every later branch reads it back.
    per_xy = pts.groupBy(x, y).agg(
        F.count("*").alias("n_rows"), F.min(id_col).alias("min_id")
    ).localCheckpoint(eager=False)
    g = per_xy.groupBy(x).agg(F.min(y).alias("_min_y"))

    # step 2: fixed-width range buckets from a broadcast bounds row
    bounds = g.agg(
        F.min(x).alias("_xlo"), F.max(x).alias("_xhi")
    )
    gb = g.crossJoin(F.broadcast(bounds)).withColumn(
        "_b",
        F.when(
            F.col("_xhi") == F.col("_xlo"), F.lit(0)
        ).otherwise(
            F.least(
                F.floor(
                    (F.col(x) - F.col("_xlo"))
                    / ((F.col("_xhi") - F.col("_xlo")) / buckets)
                ),
                F.lit(buckets - 1),
            )
        ).cast("int"),
    ).localCheckpoint(eager=False)

    # step 3a: strictly-left prefix min INSIDE each bucket.  g holds ONE
    # row per distinct x, so a ROWS frame ending 1 before the current
    # row is exactly {x′ < x} — a RANGE -1 frame would be wrong for
    # real-valued x (it excludes everything in (x−1, x), not just ties).
    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.col(x).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gb = gb.withColumn("_pref_in", F.min("_min_y").over(w_in))

    # step 3b: best y of all strictly-prior buckets (≤`buckets` rows)
    bmins = gb.groupBy("_b").agg(F.min("_min_y").alias("_bmin"))
    w_b = (
        Window.orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bmins.withColumn("_pref_prior", F.min("_bmin").over(w_b)).select(
        "_b", "_pref_prior"
    )

    # least() skips NULLs (NULL only when BOTH are): exactly the wanted
    # "min over whichever prefixes exist; NULL when the point is global-
    # leftmost" semantics.
    sky_x = (
        gb.join(F.broadcast(prior), "_b")
        .withColumn("_m1", F.least(F.col("_pref_in"), F.col("_pref_prior")))
        .filter(F.col("_m1").isNull() | (F.col("_m1") > F.col("_min_y")))
        .select(x, F.col("_min_y").alias(y))
    )
    # step 4: join back the per-point stats (frontier-sized equi-join)
    return sky_x.join(per_xy, [x, y]).select(x, y, "n_rows", "min_id")
