"""Shared SQL-string builders for array-lambda vector math.

cluster._assign, quantize.pq_encode, and similarity.random_projection
all compute dots / squared distances between an array column and float
literals.  They use higher-order lambdas (aggregate/zip_with), which
whole-stage codegen compiles as LOOPS — unrolled scalar chains blow
janino's 64KB method limit past a few hundred terms and silently drop
the stage to interpreted rows (measured 8.5× on pq_encode).

Bit-identity contract (derived once, HERE, not per call site): a fold
seeded ``CAST(0 AS DOUBLE)`` equals the left-associated unrolled sum
``t0 + t1 + …`` for every IEEE input except the sign of zero
(``0.0 + -0.0`` is ``+0.0``), and a sign-of-zero difference is
invisible to ``least``/``CASE``/``array_min``/comparisons/canon — so
swapping either form for the other never changes argmin results,
tie-breaks, or oracle hashes.
"""

from __future__ import annotations


def float_array_sql(vals) -> str:
    """array(…) literal from python floats; repr round-trips exactly."""
    return "array(" + ", ".join(repr(float(v)) for v in vals) + ")"


def fold_sum_sql(arr_expr: str, term: str) -> str:
    """aggregate(arr, 0.0, acc + term(v)) — the codegen-loop sum."""
    return (
        f"aggregate({arr_expr}, CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + {term})"
    )


def dot_sql(arr_expr: str, vals) -> str:
    """Σ arr[i]·vals[i] as a fold (arr_expr must be array<double>)."""
    return fold_sum_sql(
        f"zip_with({arr_expr}, {float_array_sql(vals)}, (a, b) -> a * b)",
        "v",
    )


def sqdist_sql(arr_expr: str, vals) -> str:
    """Σ (arr[i] − vals[i])² as a fold."""
    return fold_sum_sql(
        f"zip_with({arr_expr}, {float_array_sql(vals)}, "
        f"(a, b) -> (a - b) * (a - b))",
        "v",
    )


def sqnorm_sql(arr_expr: str) -> str:
    """Σ arr[i]² as a fold."""
    return fold_sum_sql(arr_expr, "v * v")


# Headroom for flat unrolled scalar chains (measured r12 on pq_encode,
# 1M rows: flat ~0.5–0.9 s vs fold-loop ~9.6 s — 10× per row, no
# lambda-call overhead per element).  At the 512-term bench config the
# unrolled whole-stage source is ~1 MB: janino either dies at its 64 KB
# method limit (the r5 least()+CASE shape) or compiles methods past the
# JVM's 8 KB JIT limit — so ENGINE_CONF pins
# spark.sql.codegen.hugeMethodLimit=8000 and execution lands on
# per-operator codegen (small, JIT-able per-expression methods), which
# is the measured-fast path.  Beyond this limit the Catalyst tree
# itself (plan size, per-action optimization cost) becomes the
# bottleneck and callers switch to the fold form.  Callers sum their
# per-stage term count against this before choosing an unrolled form
# over the folds.
FLAT_TERM_LIMIT = 512
