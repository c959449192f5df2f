"""Scalar embedding quantization (EXT — no reference analog).

Vector stores and training pipelines ship embeddings as int8 codes
(4× smaller than float32, SIMD-friendly distance kernels).  Per-dimension
min/max scalar quantization: code = round((x − min_d) / scale_d) with
scale_d = (max_d − min_d) / (2^bits − 1).

Scale shape: per-dim stats are ONE wide aggregation (2×dim min/max
expressions, map-side combined — the exchange carries one 2×dim row per
partition, never the corpus), broadcast back via a 1-row crossJoin; code
computation is flat column arithmetic in whole-stage codegen.  No explode
(a dim-explode would inflate rows ×dim and shuffle on 64 hot keys), no
Python UDF, no driver action — stats stay inside the lazy plan.

All outputs are integers, so results are bit-identical across engines
(min/max are order-independent; the code arithmetic is pure IEEE-double
with identical shapes) — which is what makes the contract key
oracle-matchable despite float inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wide(df: DataFrame, id_col: str, vec: str, dim: int) -> DataFrame:
    return df.selectExpr(
        id_col,
        *[
            f"CAST(element_at({vec}, {i + 1}) AS DOUBLE) AS x{i}"
            for i in range(dim)
        ],
    )


def _with_stats(wide: DataFrame, dim: int) -> DataFrame:
    stats = wide.agg(
        *[F.min(f"x{i}").alias(f"mn{i}") for i in range(dim)],
        *[F.max(f"x{i}").alias(f"mx{i}") for i in range(dim)],
    )
    return wide.crossJoin(F.broadcast(stats))


def _code(i: int, levels: int) -> str:
    # constant dimension (mx == mn) quantizes to 0 rather than divide by zero
    return (
        f"CASE WHEN mx{i} = mn{i} THEN 0 ELSE "
        f"CAST(ROUND((x{i} - mn{i}) / ((mx{i} - mn{i}) / {float(levels)!r})) AS INT) "
        f"END"
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec: str, dim: int, bits: int = 8
) -> DataFrame:
    """(id, codes array<int>): each dimension quantized to [0, 2^bits−1]."""
    levels = (1 << bits) - 1
    arr = ", ".join(_code(i, levels) for i in range(dim))
    return _with_stats(_wide(df, id_col, vec, dim), dim).selectExpr(
        id_col, f"array({arr}) AS codes"
    )


def dim_code_stats(
    df: DataFrame, id_col: str, vec: str, dim: int, bits: int = 8
) -> DataFrame:
    """Per-dimension quantization audit: (dim_idx, code_min, code_max,
    code_sum, n) — the checksum row-set proving codes are identical across
    engines/runs.  Same plan as quantize_embeddings plus one wide agg and
    a stack() unpivot of the single summary row (64 rows, driver-sized)."""
    levels = (1 << bits) - 1
    coded = _with_stats(_wide(df, id_col, vec, dim), dim).selectExpr(
        *[f"{_code(i, levels)} AS q{i}" for i in range(dim)]
    )
    summary = coded.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.min(f"q{i}").cast("int").alias(f"qmn{i}") for i in range(dim)],
        *[F.max(f"q{i}").cast("int").alias(f"qmx{i}") for i in range(dim)],
        *[F.sum(f"q{i}").cast("long").alias(f"qsm{i}") for i in range(dim)],
    )
    stack = ", ".join(
        f"{i + 1}, qmn{i}, qmx{i}, qsm{i}" for i in range(dim)
    )
    return summary.selectExpr(
        f"stack({dim}, {stack}) AS (dim_idx, code_min, code_max, code_sum)",
        "n",
    )
