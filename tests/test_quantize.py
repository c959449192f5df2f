"""Scalar embedding quantization (ops/quantize.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowav_spark.ops import quantize


def _vecs(spark):
    rows = [
        (0, [0.0, -1.0, 5.0, 7.5]),
        (1, [1.0, 0.0, 5.0, 2.5]),
        (2, [2.0, 1.0, 5.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_codes_span_range_and_bounds(spark):
    out = {
        r.vec_id: r.codes
        for r in quantize.quantize_embeddings(
            _vecs(spark), "vec_id", "embedding", dim=4
        ).collect()
    }
    for codes in out.values():
        assert len(codes) == 4
        assert all(0 <= c <= 255 for c in codes)
    # min of a dim → 0, max → 255
    assert out[0][0] == 0 and out[2][0] == 255
    assert out[0][1] == 0 and out[2][1] == 255
    # constant dimension quantizes to 0, not a division by zero
    assert [out[i][2] for i in (0, 1, 2)] == [0, 0, 0]


def test_dequantization_error_bounded(spark):
    df = _vecs(spark)
    codes = quantize.quantize_embeddings(df, "vec_id", "embedding", dim=4)
    joined = df.join(codes, "vec_id").collect()
    # reconstruct with the known per-dim ranges; error ≤ scale/2
    mins = [0.0, -1.0, 5.0, 0.0]
    maxs = [2.0, 1.0, 5.0, 7.5]
    for r in joined:
        for d in range(4):
            scale = (maxs[d] - mins[d]) / 255.0
            if scale == 0.0:
                continue
            recon = mins[d] + r.codes[d] * scale
            assert abs(recon - r.embedding[d]) <= scale / 2 + 1e-12


def test_dim_code_stats_consistent_with_codes(spark):
    df = _vecs(spark)
    stats = {
        r.dim_idx: (r.code_min, r.code_max, r.code_sum, r.n)
        for r in quantize.dim_code_stats(df, "vec_id", "embedding", dim=4).collect()
    }
    codes = quantize.quantize_embeddings(df, "vec_id", "embedding", dim=4)
    per_dim = codes.select(
        *[F.element_at("codes", d + 1).alias(f"c{d}") for d in range(4)]
    ).collect()
    for d in range(4):
        vals = [r[f"c{d}"] for r in per_dim]
        assert stats[d + 1] == (min(vals), max(vals), sum(vals), len(vals))
