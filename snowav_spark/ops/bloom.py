"""DataFrame-native Bloom filter (SURVEY.md §2.6 EXT — scale path for
membership gates: decontamination, stop-lists, seen-before checks).

Spark ships a BloomFilter implementation, but neither surface works for a
distributed, in-plan gate from PySpark: the internal ``bloom_filter_agg``
aggregate is not registered as a SQL-callable routine in this build
(probed: UNRESOLVED_ROUTINE), and ``DataFrameStatFunctions.bloomFilter``
returns a driver-side JVM object that Python executors cannot evaluate.
So this module builds the same structure as pure DataFrame algebra:

* build: k double-hashed bit positions per value
  (Kirsch–Mitzenmacher: ``pos_i = (h1 + i·h2) mod m`` with
  ``h1, h2 = xxhash64(v), xxhash64(v, 1)``) → explode → ``bit_or``
  per 64-bit word → densify into ONE row holding a bit-packed
  ``array<long>`` bitmap.  Two shuffles total (word agg + final 1-row
  agg), both over ≤ m/64 rows, regardless of input size.
* probe: broadcast the 1-row bitmap, test all k bits with codegen
  integer math (``element_at`` + ``&``) — no UDF, no shuffle, and the
  probe side is scanned exactly once.

Why it matters at 100 TB: a membership gate against a 10⁸-element set
via broadcast semi-join ships the full distinct key set (GBs of strings)
to every executor; the bitmap is ``m/8`` bytes — 16 MB at m=2²⁷ —
with a false-positive rate of (1−e^{−kn/m})^k, and false positives are
removed by whatever exact verify follows.  No false negatives, so a
bloom prefilter composed with an exact join is *output-identical* to the
exact join alone (the contract key ``q_decontam_bloom`` shares
``q_decontam``'s oracle for exactly this reason).

All hashing is xxhash64 with fixed seeds — bit-identical across runs,
partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bit_positions(value: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions in [0, num_bits) for one value.

    Double hashing keeps this two xxhash64 calls total (not k); the
    per-hash arithmetic is mod-reduced BEFORE the multiply so ANSI-mode
    long overflow is impossible (i·h2m < k·m ≪ 2⁶³).
    """
    h1m = F.pmod(F.xxhash64(value), F.lit(num_bits))
    h2m = F.pmod(F.xxhash64(value, F.lit(1)), F.lit(num_bits))
    return [
        F.pmod(h1m + F.lit(i) * h2m, F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """Aggregate ``df[col]`` into a ONE-row DataFrame with column ``bf``:
    a dense bit-packed ``array<long>`` of length ``num_bits/64``.

    Sizing: for n distinct values, fp ≈ (1−e^{−kn/m})^k; m ≈ 10·n bits
    with k=5 gives fp ≈ 0.9%.  ``num_bits`` must be a multiple of 64.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    nwords = num_bits // 64
    pos = df.select(
        F.explode(
            F.array(*bit_positions(F.col(col), num_bits, num_hashes))
        ).alias("p")
    )
    words = pos.groupBy(F.shiftright(F.col("p"), 6).alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))")
        ).alias("bits")
    )
    # Densify: sparse (word, bits) rows → one fixed-length array, absent
    # words = 0.  Left-join a generated full word range (zero-fill), then
    # order-preserving collect via array_sort over (w, bits) structs —
    # strictly linear in m/64.  (A map-based densify is quadratic here:
    # Spark maps are unsorted arrays, so element_at inside a transform
    # over the full range is O((m/64)²) interpreted key scans — measured
    # 100× slower at m=2²⁰.)
    full = df.sparkSession.range(nwords).select(F.col("id").alias("w"))
    dense = full.join(words, "w", "left").select(
        "w", F.coalesce(F.col("bits"), F.lit(0).cast("long")).alias("bits")
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda e: e["bits"],
        ).alias("bf")
    )


def bloom_might_contain(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the set ``bloom`` was
    built from (guaranteed superset of the true members — no false
    negatives).  The 1-row bitmap is broadcast; the k bit tests compile
    to straight-line integer codegen over the probe scan.
    """
    positions = bit_positions(F.col(col), num_bits, num_hashes)
    # Positions become named columns so the variable-shift bit test can be
    # written as plain SQL text (shiftleft's Python wrapper only accepts a
    # literal shift amount); Catalyst collapses the two projections.
    staged = df.crossJoin(
        F.broadcast(bloom.withColumnRenamed("bf", "__bf"))
    ).withColumns({f"__p{i}": p for i, p in enumerate(positions)})
    cond = None
    for i in range(num_hashes):
        word = F.element_at(
            F.col("__bf"), (F.shiftright(F.col(f"__p{i}"), 6) + 1).cast("int")
        )
        mask = F.expr(f"shiftleft(1L, cast(pmod(__p{i}, 64) as int))")
        test = word.bitwiseAND(mask) != 0
        cond = test if cond is None else cond & test
    return staged.filter(cond).drop(
        "__bf", *[f"__p{i}" for i in range(num_hashes)]
    )
