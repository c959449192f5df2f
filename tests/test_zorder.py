"""Z-order clustered writes: Morton-value correctness, multi-column
row-group skipping vs a single-column sort, and round-trip equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.sinks import morton_key, rowgroup_overlap, write_zordered


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_value_matches_python_morton(spark):
    # ints 0..15 on two axes, bits=4, bounds = exact value range: with
    # width_bucket over [lo, hi) edges the bucket is a monotone relabel
    # of the value; we only assert the INTERLEAVING is a true Morton
    # code: bucket pairs -> z via the same bit positions as _morton
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a int, b int")
    bits = 4
    zdf = df.withColumn(
        "z", morton_key(df, ["a", "b"], bits, clamp=(0.0, 1.0))
    )
    got = {(r["a"], r["b"]): r["z"] for r in zdf.collect()}
    # recover each axis's bucket from the z-value and check the z-value
    # is exactly the Morton interleave of those buckets
    for (a, b), z in got.items():
        ba = 0
        bb = 0
        for i in range(bits):
            ba |= ((z >> (2 * i)) & 1) << i
            bb |= ((z >> (2 * i + 1)) & 1) << i
        assert z == _morton([ba, bb], bits)
    # and each axis's bucket is monotone in the raw value
    for other in range(16):
        bas = []
        for a in range(16):
            z = got[(a, other)]
            ba = sum(((z >> (2 * i)) & 1) << i for i in range(4))
            bas.append(ba)
        assert bas == sorted(bas)


def test_zorder_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 7.0), (1, 7.0), (100, 7.0)], "a int, b double"
    )
    zdf = df.withColumn(
        "z", morton_key(df, ["a", "b"], 4, clamp=(0.0, 1.0))
    )
    out = {r["a"]: r["z"] for r in zdf.collect()}
    # constant column contributes zero bits; NULL sorts first
    assert out[None] == 0
    assert out[None] <= out[1] <= out[100]


def test_zorder_rejects_strings_and_too_many_bits(spark):
    df = spark.createDataFrame([("x", 1)], "s string, a int")
    with pytest.raises(ValueError, match="unsupported type"):
        morton_key(df, ["s"])
    with pytest.raises(ValueError, match="63-bit"):
        morton_key(df, ["a"], 64)


def test_zorder_date_and_timestamp_columns(spark):
    import datetime as dt

    rows = [
        (dt.date(2024, 1, d), dt.datetime(2024, 1, 1, h), d * h)
        for d in range(1, 9)
        for h in range(8)
    ]
    df = spark.createDataFrame(rows, "d date, t timestamp, v int")
    zdf = df.withColumn("z", morton_key(df, ["d", "t"], 3, clamp=(0.0, 1.0)))
    got = zdf.collect()
    assert all(r["z"] is not None for r in got)
    # the key is monotone along each axis when the other is fixed
    by_t = {}
    for r in got:
        by_t.setdefault(r["t"], []).append((r["d"], r["z"]))
    for pairs in by_t.values():
        zs = [z for _, z in sorted(pairs)]
        assert zs == sorted(zs)


def test_zorder_write_skips_rowgroups_both_dims(spark, sf_dir, tmp_path):
    """The layout claim itself: a box predicate on (l_partkey, l_suppkey)
    must skip most row groups under z-order, and a predicate on the
    SECOND column alone — useless under a partkey-only sort — must still
    prune."""
    li = load_table(spark, sf_dir, "lineitem")
    n_files = 32
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    # single-column comparison layout: range-sorted by l_partkey only
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    sk_max = li.agg(F.max("l_suppkey")).first()[0]
    # a ~10% box in each dimension, mid-range
    pk_box = (int(pk_max * 0.45), int(pk_max * 0.55))
    sk_box = (int(sk_max * 0.45), int(sk_max * 0.55))

    both = {"l_partkey": pk_box, "l_suppkey": sk_box}
    z_hit, z_tot = rowgroup_overlap(zpath, both)
    s_hit, s_tot = rowgroup_overlap(spath, both)
    assert z_tot >= n_files // 2 and s_tot >= n_files // 2
    # z-order skips at least half the row groups on the 2-D box
    assert z_hit <= z_tot // 2, (z_hit, z_tot)

    # second-dimension-only predicate: the partkey sort cannot prune
    # (suppkey is uncorrelated with file order there), z-order can
    sk_only = {"l_suppkey": sk_box}
    z2_hit, _ = rowgroup_overlap(zpath, sk_only)
    s2_hit, _ = rowgroup_overlap(spath, sk_only)
    assert s2_hit == s_tot  # every row group overlaps under the sort
    assert z2_hit < z_tot, (z2_hit, z_tot)

    # round trip: clustering reorders rows, never changes them — full
    # bidirectional multiset equality (a duplicate-one/drop-one layout
    # bug with offsetting aggregates must not pass)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.exceptAll(li).isEmpty()
    assert li.exceptAll(back).isEmpty()
