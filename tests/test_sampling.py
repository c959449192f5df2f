"""Deterministic hash sampling / splits and expectations reports."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.ops import sampling


def test_hash_sample_fraction_and_determinism(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    s1 = sampling.hash_sample(orders, "o_orderkey", 0.25)
    got = s1.count()
    assert abs(got / n - 0.25) < 0.08  # uniform hash → near the target
    # determinism: same rows under different partitioning
    a = sorted(r.o_orderkey for r in s1.select("o_orderkey").collect())
    b = sorted(
        r.o_orderkey
        for r in sampling.hash_sample(orders.repartition(7), "o_orderkey", 0.25)
        .select("o_orderkey")
        .collect()
    )
    assert a == b


def test_train_test_split_partitions_everything(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    split = sampling.train_test_split(orders, "o_orderkey", 0.1)
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert counts["train"] + counts["test"] == orders.count()
    # test and train are disjoint by construction (single CASE)
    assert 0.03 < counts["test"] / orders.count() < 0.2


def test_expectations_report_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 0.0)], ["id", "v"]
    )
    out = sampling.expectations_report(
        df,
        {
            "nonpositive": F.col("v") <= 0,
            "nulls": F.col("v").isNull(),
        },
    ).collect()[0]
    assert out.nonpositive == 2  # -5.0 and 0.0 (NULL comparison is NULL → not counted)
    assert out.nulls == 1
    assert out.n_rows == 4


def test_stratified_sample_rates_and_determinism(spark):
    from snowav_spark.ops import sampling

    rows = [(i, "en" if i % 2 == 0 else "rare") for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    got = sampling.stratified_sample(
        df, "k", "lang", {"en": 0.2}, default=1.0
    )
    counts = {r.lang: r.n for r in got.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts["rare"] == 1000          # default=1.0 keeps everything
    assert 100 <= counts["en"] <= 300      # ≈20% of 1000
    # deterministic: identical result on recompute and under repartition
    again = sampling.stratified_sample(
        df.repartition(7), "k", "lang", {"en": 0.2}, default=1.0
    )
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in again.collect()
    )


def test_shuffled_total_order_and_stability(spark):
    from snowav_spark.ops import sampling

    df = spark.range(500).withColumnRenamed("id", "k")
    out = sampling.shuffled(df, "k", seed="7")
    rows = [r.k for r in out.toLocalIterator()]  # partition order = total order
    keys = [r._shuffle_key for r in out.toLocalIterator()]
    assert sorted(set(rows)) == list(range(500))  # permutation, nothing lost
    assert keys == sorted(keys)  # reading partitions in order is sorted
    rows2 = [r.k for r in sampling.shuffled(df, "k", seed="7").toLocalIterator()]
    assert rows == rows2  # re-run reproduces the epoch exactly
    rows3 = [r.k for r in sampling.shuffled(df, "k", seed="8").toLocalIterator()]
    assert rows != rows3  # different seed, different epoch


def test_balance_groups_equalizes_and_is_deterministic(spark):
    from snowav_spark.ops import sampling

    rows = [(i, "big") for i in range(2000)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sampling.balance_groups(df, "doc_id", "source")
    sizes = {r.source: r.n for r in kept.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sizes["small"] == 100  # rate 1.0 keeps everything
    # big downsampled to ≈100 (binomial at rate 0.05 over 2000 rows)
    assert 60 <= sizes["big"] <= 140
    again = sampling.balance_groups(df, "doc_id", "source")
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
