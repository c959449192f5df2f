"""k-means clustering + cluster-balanced sampling (ops/cluster.py)."""

from __future__ import annotations

from snowav_spark.ops import cluster


def _planted(spark, n_per=20, dim=8):
    # two tight blobs far apart: ids 0..19 near (0,...), 20..39 near (10,...)
    rows = []
    for i in range(n_per):
        rows.append((i, [0.0 + (i % 5) * 0.01] * dim))
        rows.append((n_per + i, [10.0 + (i % 5) * 0.01] * dim))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separates_planted_blobs(spark):
    df = _planted(spark)
    assigned, cents = cluster.kmeans(df, "vec_id", "embedding", k=2, dim=8, iters=4)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    blob_a = {got[i] for i in range(20)}
    blob_b = {got[i] for i in range(20, 40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # centroids converged onto the blob centers
    assert any(abs(c[0] - 0.02) < 0.1 for c in cents)
    assert any(abs(c[0] - 10.02) < 0.1 for c in cents)


def test_kmeans_deterministic_rerun(spark):
    df = _planted(spark)
    a, ca = cluster.kmeans(df, "vec_id", "embedding", k=2, dim=8, iters=3)
    b, cb = cluster.kmeans(df, "vec_id", "embedding", k=2, dim=8, iters=3)
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 on two blobs: at least one centroid can end up empty; must not crash
    df = _planted(spark, n_per=5)
    assigned, cents = cluster.kmeans(df, "vec_id", "embedding", k=3, dim=8, iters=3)
    assert len(cents) == 3
    assert assigned.count() == 10


def test_cluster_balanced_sample_caps(spark):
    df = _planted(spark)
    assigned, _ = cluster.kmeans(df, "vec_id", "embedding", k=2, dim=8, iters=3)
    sampled = cluster.cluster_balanced_sample(assigned, "vec_id", per_cluster=7)
    per = {
        r.cluster: r.n
        for r in sampled.groupBy("cluster").count().withColumnRenamed("count", "n").collect()
    }
    assert per == {0: 7, 1: 7} or sum(per.values()) == 14
    # deterministic
    again = cluster.cluster_balanced_sample(assigned, "vec_id", per_cluster=7)
    assert sorted(map(tuple, sampled.collect())) == sorted(map(tuple, again.collect()))
