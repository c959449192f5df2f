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


def _rand_vecs(spark, n=120, dim=16, seed=7):
    # deterministic pseudo-random vectors with repeats and near-ties
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_subspaces_bit_identical_to_per_subspace_loop(spark):
    """The joint trainer (one scan per Lloyd round for all m subspaces,
    centroids carried as broadcast data instead of literals) must emit
    centroids BIT-identical to looping cluster.kmeans over each slice —
    the r11 optimization replaced train_pq_codebook's loop with it on
    exactly this equivalence (also pinned at fixture scale by
    tools/dump_index_state.py)."""
    from pyspark.sql import functions as F

    m, sub, k, iters = 4, 4, 3, 3
    df = _rand_vecs(spark, n=120, dim=m * sub)
    joint = cluster.kmeans_subspaces(
        df, "vec_id", "embedding", m=m, sub=sub, k=k, iters=iters
    )
    looped = []
    for j in range(m):
        sliced = df.select(
            "vec_id",
            F.slice(F.col("embedding"), j * sub + 1, sub)
            .cast("array<double>")
            .alias("_v"),
        )
        _, cents = cluster.kmeans(
            sliced, "vec_id", "_v", k=k, dim=sub, iters=iters
        )
        looped.append(cents)
    assert joint == looped


def test_kmeans_subspaces_empty_cluster_keeps_centroid(spark):
    # more centroids than distinct points in a subspace: empty clusters
    # must keep their seed centroid, as kmeans does
    df = _planted(spark, n_per=3, dim=8)
    cb = cluster.kmeans_subspaces(
        df, "vec_id", "embedding", m=2, sub=4, k=5, iters=2
    )
    assert len(cb) == 2 and all(len(cj) == 5 for cj in cb)
