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


def test_pq_encode_and_adc_search(spark, sf_dir):
    """PQ round trip on fixture embeddings: codes are m small ints,
    reconstruction beats the zero-information baseline, and ADC search
    finds the query itself first plus a majority of true neighbors."""
    import numpy as np
    from pyspark.sql import functions as F

    from snowav_spark.io import load_table
    from snowav_spark.ops import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    cb = quantize.train_pq_codebook(
        emb, "vec_id", "embedding", dim=64, m=8, k=8, iters=3
    )
    assert len(cb) == 8 and len(cb[0]) == 8 and len(cb[0][0]) == 8
    codes = quantize.pq_encode(emb, "vec_id", "embedding", cb).cache()
    n = emb.count()
    assert codes.count() == n
    code_rows = {r.vec_id: r.codes for r in codes.collect()}
    assert all(
        len(c) == 8 and all(0 <= x < 8 for x in c)
        for c in code_rows.values()
    )

    rows = emb.collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    # reconstruction MSE < corpus variance (k=1 per subspace ≈ variance)
    mses = []
    for vid, v in vecs.items():
        rec = [c for j in range(8) for c in cb[j][code_rows[vid][j]]]
        mses.append(float(np.mean((np.array(rec) - np.array(v)) ** 2)))
    var = float(np.var(np.array(list(vecs.values()))))
    assert np.mean(mses) < var

    # ADC: query vector's own code must rank first (distance to its own
    # centroids is minimal); majority of exact top-5 inside ADC top-25
    qid = sorted(vecs)[0]
    q = vecs[qid]
    adc = [r[0] for r in quantize.pq_topk(codes, cb, q, 25).collect()]
    assert adc[0] == qid
    exact5 = [
        vid
        for _, vid in sorted(
            (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
            for vid, v in vecs.items()
        )[:5]
    ]
    assert len(set(exact5) & set(adc)) >= 3


def test_pq_rejects_bad_dims(spark, sf_dir):
    import pytest

    from snowav_spark.io import load_table
    from snowav_spark.ops import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        quantize.train_pq_codebook(emb, "vec_id", "embedding", dim=64, m=7)


def test_pq_encode_flat_and_fold_bit_identical(spark, sf_dir):
    """The hybrid kernel's two codegen shapes (flat scalar chains under
    arrmath.FLAT_TERM_LIMIT, array-lambda folds beyond) must emit
    IDENTICAL codes — the arrmath bit-identity contract, pinned here so
    the hybrid can never drift."""
    from snowav_spark.io import load_table
    from snowav_spark.ops import arrmath, quantize

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    cb = quantize.train_pq_codebook(
        emb, "vec_id", "embedding", dim=64, m=8, k=8, iters=2
    )
    flat = {
        r.vec_id: list(r.codes)
        for r in quantize.pq_encode(emb, "vec_id", "embedding", cb).collect()
    }
    orig = arrmath.FLAT_TERM_LIMIT
    try:
        arrmath.FLAT_TERM_LIMIT = 0  # force the fold branch
        fold = {
            r.vec_id: list(r.codes)
            for r in quantize.pq_encode(
                emb, "vec_id", "embedding", cb
            ).collect()
        }
    finally:
        arrmath.FLAT_TERM_LIMIT = orig
    assert flat == fold and len(flat) == 300


def test_pq_encode_excludes_poisoned_vectors(spark):
    """Vectors with NULL/NaN ELEMENTS are outside the encodable domain
    (the flat and fold kernels disagree on NaN argmin — CASE-on-NaN vs
    array_position's NaN-equality), so pq_encode drops them up front in
    BOTH branches rather than encoding them divergently."""
    from snowav_spark.ops import arrmath, quantize

    good = [float(i % 7) for i in range(8)]
    rows = [
        (1, good),
        (2, [float("nan")] + good[1:]),
        (3, [None] + good[1:]),
        (4, good[:4]),  # wrong dim
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = [[[0.0] * 4, [5.0] * 4], [[1.0] * 4, [6.0] * 4]]  # m=2,k=2,sub=4
    for limit in (arrmath.FLAT_TERM_LIMIT, 0):
        orig = arrmath.FLAT_TERM_LIMIT
        try:
            arrmath.FLAT_TERM_LIMIT = limit
            got = quantize.pq_encode(df, "vec_id", "embedding", cb).collect()
        finally:
            arrmath.FLAT_TERM_LIMIT = orig
        assert [r.vec_id for r in got] == [1]
        assert all(c is not None for c in got[0].codes)


def test_ivfpq_index_build_and_search(spark, sf_dir, tmp_path):
    """IVF-PQ e2e: build persists cell-partitioned PQ codes (no float
    vectors at rest) + two sidecars; ADC search self-hits at rank 0; the
    probe carries the cell predicate as a PartitionFilter; full-probe +
    full-depth cosine re-rank reproduces the exact brute-force top-k."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    cents, cb = quantize.build_ivfpq_index(
        emb, "vec_id", "embedding", path, n_cells=4, m=8, k=4, iters=1
    )
    assert len(cents) == 4 and len(cb) == 8 and len(cb[0]) == 4

    stored = spark.read.parquet(path)
    assert sorted(stored.columns) == ["cell", "codes", "vec_id"]
    n = emb.count()
    assert stored.count() == n

    vecs = {
        r.vec_id: np.asarray([float(x) for x in r.embedding])
        for r in emb.collect()
    }
    qid = sorted(vecs)[0]
    q = [float(x) for x in vecs[qid]]

    # ADC-only: the query's own row has minimal ADC distance
    adc = quantize.search_ivfpq_index(
        spark, path, q, "vec_id", k_out=10, nprobe=2
    )
    plan = adc._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    rows = adc.collect()
    assert rows[0].vec_id == qid
    assert [r.adc_dist2 for r in rows] == sorted(
        float(r.adc_dist2) for r in rows
    )

    # full probe + full-depth re-rank == exact cosine top-k (same
    # round(,6) + id tie-break as _cosine_score_topk)
    got = [
        (r.vec_id, r.cos_sim)
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=5, nprobe=4,
            rerank=emb, rerank_depth=n,
        ).collect()
    ]
    qn = np.linalg.norm(vecs[qid])
    exact = sorted(
        (
            -round(float(v @ vecs[qid]) / (np.linalg.norm(v) * qn), 6),
            vid,
        )
        for vid, v in vecs.items()
    )[:5]
    assert got == [(vid, -c) for c, vid in exact]


def test_ivfpq_metadata_filtered_search(spark, sf_dir, tmp_path):
    """Metadata-filtered ANN e2e: build with metadata=("label",) stores
    the label next to the codes; search(where=...) pushes the predicate
    into the pruned cell scan (PushedFilters), returns ONLY matching
    ids, and under full probe + full depth equals the exact filtered
    cosine top-k.  A pruned probe stays a subset of the filtered corpus
    with decent recall."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivfpq_meta")
    quantize.build_ivfpq_index(
        emb, "vec_id", "embedding", path,
        n_cells=4, m=8, k=4, iters=1, metadata=("label",),
    )
    stored = spark.read.parquet(path)
    assert sorted(stored.columns) == ["cell", "codes", "label", "vec_id"]
    # labels stored verbatim
    want_labels = {r.vec_id: r.label for r in emb.collect()}
    got_labels = {r.vec_id: r.label for r in stored.collect()}
    assert got_labels == want_labels

    vecs = {
        r.vec_id: (np.asarray([float(x) for x in r.embedding]), r.label)
        for r in emb.collect()
    }
    qid = sorted(vecs)[0]
    q = [float(x) for x in vecs[qid][0]]
    n = emb.count()

    # pushed filter: the ADC plan carries label in PushedFilters and
    # every returned id has the label
    adc = quantize.search_ivfpq_index(
        spark, path, q, "vec_id", k_out=10, nprobe=2, where="label = 1"
    )
    plan = adc._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(label,1" in plan.split("PushedFilters", 1)[1].split(
        "]", 1
    )[0]
    assert all(vecs[r.vec_id][1] == 1 for r in adc.collect())

    # full probe + full depth == exact filtered cosine top-k
    got = [
        (r.vec_id, r.cos_sim)
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=5, nprobe=4,
            rerank=emb, rerank_depth=n, where="label = 1",
        ).collect()
    ]
    qv = vecs[qid][0]
    qn = np.linalg.norm(qv)
    exact = sorted(
        (
            -round(float(v @ qv) / (np.linalg.norm(v) * qn), 6),
            vid,
        )
        for vid, (v, lab) in vecs.items()
        if lab == 1
    )[:5]
    assert got == [(vid, -c) for c, vid in exact]

    # pruned probe: subset of the filtered corpus, recall >= 3/5 vs the
    # exact filtered answer on this small fixture
    pruned = [
        r.vec_id
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=5, nprobe=2,
            rerank=emb, rerank_depth=20, where="label = 1",
        ).collect()
    ]
    assert all(vecs[v][1] == 1 for v in pruned)
    assert len(set(pruned) & {vid for _, vid in exact}) >= 3


def test_ivfpq_metadata_append_carries_labels(spark, sf_dir, tmp_path):
    """Appending to a metadata-carrying index with the same tuple keeps
    filtered search correct over old + new rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    head = emb.filter(F.col("vec_id") < 100)
    tail = emb.filter(F.col("vec_id") >= 100)
    path = str(tmp_path / "ivfpq_meta_app")
    quantize.build_ivfpq_index(
        head, "vec_id", "embedding", path,
        n_cells=2, m=8, k=2, iters=1, metadata=("label",),
    )
    n = quantize.append_to_ivfpq_index(
        tail, "vec_id", "embedding", path, metadata=("label",)
    )
    assert n == tail.count()
    stored = spark.read.parquet(path)
    assert stored.count() == emb.count()
    assert stored.filter(F.col("label").isNull()).count() == 0


def test_ivfpq_search_rejects_bad_query_dim(spark, sf_dir, tmp_path):
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivfpq_dim")
    quantize.build_ivfpq_index(
        emb, "vec_id", "embedding", path, n_cells=2, m=8, k=2, iters=1
    )
    with pytest.raises(ValueError, match="dim"):
        quantize.search_ivfpq_index(spark, path, [1.0, 2.0], "vec_id")


def test_pq_encode_keep_columns_ride_along(spark):
    """keep columns survive both kernel shapes unchanged."""
    rows = [(i, i % 3, [float(i), float(i + 1), 0.5, -0.5]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "grp", "embedding"])
    cb = quantize.train_pq_codebook(
        df, "vec_id", "embedding", dim=4, m=2, k=2, iters=1
    )
    out = quantize.pq_encode(df, "vec_id", "embedding", cb, keep=("grp",))
    assert out.columns == ["vec_id", "grp", "codes"]
    got = {r.vec_id: r.grp for r in out.collect()}
    assert got == {i: i % 3 for i in range(12)}

    # fold kernel (beyond the flat term limit) carries keep identically
    from snowav_spark.ops import arrmath

    orig = arrmath.FLAT_TERM_LIMIT
    try:
        arrmath.FLAT_TERM_LIMIT = 0
        fold = quantize.pq_encode(
            df, "vec_id", "embedding", cb, keep=("grp",)
        )
        assert fold.columns == ["vec_id", "grp", "codes"]
        assert {(r.vec_id, r.grp, tuple(r.codes)) for r in fold.collect()} == {
            (r.vec_id, r.grp, tuple(r.codes)) for r in out.collect()
        }
    finally:
        arrmath.FLAT_TERM_LIMIT = orig


def test_ivfpq_append_extends_index_without_retrain(spark, sf_dir, tmp_path):
    """append_to_ivfpq_index encodes new vectors against the frozen
    sidecar centroids/codebook and appends to the cell layout: counts
    add up, and full-probe + full-depth re-rank over the grown index
    equals exact brute force over the UNION corpus."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    first = emb.filter(F.col("vec_id") < cut)
    rest = emb.filter(F.col("vec_id") >= cut)

    path = str(tmp_path / "ivfpq_grow")
    quantize.build_ivfpq_index(
        first, "vec_id", "embedding", path, n_cells=4, m=8, k=4, iters=1
    )
    n_first = spark.read.parquet(path).count()
    appended = quantize.append_to_ivfpq_index(
        rest, "vec_id", "embedding", path
    )
    assert appended == rest.count()
    assert spark.read.parquet(path).count() == n_first + appended

    vecs = {
        r.vec_id: np.asarray([float(x) for x in r.embedding])
        for r in emb.collect()
    }
    qid = ids[-1]  # query from the APPENDED half
    q = [float(x) for x in vecs[qid]]
    got = [
        (r.vec_id, r.cos_sim)
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=5, nprobe=4,
            rerank=emb, rerank_depth=len(ids),
        ).collect()
    ]
    qn = np.linalg.norm(vecs[qid])
    exact = sorted(
        (
            -round(float(v @ vecs[qid]) / (np.linalg.norm(v) * qn), 6),
            vid,
        )
        for vid, v in vecs.items()
    )[:5]
    assert got == [(vid, -c) for c, vid in exact]
    assert got[0][0] == qid  # the appended vector is findable, self-hit


def test_compact_ivfpq_index_folds_streamed_layout(spark, sf_dir, tmp_path):
    """A (cell, _batch) streamed layout compacts to the batch serving
    layout: _batch gone, sidecars preserved, search identical, and a
    batch append works afterwards."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    a, b = emb.filter(F.col("vec_id") < cut), emb.filter(
        (F.col("vec_id") >= cut) & (F.col("vec_id") < ids[-1])
    )
    last = emb.filter(F.col("vec_id") == ids[-1])

    path = str(tmp_path / "ivfpq_stream")
    quantize.build_ivfpq_index(
        a, "vec_id", "embedding", path, n_cells=4, m=8, k=4, iters=1,
        batch_id=0,
    )
    quantize.append_to_ivfpq_index(
        b, "vec_id", "embedding", path, batch_id=1
    )
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0][1]]
    before = [
        (r.vec_id, float(r.adc_dist2))
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=8, nprobe=4
        ).collect()
    ]
    quantize.compact_ivfpq_index(spark, path)
    stored = spark.read.parquet(path)
    assert "_batch" not in stored.columns
    assert stored.count() == a.count() + b.count()
    after = [
        (r.vec_id, float(r.adc_dist2))
        for r in quantize.search_ivfpq_index(
            spark, path, q, "vec_id", k_out=8, nprobe=4
        ).collect()
    ]
    assert after == before

    # batch append works on the compacted layout
    assert quantize.append_to_ivfpq_index(
        last, "vec_id", "embedding", path
    ) == 1
    assert spark.read.parquet(path).count() == emb.count()
