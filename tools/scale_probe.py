"""Empirical scale probe: run the linear-path LLM operators at N and 2N
synthetic rows and report wall-time growth ratios.

The contract fixtures (sf0.1: 5 k docs, 2 k vectors) verify correctness;
this probe is the evidence for the SCALE.md claims — the LSH/bucketed
paths should grow ≈linearly (ratio ≈ 2 for 2× input, modulo fixed
overhead), while the capped N² paths are excluded by construction at
scale.  Data is generated INSIDE Spark (range + hash arithmetic — no
driver-side rows), with planted exact twins, near-dup chains, and a
dense embedding cluster so every operator has real work to do.

Usage: python tools/scale_probe.py [N]   (default 100_000 docs; embeddings
N/2).  Prints one JSON line with per-op seconds at N and 2N and ratios.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

def gen_documents(spark, n: int) -> DataFrame:
    """n synthetic docs over a 5000-token hash vocabulary (large enough
    that no shingle is corpus-hot — the realistic regime): 1-in-50 an
    exact twin of its predecessor, 1-in-50 a near-dup (one appended
    word); everything hash-derived so generation is pure codegen over
    spark.range."""
    seed = F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(
        F.when(F.col("id") % 50 == 2, F.col("id") - 2).otherwise(F.col("id"))
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.hash(F.col("seed"), i), F.lit(5000)).cast("string"),
        ),
    )
    body = F.concat_ws(" ", words)
    text = F.when(
        F.col("id") % 50 == 2, F.concat(body, F.lit(" extra"))
    ).otherwise(body)
    return (
        spark.range(n)
        .withColumn("seed", seed)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
    )


def gen_embeddings(spark, n: int, dim: int = 64) -> DataFrame:
    """n pseudo-random unit-cube vectors; 10% fall into clusters of ~20
    near-identical members (shared direction + small hash-noise), so the
    true near-dup pair count grows LINEARLY with n — the realistic
    duplicate structure a linear-path claim must be measured against."""
    cluster = (F.col("id") / 10) % F.lit(max(n // 200, 1))
    base = F.when(
        F.col("id") % 10 == 0, cluster.cast("long") + F.lit(10_000_000)
    ).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.pmod(F.hash(F.col("b"), i), F.lit(2000)).cast("double") / 1000.0
            - 1.0
        )
        + F.when(
            F.col("id") % 10 == 0,
            (
                F.pmod(F.hash(F.col("id"), i, F.lit(7)), F.lit(100)).cast(
                    "double"
                )
                / 2000.0
            ),
        ).otherwise(F.lit(0.0)),
    )
    return (
        spark.range(n)
        .withColumn("b", base)
        .select(
            F.col("id").alias("vec_id"),
            vec.cast("array<float>").alias("embedding"),
        )
    )


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def _ppm(found: int, expected: int) -> int:
    """Recall as parts-per-million, rounded ONCE in integer space.

    ADVICE r10: the old ``int(round(r, 6) * 1_000_000)`` rounded to six
    decimals FIRST and then float-multiplied, so 0.9955 could become
    995499.99… and int() truncation understated the ppm by 1."""
    return int(round(found / max(expected, 1) * 1_000_000))


def run_at(spark, n_docs: int) -> dict[str, tuple[float, int]]:
    from snowav_spark.ops import dedup, graph, packing, similarity, text

    docs = gen_documents(spark, n_docs).localCheckpoint(eager=True)
    emb = gen_embeddings(spark, n_docs // 2).localCheckpoint(eager=True)
    out: dict[str, tuple[float, int]] = {}

    import os

    _only = os.environ.get("PROBE_ONLY")
    _only = set(_only.split(",")) if _only else None

    def run_op(name, fn):
        """PROBE_ONLY=a,b,c isolates ops: the round-5 postmortem showed
        the sequential suite accumulates checkpoint blocks, so LATE ops
        at the larger size pay GC the smaller size didn't — a >2 suite
        ratio on a bounded op must be re-timed in isolation before
        diagnosing the plan."""
        if _only is None or name in _only:
            out[name] = timed(fn)

    run_op("exact_dedup", 
        lambda: dedup.drop_exact_dups(docs, "text", "doc_id").count()
    )
    run_op("minhash_lsh", 
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text").count()
    )
    run_op("clean_text", 
        lambda: text.clean_docs(docs, "doc_id", "text").count()
    )
    # Constant-occupancy rule: bits ≈ log2(N / target_bucket_size), so the
    # candidate cost Σ n_bucket² stays ~linear as the corpus grows.  With
    # bits FIXED instead, occupancy doubles per corpus doubling and the
    # measured ratio is ~4 — exactly what this probe exists to expose.
    import math

    bits = max(int(math.log2(max(n_docs // 2, 2) / 6)), 4)
    run_op("embed_lsh_dedup",
        lambda: similarity.dedup_pairs_lsh(
            emb, "vec_id", "embedding", 0.9, tables=4, bits=bits,
            max_bucket=2000,
        ).count()
    )
    # SemDeDup: same constant-occupancy rule as the LSH path, applied
    # to k-means cells — n_cells ∝ corpus keeps per-cell membership
    # (and the per-row candidate cost ≈ occupancy × nprobe) constant;
    # fixed n_cells would double occupancy per doubling and re-create
    # the quadratic term the probe exists to expose.  Occupancy ~40:
    # candidate volume ≈ n × 80, the same order as the LSH probe's
    # bucket budget — a 1500-occupancy first attempt put ~600M exact
    # verifies in one leg.
    n_cells = max((n_docs // 2) // 40, 8)
    run_op("semdedup",
        lambda: similarity.semdedup_pairs(
            emb, "vec_id", "embedding", 0.9,
            n_cells=n_cells, iters=1, nprobe=2, max_cluster=2000,
        ).count()
    )

    def _semdedup_recall():
        """Measured RECALL per scale point (VERDICT r9 item 5): the
        fraction of planted same-cluster pairs the cluster-then-verify
        path recovers.  The planted clusters are near-identical by
        construction (every member passes the 0.9 exact verify — r9's
        pair counts matched C(20,2)*clusters exactly), so planted-pair
        recovery IS recall vs the exact twin, without paying an N^2
        ground-truth pass at probe scale.  Returned as recall*10^6 in
        the count slot so the (seconds, n) probe record carries it."""
        from math import comb

        n_emb = n_docs // 2
        pairs = similarity.semdedup_pairs(
            emb, "vec_id", "embedding", 0.9,
            n_cells=n_cells, iters=1, nprobe=2, max_cluster=2000,
        )
        cl = F.pmod((F.col("vec_id") / 10).cast("long"),
                    F.lit(max(n_emb // 200, 1)))
        members = emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", cl.alias("cl")
        )
        a = members.select(F.col("vec_id").alias("id_a"),
                           F.col("cl").alias("ca"))
        b = members.select(F.col("vec_id").alias("id_b"),
                           F.col("cl").alias("cb"))
        found = (
            pairs.join(F.broadcast(a), "id_a")
            .join(F.broadcast(b), "id_b")
            .filter("ca = cb").count()
        )
        sizes = members.groupBy("cl").count().collect()
        expected = sum(comb(r["count"], 2) for r in sizes)
        return _ppm(found, expected)

    run_op("semdedup_recall", _semdedup_recall)
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text").select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    run_op("cc_resolve",
        lambda: graph.resolve_duplicates(pairs, "doc_id").count()
    )

    # Graph analytics family (VERDICT r7 item 5): a small-world ring
    # graph — n_docs vertices, out-degree 4 into a 10-hop neighborhood,
    # so |E| ~ 4·n and triangles/peel-rounds/moments all have real work
    # that doubles with n.  Expected growth ≈ linear: wedge closing is
    # bounded by degree-oriented out-degrees (constant here), peeling by
    # rounds × one agg + anti-join, moments by two edge-degree joins.
    if _only is None or {
        "graph_triangles", "graph_degree_hist",
        "graph_assortativity", "graph_kcore",
    } & _only:
        g_edges = (
            spark.range(n_docs * 4)
            .select(
                (F.col("id") / 4).cast("long").alias("src"),
                F.pmod(
                    (F.col("id") / 4).cast("long")
                    + 1
                    + F.pmod(F.hash("id"), F.lit(10)),
                    F.lit(n_docs),
                ).alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
        run_op("graph_triangles",
            lambda: graph.triangle_stats(g_edges).count()
        )
        run_op("graph_degree_hist",
            lambda: graph._degrees(
                graph._canonical_edges(g_edges, "src", "dst")
            ).groupBy("d").count().count()
        )

        def _assort():
            e = graph._canonical_edges(
                g_edges, "src", "dst"
            ).localCheckpoint(eager=False)
            deg = graph._degrees(e)
            pair = (
                e.join(deg.withColumnRenamed("v", "a"), "a")
                .withColumnRenamed("d", "x")
                .join(deg.withColumnRenamed("v", "b"), "b")
                .withColumnRenamed("d", "y")
                .select("x", "y")
            )
            ep = pair.unionAll(pair.selectExpr("y AS x", "x AS y"))
            return graph.endpoint_assortativity(ep).count()

        run_op("graph_assortativity", _assort)
        # k=4 on an avg-degree-~7.x graph: real peel cascades without
        # the ring-propagation chain k=5 triggers (hundreds of rounds —
        # each round peels only the chain frontier)
        run_op("graph_kcore",
            lambda: graph.k_core(g_edges, 4, max_rounds=300).count()
        )

    # Zarr chunk-partitioned scan: one task per chunk, so scan cost is
    # ~linear in chunk count at fixed chunk size (the layout claim of
    # sources/zarr_source.py).  Chunks are (1, 64, 64) float64 slabs;
    # n_docs/1000 timesteps -> n_docs/1000 chunks of 32 KiB.
    if _only is None or "zarr_scan" in _only:
        import shutil as _sh
        import tempfile as _tf

        import numpy as _np

        from snowav_spark.sources import zarr as _zmod

        zroot = _tf.mkdtemp(prefix="probe_zarr_")
        zdir = zroot + "/arr"
        t_steps = max(n_docs // 1000, 8)
        rng = _np.random.RandomState(5)
        # write chunk files directly (driver-side generation is NOT the
        # timed path; the scan is)
        _zmod.write_array(
            zdir,
            rng.rand(1, 64, 64),  # placeholder; meta then patched
            (1, 64, 64),
        )
        import json as _json

        meta = _json.load(open(zdir + "/.zarray"))
        meta["shape"] = [t_steps, 64, 64]
        _json.dump(meta, open(zdir + "/.zarray", "w"))
        import zlib as _zl

        for ti in range(1, t_steps):
            raw = rng.rand(1, 64, 64).astype("<f8").tobytes()
            with open(f"{zdir}/{ti}.0.0", "wb") as f:
                f.write(_zl.compress(raw, 1))

        from snowav_spark import sources as _sources

        _sources.register(spark)

        def _zarr_scan():
            df = spark.read.format("snowav_zarr").load(zdir)
            return df.filter(~F.isnan("value")).count()

        _zarr_scan()  # untimed warmup: a PROBE_ONLY single-op run would
        # otherwise charge session/JIT warmup entirely to the 1x leg
        run_op("zarr_scan", _zarr_scan)
        _sh.rmtree(zroot, ignore_errors=True)

    # Arrow IPC source: file-per-partition scan with batches passed to
    # the JVM as-is — growth should track file count ~linearly at fixed
    # batch size (sources/arrow_source.py).
    if _only is None or "arrow_scan" in _only:
        import os as _os
        import shutil as _sh
        import tempfile as _tf

        import numpy as _np
        import pyarrow as _pa

        aroot = _tf.mkdtemp(prefix="probe_arrow_")
        n_files = max(n_docs // 25_000, 4)
        rows_per = 25_000
        rng = _np.random.RandomState(9)
        schema = _pa.schema(
            [("doc_id", _pa.int64()), ("text", _pa.string())]
        )
        for i in range(n_files):
            tbl = _pa.table(
                {
                    "doc_id": _pa.array(
                        range(i * rows_per, (i + 1) * rows_per),
                        _pa.int64(),
                    ),
                    "text": _pa.array(
                        [f"w{rng.randint(5000)} body" for _ in range(rows_per)]
                    ),
                },
                schema=schema,
            )
            with _pa.ipc.new_file(
                _os.path.join(aroot, f"p{i}.arrow"), schema
            ) as w:
                w.write_table(tbl)

        from snowav_spark import sources as _srcs

        _srcs.register(spark)

        def _arrow_scan():
            df = spark.read.format("snowav_arrow").load(aroot)
            return df.filter(F.length("text") > 0).count()

        _arrow_scan()  # untimed warmup (see zarr_scan)
        run_op("arrow_scan", _arrow_scan)
        _sh.rmtree(aroot, ignore_errors=True)

    # Sharded Zarr v3 (sharding_indexed): same cell count as zarr_scan
    # but inner chunks packed 8-per-shard-file — the production
    # object-store layout.  Growth must stay linear AND match the
    # unsharded twin's cost: the shard index is parsed once per shard
    # at PLANNING, so each executor task is a single pread.
    if _only is None or "zarr_scan_sharded" in _only:
        import shutil as _sh
        import tempfile as _tf

        import numpy as _np

        from snowav_spark.sources import zarr as _zmod

        zroot = _tf.mkdtemp(prefix="probe_zarr_sh_")
        zdir = zroot + "/arr"
        t_steps = max(n_docs // 1000, 8)
        rng = _np.random.RandomState(5)
        _zmod.write_array_v3_sharded(
            zdir,
            rng.rand(t_steps, 64, 64),
            shard_shape=(8, 64, 64),
            inner_chunks=(1, 64, 64),
            compressor="gzip",
        )

        from snowav_spark import sources as _sources

        _sources.register(spark)

        def _zarr_scan_sh():
            df = spark.read.format("snowav_zarr").load(zdir)
            return df.filter(~F.isnan("value")).count()

        _zarr_scan_sh()  # untimed warmup (see zarr_scan)
        run_op("zarr_scan_sharded", _zarr_scan_sh)
        _sh.rmtree(zroot, ignore_errors=True)

    # MB-scale chunks (the production knob the KB-chunk probes can't
    # pin): (1, 1024, 1024) float64 = 8 MB raw per chunk.  At this size
    # per-chunk decode dominates task scheduling, so the ratio isolates
    # the decode path's linearity — the per-chunk floor claim.
    if _only is None or "zarr_scan_mb" in _only:
        import shutil as _sh
        import tempfile as _tf

        import numpy as _np

        from snowav_spark.sources import zarr as _zmod

        zroot = _tf.mkdtemp(prefix="probe_zarr_mb_")
        zdir = zroot + "/arr"
        t_steps = max(n_docs // 25_000, 8)
        rng = _np.random.RandomState(6)
        _zmod.write_array(
            zdir, rng.rand(t_steps, 1024, 1024), (1, 1024, 1024)
        )

        from snowav_spark import sources as _sources

        _sources.register(spark)

        def _zarr_scan_mb():
            df = spark.read.format("snowav_zarr").load(zdir)
            return df.filter(~F.isnan("value")).count()

        _zarr_scan_mb()  # untimed warmup (see zarr_scan)
        run_op("zarr_scan_mb", _zarr_scan_mb)
        _sh.rmtree(zroot, ignore_errors=True)

    # Arrow IPC at MB-scale files: 1M rows × (int64, float64) = 16 MB
    # per file — fewer, bigger partitions, the regime where per-file
    # decode (not task-wave scheduling) is the cost.
    if _only is None or "arrow_scan_mb" in _only:
        import os as _os
        import shutil as _sh
        import tempfile as _tf

        import numpy as _np
        import pyarrow as _pa

        aroot = _tf.mkdtemp(prefix="probe_arrow_mb_")
        n_files = max(n_docs // 100_000, 4)
        rows_per = 1_000_000
        rng = _np.random.RandomState(10)
        schema = _pa.schema(
            [("doc_id", _pa.int64()), ("value", _pa.float64())]
        )
        for i in range(n_files):
            tbl = _pa.table(
                {
                    "doc_id": _pa.array(
                        _np.arange(
                            i * rows_per, (i + 1) * rows_per,
                            dtype=_np.int64,
                        )
                    ),
                    "value": _pa.array(rng.rand(rows_per)),
                },
                schema=schema,
            )
            with _pa.ipc.new_file(
                _os.path.join(aroot, f"p{i}.arrow"), schema
            ) as w:
                w.write_table(tbl)

        from snowav_spark import sources as _srcs

        _srcs.register(spark)

        def _arrow_scan_mb():
            df = spark.read.format("snowav_arrow").load(aroot)
            return df.filter(F.col("value") >= 0.0).count()

        _arrow_scan_mb()  # untimed warmup (see zarr_scan)
        run_op("arrow_scan_mb", _arrow_scan_mb)
        _sh.rmtree(aroot, ignore_errors=True)

    # IVF-PQ: build cost must stay ~linear (one pass + sampled training);
    # SERVE cost must stay ~flat when n_cells grows with the corpus
    # (constant per-cell occupancy — the partition-pruned probe then
    # reads a constant number of rows at any corpus size).
    if _only is None or {"ivfpq_build", "ivfpq_search"} & _only:
        import shutil
        import tempfile

        from snowav_spark.ops import quantize

        n_vec = n_docs // 2
        root = tempfile.mkdtemp(prefix="probe_ivfpq_")
        idx = root + "/idx"
        # constant per-cell occupancy (the IVF analog of the LSH bits
        # rule): cells grow with the corpus, so nprobe directories hold
        # a fixed row count and serve cost stays flat
        n_cells = max(8, n_vec // 6_250)
        frac = min(1.0, 50_000 / max(n_vec, 1))
        # the float store a real deployment re-ranks against: parquet
        # laid out by id, so the shortlist IN-filter prunes row groups
        store = root + "/floats"
        emb.orderBy("vec_id").write.parquet(store)
        emb_store = spark.read.parquet(store)

        def _build_ivfpq():
            quantize.build_ivfpq_index(
                emb, "vec_id", "embedding", idx, n_cells=n_cells,
                m=8, k=16, iters=1, dim=64, train_fraction=frac,
            )
            return spark.read.parquet(idx).count()

        run_op("ivfpq_build", _build_ivfpq)
        if _only is not None and "ivfpq_build" not in _only:
            # PROBE_ONLY=ivfpq_search: the search still needs an index —
            # build it UNTIMED (run_op skipped the timed build above)
            _build_ivfpq()
        qvs = [
            [float(x) for x in r.embedding]
            for r in emb.orderBy("vec_id").limit(5).collect()
        ]
        run_op("ivfpq_search",
            lambda: sum(
                len(
                    quantize.search_ivfpq_index(
                        spark, idx, qv, "vec_id", k_out=10, nprobe=4,
                        rerank=emb_store,
                    ).collect()
                )
                for qv in qvs
            )
        )
        shutil.rmtree(root, ignore_errors=True)

    # Inverted text index: build linear (one tokenize pass); SEARCH must
    # stay flat when n_buckets grows with the corpus (constant per-bucket
    # postings — same constant-occupancy rule as IVF cells/LSH bits).
    if _only is None or {"textidx_build", "textidx_search"} & _only:
        import shutil
        import tempfile

        from snowav_spark.ops import text as text_ops

        troot = tempfile.mkdtemp(prefix="probe_textidx_")
        tidx = troot + "/idx"
        tn_buckets = max(16, n_docs // 3_125)
        def _build_textidx():
            text_ops.build_text_index(
                docs, "doc_id", "text", tidx, n_buckets=tn_buckets
            )
            return spark.read.parquet(
                tidx.rstrip("/") + "/_corpus_stats"
            ).count()

        run_op("textidx_build", _build_textidx)
        if _only is not None and "textidx_build" not in _only:
            _build_textidx()  # search-only isolation still needs the index
        # the generator's vocabulary is w0..w4999
        queries = [
            ["w17", "w123"], ["w999"], ["w5", "w2500", "w4000"],
            ["w42"], ["w1234", "w77"],
        ]
        run_op("textidx_search",
            lambda: sum(
                len(
                    text_ops.search_text_index(
                        spark, tidx, q, k=10
                    ).collect()
                )
                for q in queries
            )
        )
        shutil.rmtree(troot, ignore_errors=True)
    lens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    run_op("pack", 
        lambda: packing.pack_sequences(
            lens, "doc_id", "n_tokens", 512, n_shards=64
        ).count()
    )
    run_op("chunk", 
        lambda: text.chunk_docs(docs, "doc_id", "text", 20, 10).count()
    )
    run_op("simhash", 
        lambda: dedup.simhash(docs, "doc_id", "text").count()
    )
    run_op("span_dedup", 
        lambda: dedup.span_dup_stats(docs, "doc_id", "text", n=5).count()
    )

    from snowav_spark.ops import sampling, windows

    run_op("global_decile", 
        lambda: sampling.global_decile_assign(
            docs.select(
                "doc_id", F.length("text").alias("n_chars")
            ),
            "n_chars",
            q=10,
        ).count()
    )
    # synthetic events: n_docs rows over n/100 users × 60 days, pure
    # codegen off spark.range — rolling_active's cost is driven by the
    # distinct (user, day) frame, which grows linearly here.
    ev = (
        spark.range(n_docs)
        .select(
            F.pmod(F.hash("id"), F.lit(max(n_docs // 100, 1))).alias(
                "user_id"
            ),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(
                    days=F.pmod(F.hash("id", F.lit(1)), F.lit(60))
                )
            ).alias("ts"),
            F.concat(
                F.lit("e"), F.pmod(F.hash("id", F.lit(2)), F.lit(5))
            ).alias("event_type"),
            F.col("id").alias("event_id"),
        )
        .localCheckpoint(eager=True)
    )
    run_op("rolling_active", 
        lambda: windows.rolling_active(ev, "ts", "user_id", days=7).count()
    )
    run_op("transitions", 
        lambda: windows.transition_counts(
            ev, "user_id", "ts", "event_type", "event_id"
        ).count()
    )

    # fuzzy-join frontier: n/10 syllable-composed names (hash-derived,
    # so some trigrams are corpus-hot) reconciled against their
    # first-char-dropped typos.  max_df caps the hot grams on both
    # sides — without it Σ df(g)² over the hot grams would dominate;
    # the measured ratio is the evidence the cap keeps growth linear.
    from snowav_spark.ops import joins

    names = (
        spark.range(max(n_docs // 10, 100))
        .select(
            F.col("id").alias("key"),
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(1), F.lit(4)),
                    lambda i: F.concat(
                        F.lit("s"),
                        F.pmod(F.hash(F.col("id"), i), F.lit(500)).cast(
                            "string"
                        ),
                    ),
                ),
            ).alias("name"),
        )
        .localCheckpoint(eager=True)
    )
    typos = names.select(
        (F.col("key") + 100_000_000).alias("key"),
        F.expr("substr(name, 2)").alias("name"),
    )
    run_op("fuzzy_join", 
        lambda: joins.fuzzy_join(
            typos, names, "key", "key", "name", "name",
            max_dist=1, max_df=200,
        ).count()
    )

    # round-5 operators
    from snowav_spark.ops import skyline, text as text_ops, windows as w_ops

    sky_in = docs.select(
        F.col("doc_id"),
        F.pmod(F.hash("doc_id"), F.lit(2000)).cast("double").alias("x"),
        F.pmod(F.hash("doc_id", F.lit(3)), F.lit(2000)).alias("y"),
    )
    run_op("skyline", 
        lambda: skyline.skyline_points(sky_in, "x", "y", "doc_id").count()
    )
    run_op("scd2", 
        lambda: w_ops.scd2_segments(
            ev, "user_id", "ts", "event_type", "event_id"
        ).count()
    )
    ivl = (
        spark.range(60)
        .select(
            F.col("id").alias("wid"),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=F.col("id"))
            ).alias("ws"),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=F.col("id") + 3)
            ).alias("we"),
        )
        .localCheckpoint(eager=True)
    )
    run_op("interval_join", 
        lambda: joins.interval_join(
            ev, ivl, "ts", "wid", "ws", "we", 3 * 86_400
        ).groupBy("wid").count().count()
    )
    run_op("bigram_lm", 
        lambda: text_ops.bigram_counts(docs, "text").count()
    )
    run_op("reservoir", 
        lambda: sampling.reservoir_per_group(
            docs.select(
                F.pmod(F.col("doc_id"), F.lit(100)).alias("grp"), "doc_id"
            ),
            "grp",
            "doc_id",
            10,
        ).count()
    )

    # round-5b compositions (mirroring the contract plan shapes on the
    # synthetic event frame — all first-collapse-then-window/join, so the
    # expected growth is linear)
    from pyspark.sql.window import Window

    def _running_distinct():
        first = (
            ev.select(
                "event_type", "user_id", F.to_date("ts").alias("day")
            )
            .groupBy("event_type", "user_id")
            .agg(F.min("day").alias("first_day"))
        )
        daily = first.groupBy("event_type", "first_day").agg(
            F.count("*").alias("new_users")
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("first_day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return daily.select(
            "event_type", F.sum("new_users").over(w).alias("cum")
        ).count()

    run_op("running_distinct", _running_distinct)

    def _top_paths():
        sess = (
            ev.select(
                "user_id",
                F.to_date("ts").alias("day"),
                F.struct("ts", "event_id", "event_type").alias("e"),
            )
            .groupBy("user_id", "day")
            .agg(
                F.array_join(
                    F.transform(
                        F.slice(F.array_sort(F.collect_list("e")), 1, 20),
                        lambda x: x.event_type,
                    ),
                    ">",
                ).alias("path")
            )
        )
        return (
            sess.groupBy("path")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("path"))
            .limit(10)
            .count()
        )

    run_op("top_paths", _top_paths)

    def _weighted_median():
        vals = ev.select(
            "event_type",
            F.pmod(F.hash("event_id"), F.lit(20)).alias("v"),
            F.lit(1).cast("bigint").alias("wt"),
        )
        wf = vals.groupBy("event_type", "v").agg(F.sum("wt").alias("w"))
        cum = (
            Window.partitionBy("event_type")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tot = Window.partitionBy("event_type")
        c = wf.select(
            "event_type",
            "v",
            F.sum("w").over(cum).alias("cw"),
            F.sum("w").over(tot).alias("tw"),
        )
        return (
            c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
            .groupBy("event_type")
            .agg(F.min("v"))
            .count()
        )

    run_op("weighted_median", _weighted_median)

    def _market_basket():
        ob = ev.select(
            F.col("user_id").alias("bid"), F.col("event_type").alias("itm")
        ).distinct().localCheckpoint(eager=False)
        aa, bb = ob.alias("a"), ob.alias("b")
        return (
            aa.join(
                bb,
                (F.col("a.bid") == F.col("b.bid"))
                & (F.col("a.itm") < F.col("b.itm")),
            )
            .groupBy(F.col("a.itm"), F.col("b.itm"))
            .agg(F.count("*"))
            .count()
        )

    run_op("market_basket", _market_basket)

    # round-5c compositions: attribution band join, gaps-and-islands
    # streaks, 16-lag EWMA window, keyword lambda-filter, frequency-table
    # gini — all first-collapse-then-window/join shapes, expected linear
    def _attribution():
        p = ev.filter(F.col("event_type") == "e0").select(
            "event_id", "user_id", "ts"
        )
        v = ev.filter(F.col("event_type") == "e1").select("user_id", "ts")
        pairs = joins.lookback_pairs(
            p, v, ["user_id"], "ts", "ts", 7 * 86400, ["event_id"], []
        )
        w = Window.partitionBy("event_id")
        return (
            pairs.withColumn("n", F.count("*").over(w))
            .groupBy(F.to_date(F.timestamp_micros(F.col("_le"))).alias("d"))
            .agg(F.sum(F.expr("1000000 div n")).alias("c"))
            .count()
        )

    run_op("attribution", _attribution)

    def _streaks():
        d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
        w = Window.partitionBy("user_id").orderBy("day")
        r = d.select(
            "user_id",
            (
                F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
                - F.row_number().over(w)
            ).alias("grp"),
        )
        return (
            r.groupBy("user_id", "grp")
            .agg(F.count("*").alias("len"))
            .groupBy("user_id")
            .agg(F.max("len").alias("m"))
            .groupBy("m")
            .count()
            .count()
        )

    run_op("streaks", _streaks)

    def _ewma16():
        d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count("*").alias("ym")
        )
        w = Window.partitionBy("event_type").orderBy("day")
        num = None
        for lag in range(16):
            t = F.coalesce(F.lag("ym", lag).over(w), F.lit(0)) * (
                1 << (15 - lag)
            )
            num = t if num is None else num + t
        return d.select("event_type", "day", num.alias("s")).count()

    run_op("ewma16", _ewma16)

    def _keyword_tags():
        t = docs.select(
            F.explode(
                F.expr(
                    "filter(array('w1','w22','w333','w4','w55','w666',"
                    "'w77'), k -> instr(text, k) > 0)"
                )
            ).alias("kw")
        )
        return t.groupBy("kw").count().count()

    run_op("keyword_tags", _keyword_tags)

    def _gini_freq():
        lens = docs.select(
            F.pmod(F.hash("doc_id"), F.lit(20)).alias("src"),
            F.length("text").alias("v"),
        )
        freq = lens.groupBy("src", "v").agg(F.count("*").alias("cnt"))
        w = (
            Window.partitionBy("src")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        c = freq.withColumn("c0", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        return (
            c.groupBy("src")
            .agg(
                F.sum(
                    (
                        2 * F.col("cnt") * F.col("c0")
                        + F.col("cnt") * (F.col("cnt") + 1)
                    )
                    * F.col("v")
                ).alias("t2")
            )
            .count()
        )

    run_op("gini_freq", _gini_freq)

    # q_ttr shape: explode -> (source, token) hash agg.  The shuffle is
    # vocabulary-sized (src × 5000-token vocab here), so cost is the
    # linear explode+partial-agg pass, not the constant-size final agg.
    def _ttr():
        toks = docs.select(
            F.pmod(F.hash("doc_id"), F.lit(20)).alias("src"),
            F.explode(F.split("text", " ")).alias("w"),
        ).filter(F.col("w") != "")
        c = toks.groupBy("src", "w").agg(F.count("*").alias("cnt"))
        return (
            c.groupBy("src")
            .agg(
                F.sum("cnt").alias("n_tokens"),
                F.count("*").alias("n_types"),
                F.count_if(F.col("cnt") == 1).alias("n_hapax"),
            )
            .count()
        )

    run_op("ttr", _ttr)

    # q_source_jaccard shape: distinct (src, token) vocab frame, then a
    # token-keyed self equi-join.  Per-token fan-out is ≤ |sources|² (20²
    # here) independent of corpus size, so the join cost is bounded by
    # |vocab|·|sources|² — the measured ratio isolates the linear
    # corpus-collapse pass from the constant pair stage.
    def _source_jaccard():
        vv = (
            docs.select(
                F.pmod(F.hash("doc_id"), F.lit(20)).alias("src"),
                F.explode(F.split("text", " ")).alias("w"),
            )
            .filter(F.col("w") != "")
            .distinct()
        )
        a = vv.select(F.col("src").alias("s1"), "w")
        b = vv.select(F.col("src").alias("s2"), "w")
        return (
            a.join(b, (a.w == b.w) & (F.col("s1") < F.col("s2")))
            .groupBy("s1", "s2")
            .agg(F.count("*").alias("n_common"))
            .count()
        )

    run_op("source_jaccard", _source_jaccard)

    # q_growth_accounting shape: distinct (user, day) collapse, then a
    # running-min + lag window pair on ONE per-user partition (bounded by
    # days-per-user: ≤60 here), then a day-keyed hash agg.
    def _growth():
        ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
        w_all = Window.partitionBy("user_id")
        w_ord = Window.partitionBy("user_id").orderBy(F.col("day").asc())
        c = ud.select(
            "day",
            F.min("day").over(w_all).alias("first_day"),
            F.lag("day").over(w_ord).alias("prev"),
        )
        gap = F.datediff(F.col("day"), F.col("prev"))
        return (
            c.groupBy("day")
            .agg(
                F.count_if(F.col("day") == F.col("first_day")).alias("nn"),
                F.count_if(gap == 1).alias("nr"),
                F.count_if(
                    (F.col("day") != F.col("first_day"))
                    & (F.col("prev").isNull() | (gap > 1))
                ).alias("ns"),
            )
            .count()
        )

    run_op("growth_accounting", _growth)

    # the remaining event-analytics contract keys run AS-IS against the
    # synthetic frame written out as a fixture dir: interarrival (distinct
    # -> per-user lag window -> bucket agg), churn (distinct collapse
    # checkpointed, lead window + 1-row max broadcast), peak concurrency
    # (sessionize -> intervals -> per-day endpoint sweep).  Timing the
    # contract functions themselves means the measured shape is exactly
    # what the driver grades.
    import shutil
    import tempfile

    from snowav_spark.contract import QUERIES

    evdir = tempfile.mkdtemp(prefix="probe_ev_")
    try:
        ev.write.mode("overwrite").parquet(f"{evdir}/events.parquet")
        for key in (
            "q_interarrival",
            "q_churn",
            "q_peak_concurrency",
            "q_session_duration",
            "q_hhi",
        ):
            run_op(
                key.removeprefix("q_"),
                lambda k=key: QUERIES[k](spark, evdir).count(),
            )
    finally:
        shutil.rmtree(evdir, ignore_errors=True)

    # Star-schema contract keys (Q4/Q5/Q8/Q14 shapes + fan-out profile):
    # synthetic orders (N/4 rows) with hash-fanout lineitem (~N rows) and
    # small fixed dims, all generated codegen-side and written as a
    # fixture dir so the TIMED code is the contract functions themselves.
    # Every one of these is a broadcast-dim join tree over one fact
    # shuffle — the probe checks the measured growth stays ~linear in the
    # fact size.
    n_ord = n_docs // 4
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.hash("id", F.lit(3)), F.lit(max(n_ord // 10, 1))).alias(
            "o_custkey"
        ),
        (
            F.lit("1995-01-01").cast("timestamp")
            + F.make_interval(
                days=F.pmod(F.hash("id", F.lit(4)), F.lit(2000))
            )
        ).alias("o_orderdate"),
        F.concat(
            F.lit("P"), F.pmod(F.hash("id", F.lit(5)), F.lit(5))
        ).alias("o_orderpriority"),
    )
    li = (
        spark.range(n_ord)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.pmod(F.hash("id", F.lit(6)), F.lit(7)) + 1,
                )
            ).alias("ln"),
        )
        .select(
            "l_orderkey",
            F.pmod(F.hash("l_orderkey", "ln", F.lit(7)), F.lit(100)).alias(
                "l_suppkey"
            ),
            F.pmod(F.hash("l_orderkey", "ln", F.lit(8)), F.lit(2000)).alias(
                "l_partkey"
            ),
            (
                F.pmod(F.hash("l_orderkey", "ln", F.lit(9)), F.lit(90000))
                .cast("double")
                / 100.0
                + 1.0
            ).alias("l_extendedprice"),
            (
                F.pmod(F.hash("l_orderkey", "ln", F.lit(10)), F.lit(10))
                .cast("double")
                / 100.0
            ).alias("l_discount"),
            (
                F.lit("1995-01-01").cast("timestamp")
                + F.make_interval(
                    days=F.pmod(F.hash("l_orderkey", "ln", F.lit(11)), F.lit(2030))
                )
            ).alias("l_shipdate"),
        )
    )
    customer = spark.range(max(n_ord // 10, 1)).select(
        F.col("id").alias("c_custkey"),
        F.pmod(F.hash("id", F.lit(12)), F.lit(25)).cast("int").alias(
            "c_nationkey"
        ),
    )
    supplier = spark.range(100).select(
        F.col("id").alias("s_suppkey"),
        F.pmod(F.hash("id", F.lit(13)), F.lit(25)).cast("int").alias(
            "s_nationkey"
        ),
    )
    part = spark.range(2000).select(
        F.col("id").alias("p_partkey"),
        F.when(F.col("id") % 6 == 0, "PROMO")
        .otherwise(F.concat(F.lit("T"), (F.col("id") % 6).cast("string")))
        .alias("p_type"),
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string")).alias(
            "n_name"
        ),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    region = spark.createDataFrame(
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
         (4, "MIDDLE EAST")],
        ["r_regionkey", "r_name"],
    )
    stardir = tempfile.mkdtemp(prefix="probe_star_")
    try:
        for name, df in (
            ("orders", orders), ("lineitem", li), ("customer", customer),
            ("supplier", supplier), ("part", part), ("nation", nation),
            ("region", region),
        ):
            df.write.mode("overwrite").parquet(f"{stardir}/{name}.parquet")
        for key in (
            "q_regional_volume",
            "q_market_share",
            "q_late_orders",
            "q_promo_share",
            "q_fanout_profile",
        ):
            run_op(
                key.removeprefix("q_"),
                lambda k=key: QUERIES[k](spark, stardir).count(),
            )
    finally:
        shutil.rmtree(stardir, ignore_errors=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import os

    # The probe packs driver + 32 executor threads + every run's eager
    # localCheckpoint blocks into ONE JVM; at 1M-doc scale the contract
    # default (8g) fills with checkpoint blocks and the next broadcast
    # build dies.  A real cluster spreads these across executors — for
    # the single-JVM probe, size the heap to the simulation.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from snowav_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    import gc

    def run_and_release(nd):
        out = run_at(spark, nd)
        # drop the run's eager localCheckpoint blocks before the next,
        # larger run claims the heap (ContextCleaner frees them on GC)
        gc.collect()
        return out

    run_and_release(max(n // 10, 1000))  # untimed warmup: JIT + codegen
    r1 = run_and_release(n)
    r2 = run_and_release(2 * n)
    report = {
        "n_docs": n,
        "ops": {
            k: {
                "sec_1x": r1[k][0],
                "sec_2x": r2[k][0],
                "rows_1x": r1[k][1],
                "rows_2x": r2[k][1],
                "ratio": round(r2[k][0] / r1[k][0], 2) if r1[k][0] else None,
            }
            for k in r1
        },
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
