"""Structured Streaming incremental mode: availableNow daily rollup with
watermark semantics, and stateful in-stream dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.streaming import incremental


@pytest.fixture()
def staged_events(spark, sf_dir, tmp_path):
    """Stage the events fixture (nanos already converted) as a stream
    input directory."""
    src = str(tmp_path / "in")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.write.parquet(src)
    return src, ev.schema, ev


def test_daily_rollup_stream_matches_batch_below_watermark(
    spark, tmp_path, staged_events
):
    src, schema, ev = staged_events
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = incremental.stream_source(spark, src, schema)
    rolled = incremental.daily_rollup_stream(stream, "ts", ["event_type"], "value")
    q = incremental.run_to_sink(rolled, out, ckpt, once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # append mode emits only windows finalized by the watermark:
    # watermark = max(ts) - 1 day → the last open day (and any later) stays
    # in state. Everything emitted must exactly match the batch rollup.
    batch = (
        ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("sum_value"), F.count("*").alias("n"))
    )
    emitted_days = [r.day for r in got.select("day").distinct().collect()]
    assert len(emitted_days) > 0
    batch_sub = batch.filter(F.col("day").isin(emitted_days))
    diff = got.exceptAll(batch_sub).count() + batch_sub.exceptAll(got).count()
    assert diff == 0
    # the open window near max event time is retained, not emitted
    max_day = ev.agg(F.max(F.date_trunc("day", "ts").cast("date"))).collect()[0][0]
    assert max_day not in emitted_days


def test_session_window_stream_matches_batch_sessionize(
    spark, tmp_path, staged_events
):
    """Native session_window (streaming-capable) must count the same
    sessions as the batch gaps-and-islands operator for gap=30min."""
    from snowav_spark.ops import windows as w

    src, schema, ev = staged_events
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    stream = incremental.stream_source(spark, src, schema)
    sess = (
        # 1h watermark: only sessions near the stream tail stay open
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        sess.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # batch twin: gaps-and-islands sessionization
    batch = (
        w.sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    # emitted sessions are those finalized by the watermark; every emitted
    # (user, session) must be one of the batch sessions, and for users with
    # all sessions emitted the counts must agree exactly
    emitted = got.groupBy("user_id").agg(F.count("*").alias("n_emitted"))
    joined = emitted.join(batch, "user_id").collect()
    assert len(joined) > 0
    assert all(r.n_emitted <= r.n_sessions for r in joined)
    full = [r for r in joined if r.n_emitted == r.n_sessions]
    assert len(full) > 0  # most users' sessions finalize well before the tail


def test_dedup_stream_drops_duplicates(spark, tmp_path, staged_events):
    src, schema, ev = staged_events
    dup_src = str(tmp_path / "dup_in")
    # duplicate every event id (two identical files)
    ev.write.parquet(dup_src)
    ev.write.mode("append").parquet(dup_src)
    stream = incremental.stream_source(spark, dup_src, schema)
    deduped = incremental.dedup_stream(stream, "ts", ["event_id"], "2 days")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    q = incremental.run_to_sink(deduped, out, ckpt, once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == got.select("event_id").distinct().count()


def test_curation_stream_cleans_gates_dedups(spark, tmp_path):
    """Streaming curation: normalized twins collapse to one, low-quality
    and URL-only docs are gated out, PII never reaches the sink."""
    import datetime

    base = "quick brown fox jumps over lazy dog near river bank today"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (0, base, t0),
        (1, base + ".", t0),                      # normalized twin of 0
        (2, "a a the the a a the a the a", t0),   # stopword soup → gated
        (3, "https://only.example/x", t0),        # empty after clean
        (4, "email bob@example.com about engines", t0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
    src = str(tmp_path / "cur_in")
    df.write.parquet(src)
    stream = incremental.stream_source(
        spark, src, spark.read.parquet(src).schema
    )
    curated = incremental.curation_stream(
        stream, "ts", min_quality=0.5, watermark="1 hour"
    )
    out = str(tmp_path / "cur_out")
    ckpt = str(tmp_path / "cur_ckpt")
    q = incremental.run_to_sink(curated, out, ckpt, once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    kept = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert 2 not in kept and 3 not in kept
    assert len({0, 1} & set(kept)) == 1  # twins collapsed to one
    assert 4 in kept
    texts = " ".join(r._clean for r in got.collect())
    assert "bob" not in texts and "email" in texts


def test_progress_metrics_harvest_and_upsert(spark, tmp_path):
    """Streaming observability: recentProgress harvests into the stable
    metrics schema, the parquet upsert is idempotent on
    (query_id, run_id, batch_id), re-running the stream lands only the
    NEW batches, and the rollup report aggregates sanely."""
    import datetime

    from snowav_spark.streaming import metrics

    src = str(tmp_path / "pm_in")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, f"doc {i}", t0) for i in range(10)], ["doc_id", "text", "ts"]
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "pm_out")
    ckpt = str(tmp_path / "pm_ckpt")
    mpath = str(tmp_path / "pm_metrics")

    def run_once():
        stream = incremental.stream_source(
            spark, src, spark.read.parquet(src).schema
        )
        q = incremental.run_to_sink(
            incremental.dedup_stream(stream, "ts", ["doc_id"]), out, ckpt
        )
        q.awaitTermination(120)
        return q

    q = run_once()
    rows = metrics.harvest_progress(q)
    assert rows and sum(r["num_input_rows"] or 0 for r in rows) == 10
    # the stateful dedup surfaces state rows
    assert any((r["state_rows"] or 0) > 0 for r in rows)

    n1 = metrics.append_progress(spark, q, mpath)
    assert n1 == len(rows) > 0
    # re-append the SAME progress: pure upsert, nothing new, no dupes
    assert metrics.append_progress(spark, q, mpath) == 0
    stored = spark.read.parquet(mpath)
    assert stored.count() == len(rows)

    # second trigger over a new drop: only the new batch lands
    spark.createDataFrame(
        [(i, f"doc {i}", t0) for i in range(10, 14)],
        ["doc_id", "text", "ts"],
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = run_once()
    n2 = metrics.append_progress(spark, q2, mpath)
    assert n2 >= 1
    stored = spark.read.parquet(mpath)
    assert stored.count() == len(rows) + n2
    assert stored.agg(F.sum("num_input_rows")).first()[0] == 14

    rep = metrics.progress_report(spark, mpath).collect()
    assert sum(r.total_rows for r in rep) == 14
    assert all(r.n_batches >= 1 for r in rep)


def test_curation_stream_near_dedup_gate_flags_not_drops(spark, tmp_path):
    """curation_stream(near_dedup=True) e2e: the band-ownership stages
    chain after the digest dedup — an in-horizon NEAR dup is FLAGGED
    (kept in the stream, near_dup_flag=true, owned_bands < bands), a
    novel doc and the cluster's first doc are unflagged, an exact twin
    still vanishes at the digest stage, and a short doc (< n tokens,
    unbanded) passes unflagged.  Flag-don't-drop preserves the batch
    resolve contract (pipeline_llm near-dedup parity tests unchanged)."""
    import datetime

    from snowav_spark.ops import dedup

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " changed"
    novel = " ".join(f"x{i}" for i in range(40))
    # a FULL-collision near dup for the sentinel path: a one-token
    # suffix whose new shingle changes none of the 32 minhash minima
    # (~43% of candidates — derived from the deterministic batch
    # banding, not hardcoded), so all 8 bands collide with doc 0's
    # while the digest differs
    cands = [(i, base + f" z{i}") for i in range(30)] + [(999, base)]
    bb = dedup.minhash_bands(
        spark.createDataFrame(cands, ["doc_id", "text"]), "doc_id", "text"
    ).collect()
    base_bk = {(r.band, r.bucket) for r in bb if r.doc_id == 999}
    full = None
    for i in range(30):
        if {(r.band, r.bucket) for r in bb if r.doc_id == i} == base_bk:
            full = base + f" z{i}"
            break
    assert full is not None, "no full-collision suffix in 30 candidates"
    total = full
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 12, 30, 0)
    flush = datetime.datetime(2024, 1, 1, 18, 0, 0)
    cols = ["doc_id", "text", "ts"]
    src = str(tmp_path / "cnd_in")
    drops = [
        [(0, base, t0)],
        [(1, base, t1), (2, near, t1), (3, novel, t1), (4, "tiny doc", t1),
         (5, total, t1)],
        [(9, "flush doc only closes windows now", flush)],
    ]
    for rows in drops:
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = incremental.stream_source(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    out = str(tmp_path / "cnd_out")
    ckpt = str(tmp_path / "cnd_ckpt")
    q = incremental.run_to_sink(
        incremental.curation_stream(
            stream, "ts", watermark="1 hour", near_dedup=True
        ),
        out,
        ckpt,
        once=True,
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # flush doc's window is still open; exact twin died at digest stage
    assert 9 not in got and 1 not in got
    # cluster head + novel doc + short doc: kept, unflagged
    assert got[0].owned_bands == 8 and not got[0].near_dup_flag
    assert got[3].owned_bands == 8 and not got[3].near_dup_flag
    assert got[4].owned_bands == 8 and not got[4].near_dup_flag
    # the near dup is KEPT but flagged with partial ownership
    assert 2 in got, "flag-don't-drop: near dup must stay in the stream"
    assert got[2].near_dup_flag and 0 < got[2].owned_bands < 8
    # ALL-bands-lost near dup (doc 5's banding is bucket-identical to
    # doc 0's by construction): the sentinel row keeps it in the stream
    # at owned_bands = 0, flagged — without it the doc would silently
    # VANISH at the ownership count (round-8 review finding)
    assert 5 in got, "sentinel: full-loss near dup must still emit"
    assert got[5].near_dup_flag and got[5].owned_bands == 0
    # text rides through (cleaned form)
    assert got[3].text.startswith("x0 ")


def test_incremental_ingest_stream_dedups_across_batches(spark, tmp_path):
    """Two availableNow passes: the second batch's twins of the first
    batch's docs must be dropped via the persisted index, fresh content
    must land, and the index must grow to cover the survivors."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    src = str(tmp_path / "in")
    sink = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    first = spark.createDataFrame(
        [(0, base), (1, "completely different words about catalyst engines")],
        ["doc_id", "text"],
    )
    first.write.parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    q = incremental.incremental_ingest_stream(
        stream, index, sink, ckpt, est_threshold=0.4
    )
    q.awaitTermination(120)
    assert sorted(r.doc_id for r in spark.read.parquet(sink).collect()) == [0, 1]

    second = spark.createDataFrame(
        [
            (10, base),  # exact twin of ingested doc 0 -> dropped
            # near twin (one appended word, shingle-Jaccard ~0.92 — well
            # above the b=8/r=4 LSH recall knee, so the band collision is
            # certain, not a coin flip) -> dropped
            (11, base + " today"),
            (12, "entirely fresh content one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    second.write.mode("append").parquet(src)
    q2 = incremental.incremental_ingest_stream(
        spark.readStream.schema(first.schema).parquet(src),
        index,
        sink,
        ckpt,
        est_threshold=0.4,
    )
    q2.awaitTermination(120)
    corpus_ids = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert corpus_ids == [0, 1, 12]
    indexed_ids = {r.doc_id for r in spark.read.parquet(index).select("doc_id").collect()}
    assert indexed_ids == {0, 1, 12}


def test_incremental_ingest_stream_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: deleting the last commit marker
    makes Spark REPLAY the batch on restart.  The replay must rewrite
    its _batch partition, not append a second copy of the corpus rows
    (review finding: plain mode=append duplicated every doc)."""
    import os

    src = str(tmp_path / "in")
    sink = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    docs.write.parquet(src)

    def run_once():
        q = incremental.incremental_ingest_stream(
            spark.readStream.schema(docs.schema).parquet(src),
            index, sink, ckpt,
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(sink).count() == 2
    # simulate the crash-before-commit: drop the last commit marker
    commits = os.path.join(ckpt, "commits")
    last = sorted(n for n in os.listdir(commits) if not n.startswith("."))[-1]
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()  # Spark replays the uncommitted batch
    assert spark.read.parquet(sink).count() == 2  # no duplicates
    assert spark.read.parquet(index).select("doc_id").distinct().count() == 2


def test_incremental_ingest_stream_same_batch_near_dups(spark, tmp_path):
    """Two near-twins arriving in the SAME micro-batch: only the lower
    id survives (review finding: the vs-index gates can't see
    same-batch pairs, so both were admitted forever)."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    src = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(5, base), (6, base + " today"), (7, "totally unrelated fresh words")],
        ["doc_id", "text"],
    )
    docs.write.parquet(src)
    q = incremental.incremental_ingest_stream(
        spark.readStream.schema(docs.schema).parquet(src),
        str(tmp_path / "index"), str(tmp_path / "corpus"),
        str(tmp_path / "ckpt"), est_threshold=0.4,
    )
    q.awaitTermination(120)
    ids = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert ids == [5, 7]


def test_enrich_stream_static_join_matches_batch(spark, tmp_path, staged_events):
    """Stream-static broadcast enrichment must produce exactly the batch
    join's rows (stateless — no watermark required)."""
    src, schema, ev = staged_events
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "eckpt")
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("error", 0.0)],
        ["event_type", "weight"],
    )
    stream = incremental.stream_source(spark, src, schema)
    enriched = incremental.enrich_stream(stream, dim, ["event_type"]).select(
        "event_id", "event_type", "weight"
    )
    q = incremental.run_to_sink(enriched, out, ckpt, once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = ev.join(F.broadcast(dim), ["event_type"], "left").select(
        "event_id", "event_type", "weight"
    )
    assert got.count() == ev.count()  # left join keeps every event
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert diff == 0


def test_correlate_streams_matches_batch_join(spark, tmp_path, staged_events):
    """Stream-stream inner join (views × purchases per user within 60
    min) must emit exactly the batch join's pairs when the whole backlog
    is processed in one availableNow pass."""
    src, schema, ev = staged_events
    out = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")

    views_s = incremental.stream_source(spark, src, schema).filter(
        F.col("event_type") == "view"
    )
    buys_s = incremental.stream_source(spark, src, schema).filter(
        F.col("event_type") == "purchase"
    )
    joined = incremental.correlate_streams(
        views_s, buys_s, "user_id", "ts", within_minutes=60
    ).select("event_id", "user_id", "ts", "r_event_id", "r_ts")
    q = incremental.run_to_sink(joined, out, ckpt, once=True)
    q.awaitTermination(180)
    got = spark.read.parquet(out)

    # batch twin: identical operator call on the static frames —
    # watermarks are no-ops in batch, so semantics are pinned 1:1.
    views_b = ev.filter(F.col("event_type") == "view")
    buys_b = ev.filter(F.col("event_type") == "purchase")
    batch = incremental.correlate_streams(
        views_b, buys_b, "user_id", "ts", within_minutes=60
    ).select("event_id", "user_id", "ts", "r_event_id", "r_ts")

    assert got.count() > 0
    diff = got.exceptAll(batch).count() + batch.exceptAll(got).count()
    assert diff == 0


def test_frequency_sketch_stream_matches_oneshot(spark, tmp_path, staged_events):
    """Per-batch partial sketches appended by the stream must merge to
    the SAME estimates as one batch sketch over all the data — CMS
    counter addition is exact, so the stream loses nothing."""
    from snowav_spark.ops import sketches
    from snowav_spark.streaming import incremental

    src_dir, schema, batch_df = staged_events
    stream = incremental.stream_source(spark, src_dir, schema)
    q = incremental.frequency_sketch_stream(
        stream,
        str(tmp_path / "sketches"),
        str(tmp_path / "ckpt_cms"),
    )
    q.awaitTermination(120)
    store = spark.read.parquet(str(tmp_path / "sketches"))
    assert store.count() >= 1
    keys = [
        r.event_type
        for r in batch_df.select("event_type").distinct().collect()
        if r.event_type is not None
    ]
    got = dict(sketches.frequency_estimates(spark, store, keys))
    oneshot = dict(
        sketches.frequency_estimates(
            spark,
            sketches.daily_frequency_sketches(batch_df, "ts", "event_type"),
            keys,
        )
    )
    assert got == oneshot
    exact = {
        r.event_type: r.n
        for r in batch_df.filter(batch_df.event_type.isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert got[k] >= n  # overestimate-only


def test_near_dedup_stream_bucket_ownership(spark, tmp_path):
    """Streaming MinHash-LSH ownership across MICRO-BATCHES: batch 1's
    docs claim their buckets; a later batch's exact twin owns zero, a
    near-dup owns only its unshared bands, a novel doc owns all 8 — the
    cross-batch state the batch pair-miner cannot provide."""
    import datetime

    from snowav_spark.ops import dedup

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"
    novel = " ".join(f"x{i}" for i in range(40))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 12, 30, 0)
    flush = datetime.datetime(2024, 1, 1, 18, 0, 0)  # closes t0's window
    cols = ["doc_id", "text", "ts"]
    src = str(tmp_path / "nd_in")
    # one file per drop (coalesce(1)) + maxFilesPerTrigger=1 → arrival
    # order IS batch order, so cross-batch ownership is deterministic
    drops = [
        [(0, base, t0)],
        [(1, base, t1), (2, near, t1), (3, novel, t1)],
        [(9, "flush doc only closes windows", flush)],
    ]
    for rows in drops:
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = incremental.stream_source(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    out = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")
    q = incremental.run_to_sink(
        incremental.near_dedup_stream(stream, "ts", watermark="1 hour"),
        out,
        ckpt,
        once=True,
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.owned_bands for r in spark.read.parquet(out).collect()}
    # flush doc's window is still open — only t0's window emits
    assert 9 not in got
    # batch-1 doc owns all its buckets; its later exact twin owns none
    assert got[0] == 8
    assert 1 not in got
    # novel doc owns all 8 (no overlap with anything in-horizon)
    assert got[3] == 8
    # near-dup owns exactly its bands that differ from doc 0's — derived
    # from the deterministic batch banding, not hardcoded
    df01 = spark.createDataFrame(
        [(0, base, t0), (2, near, t1)], cols
    )
    banded = dedup.minhash_bands(df01, "doc_id", "text")
    shared = (
        banded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert 0 < shared < 8  # the fixture really is a PARTIAL overlap
    assert got.get(2, 0) == 8 - shared


def test_ann_index_stream_builds_then_appends(spark, tmp_path):
    """Two availableNow passes over an embedding drop directory: the
    first batch trains + builds the IVF-PQ layout, the second appends
    against the frozen sidecars; a search over the grown index finds a
    second-batch vector as its own nearest neighbor, and full-probe +
    full-depth re-rank equals exact brute force over the union."""
    import numpy as np

    from snowav_spark.ops import quantize

    rng = np.random.RandomState(7)
    dim = 8

    def batch_df(ids):
        return spark.createDataFrame(
            [
                (int(i), [float(x) for x in rng.randn(dim)])
                for i in ids
            ],
            "vec_id long, embedding array<double>",
        )

    src = str(tmp_path / "in")
    index = str(tmp_path / "annidx")
    ckpt = str(tmp_path / "ckpt")
    first, second = batch_df(range(40)), batch_df(range(100, 130))
    first.write.parquet(src)

    def run_once():
        q = incremental.ann_index_stream(
            spark.readStream.schema(first.schema).parquet(src),
            index, ckpt, n_cells=4, m=4, k=4, iters=1, dim=dim,
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(index).count() == 40
    second.write.mode("append").parquet(src)
    run_once()
    stored = spark.read.parquet(index)
    assert stored.count() == 70
    assert sorted(stored.columns) == ["_batch", "cell", "codes", "vec_id"]

    allv = {
        r.vec_id: np.asarray(r.embedding)
        for r in first.union(second).collect()
    }
    qid = 105  # from the appended batch
    qv = [float(x) for x in allv[qid]]
    got = [
        (r.vec_id, r.cos_sim)
        for r in quantize.search_ivfpq_index(
            spark, index, qv, "vec_id", k_out=5, nprobe=4,
            rerank=first.union(second), rerank_depth=70,
        ).collect()
    ]
    qn = np.linalg.norm(allv[qid])
    exact = sorted(
        (-round(float(v @ allv[qid]) / (np.linalg.norm(v) * qn), 6), vid)
        for vid, v in allv.items()
    )[:5]
    assert got == [(vid, -c) for c, vid in exact]
    assert got[0][0] == qid


def test_ann_index_stream_replay_is_idempotent(spark, tmp_path):
    """Dropping the last commit marker replays the append batch: the
    (cell, _batch) dynamic-overwrite layout must rewrite, not double."""
    import os

    import numpy as np

    rng = np.random.RandomState(11)
    dim = 8
    rows = [
        (int(i), [float(x) for x in rng.randn(dim)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "in")
    index = str(tmp_path / "annidx")
    ckpt = str(tmp_path / "ckpt")
    df.write.parquet(src)

    def run_once():
        q = incremental.ann_index_stream(
            spark.readStream.schema(df.schema).parquet(src),
            index, ckpt, n_cells=2, m=4, k=2, iters=1, dim=dim,
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(index).count() == 30
    commits = os.path.join(ckpt, "commits")
    last = sorted(n for n in os.listdir(commits) if not n.startswith("."))[-1]
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()  # replays batch 0 through the append path (sidecars exist)
    stored = spark.read.parquet(index)
    assert stored.count() == 30  # rewritten, not doubled
    assert stored.select("vec_id").distinct().count() == 30


def test_text_index_stream_builds_appends_and_replays(spark, tmp_path):
    """Two availableNow passes keep the inverted index current (search
    equals the ad-hoc BM25 over everything ingested); replaying the
    append batch (commit marker deleted) changes nothing — postings and
    the stats partial rewrite their own _batch partitions."""
    import os

    from snowav_spark.ops import text as t

    first = spark.createDataFrame(
        [
            (1, "spark engines process data at scale"),
            (2, "ducks swim in the lake"),
        ],
        ["doc_id", "text"],
    )
    second = spark.createDataFrame(
        [
            (3, "data pipelines clean data daily"),
            (4, "the lake is calm today"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "in")
    index = str(tmp_path / "textidx")
    ckpt = str(tmp_path / "ckpt")
    first.write.parquet(src)

    def run_once():
        q = incremental.text_index_stream(
            spark.readStream.schema(first.schema).parquet(src),
            index, ckpt, n_buckets=8,
        )
        q.awaitTermination(120)

    run_once()
    second.write.mode("append").parquet(src)
    run_once()

    def search(query):
        return [
            (r.doc_id, r.bm25)
            for r in t.search_text_index(spark, index, query, k=10).collect()
        ]

    union = first.union(second)
    for query in (["data"], ["lake", "spark"]):
        adhoc = sorted(
            (
                (r.doc_id, r.bm25)
                for r in t.bm25_scores(
                    union, "doc_id", "text", query
                ).collect()
            ),
            key=lambda x: (-x[1], x[0]),
        )
        assert search(query) == adhoc and len(adhoc) > 0

    before = search(["data"])
    commits = os.path.join(ckpt, "commits")
    last = sorted(n for n in os.listdir(commits) if not n.startswith("."))[-1]
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()  # replay the append batch
    assert search(["data"]) == before
    stats = spark.read.parquet(index + "/_corpus_stats")
    assert stats.groupBy().sum("n_docs").collect()[0][0] == 4
