"""Structured Streaming incremental mode (SURVEY.md §2.7).

The reference's 'streaming' is a daily re-run that skips dates already in
the DB (EP2).  The batch twin lives in sinks.ResultsStore.append_missing;
this module is the true streaming form: a file-source stream over an
output directory, daily tumbling windows with a watermark for late grids,
and stateful dedup within the watermark.

The aggregation expression is IDENTICAL to windows.tumbling — one
definition serves batch and streaming, which is the point of expressing
the day loop as ``F.window`` instead of a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a model-output drop directory — the AWSM
    daily coupling as a stream (new files appear per model day).

    Event-time columns are normalized TIMESTAMP_NTZ → TIMESTAMP here:
    Structured Streaming watermarks reject NTZ
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]), and with the session pinned
    to UTC the cast preserves wall time, so batch (NTZ) and streaming
    (LTZ) views of the same data agree.

    ``max_files_per_trigger`` bounds each micro-batch (respected by
    availableNow backlog drains too) — the knob that keeps a huge
    backlog from becoming one giant first batch, and that makes
    file-arrival order an explicit batch order in tests."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def _ltz(df: DataFrame, ts: str) -> DataFrame:
    """Cast an NTZ event-time column to TIMESTAMP (watermark-compatible);
    no-op when it is already LTZ.  Session tz is UTC → wall time kept.

    Two deliberate normalization layers: ``stream_source`` converts at
    the boundary so RAW readStream users can call withWatermark directly;
    this per-operator guard covers frames built any other way (an
    externally-constructed stream handed to daily_rollup_stream etc.).
    For stream_source-built frames it is a no-op."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def daily_rollup_stream(
    events: DataFrame,
    ts: str,
    keys: list[str],
    value: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Daily tumbling aggregation with late-data handling.

    The watermark bounds state: windows older than (max event time −
    watermark) finalize and evict, so state is O(groups × open windows)
    regardless of stream length — the property that lets this run forever
    at scale.  Late rows inside the watermark update their window; later
    ones are dropped (the reference would silently re-run the day)."""
    return (
        _ltz(events, ts)
        .withWatermark(ts, watermark)
        .groupBy(F.window(ts, "1 day"), *keys)
        .agg(
            F.round(F.sum(value), 6).alias("sum_value"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("window.start").cast("date").alias("day"),
            *keys,
            "sum_value",
            "n",
        )
    )


def dedup_stream(
    events: DataFrame, ts: str, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Stateful exact dedup within the watermark horizon
    (dropDuplicatesWithinWatermark): the streaming twin of
    dedup.drop_exact_dups, with bounded state."""
    return (
        _ltz(events, ts)
        .withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def run_to_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    once: bool = True,
):
    """Write a streaming frame to a partitioned parquet sink with
    exactly-once file-sink semantics (checkpointed).  ``once=True`` uses
    availableNow — process the backlog, then stop (the EP2 batch-like
    invocation); continuous deployments drop the trigger."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curation_stream(
    docs: DataFrame,
    ts: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    watermark: str = "1 hour",
    near_dedup: bool = False,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    window_len: str = "1 hour",
) -> DataFrame:
    """Streaming corpus curation: the ingest-time stages of
    pipeline_llm.curate as one continuous query.

    clean/redact (stateless codegen projection) → quality gate
    (stateless arithmetic) → stateful exact dedup on the NORMALIZED
    digest within the watermark horizon.  State is bounded by the
    watermark (digests older than the horizon evict), so this runs
    forever at ingest scale.

    ``near_dedup=True`` chains the near_dedup_stream band-ownership
    stages AFTER the digest dedup as the in-horizon NEAR-dup gate —
    FLAG, don't drop: the output gains (win_start, owned_bands, bands,
    near_dup_flag) per surviving doc, where ``near_dup_flag`` marks any
    doc that lost ≥1 LSH band to an earlier in-horizon owner (per-band
    collision probability = Jaccard^(num_hashes/bands)).  Flagged docs
    stay in the stream so the periodic batch resolve
    (graph.resolve_duplicates over minhash_lsh_pairs) keeps its
    keep-best/canonical contract — the stream only provides the early
    signal.  A per-doc SENTINEL ownership row guarantees that even a
    doc losing EVERY band (owned_bands = 0 — a near-exact twin whose
    digest differs) still emits, flagged, instead of vanishing at the
    ownership count.  Docs shorter than ``n`` tokens carry no shingles:
    they get doc-unique salt buckets, own all their bands, and are
    never flagged (their dedup is the exact digest stage).  Three chained stateful
    operators in append mode (digest dedup → bucket ownership →
    windowed ownership count), every one watermark-bounded; rows emit
    when their ``window_len`` window closes.
    """
    from snowav_spark.ops import text as text_ops

    cleaned = docs.withColumn(
        "_clean", text_ops.clean_text(text_ops.redact_pii(F.col(text_col)))
    ).filter(F.length("_clean") > 0)
    # THE batch quality formula (text_ops.quality_expr) — stateless, so
    # it streams unchanged and cannot drift from pipeline_llm.curate.
    _, _, quality = text_ops.quality_expr(F.col("_clean"))
    gated = cleaned.withColumn("_digest", F.md5("_clean")).filter(
        quality >= F.lit(min_quality)
    )
    deduped = (
        _ltz(gated, ts)
        .withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
    )
    if not near_dedup:
        return deduped

    from snowav_spark.ops.dedup import minhash_signature

    rows = num_hashes // bands
    toks = F.split(F.col("_clean"), " ")
    sig = deduped.withColumn(
        "_sig",
        F.when(F.size(toks) >= n, minhash_signature(toks, num_hashes, n)),
    )

    def _bucket(b: int):
        # same murmur3/min banding as the batch miner for banded docs
        # (cast long so real and sentinel/salt buckets share one type);
        # 64-bit doc-unique salt buckets for short docs, so they own
        # all their bands (a 32-bit salt would birthday-collide across
        # ~77k in-horizon docs and falsely flag short docs)
        return F.when(
            F.col("_sig").isNotNull(),
            F.hash(
                *[F.element_at("_sig", b * rows + r + 1) for r in range(rows)]
            ).cast("long"),
        ).otherwise(F.xxhash64(F.col(id_col), F.lit(b)))

    # FLAG, don't drop — structurally: besides its ``bands`` LSH keys,
    # every doc emits ONE sentinel row (band = -1, 64-bit doc-unique
    # bucket) that always survives the ownership dedup.  Without it, a
    # near-dup that loses ALL its bands to an earlier in-horizon owner
    # (P = Jaccard^num_hashes per doc — approaching 1 for near-exact
    # twins whose digests differ) would have zero rows at the window
    # agg and silently VANISH from the stream, which is exactly the
    # drop the flag contract forbids.  owned_bands = count − sentinel.
    structs = [
        F.struct(
            F.lit(-1).alias("band"),
            F.xxhash64(F.col(id_col), F.lit(-1)).alias("bucket"),
        )
    ] + [
        F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(ts),
        F.col(id_col),
        F.col("_clean"),
        F.explode(F.array(*structs)).alias("bb"),
    ).select(F.col(ts), F.col(id_col), "_clean", "bb.band", "bb.bucket")
    # the watermark set before the digest dedup PROPAGATES through the
    # chain — redefining it between stateful operators is disallowed
    # (Spark's multi-stateful watermark simulator)
    owned = banded.dropDuplicatesWithinWatermark(["band", "bucket"])
    return (
        owned.groupBy(F.window(F.col(ts), window_len), F.col(id_col))
        .agg(
            (F.count("*") - 1).alias("owned_bands"),
            F.first("_clean").alias(text_col),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col(id_col),
            F.col(text_col),
            "owned_bands",
            F.lit(bands).alias("bands"),
            (F.col("owned_bands") < F.lit(bands)).alias("near_dup_flag"),
        )
    )


def near_dedup_stream(
    docs: DataFrame,
    ts: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    watermark: str = "1 hour",
    window_len: str = "1 hour",
) -> DataFrame:
    """Cross-micro-batch NEAR-duplicate detection as a continuous query:
    MinHash-LSH band-bucket ownership with watermark-bounded state.

    The batch near-dup path (ops/dedup.minhash_lsh_pairs) mines candidate
    PAIRS — a self-join no stream can run unbounded.  The streaming form
    inverts it into first-wins bucket OWNERSHIP, which needs only keyed
    state: each doc's signature explodes into ``bands`` (band, bucket)
    keys (stateless projection — same murmur3/min values as the batch
    banding, bit-identical buckets), and
    ``dropDuplicatesWithinWatermark`` retains the FIRST doc to claim
    each bucket within the horizon.  A windowed count then emits
    ``owned_bands`` per doc: a novel doc owns all ``bands`` of its
    buckets; an exact/near duplicate of any in-horizon doc loses the
    shared buckets to the earlier owner (per-band collision probability
    = Jaccard^(num_hashes/bands), the LSH S-curve), so low
    ``owned_bands/bands`` flags it for downstream quarantine or the
    periodic batch resolve.  Docs with fewer than ``n`` tokens carry no
    shingles and are not banded (their dedup is curation_stream's exact
    digest stage).

    Two stateful operators chained in append mode (Spark 3.5+ multi-
    stateful support): both keyed by (band, bucket) / window — state is
    bounded by the watermark horizon on both.  At 100 TB-scale ingest,
    state is ≤ bands × distinct-docs-per-horizon tiny rows, and every
    stage before the dedup is a codegen projection."""
    from snowav_spark.ops.dedup import minhash_signature

    rows = num_hashes // bands
    sig = (
        _ltz(docs, ts)
        .select(
            F.col(ts),
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .filter(F.size("_toks") >= n)
        .withColumn("_sig", minhash_signature(F.col("_toks"), num_hashes, n))
    )
    banded = sig.select(
        F.col(ts),
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.element_at("_sig", b * rows + r + 1)
                                for r in range(rows)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(ts), F.col(id_col), "bb.band", "bb.bucket")
    owned = banded.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        ["band", "bucket"]
    )
    return (
        owned.groupBy(F.window(F.col(ts), window_len), F.col(id_col))
        .agg(F.count("*").alias("owned_bands"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col(id_col),
            "owned_bands",
            F.lit(bands).alias("bands"),
        )
    )


def _parquet_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists as a readable dataset root.  Deliberately
    NOT a bare try/except around the read: a transient storage fault or
    corrupt footer must FAIL the batch (so the trigger retries), not
    silently masquerade as 'first batch, no data yet'."""
    import os

    return os.path.isdir(path) and any(
        "=" in n  # partition directory (e.g. _batch=0) — data
        or not n.startswith((".", "_"))
        for n in os.listdir(path)
    )


def _write_batch_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent foreachBatch append: write under a ``_batch=<id>``
    partition with dynamic partition overwrite, so an at-least-once
    REPLAY of the batch rewrites its own partition instead of appending
    a second copy of the rows.  Readers drop the bookkeeping column."""
    (
        df.withColumn("_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(path)
    )


def incremental_ingest_stream(
    docs: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_threshold: float = 0.8,
    once: bool = True,
):
    """Continuous corpus ingestion deduplicated against the PERSISTED
    dedup index (dedup.dedup_index written to ``index_path``): each
    micro-batch drops exact and near twins of everything already
    ingested, appends the survivors to the corpus sink, and appends the
    survivors' OWN index rows to the index — so later batches dedup
    against earlier ones without ever rescanning corpus text.

    The cross-batch corpus comparison needs a static-side join per batch,
    which Structured Streaming only allows in ``foreachBatch`` — the
    standard shape for stream-vs-growing-table joins.  State lives
    entirely in the index files (no in-memory streaming state), so a
    restart resumes from the checkpoint with nothing lost.

    foreachBatch is AT-LEAST-ONCE, so both appends are made idempotent
    by writing under a ``_batch=<id>`` partition with dynamic partition
    overwrite: a replayed batch REWRITES its own partition instead of
    appending duplicates next to the first attempt's rows.  Readers of
    the sink/index drop the bookkeeping column.

    Within a batch, survivors are additionally near-deduped against
    EACH OTHER (incremental_dedup's gates are within-batch-exact and
    vs-index only — two near-twins arriving in the same trigger would
    otherwise both be admitted forever).
    """
    from snowav_spark.ops import dedup as dedup_ops

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if _parquet_exists(spark, index_path):
            # canonical read: drops _batch AND anti-joins tombstones, so
            # takedown-deleted docs stop suppressing new ingests
            index = dedup_ops.load_dedup_index(spark, index_path)
        else:  # first batch: dedup only within itself
            index = dedup_ops.dedup_index(batch.limit(0), id_col, text_col)
        fresh = dedup_ops.incremental_dedup(
            batch, index, id_col, text_col, est_threshold=est_threshold
        )
        # near-dedup WITHIN the surviving batch (vs-index gates above
        # cannot see same-batch pairs) — the documented batch path:
        # LSH pairs + min-id cluster survivors
        from snowav_spark.ops import graph as graph_ops

        pairs = dedup_ops.minhash_lsh_pairs(
            fresh, id_col, text_col, est_threshold=est_threshold
        )
        fresh = graph_ops.drop_near_dups(
            fresh, pairs, id_col, src="doc_a", dst="doc_b"
        )
        fresh = fresh.localCheckpoint(eager=True)  # survivors computed ONCE:
        # corpus append and index append must agree exactly, and the index
        # must not observe its own batch's rows mid-computation
        _write_batch_partition(fresh, sink_path, batch_id)
        _write_batch_partition(
            dedup_ops.dedup_index(fresh, id_col, text_col),
            index_path,
            batch_id,
        )

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes (source
    weights, basin metadata, eval-set flags) to a streaming frame.

    Structured Streaming joins a stream to a STATIC frame statelessly —
    each micro-batch joins against the dimension's current snapshot, no
    watermark, no state store.  With ``broadcast`` (the default; dims
    are small by definition here) the stream side never shuffles, so
    enrichment adds zero exchanges to the continuous query — the same
    rule the batch engine enforces for q_join_dim.  For a dimension that
    must update mid-stream, re-read it inside ``foreachBatch`` instead
    (see incremental_ingest_stream for that shape)."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, keys, how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    within_minutes: int,
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with the right
    events of the same key that occur within ``within_minutes`` AFTER it
    (attribution: view→purchase, request→response, trigger→alert).

    Both sides carry a watermark and the join condition bounds right's
    event time to [left.ts, left.ts + within] — the two things Structured
    Streaming needs to make stream-stream state FINITE: a row can be
    evicted from the state store once the other side's watermark passes
    its join window.  Without the time bound the state grows without
    limit; without the watermark nothing is ever evicted.  State is
    keyed by the join key, so hot keys shard at the exchange like any
    shuffle (salting does NOT apply — the equality must hold — so a
    pathological single key needs a coarser key or a shorter window).

    Right-side columns are renamed with ``right_prefix`` (streaming
    self-joins otherwise hit ambiguous-column analysis errors); the
    output carries all left columns plus the prefixed right columns.
    The same call works in batch (watermarks are no-ops there), which is
    how the parity test pins the semantics.
    """
    l = _ltz(left, ts).withWatermark(ts, watermark)
    r = _ltz(right, ts).withWatermark(ts, watermark)
    for c in r.columns:
        r = r.withColumnRenamed(c, right_prefix + c)
    rk, rts = right_prefix + key, right_prefix + ts
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(ts))
        & (
            F.col(rts)
            <= F.col(ts) + F.expr(f"INTERVAL {int(within_minutes)} MINUTES")
        )
    )
    return l.join(r, cond, "inner").drop(rk)


def frequency_sketch_stream(
    events: DataFrame,
    sketch_path: str,
    checkpoint: str,
    ts: str = "ts",
    key: str = "event_type",
    eps: float = 0.001,
    confidence: float = 0.99,
    once: bool = True,
):
    """Continuous heavy-hitter maintenance: each micro-batch appends its
    per-day Count-Min sketches (ops/sketches.daily_frequency_sketches)
    to a persisted sketch store.  Because CMS merge is exact counter
    addition, appending PARTIAL per-batch sketches is lossless — reading
    the store and merging (sketches.frequency_estimates) answers "how
    often has X occurred, ever" without rescanning any event data, and
    equals the one-shot batch sketch bit-for-bit (pinned by test).

    State lives entirely in the KB-sized sketch files (no in-memory
    streaming state): a restart resumes from the checkpoint, and the
    store stays append-only — the same lambda split as
    incremental_ingest_stream's dedup index.  All batches share
    (eps, confidence, seed) via the shared default, which CMS merge
    requires.  Writes go under a ``_batch=<id>`` partition with dynamic
    overwrite (_write_batch_partition): foreachBatch is at-least-once,
    and a replayed batch appended next to its first attempt would
    double-count every event in it — silently, since CMS only promises
    overestimates."""
    from snowav_spark.ops import sketches

    def _process(batch: DataFrame, batch_id: int) -> None:
        sk = sketches.daily_frequency_sketches(
            batch, ts, key, eps=eps, confidence=confidence
        )
        _write_batch_partition(sk, sketch_path, batch_id)

    writer = (
        events.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fs_dir_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through Hadoop's FileSystem — works for every
    filesystem Spark can write (local, HDFS, object stores), unlike
    ``os.path.isdir`` which silently answers False for any non-local
    URI (and would make a stream rebuild-and-wipe its index every
    batch)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def ann_index_stream(
    emb: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    iters: int = 1,
    dim: int = 64,
    train_fraction: float = 1.0,
    once: bool = True,
):
    """Continuous ANN index maintenance: an embedding stream keeps a
    :func:`snowav_spark.ops.quantize.build_ivfpq_index` layout current —
    the FIRST non-empty batch trains centroids + codebook and builds the
    index; every later batch is encoded against the FROZEN sidecars and
    appended to its cell partitions (linear in the batch, independent of
    index size).  Searches (`search_ivfpq_index`) work at any point and
    see everything ingested so far.

    The static-side build/append per batch needs ``foreachBatch`` (the
    same shape as incremental_ingest_stream); state lives entirely in
    the index files, so a restart resumes from the checkpoint.
    Idempotency under at-least-once replay: code rows land in
    ``(cell, _batch=<id>)`` partitions with dynamic overwrite — a
    replayed batch REWRITES its own partitions (codes are deterministic
    given the sidecars, so the rewrite is bit-identical).  The centroid
    sidecar doubles as the build's commit marker: a crash mid-build
    leaves no sidecar, and the replay rebuilds from scratch (static
    overwrite wipes partial codes).

    The standard serving trade-off documented on append_to_ivfpq_index
    applies: later batches are quantized by the first batch's training —
    a large distribution drift warrants a batch rebuild at the same
    path (which this stream then keeps appending to).
    """
    from snowav_spark.ops import quantize

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        built = _fs_dir_exists(
            batch.sparkSession, index_path.rstrip("/") + "/_ivf_centroids"
        )
        if not built:
            quantize.build_ivfpq_index(
                batch, id_col, vec, index_path,
                n_cells=n_cells, m=m, k=k, iters=iters, dim=dim,
                train_fraction=train_fraction, batch_id=batch_id,
            )
        else:
            quantize.append_to_ivfpq_index(
                batch, id_col, vec, index_path, batch_id=batch_id
            )

    writer = (
        emb.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def text_index_stream(
    docs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    once: bool = True,
):
    """Continuous inverted-index maintenance: a document stream keeps a
    :func:`snowav_spark.ops.text.build_text_index` layout current — the
    first non-empty batch builds it, later batches append postings into
    their term buckets and add their own stats PARTIAL row (the
    mergeable-integer sidecar design makes the merge order irrelevant).
    Searches see everything ingested so far, with doc frequencies and
    avg_dl always consistent because both derive at query time.

    Idempotency under at-least-once replay (the ann_index_stream twin):
    postings land in ``(bucket, _batch)`` partitions and the stats
    partial under ``_batch``, both dynamic-overwrite, so a replayed
    batch rewrites itself.  The stats sidecar doubles as the build's
    commit marker."""
    from snowav_spark.ops import text as text_ops

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        built = _fs_dir_exists(
            batch.sparkSession, index_path.rstrip("/") + "/_corpus_stats"
        )
        if not built:
            text_ops.build_text_index(
                batch, id_col, text_col, index_path,
                n_buckets=n_buckets, batch_id=batch_id,
            )
        else:
            text_ops.append_to_text_index(
                batch, id_col, text_col, index_path, batch_id=batch_id
            )

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
