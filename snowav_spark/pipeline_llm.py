"""End-to-end training-corpus curation pipeline (SURVEY.md §2.6 EXT):
the composition a data team actually runs, wired from this package's
operators — each stage is the scale-safe variant.

    raw documents
      → clean + redact           (codegen regexp chain, text.clean_text)
      → quality + language gate  (one agg pass, broadcast marker dim)
      → exact dedup              (normalized-digest groupBy, one shuffle)
      → near-dedup resolve       (shingle pairs → connected components →
                                  canonical survivors, ops/graph.py)
      → sequence packing         (FFD bins, sharded applyInPandas)

Every stage consumes and returns a DataFrame, so Catalyst sees one lazy
plan per stage boundary and the corpus text is shuffled only where a
stage's semantics require its hash or shingles — never for packing
(ids+lengths only) or survivor filtering (broadcast anti-join).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowav_spark.ops import dedup, graph, packing, text


@dataclass
class CurationConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    min_quality: float = 0.0
    max_dup_frac: float | None = None  # repetition gate (None = off)
    rule_flags: bool = False  # word-count/word-len/symbol-ratio rules
    keep_langs: tuple[str, ...] | None = None
    shingle_n: int = 3
    jaccard_threshold: float = 0.5
    pack_capacity: int = 512
    pack_shards: int = 64
    max_shingle_df: int | None = 10_000  # hot-shingle guard at scale
    decontam_n: int = 5  # eval-overlap gram width
    decontam_max_hits: int = 0  # drop docs with > this many leaked grams
    index_est_threshold: float = 0.8  # near-dup bar vs an existing corpus
    # exact-dup survivorship: "min_id" (default) or "best" — keep the
    # LONGEST member of each normalized-digest cluster (dedup.keep_best;
    # numeric ids required for its deterministic tie-break)
    exact_survivor: str = "min_id"
    # input expectations (ops/expectations.Rule list): enforced in one
    # validation scan BEFORE any curation work starts — fail fast on a
    # malformed corpus rather than after the expensive dedup stages
    input_expectations: tuple = ()
    # mixture balancing after dedup: None | "uniform" (downsample every
    # group to the smallest) | "temperature" (sqrt(min/n) keep-rates)
    balance: str | None = None
    balance_col: str = "source"


@dataclass
class CurationResult:
    """Curated corpus plus the per-stage frames a pipeline owner audits."""

    corpus: DataFrame
    cleaned: DataFrame
    survivors_map: DataFrame
    packed: DataFrame
    stage_counts: dict[str, int] = field(default_factory=dict)
    # count_stages="observe": per-stage pyspark Observation objects —
    # call observed_counts() AFTER an action has materialized the
    # corpus (e.g. the sink write); counts then cost ZERO extra scans.
    observations: dict = field(default_factory=dict)

    def observed_counts(self) -> dict[str, int]:
        """Stage row counts captured by observe() during the caller's
        own action (blocks until one has run)."""
        return {
            name: int(obs.get["rows"])
            for name, obs in self.observations.items()
        }


def curate(df: DataFrame, cfg: CurationConfig | None = None,
           count_stages: bool = False,
           corpus_index: DataFrame | None = None,
           eval_df: DataFrame | None = None) -> CurationResult:
    """Run the full curation pipeline.

    ``count_stages=True`` materializes a count per stage for reporting —
    off by default because each count is an extra action.
    ``count_stages="observe"`` is the 100 TB form: each stage gets a
    ``DataFrame.observe`` counter (a CollectMetrics node in the SAME
    plan), so the counts ride the caller's one sink write for free —
    read them afterwards via ``CurationResult.observed_counts()``.

    ``corpus_index`` switches the exact-dedup stage to INCREMENTAL mode:
    the batch is deduplicated (exact + near) against an existing corpus'
    dedup.dedup_index — built on the same normalized ``_clean`` column
    with default minhash parameters — without rescanning corpus text.

    ``eval_df`` adds a decontamination gate after near-dedup: documents
    sharing more than ``cfg.decontam_max_hits`` distinct word
    ``cfg.decontam_n``-grams with the held-out eval corpus are dropped
    (the eval side is compared on the raw text column).
    """
    cfg = cfg or CurationConfig()
    # validate enum-ish options up front — a typo must fail loudly, not
    # silently run the other semantics for an entire corpus pass
    if cfg.exact_survivor not in ("min_id", "best"):
        raise ValueError(f"unknown exact_survivor mode {cfg.exact_survivor!r}")
    if cfg.balance not in (None, "uniform", "temperature"):
        raise ValueError(f"unknown balance mode {cfg.balance!r}")
    id_c, txt = cfg.id_col, cfg.text_col
    if cfg.input_expectations:
        from snowav_spark.ops import expectations as _ex

        _ex.enforce(df, list(cfg.input_expectations))
    counts: dict[str, int] = {}
    observations: dict = {}

    def note(name: str, frame: DataFrame) -> DataFrame:
        if count_stages == "observe":
            from pyspark.sql import Observation

            obs = Observation()
            observations[name] = obs
            return frame.observe(obs, F.count(F.lit(1)).alias("rows"))
        if count_stages:
            counts[name] = frame.count()
        return frame

    df = note("raw", df)

    # 1. clean + redact; keep the normalized text alongside the raw.
    cleaned = df.withColumn(
        "_clean", text.clean_text(text.redact_pii(F.col(txt)))
    ).filter(F.length("_clean") > 0)
    cleaned = note("cleaned", cleaned)

    # 2. quality / language gate.
    q = text.quality_score(cleaned, id_c, "_clean").select(
        id_c, "quality"
    )
    gated = cleaned.join(q, id_c).filter(
        F.col("quality") >= cfg.min_quality
    )
    if cfg.keep_langs is not None:
        pred = text.lang_id(gated, id_c, "_clean")
        gated = (
            gated.join(pred, id_c)
            .filter(F.col("pred_lang").isin(*cfg.keep_langs))
            .drop("pred_lang")
        )
    if cfg.max_dup_frac is not None:
        rep = text.repetition_stats(gated, id_c, "_clean").select(
            id_c, "dup_frac"
        )
        gated = (
            gated.join(rep, id_c)
            .filter(F.col("dup_frac") <= cfg.max_dup_frac)
            .drop("dup_frac")
        )
    if cfg.rule_flags:
        fl = text.quality_flags(gated, id_c, "_clean").select(id_c, "keep")
        gated = gated.join(fl, id_c).filter("keep").drop("keep")
    gated = note("gated", gated.drop("quality"))

    # 3. exact dedup on the NORMALIZED digest (catches whitespace/case/
    #    punctuation twins the raw digest misses).  With a corpus index,
    #    the same stage also drops exact/near twins of ALREADY-INGESTED
    #    documents — corpus text is never rescanned.
    if corpus_index is not None:
        exact = dedup.incremental_dedup(
            gated,
            corpus_index,
            id_c,
            "_clean",
            n=cfg.shingle_n,
            est_threshold=cfg.index_est_threshold,
        )
    elif cfg.exact_survivor == "best":
        # keep the longest capture per normalized-digest cluster
        # (duplicate crawls differ in completeness; min-id would throw
        # away the better copy).  keep_best is one max_by hash agg; the
        # survivor filter is a semi-join on the id key.
        kept = dedup.keep_best(
            gated.withColumn("_len", F.length(txt)), id_c, "_clean", "_len"
        ).select(F.col("kept_id").alias(id_c))
        exact = gated.join(kept, id_c, "left_semi")
    else:
        exact = dedup.drop_exact_dups(gated, "_clean", id_c)
    exact = note("exact_deduped", exact)

    # 4. near-dedup: shingle pairs → connected components → survivors.
    pairs = dedup.jaccard_pairs(
        exact,
        id_c,
        "_clean",
        n=cfg.shingle_n,
        threshold=cfg.jaccard_threshold,
        max_df=cfg.max_shingle_df,
    ).select("doc_a", "doc_b")
    survivors_map = graph.resolve_duplicates(pairs, id_c, "doc_a", "doc_b")
    corpus = graph.drop_near_dups(exact, pairs, id_c, "doc_a", "doc_b")
    corpus = note("near_deduped", corpus)

    # 4b. benchmark decontamination: drop training docs that leak eval
    #     n-grams (broadcast eval-gram set; one scan of the corpus).
    if eval_df is not None:
        leaked = (
            dedup.decontaminate(
                corpus, eval_df, id_c, txt, n=cfg.decontam_n
            )
            .filter(F.col("hit_grams") > cfg.decontam_max_hits)
            .select(id_c)
        )
        corpus = corpus.join(leaked, id_c, "left_anti")
        corpus = note("decontaminated", corpus)

    # 4c. mixture balancing: md5-deterministic per-group downsampling
    #     AFTER dedup (duplicates must not inflate a group's share).
    if cfg.balance is not None:
        from snowav_spark.ops import sampling

        if cfg.balance == "uniform":
            corpus = sampling.balance_groups(
                corpus, id_c, cfg.balance_col
            ).drop("_rate")
        else:  # "temperature" — validated at entry
            corpus = sampling.temperature_balance(
                corpus, id_c, cfg.balance_col
            ).drop("_rate")
        corpus = note("balanced", corpus)

    # 5. pack into training bins on token counts of the cleaned text.
    lens = corpus.select(
        id_c, F.size(F.split("_clean", " ")).alias("n_tokens")
    )
    packed = packing.pack_sequences(
        lens, id_c, "n_tokens", cfg.pack_capacity, cfg.pack_shards
    )

    return CurationResult(
        corpus=corpus,
        cleaned=cleaned,
        survivors_map=survivors_map,
        packed=packed,
        stage_counts=counts,
        observations=observations,
    )


def curate_stream_pass(
    spark,
    input_dir: str,
    output_dir: str,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    watermark: str = "1 hour",
    window_len: str = "1 hour",
    text_index: bool = False,
    n_buckets: int = 64,
    timeout: int = 600,
) -> str:
    """One availableNow catch-up pass of the STREAMING curation pipeline
    over a GROWING documents directory — the e2e composition a user
    runs (``snowav_spark curate-stream``): ingest new parquet files →
    clean/redact → quality gate → in-horizon exact dedup → near-dup
    band-ownership FLAG (flag, don't drop) → curated-corpus append, and
    optionally a persisted inverted index kept current in the same pass.

    ONE pipeline, ONE foreachBatch writing both sinks — running two
    independent streams over the same input would double the stateful
    work AND open a divergence window (files landing between the two
    drains would reach one sink only; bitten in the round-9 review).
    Each sink is idempotent under at-least-once replay on its own
    terms, so a replayed batch rewrites itself in both places:

    - corpus: ``_batch=<id>`` dynamic-overwrite partitions (readers
      drop the bookkeeping column);
    - index: the ``(bucket, _batch)`` dynamic-overwrite layout
      (build on the first non-empty batch, append after).

    Emission semantics (inherent to watermarked windows): a document's
    row emits when the watermark passes its window's end, i.e. the
    NEWEST window's docs surface on the NEXT pass once newer arrivals
    advance the watermark.  Each invocation drains the current backlog
    and stops; re-run on a schedule (or drop the trigger for a
    continuous deployment).  Returns the curated-corpus path."""
    from snowav_spark.ops import text as text_ops
    from snowav_spark.streaming import incremental

    out = output_dir.rstrip("/")
    corpus = f"{out}/corpus"
    index_path = f"{out}/text_index"
    schema = spark.read.parquet(input_dir).schema
    curated = incremental.curation_stream(
        incremental.stream_source(spark, input_dir, schema),
        ts_col,
        id_col,
        text_col,
        min_quality=min_quality,
        watermark=watermark,
        near_dedup=True,
        window_len=window_len,
    )

    def _process(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)  # computed once:
        # corpus rows and index postings must agree exactly
        incremental._write_batch_partition(batch, corpus, batch_id)
        if text_index:
            built = incremental._fs_dir_exists(
                batch.sparkSession, index_path + "/_corpus_stats"
            )
            if not built:
                text_ops.build_text_index(
                    batch, id_col, text_col, index_path,
                    n_buckets=n_buckets, batch_id=batch_id,
                )
            else:
                text_ops.append_to_text_index(
                    batch, id_col, text_col, index_path,
                    batch_id=batch_id,
                )

    q = (
        curated.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{out}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    # a silent fall-through on timeout would leave the query live and
    # report a half-drained pass as complete
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            "curate_stream_pass: the pass did not drain the backlog "
            f"within {timeout}s — raise --timeout or shrink the "
            "backlog (the checkpoint resumes where this stopped)"
        )
    return corpus
