"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine (SURVEY.md §2.6 EXT).

Scale design (the whole point of these):

- **exact**: hash-groupBy on a content digest — one shuffle keyed by the
  digest, map-side combine collapses duplicates before the exchange.
- **n-gram Jaccard**: shingle-set self-join.  Joining on *shingles* (not
  tokens) keeps the candidate-pair set sparse — a shingle's document list
  is short, so the pair explosion is bounded by Σ df(s)² over shingles,
  not n².
- **MinHash+LSH**: the 100 TB path.  Signatures are built in one pass
  with higher-order array expressions (no explode until banding); LSH
  bands turn near-dup detection into an equi-join on (band, bucket-hash),
  which is linear in corpus size.  Estimated Jaccard = signature overlap;
  verify exactly only within candidates.
- **SimHash**: 64-bit fingerprint whose Hamming distance approximates
  cosine over token multisets; one explode + one aggregate.
- **embedding-cosine**: see ops/similarity.py — thresholded pair join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snowav_spark.ops import bloom


def exact_dedup_stats(df: DataFrame, group: str, text: str) -> DataFrame:
    """Exact duplicate counts per group via content digest (md5)."""
    return df.groupBy(group).agg(
        F.count("*").alias("n"),
        F.countDistinct(F.md5(F.col(text))).alias("n_uniq"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text)))).alias("n_dups"),
    )


def drop_exact_dups(
    df: DataFrame, text: str, tiebreak: str
) -> DataFrame:
    """Keep one row per distinct content digest (deterministic keeper =
    min tiebreak).  groupBy-digest + min_by: one shuffle, no window sort."""
    digest = F.md5(F.col(text)).alias("_digest")
    keep = (
        df.select(digest, F.col(tiebreak).alias("_keep"))
        .groupBy("_digest")
        .agg(F.min("_keep").alias("_keep"))
    )
    return df.join(
        keep,
        (F.md5(F.col(text)) == F.col("_digest"))
        & (F.col(tiebreak) == F.col("_keep")),
        "left_semi",
    )


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a *materialized* token-array column.

    Callers must project the token array first (``F.split`` in its own
    select): referencing ``split(text)`` inside the lambda would inline the
    split per element_at — O(n_shingles × n) re-splits per row, measured
    ~5× slower on the fixture corpus."""
    # Guard: below n tokens there are no shingles. Without it,
    # sequence(0, -1) produces a DESCENDING [0, -1] (Spark infers step -1)
    # and element_at crashes on index 0/negative.
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingled(df: DataFrame, id_col: str, text: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows: tokenize in one projection, then shingle+explode."""
    return df.select(
        F.col(id_col), F.split(F.col(text), " ").alias("_toks")
    ).select(
        F.col(id_col), F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("s")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text: str,
    n: int = 3,
    top_k: int | None = None,
    threshold: float | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs.

    distinct(id, shingle) → self-join on shingle (sparse by construction)
    → |A∩B| per pair → Jaccard via |A|+|B|−|A∩B|.  Deterministic: Jaccard
    is a ratio of small integers, identical in any engine.

    ``max_df`` caps shingle document frequency before the self-join: the
    join's cost is Σ_s df(s)², so ONE corpus-hot shingle (a boilerplate
    header, a template line) turns it quadratic.  Dropping shingles with
    df > max_df bounds every join group at max_df² — standard practice
    for shingle joins on skewed corpora.  None (the contract default)
    keeps exact semantics.  Set sizes |A| and |B| are computed BEFORE the
    cap, so a dropped shingle can only shrink |A∩B| — the error is
    one-sided (false negatives only); a score can never exceed the true
    Jaccard, so the cap never invents a duplicate pair.
    """
    sh = shingled(df, id_col, text, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        sh = sh.join(rare, "s", "left_semi")
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    inter = (
        a.join(b, ["s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    # NO broadcast hint on the size lookups: `sizes` is one row PER
    # DOCUMENT — corpus-sized, exactly what must never be force-broadcast
    # (a 1M-doc probe OOMed the driver here).  Left as plain equi-joins,
    # AQE still broadcast-converts them when the corpus is actually small.
    pairs = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
    if threshold is not None:
        pairs = pairs.filter(F.col("jaccard") >= threshold)
    if top_k is not None:
        pairs = pairs.orderBy(
            F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b")
        ).limit(top_k)
    return pairs


def minhash_signature(toks: Column, num_hashes: int = 32, n: int = 3) -> Column:
    """MinHash signature over n-gram shingles of a materialized token-array
    column: for seed i, min over shingles of murmur3(shingle, salted).
    Array expression — the signature is computed in one projection, no
    explode (the explode+agg twin used by minhash_lsh_pairs is faster on
    wide corpora; this form suits signature-per-row outputs)."""
    sh = shingles_of_tokens(toks, n)

    # The seed must be captured in an OUTER closure: a two-parameter
    # lambda (s, i=i) looks like transform's (element, index) form to
    # PySpark, which binds the second parameter to the ARRAY INDEX and
    # silently shadows the seed — every element of the signature then
    # collapses to the same seed-less min.
    def seeded(i: int):
        return lambda s: F.hash(s, F.lit(i))

    return F.array(
        *[
            F.array_min(F.transform(sh, seeded(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """(id, sig, band, bucket) — the LSH banding layout shared by batch
    pair-mining (minhash_lsh_pairs) and the persistable corpus index
    (dedup_index).

    Signature via explode + one hash-aggregate of `num_hashes` min()s:
    murmur3 + min run fully inside codegen with map-side combine, unlike
    the per-element interpreted lambda of minhash_signature (kept for the
    no-explode single-projection form).
    """
    rows = num_hashes // bands
    sh = shingled(df, id_col, text, n)
    sig = sh.groupBy(id_col).agg(
        F.array(
            *[F.min(F.hash("s", F.lit(i))) for i in range(num_hashes)]
        ).alias("sig")
    )
    return sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.element_at("sig", b * rows + r + 1)
                                for r in range(rows)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding — the linear-time near-dup path for 100 TB.

    signature (one pass) → explode into `bands` band-hashes → equi-join on
    (band, bucket) → candidate pairs → estimated Jaccard = fraction of
    matching signature positions.  Murmur3 hashes differ across engines →
    rows-only in the contract; exactness is covered by jaccard_pairs.
    """
    banded = minhash_bands(df, id_col, text, num_hashes, bands, n)
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= est_threshold)
    )


def simhash(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """64-bit SimHash fingerprint: per token hash, vote ±1 on each bit,
    sign of the vote becomes the fingerprint bit.  One explode + one
    aggregate (64 conditional sums in a single agg pass)."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("w")
    ).select(F.col(id_col), F.xxhash64("w").alias("h"))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 is the sign bit; 63 bits suffice
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(63):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(id_col, fp.cast("long").alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text: str,
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination check (EXT): per training document, the
    number of distinct word ``n``-grams it shares with a held-out eval
    corpus — the standard train/test contamination detector for LLM
    training data.

    Shape: distinct eval n-grams (small — eval sets are thousands of
    documents even when the training corpus is 100 TB) are broadcast to
    every executor; the training side streams through a hash semi-shaped
    equi-join on the n-gram and aggregates per document.  The training
    corpus is scanned exactly once, never shuffled on anything wider than
    ``(id, n-gram)``, and the only full-width exchange is the final
    per-document count.  Set ``broadcast_eval=False`` for the rare
    eval-larger-than-memory case (falls back to a shuffle join on the
    n-gram, still linear).

    Returns ``(id_col, hit_grams)`` for training docs with ≥1 shared
    n-gram; docs absent from the output are clean.
    """
    ev = shingled(eval_df, id_col, text, n).select("s").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = shingled(train, id_col, text, n).distinct()
    return (
        tr.join(ev, "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_grams"))
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text: str,
    n: int = 5,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``decontaminate`` with a Bloom prefilter — the 100 TB shape.

    ``decontaminate`` broadcasts the full distinct eval n-gram SET
    (strings); at a large eval suite that broadcast is GBs.  Here the
    eval grams are folded into a fixed-size bit-packed bitmap
    (``num_bits/8`` bytes — 128 KB at the default 2²⁰ — see
    ops/bloom.py), the training side is prefiltered by k codegen bit
    tests during its single scan, and only the surviving sliver (true
    hits + ≈(1−e^{−kn/m})^k false positives) enters the exact verify
    join.  Bloom filters have no false negatives, so the output is
    IDENTICAL to ``decontaminate``'s — ``q_decontam_bloom`` shares
    ``q_decontam``'s DuckDB oracle on exactly this argument.

    The exact verify join is deliberately NOT broadcast: the prefilter
    already collapsed the probe side, so AQE picks broadcast when the
    candidate sliver is small and a shuffle join when it isn't.
    """
    ev = shingled(eval_df, id_col, text, n).select("s").distinct()
    bf = bloom.bloom_build(ev, "s", num_bits, num_hashes)
    tr = shingled(train, id_col, text, n).distinct()
    cand = bloom.bloom_might_contain(tr, "s", bf, num_bits, num_hashes)
    return (
        cand.join(ev, "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_grams"))
    )


def dedup_index(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Persistable dedup index of a corpus: (id, digest, sig, band,
    bucket) — one row per document per LSH band.

    This is what makes dedup INCREMENTAL at 100 TB: write it once
    (partitioned/bucketed by (band, bucket) so arriving batches co-locate),
    then every new batch joins against the index — the corpus *text* is
    never rescanned.  digest gates exact duplicates; the banded minhash
    gates near-duplicates.
    """
    banded = minhash_bands(df, id_col, text, num_hashes, bands, n)
    digests = df.select(F.col(id_col), F.md5(F.col(text)).alias("digest"))
    return banded.join(digests, id_col).select(
        id_col, "digest", "sig", "band", "bucket"
    )


def load_dedup_index(spark, path: str) -> DataFrame:
    """The canonical read path for a PERSISTED dedup index: drops the
    streaming ``_batch`` bookkeeping column and anti-joins the
    ``_tombstones`` sidecar (:func:`delete_from_dedup_index`), so
    takedown-deleted documents stop suppressing future ingests the
    moment the tombstone lands.  Every consumer (incremental_dedup
    callers, the ingest stream) should read through here — a raw
    ``spark.read.parquet`` would keep enforcing deleted docs' digests
    and buckets until compaction."""
    from snowav_spark.io import hadoop_path_exists

    idx = spark.read.parquet(path)
    if "_batch" in idx.columns:
        idx = idx.drop("_batch")
    tomb = path.rstrip("/") + "/_tombstones"
    if hadoop_path_exists(spark, tomb):
        id_col = idx.columns[0]
        idx = idx.join(
            spark.read.parquet(tomb).withColumnRenamed(
                "doc_id", id_col
            ),
            id_col,
            "left_anti",
        )
    return idx


def delete_from_dedup_index(spark, path: str, ids, id_col="doc_id") -> int:
    """Tombstone documents in a persisted dedup index — the takedown /
    policy-change eviction path (the delete_from_text_index twin with
    INVERTED polarity: here a delete means the doc's digest and LSH
    buckets stop SUPPRESSING future ingests, so equivalent content can
    legitimately re-enter the corpus).  Index rows are never rewritten:
    ids append to a ``_tombstones`` sidecar that
    :func:`load_dedup_index` anti-joins and
    :func:`compact_dedup_index` folds away physically.  Idempotent;
    ids absent from the index are ignored.  NOTE: this evicts the
    INDEX entry only — removing the doc from the corpus sink itself is
    the sink's delete (partition rewrite / tombstoned store).
    Returns the number of newly tombstoned documents."""
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    ids = ids.selectExpr(
        f"CAST({ids.columns[0]} AS LONG) AS doc_id"
    ).distinct()
    from snowav_spark.io import hadoop_path_exists

    tomb = path.rstrip("/") + "/_tombstones"
    if hadoop_path_exists(spark, tomb):
        ids = ids.join(spark.read.parquet(tomb), "doc_id", "left_anti")
    idx = spark.read.parquet(path)
    present = (
        idx.selectExpr(f"CAST({idx.columns[0]} AS LONG) AS doc_id")
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .distinct()
        .persist()
    )
    try:
        n = present.count()
        if n:
            present.coalesce(1).write.mode("append").parquet(tomb)
    finally:
        present.unpersist()
    return n


def compact_dedup_index(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Fold a streamed ``(_batch)`` dedup-index layout into a flat
    serving layout, physically dropping tombstoned rows and retiring
    the sidecar (the compact_text_index twin).  Run after the ingest
    stream is stopped.  A ``band=``-partitioned layout (the CLI
    build-dedup form) keeps its band directories — flattening them
    would make the next partitioned append a mixed directory structure
    Spark refuses to read."""
    import os
    import shutil

    from snowav_spark import sinks
    from snowav_spark.io import hadoop_path_exists

    banded = os.path.isdir(path) and any(
        n.startswith("band=") for n in os.listdir(path)
    )

    tombs = path.rstrip("/") + "/_tombstones"
    tomb = (
        spark.read.parquet(tombs)
        if hadoop_path_exists(spark, tombs)
        else None
    )

    def _fold(df):
        if "_batch" in df.columns:
            df = df.drop("_batch")
        if tomb is not None:
            id_col = df.columns[0]
            df = df.join(
                tomb.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
            )
        return df

    n_files = sinks.compact_partitions(
        spark,
        path,
        partition_by=("band",) if banded else (),
        target_rows_per_file=target_rows_per_file,
        transform=_fold,
        sort_within=("bucket",) if banded else (),
    )
    shutil.rmtree(tombs, ignore_errors=True)
    return n_files


def incremental_dedup(
    new: DataFrame,
    index: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    est_threshold: float = 0.8,
) -> DataFrame:
    """Survivors of a new batch against an existing corpus index (built by
    dedup_index with the SAME parameters).

    Three linear gates, no corpus rescan:
    1. within-batch exact: keep the lowest id per content digest;
    2. exact-vs-corpus: anti-join batch digests against index digests;
    3. near-vs-corpus: LSH-band the batch, equi-join the index on
       (band, bucket) — only co-bucketed (candidate) pairs are scored —
       and drop batch docs whose estimated Jaccard vs ANY corpus doc
       reaches ``est_threshold``.

    Near-duplicates *within* the new batch are the existing batch path
    (minhash_lsh_pairs + graph.drop_near_dups); run it on the survivors if
    the batch itself is large enough to self-duplicate.
    """
    w_digest = new.withColumn("_digest", F.md5(F.col(text)))
    best = w_digest.groupBy("_digest").agg(F.min(id_col).alias("_keep"))
    batch_exact = (
        w_digest.join(best, "_digest")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )
    fresh = batch_exact.join(
        index.select("digest").distinct(),
        batch_exact["_digest"] == F.col("digest"),
        "left_anti",
    ).drop("_digest")

    cand = minhash_bands(fresh, id_col, text, num_hashes, bands, n).join(
        index.select(
            F.col("sig").alias("_corpus_sig"), "band", "bucket"
        ),
        ["band", "bucket"],
    )
    est = F.size(
        F.filter(
            F.zip_with("sig", "_corpus_sig", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    near_hit = (
        cand.filter(est >= est_threshold).select(id_col).distinct()
    )
    return fresh.join(near_hit, id_col, "left_anti")


def minhash_lsh_pairs_portable(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH with a PORTABLE hash family: signature element i is the
    lexicographic min over shingles of ``md5('i:' || shingle)`` — a valid
    uniform permutation, and bit-identical in every engine that has md5
    (unlike murmur3/xxhash), so the full pipeline is oracle-verifiable.

    Same linear-scale shape as minhash_lsh_pairs: one explode + one
    hash-aggregate of `num_hashes` mins (map-side combine), band buckets
    by hashing signature slices, equi-join on (band, bucket), estimated
    Jaccard = fraction of equal signature positions (multiples of
    1/num_hashes — exact binary doubles, so round() is noise-free).
    Production corpora should prefer the murmur3 form (integer hashing is
    ~2-3x cheaper than md5-on-string); semantics are identical.
    """
    rows = num_hashes // bands
    sh = shingled(df, id_col, text, n)
    sig = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        id_col,
        *[F.col(f"h{i}") for i in range(num_hashes)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[
                                    F.col(f"h{b * rows + r}")
                                    for r in range(rows)
                                ]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, *[f"h{i}" for i in range(num_hashes)], "bb.band", "bb.bucket")
    a = banded.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
        "band",
        "bucket",
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
        "band",
        "bucket",
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = matches.cast("double") / F.lit(float(num_hashes))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .distinct()
        .filter(F.col("est_jaccard") >= est_threshold)
    )


def simhash_portable(
    df: DataFrame, id_col: str, text: str, bits: int = 32
) -> DataFrame:
    """SimHash with a PORTABLE hash family: bit j of a token is the top
    bit of ``md5('j:' || token)`` (first hex char >= '8') — uniform,
    independent per j, and bit-identical in every engine with md5, so
    the fingerprint is oracle-verifiable end to end.

    Same shape as simhash(): one explode + ONE aggregate of `bits`
    conditional sums (map-side combine), sign of each vote becomes the
    fingerprint bit.  Fingerprint is emitted as a bit string — engine
    and width neutral.  Production corpora should prefer simhash()
    (one xxhash64 per token vs `bits` md5s); semantics are identical.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("w")
    )
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), F.col("w"))), 1, 1
                    )
                    >= "8",
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = F.concat(
        *[
            F.when(F.col(f"v{j}") > 0, "1").otherwise("0")
            for j in range(bits)
        ]
    )
    return votes.select(F.col(id_col), fp.alias("fp"))


def dup_size_histogram(df: DataFrame, text: str) -> DataFrame:
    """Duplicate-cluster-size histogram: how many content-identical
    clusters exist at each multiplicity — the "how duplicated is my
    corpus" diagnostic that sizes a dedup pass before running it.

    Two hash aggregates (digest → cluster size, size → cluster count),
    both map-side combined; the second input is one row per DISTINCT
    digest, so the heavy shuffle is the first and carries only
    (digest, partial count).  Exact integer output — hash-matchable in
    any engine.  Scale: linear, no skew concern (a hot digest is still
    one group; the histogram key space is tiny).
    """
    return (
        df.select(F.md5(F.col(text)).alias("_digest"))
        .groupBy("_digest")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def keep_best(
    df: DataFrame, id_col: str, text: str, score: str
) -> DataFrame:
    """Quality-aware exact-dup resolution: per content-digest cluster,
    keep the member with the highest ``score`` (ties → lowest id) — the
    "keep the best copy" variant of drop_exact_dups, used when duplicate
    crawls differ in completeness and min-id survivorship would throw
    away the better capture.

    One shuffle keyed on the digest; the survivor is a single
    ``max_by(id, (score, -id))`` hash aggregate with map-side combine —
    no window, no second pass over the text.  NULL text is excluded (a
    NULL digest would otherwise form one giant bogus cluster).
    Output: (digest, n_copies, kept_id, best_score).

    Requires an integral id column: the lowest-id tie-break negates the
    id inside max_by's ordering struct.  A non-numeric id would silently
    cast to NULL and every cluster's survivor would vanish, so reject it
    loudly instead.
    """
    import re as _re

    dtypes = dict(df.dtypes)
    if id_col not in dtypes:
        raise ValueError(
            f"keep_best: no column {id_col!r} (have {sorted(dtypes)})"
        )
    id_type = dtypes[id_col]
    if id_type not in (
        "tinyint", "smallint", "int", "bigint"
    ) and not _re.fullmatch(r"decimal\(\d+,0\)", id_type):
        raise ValueError(
            f"keep_best needs an integral id column for its deterministic"
            f" tie-break; {id_col!r} is {id_type}"
        )
    d = df.filter(F.col(text).isNotNull()).select(
        F.md5(F.col(text)).alias("digest"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(score).alias("_score"),
    )
    return d.groupBy("digest").agg(
        F.count("*").alias("n_copies"),
        F.max_by(
            "_id", F.struct(F.col("_score"), (-F.col("_id")).alias("_nid"))
        ).alias("kept_id"),
        F.max("_score").alias("best_score"),
    )


def span_dup_stats(
    df: DataFrame, id_col: str, text: str, n: int = 5
) -> DataFrame:
    """Cross-document duplicated-SPAN diagnostics: for each document,
    how many of its n-token spans (all positions, repeats included)
    also occur in at least one OTHER document — the substring-level
    duplication signal behind exact-substring dedup (suffix-array
    pipelines report the same per-doc fraction; this is the bounded
    n-gram form of it, n fixed instead of longest-match).

    Plan shape at 100 TB: one token-array projection, positions explode
    to (doc, span) — linear in token count; span doc-frequency is a
    map-side-combined count over the per-doc DISTINCT span set; the
    shared-span set joins back by equi-join on the span key (AQE splits
    the hot stopword-run spans — a df cap would erase exactly the
    boilerplate the diagnostic exists to find).  Exact integer counts;
    the fraction is one division of exact ints.  Docs with < n tokens
    have no spans and are not emitted (consistent in both dialects).
    Output: (id, n_spans, n_dup_spans, dup_frac).
    """
    toks = df.filter(F.col(text).isNotNull()).select(
        F.col(id_col), F.split(F.col(text), " ").alias("_toks")
    )
    spans = toks.select(
        id_col,
        F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("_s"),
    )
    docfreq = (
        spans.select(id_col, "_s")
        .distinct()
        .groupBy("_s")
        .agg(F.count("*").alias("_dfc"))
    )
    shared = docfreq.filter(F.col("_dfc") >= 2).select("_s")
    tot = spans.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    dup = (
        spans.join(shared, "_s", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n_dup"))
    )
    return (
        tot.join(dup, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce(F.col("_n_dup"), F.lit(0).cast("long")).alias(
                "n_dup_spans"
            ),
            F.round(
                F.coalesce(F.col("_n_dup"), F.lit(0)) / F.col("n_spans"), 6
            ).alias("dup_frac"),
        )
    )
