"""Scalar embedding quantization (EXT — no reference analog).

Vector stores and training pipelines ship embeddings as int8 codes
(4× smaller than float32, SIMD-friendly distance kernels).  Per-dimension
min/max scalar quantization: code = round((x − min_d) / scale_d) with
scale_d = (max_d − min_d) / (2^bits − 1).

Scale shape: per-dim stats are ONE wide aggregation (2×dim min/max
expressions, map-side combined — the exchange carries one 2×dim row per
partition, never the corpus), broadcast back via a 1-row crossJoin; code
computation is flat column arithmetic in whole-stage codegen.  No explode
(a dim-explode would inflate rows ×dim and shuffle on 64 hot keys), no
Python UDF, no driver action — stats stay inside the lazy plan.

All outputs are integers, so results are bit-identical across engines
(min/max are order-independent; the code arithmetic is pure IEEE-double
with identical shapes) — which is what makes the contract key
oracle-matchable despite float inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wide(
    df: DataFrame, id_col: str, vec: str, dim: int, keep: tuple = ()
) -> DataFrame:
    return df.selectExpr(
        id_col,
        *keep,
        *[
            f"CAST(element_at({vec}, {i + 1}) AS DOUBLE) AS x{i}"
            for i in range(dim)
        ],
    )


def _with_stats(wide: DataFrame, dim: int) -> DataFrame:
    stats = wide.agg(
        *[F.min(f"x{i}").alias(f"mn{i}") for i in range(dim)],
        *[F.max(f"x{i}").alias(f"mx{i}") for i in range(dim)],
    )
    return wide.crossJoin(F.broadcast(stats))


def _code(i: int, levels: int) -> str:
    # constant dimension (mx == mn) quantizes to 0 rather than divide by zero
    return (
        f"CASE WHEN mx{i} = mn{i} THEN 0 ELSE "
        f"CAST(ROUND((x{i} - mn{i}) / ((mx{i} - mn{i}) / {float(levels)!r})) AS INT) "
        f"END"
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec: str, dim: int, bits: int = 8
) -> DataFrame:
    """(id, codes array<int>): each dimension quantized to [0, 2^bits−1]."""
    levels = (1 << bits) - 1
    arr = ", ".join(_code(i, levels) for i in range(dim))
    return _with_stats(_wide(df, id_col, vec, dim), dim).selectExpr(
        id_col, f"array({arr}) AS codes"
    )


def dim_code_stats(
    df: DataFrame, id_col: str, vec: str, dim: int, bits: int = 8
) -> DataFrame:
    """Per-dimension quantization audit: (dim_idx, code_min, code_max,
    code_sum, n) — the checksum row-set proving codes are identical across
    engines/runs.  Same plan as quantize_embeddings plus one wide agg and
    a stack() unpivot of the single summary row (64 rows, driver-sized)."""
    levels = (1 << bits) - 1
    coded = _with_stats(_wide(df, id_col, vec, dim), dim).selectExpr(
        *[f"{_code(i, levels)} AS q{i}" for i in range(dim)]
    )
    summary = coded.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.min(f"q{i}").cast("int").alias(f"qmn{i}") for i in range(dim)],
        *[F.max(f"q{i}").cast("int").alias(f"qmx{i}") for i in range(dim)],
        *[F.sum(f"q{i}").cast("long").alias(f"qsm{i}") for i in range(dim)],
    )
    stack = ", ".join(
        f"{i + 1}, qmn{i}, qmx{i}, qsm{i}" for i in range(dim)
    )
    return summary.selectExpr(
        f"stack({dim}, {stack}) AS (dim_idx, code_min, code_max, code_sum)",
        "n",
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) search
# ---------------------------------------------------------------------------


def train_pq_codebook(
    df: DataFrame,
    id_col: str,
    vec: str,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    train_fraction: float = 1.0,
) -> list[list[list[float]]]:
    """Train a product-quantization codebook: split each vector into
    ``m`` subvectors of dim/m and k-means each subspace independently
    (deterministic Lloyd's from ops/cluster.py — auditable codebooks).
    Returns m codebooks of k centroids each (m·k·dim/m floats — KBs:
    driver-sized by construction).

    Standard PQ practice at 100 TB: TRAIN on a deterministic hash sample
    (``train_fraction``) — codebook quality saturates quickly — then
    ENCODE the full corpus with :func:`pq_encode` (one codegen pass, no
    further iteration).

    The m subspace k-means are trained JOINTLY
    (cluster.kmeans_subspaces): 1 + iters passes over the training set
    for all m subspaces, instead of the m·(1 + iters) passes the
    per-subspace kmeans loop paid — the passes are the build cost at
    scale, and each pass re-derives the input lineage (for IVF-PQ,
    the whole residual computation)."""
    from snowav_spark.ops import cluster, sampling

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    train = df.filter(F.col(vec).isNotNull() & (F.size(F.col(vec)) == dim))
    if train_fraction < 1.0:
        train = sampling.hash_sample(train, id_col, train_fraction)
    return cluster.kmeans_subspaces(
        train, id_col, vec, m=m, sub=sub, k=k, iters=iters
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec: str,
    codebook: list[list[list[float]]],
    keep: tuple = (),
) -> DataFrame:
    """Encode every vector as ``m`` small centroid ids (array<int> —
    m bytes of information per vector vs 4·dim for float32) in ONE
    whole-stage-codegen projection: the codebook is inlined as literal
    expressions (same trick as cluster._assign), each subspace computes
    k squared distances over its slice and takes the argmin.  No join,
    no shuffle, no UDF — a linear scan at any corpus size.
    Output: (id, *keep, codes array<int>) — ``keep`` columns (e.g. an
    IVF cell id) ride along the projection unchanged."""
    m = len(codebook)
    sub = len(codebook[0][0])
    dim = m * sub
    # domain filter: NULL vectors, wrong dims, and vectors with NULL/NaN
    # ELEMENTS are excluded — a poisoned element makes every distance in
    # its subspace NaN/NULL, where the flat and fold kernels disagree on
    # the argmin (CASE-on-NaN yields NULL, array_position treats NaN as
    # equal) — so the bit-identity contract holds on the encodable set
    base = df.filter(
        F.col(vec).isNotNull()
        & (F.size(F.col(vec)) == dim)
        & ~F.expr(f"exists({vec}, v -> v IS NULL OR isnan(CAST(v AS DOUBLE)))")
    )
    # HYBRID distance kernel (VERDICT r6 item 4).  Two codegen shapes,
    # bit-identical codes either way:
    #
    # FLAT (term count ≤ arrmath.FLAT_TERM_LIMIT): scalar wide columns
    # x{i} feeding one literal-unrolled distance chain per (subspace,
    # centroid), collected into a per-subspace array —
    # array_position(array_min) argmin, the same first-match
    # (lowest centroid id) tie-break as a least()+CASE chain (arrmath
    # bit-identity contract).  R12 re-measure of the r5 shape: the old
    # per-distance NAMED columns + least()+CASE form generated ~1 MB of
    # whole-stage source at the 512-term bench config and janino DIED
    # ("Code grows beyond 64 KB") — Spark then fell back to per-operator
    # codegen, which RAN fast (0.5 s/1M rows: small, JIT-able
    # per-expression methods) but re-attempted and re-failed the doomed
    # whole-stage compile on EVERY action (~0.4 s each, never cached,
    # ERROR noise in every log).  The array form compiles (cached
    # thereafter); its whole-stage methods exceed the JVM's 8 KB JIT
    # limit, so with spark.sql.codegen.hugeMethodLimit=8000
    # (session.ENGINE_CONF) Spark takes the same fast per-operator path
    # deterministically — measured 0.70 s/1M rows warm vs 0.93 s for the
    # failing-compile shape and 7.5 s for non-JIT whole-stage.
    #
    # FOLD (beyond the limit): array-lambda folds (ops/arrmath.py) that
    # codegen as loops — the flat form past FLAT_TERM_LIMIT
    # multiply-adds per fused stage makes the Catalyst tree itself the
    # bottleneck, and lambda loops stay compact at any k.  Measured 10×
    # slower per row than the flat chains (9.6 vs 0.93 s/1M rows), so
    # the flat form keeps the at-scale configs below the limit.
    # Bit-identity of fold vs left-assoc chains is derived once in
    # arrmath (sign-of-zero only, invisible to argmin).
    from snowav_spark.ops import arrmath

    k = len(codebook[0])
    if m * k * sub <= arrmath.FLAT_TERM_LIMIT:
        wide = _wide(base, id_col, vec, dim, keep)
        dist_cols = []
        for j, cents in enumerate(codebook):
            per_cent = []
            for c in cents:
                per_cent.append(
                    " + ".join(
                        f"(x{j * sub + i} - {float(c[i])!r})"
                        f" * (x{j * sub + i} - {float(c[i])!r})"
                        for i in range(sub)
                    )
                )
            dist_cols.append(f"array({', '.join(per_cent)}) AS _d{j}")
        scored = wide.selectExpr(id_col, *keep, *dist_cols)
        codes = ", ".join(
            f"CAST(array_position(_d{j}, array_min(_d{j})) - 1 AS INT)"
            for j in range(m)
        )
        return scored.selectExpr(
            id_col, *keep, f"array({codes}) AS codes"
        )

    slices = [
        f"CAST(slice({vec}, {j * sub + 1}, {sub}) AS array<double>) AS _s{j}"
        for j in range(m)
    ]
    dist_cols = []
    for j, cents in enumerate(codebook):
        per_cent = ", ".join(
            arrmath.sqdist_sql(f"_s{j}", c) for c in cents
        )
        dist_cols.append(f"array({per_cent}) AS _d{j}")
    scored = base.selectExpr(id_col, *keep, *slices).selectExpr(
        id_col, *keep, *dist_cols
    )
    codes = ", ".join(
        f"CAST(array_position(_d{j}, array_min(_d{j})) - 1 AS INT)"
        for j in range(m)
    )
    return scored.selectExpr(id_col, *keep, f"array({codes}) AS codes")


def pq_topk(
    codes: DataFrame,
    codebook: list[list[list[float]]],
    query: list[float],
    k_out: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query is
    compared against CENTROIDS, so per subspace there are only k
    distances — precomputed here into literal lookup tables — and each
    row's approximate distance is m array lookups + a sum, pure codegen
    over the codes column.  The corpus scan never touches float vectors
    (they need not even be stored), and top-k is TakeOrdered (no global
    sort).  Output: (id, adc_dist2) ascending."""
    m = len(codebook)
    sub = len(codebook[0][0])
    terms = []
    for j, cents in enumerate(codebook):
        q = query[j * sub : (j + 1) * sub]
        table = [
            sum((qv - cv) ** 2 for qv, cv in zip(q, c)) for c in cents
        ]
        lits = ", ".join(repr(float(t)) for t in table)
        # CAST: bare decimal literals parse as DECIMAL — keep the ADC
        # sum in IEEE doubles (same fix as search_ivfpq_index)
        terms.append(
            f"element_at(CAST(array({lits}) AS array<double>), "
            f"element_at(codes, {j + 1}) + 1)"
        )
    scored = codes.selectExpr(
        codes.columns[0], f"{' + '.join(terms)} AS adc_dist2"
    )
    return scored.orderBy("adc_dist2", codes.columns[0]).limit(k_out)


def _residuals(
    df: DataFrame, id_col: str, vec: str, cents, extra: tuple = ()
) -> DataFrame:
    """(id, *extra, cell, _res): Voronoi cell + residual v − centroid
    (cell), via one broadcast join against the KB centroid table + a
    zip_with subtraction — the corpus is never shuffled.  ``extra``
    names metadata columns that ride through unchanged (filtered-ANN
    support: they end up stored next to the codes)."""
    from snowav_spark.io import local_df
    from snowav_spark.ops import similarity

    cent_df = local_df(
        df.sparkSession,
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, _cent array<double>",
    )
    assigned = similarity.ivf_assign(df, id_col, vec, cents)
    return assigned.join(F.broadcast(cent_df), "cell").selectExpr(
        id_col,
        *extra,
        "cell",
        f"zip_with(CAST({vec} AS array<double>), _cent, "
        "(a, b) -> a - b) AS _res",
    )


def _write_codes(
    codes: DataFrame, path: str, batch_id: int | None, overwrite_all: bool
) -> None:
    """One code-write shape for both index layouts: plain ``cell``
    partitions for batch builds/appends, ``(cell, _batch)`` for
    streaming ingest (replays rewrite their own _batch partitions via
    dynamic overwrite instead of appending a second copy)."""
    if batch_id is None:
        mode = "overwrite" if overwrite_all else "append"
        codes.write.mode(mode).partitionBy("cell").parquet(path)
        return
    w = codes.withColumn("_batch", F.lit(int(batch_id))).write
    if overwrite_all:
        w = w.mode("overwrite")
    else:
        w = w.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    w.partitionBy("cell", "_batch").parquet(path)


def _read_ivfpq_sidecars(spark, path: str) -> tuple[list, list]:
    """(centroids, codebook) from a build_ivfpq_index layout's sidecars."""
    side = (
        spark.read.parquet(path.rstrip("/") + "/_ivf_centroids")
        .orderBy("cell")
        .collect()
    )
    cents = [list(r._cent) for r in side]
    cb_rows = (
        spark.read.parquet(path.rstrip("/") + "/_pq_codebook")
        .orderBy("subspace", "centroid_id")
        .collect()
    )
    m = 1 + max(r.subspace for r in cb_rows)
    k = 1 + max(r.centroid_id for r in cb_rows)
    codebook: list = [[None] * k for _ in range(m)]
    for r in cb_rows:
        codebook[r.subspace][r.centroid_id] = list(r.centroid)
    return cents, codebook


def build_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec: str,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    train_fraction: float = 1.0,
    batch_id: int | None = None,
    metadata: tuple = (),
    cents: list | None = None,
    codebook: list | None = None,
) -> tuple[list, list]:
    """Persist an IVF-PQ index: the FAISS ``IVFx,PQm`` layout re-expressed
    as a parquet directory tree (ref path: SURVEY §2.6 ANN scale path —
    no reference analog; the public design is Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search").

    Combines the two existing ANN halves into the shape that actually
    serves 100 TB:

    - **IVF** (similarity.ivf_centroids): rows are Voronoi-assigned to
      ``n_cells`` cells and written ``partitionBy("cell")`` — a probe
      reads only ``nprobe`` directories via partition pruning, exactly
      like :func:`snowav_spark.ops.similarity.build_ivf_index`.
    - **PQ on RESIDUALS** (v − centroid(cell)): the per-cell residual has
      far lower variance than the raw vector, so the same m×k codebook
      quantizes it much more accurately (the standard IVFADC refinement).
      The stored rows are (id, codes array<int>) ONLY — m small ints per
      vector; the float vectors need not be stored at all.  At 4-byte
      dims and m=8 that is a ~32× at-rest compression of a 64-d corpus.

    Residual computation is one broadcast join against the KB-sized
    centroid table + a ``zip_with`` subtraction — no shuffle of the
    corpus; encode is the :func:`pq_encode` single-projection scan with
    the cell id riding along (``keep``).  Sidecars (underscore-prefixed
    so Spark's listing of the parent ignores them, written THROUGH Spark
    so the index is portable to any Spark filesystem):

    - ``_ivf_centroids``: (cell, centroid array<double>)
    - ``_pq_codebook``:   (subspace, centroid_id, centroid array<double>)

    ``metadata`` names extra columns of ``df`` stored verbatim next to
    the codes (lang, quality, date, …): search can then push a metadata
    predicate into the pruned cell scan — the "top-k WHERE lang='en'"
    production query — without touching any other table.  Appends to a
    metadata-carrying index must pass the same tuple.

    ``cents`` / ``codebook`` accept PRE-TRAINED artifacts from an
    earlier build over the SAME corpus and parameters (e.g. a plain and
    a metadata-carrying layout of one corpus, the contract.build_indexes
    shape): Lloyd training and PQ codebook training are deterministic
    functions of (df, params), so re-running them for a second layout is
    pure recomputation — 1 + iters full passes for the centroids plus
    1 + iters training passes for the codebook (VERDICT r11 item 3).
    Passing artifacts trained on a DIFFERENT corpus or parameterization
    is on the caller — the stored codes would quantize against the
    wrong regions.  Both default to None (train here).

    Returns ``(centroids, codebook)``.
    """
    from snowav_spark.io import local_df
    from snowav_spark.ops import sampling, similarity

    spark = df.sparkSession
    if cents is None:
        cents = similarity.ivf_centroids(
            df, id_col, vec, n_cells, iters, dim
        )
    cent_df = local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, _cent array<double>",
    )
    res = _residuals(df, id_col, vec, cents, extra=metadata)
    train = res
    if train_fraction < 1.0:
        train = sampling.hash_sample(res, id_col, train_fraction)
    # The residual lineage (cell assignment + broadcast join + zip_with)
    # is re-derived by every training pass; persist the TRAINING rows —
    # (id, _res) only, the bounded sample at production train_fraction —
    # for the 1 + iters codebook jobs, then release.  The full-corpus
    # encode pass below still derives residuals exactly once from the
    # source.
    if codebook is None:
        train_cached = train.select(id_col, "_res").persist()
        try:
            codebook = train_pq_codebook(
                train_cached, id_col, "_res", dim=dim, m=m, k=k,
                iters=iters,
            )
        finally:
            train_cached.unpersist()
    codes = pq_encode(
        res, id_col, "_res", codebook, keep=("cell", *metadata)
    )
    # batch_id: streaming indexes partition by (cell, _batch) so an
    # at-least-once replay REWRITES its own partitions (see
    # streaming.incremental.ann_index_stream); a given index must use
    # one layout consistently.  Codes are written BEFORE the sidecars:
    # the centroid sidecar acts as the build's commit marker (a crash
    # mid-build leaves no sidecar, and the static overwrite here wipes
    # the partial codes on rebuild).
    _write_codes(codes, path, batch_id, overwrite_all=True)
    cb_rows = [
        (j, ci, [float(x) for x in c])
        for j, cents_j in enumerate(codebook)
        for ci, c in enumerate(cents_j)
    ]
    # local_df puts the sidecar rows on one slice already, so no
    # coalesce(1) is needed — on 32 pickled slices that coalesce cost
    # ~3.5 s of serial Python-worker round-trips per sidecar (io.local_df)
    local_df(
        spark, cb_rows,
        "subspace int, centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(
        path.rstrip("/") + "/_pq_codebook"
    )
    # the centroid sidecar is the commit marker (ann_index_stream keys
    # its build-vs-append decision on it), so it must be written LAST —
    # marker-before-codebook would leave a 'committed' index whose
    # appends fail forever on the missing codebook after a crash between
    # the two sidecar writes
    cent_df.write.mode("overwrite").parquet(
        path.rstrip("/") + "/_ivf_centroids"
    )
    return cents, codebook


def search_ivfpq_index(
    spark,
    path: str,
    query_vec,
    id_col: str = "vec_id",
    k_out: int = 10,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    rerank_vec: str = "embedding",
    rerank_depth: int = 0,
    where: str | None = None,
) -> DataFrame:
    """Top-k search against a :func:`build_ivfpq_index` layout.

    The query is compared against CENTROIDS only (asymmetric distance):
    per probed cell ``c`` the residual query ``q − centroid(c)`` yields
    an m×k table of subspace distances, precomputed driver-side and
    inlined as literals — nprobe·m·k doubles, KBs.  The scan carries
    ``cell IN (probed)`` as a PARTITION filter (reads nprobe directories
    at any corpus size) and scores each row as m lookups + a sum in one
    codegen projection over the codes column; top-k is TakeOrdered.
    ``adc_dist2`` approximates the true L2²(q, v).

    Optional exact re-rank (the standard two-stage serving shape): pass
    the float-vector corpus as ``rerank`` and the top ``rerank_depth``
    ADC candidates (default 4·k_out) are re-scored by exact cosine —
    the candidate id set is broadcast, so the corpus side is a pruned
    semi-join scan, never shuffled.  Output is then (id, cos_sim)
    descending, directly comparable to cosine_topk's exact answer.

    ``where`` (metadata-filtered ANN — the production "top-k among docs
    WHERE lang='en' AND quality>q" query): a SQL predicate over
    metadata columns the index was built with
    (``build_ivfpq_index(metadata=...)``).  It lands BETWEEN the cell
    partition filter and the ADC projection, so Catalyst pushes it into
    the pruned parquet scan (PushedFilters) — non-matching rows never
    reach scoring, and the shortlist (hence the re-rank id set) is
    filtered by construction.  nprobe semantics are unchanged: the
    filter prunes rows WITHIN probed cells, it does not widen the
    probe; highly selective filters may warrant a larger nprobe to keep
    the candidate pool deep enough.
    """
    import numpy as np

    cents, codebook = _read_ivfpq_sidecars(spark, path)
    dim = len(cents[0])
    if len(query_vec) != dim:
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {dim}"
        )
    m = len(codebook)
    sub = dim // m

    from snowav_spark.ops import similarity

    probe = similarity._probe_cells(cents, query_vec, nprobe)
    q = np.asarray(query_vec, dtype=np.float64)
    # per-(cell, subspace) ADC tables on the RESIDUAL query
    terms = []
    for j in range(m):
        branches = []
        for c in probe:
            qr = q - np.asarray(cents[c], dtype=np.float64)
            qj = qr[j * sub : (j + 1) * sub]
            table = [
                float(((qj - np.asarray(cent)) ** 2).sum())
                for cent in codebook[j]
            ]
            lits = ", ".join(repr(t) for t in table)
            # CAST: a bare decimal literal parses as DECIMAL in Spark
            # SQL — summing m of them per row would run (and round) in
            # decimal arithmetic instead of the IEEE doubles the tables
            # were computed in
            branches.append(
                f"WHEN {c} THEN CAST(array({lits}) AS array<double>)"
            )
        terms.append(
            f"element_at(CASE cell {' '.join(branches)} END, "
            f"element_at(codes, {j + 1}) + 1)"
        )
    # explicit cell-directory paths: listing O(nprobe), not O(n_cells)
    # — the text-index twin of io.read_pruned_partitions' rationale
    from snowav_spark.io import read_pruned_partitions

    cand = read_pruned_partitions(spark, path, "cell", probe).filter(
        F.col("cell").isin(probe)
    )
    if where is not None:
        cand = cand.filter(where)
    # deleted vectors: anti-join the tombstone sidecar before scoring
    # (delete_from_ivfpq_index).  AQE picks the join strategy —
    # takedown sets are usually broadcast-small.
    tomb = _read_ivfpq_tombstones(spark, path)
    if tomb is not None:
        cand = cand.join(tomb, id_col, "left_anti")
    scored = cand.selectExpr(id_col, f"{' + '.join(terms)} AS adc_dist2")
    depth = rerank_depth or 4 * k_out
    if rerank is None:
        return scored.orderBy("adc_dist2", id_col).limit(k_out)
    # The ADC shortlist is driver-sized by construction (depth ids), so
    # collect it and push an id IN-filter into the float-store scan:
    # against a parquet corpus laid out by id (sorted / z-ordered —
    # sinks.write_zordered), the filter prunes at row-group level and
    # the re-rank touches a handful of pages at any corpus size.  The
    # earlier broadcast-join form rescanned the ENTIRE float corpus per
    # query (measured 2.9× growth at a 2× corpus in the scale probe) —
    # an In-filter of ~4·k literals is the shape that stays flat.
    ids = [
        r[0]
        for r in scored.orderBy("adc_dist2", id_col)
        .limit(depth)
        .select(id_col)
        .collect()
    ]
    hit = rerank.filter(F.col(id_col).isin(ids))
    return similarity._cosine_score_topk(
        hit, [float(x) for x in query_vec], id_col, rerank_vec, k_out
    )


def append_to_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec: str,
    path: str,
    batch_id: int | None = None,
    metadata: tuple = (),
) -> int:
    """Incrementally add vectors to a :func:`build_ivfpq_index` layout
    WITHOUT retraining: new rows are Voronoi-assigned and PQ-encoded
    against the index's FROZEN centroids/codebook (read from the
    sidecars) and appended to their cell directories — one broadcast
    join + one codegen projection + a partitioned append, so ingest
    cost is linear in the batch, independent of the index size.

    This is the standard serving trade-off (FAISS ``add`` after
    ``train``): quantization error on appended vectors reflects the
    training-time distribution, so a large distribution drift warrants
    a rebuild — the index layout makes that a full-overwrite of the
    same path.  Duplicate ids are NOT checked (appends are blind, like
    parquet appends everywhere else); dedup upstream.  Returns the
    number of rows appended (vectors failing the dim/NULL domain filter
    are dropped, same rule as pq_encode).

    ``batch_id`` (streaming ingest): rows land under a
    ``(cell, _batch=<id>)`` partition with dynamic overwrite, so an
    at-least-once REPLAY of the batch rewrites its own partitions —
    requires the index to have been built with a ``batch_id`` too (the
    two layouts cannot mix under one path).

    Batch appends (batch_id=None) are STRUCTURALLY idempotent (the
    append_to_text_index contract): the batch's identity is a content
    digest of its (id, vector) rows and the code rows commit through
    sinks.idempotent_append — digest-named files, partial-attempt
    sweep, atomic renames — so a crashed-then-retried append, or a
    retry after an unacknowledged success, converges to exactly one
    copy.  Local-filesystem layouts only; object-store ingest should
    use the ``batch_id`` streaming layout.

    ``metadata`` must match the build's tuple for a metadata-carrying
    index — a mismatch forks the row schema (old rows read NULL for the
    missing columns), silently breaking filtered search."""
    from snowav_spark import sinks

    spark = df.sparkSession
    cents, codebook = _read_ivfpq_sidecars(spark, path)
    res = _residuals(df, id_col, vec, cents, extra=metadata)
    codes = pq_encode(
        res, id_col, "_res", codebook, keep=("cell", *metadata)
    )
    # cache around the count + write: without it the assign/encode
    # pipeline runs TWICE per append (once per action) — 2× the
    # advertised linear ingest cost on every micro-batch
    codes = codes.persist()
    try:
        n = codes.count()
        if batch_id is None:
            digest = sinks.content_digest(df, id_col, vec)
            sinks.idempotent_append(
                codes, path, digest, partition_by=("cell",)
            )
        else:
            _write_codes(codes, path, batch_id, overwrite_all=False)
    finally:
        codes.unpersist()
    return n


def _read_ivfpq_tombstones(spark, path: str):
    """The index's ``_tombstones`` sidecar, or None if never deleted."""
    from snowav_spark.io import hadoop_path_exists

    tomb = path.rstrip("/") + "/_tombstones"
    if not hadoop_path_exists(spark, tomb):
        return None
    return spark.read.parquet(tomb)


def delete_from_ivfpq_index(
    spark, path: str, ids, id_col: str = "vec_id"
) -> int:
    """Tombstone vectors in a :func:`build_ivfpq_index` layout — the
    takedown / re-dedup eviction path (the delete_from_text_index
    twin).  Code rows are NEVER rewritten: ids land in a
    ``_tombstones`` sidecar that :func:`search_ivfpq_index` anti-joins
    against (deleted vectors vanish from results immediately) and
    :func:`compact_ivfpq_index` later drops physically.  ``ids`` is a
    list or a 1-column DataFrame named ``id_col``.

    Idempotent (already-tombstoned ids skipped); ids absent from the
    index are ignored — presence is checked against the code rows (one
    pushed-In-filter scan per delete BATCH; batch takedowns, don't
    loop).  A tombstoned id stays suppressed even if re-appended;
    compact first to truly re-add.  Returns newly tombstoned count."""
    if not isinstance(ids, DataFrame):
        from snowav_spark.io import local_df

        ids = local_df(spark, [(int(i),) for i in ids], f"{id_col} long")
    ids = ids.select(F.col(id_col).cast("long").alias(id_col)).distinct()
    existing = _read_ivfpq_tombstones(spark, path)
    if existing is not None:
        ids = ids.join(existing, id_col, "left_anti")
    present = (
        spark.read.parquet(path)
        .join(F.broadcast(ids), id_col, "left_semi")
        .select(id_col)
        .distinct()
        .persist()
    )
    try:
        n = present.count()
        if n:
            present.coalesce(1).write.mode("append").parquet(
                path.rstrip("/") + "/_tombstones"
            )
    finally:
        present.unpersist()
    return n


def compact_ivfpq_index(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Fold a STREAMED IVF-PQ layout (``(cell, _batch)`` partitions from
    ann_index_stream's replay-idempotent appends) back into the batch
    serving layout: one pass rewrites the codes partitioned by ``cell``
    alone, dropping the ``_batch`` bookkeeping and re-sizing the
    micro-batch small files; the sidecars ride through untouched.  Run
    it AFTER the stream is stopped — further maintenance then uses the
    batch ``append_to_ivfpq_index`` (the two partition layouts cannot
    mix under one path).  Returns the post-compaction file count."""
    import shutil

    from snowav_spark import sinks

    tomb = _read_ivfpq_tombstones(spark, path)
    tomb_id = tomb.columns[0] if tomb is not None else None

    def _fold(df):
        if "_batch" in df.columns:
            df = df.drop("_batch")
        if tomb is not None:
            # physical delete of tombstoned rows during the rewrite
            df = df.join(tomb, tomb_id, "left_anti")
        return df

    n_files = sinks.compact_partitions(
        spark,
        path,
        partition_by=("cell",),
        target_rows_per_file=target_rows_per_file,
        transform=_fold,
    )
    # tombstones are folded in — retire the sidecar so re-appended ids
    # are live again
    shutil.rmtree(path.rstrip("/") + "/_tombstones", ignore_errors=True)
    return n_files
