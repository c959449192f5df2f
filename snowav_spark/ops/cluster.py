"""Embedding clustering for corpus curation (EXT — no reference analog).

Lloyd's k-means expressed as DataFrame ops: the per-iteration shape is one
scan + one k×dim-row shuffle, which is the 100 TB-safe layout —

- **assignment** is pure projection: centroids are inlined as literal
  expressions (k×dim doubles, trivially broadcast inside the plan), each
  point computes k squared distances as flat column arithmetic in
  whole-stage codegen and takes the argmin.  No join, no shuffle, no UDF.
- **update** is one hash aggregation: groupBy(cluster).agg(avg per dim) —
  map-side combine reduces every partition to ≤k×dim values before the
  exchange, so the shuffle carries k×dim×n_partitions doubles no matter
  how large the corpus is.
- the only driver action per iteration collects the k new centroids
  (k×dim doubles — the same justified-small pattern as
  graph.connected_components' convergence check).

Initialization is deterministic (the k lowest-id vectors), so re-runs
produce identical clusterings — the property curation pipelines need for
auditable cluster-balanced sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowav_spark.ops.sampling import shuffle_key


def _wide(df: DataFrame, id_col: str, vec: str, dim: int) -> DataFrame:
    """Flatten array<float> to dim double columns (one parsed projection)."""
    return df.selectExpr(
        id_col,
        *[
            f"CAST(element_at({vec}, {i + 1}) AS DOUBLE) AS x{i}"
            for i in range(dim)
        ],
    )


def _assign(wide: DataFrame, cents: list[list[float]], dim: int) -> DataFrame:
    """Add (cluster, dist2) = nearest centroid per row.

    k squared-distance columns + a CASE argmin, authored as SQL strings
    (hundreds of py4j Column calls per iteration measured ~10× slower to
    *plan*).  dist² uses the expanded form ‖x‖² − 2·x·c + ‖c‖²: the ‖x‖²
    term is one shared column, so per extra centroid only the dot product
    is new.  The per-dim sums are array-lambda folds (ops/arrmath.py:
    codegen loops, never dim-unrolled chains that blow janino's method
    limit; bit-identity to unrolled sums derived there once).
    Ties break toward the lowest cluster id (CASE evaluates in order).
    """
    from snowav_spark.ops import arrmath

    k = len(cents)
    xv = f"array({', '.join(f'x{i}' for i in range(dim))})"
    dists = []
    for ci, c in enumerate(cents):
        csq = sum(float(v) * float(v) for v in c)
        dists.append(
            f"xsq - 2.0 * ({arrmath.dot_sql('_xv', c)}) + {csq!r} AS d{ci}"
        )
    # chained projections so _xv materializes ONCE (aliases within one
    # selectExpr can't reference each other)
    scored = (
        wide.selectExpr("*", f"{xv} AS _xv")
        .selectExpr("*", f"{arrmath.sqnorm_sql('_xv')} AS xsq")
        .selectExpr("*", *dists)
    )
    best = f"least({', '.join(f'd{ci}' for ci in range(k))})"
    case = (
        "CASE "
        + " ".join(f"WHEN d{ci} = _best THEN {ci}" for ci in range(k))
        + " END"
    )
    return scored.selectExpr("*", f"{best} AS _best").selectExpr(
        *wide.columns, f"CAST({case} AS INT) AS cluster", "_best AS dist2"
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec: str,
    k: int = 8,
    dim: int = 64,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's k-means.  Returns (assignments, centroids):
    assignments = (id, cluster, dist2) as a lazy plan against the final
    centroids; centroids = k×dim floats.

    NULL or wrong-length vectors are dropped up front: a NULL seed vector
    crashes centroid extraction and a short vector's element_at returns
    NULL, which would silently poison every distance it touches (found by
    tools/fuzz_fixtures.py nulls variant)."""
    df = df.filter(F.col(vec).isNotNull() & (F.size(F.col(vec)) == dim))
    wide = _wide(df, id_col, vec, dim)
    seed_rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec).cast("array<double>").alias("v"))
        .collect()
    )
    cents = [list(r.v) for r in seed_rows]
    for _ in range(iters):
        assigned = _assign(wide, cents, dim)
        new = (
            assigned.groupBy("cluster")
            .agg(
                *[F.avg(f"x{i}").alias(f"c{i}") for i in range(dim)],
            )
            .collect()
        )
        by_id = {r["cluster"]: [r[f"c{i}"] for i in range(dim)] for r in new}
        # empty clusters keep their previous centroid
        cents = [by_id.get(ci, cents[ci]) for ci in range(k)]
    final = _assign(wide, cents, dim).select(id_col, "cluster", "dist2")
    return final, cents


def kmeans_subspaces(
    df: DataFrame,
    id_col: str,
    vec: str,
    m: int,
    sub: int,
    k: int = 8,
    iters: int = 5,
) -> list[list[list[float]]]:
    """``m`` independent Lloyd k-means over the ``m`` contiguous
    ``sub``-wide slices of one ``m·sub``-dim vector column, trained
    JOINTLY: one scan per iteration for ALL subspaces.

    Product-quantization training (quantize.train_pq_codebook) used to
    loop ``kmeans`` per subspace — m seed jobs + m·iters update jobs,
    every one a full pass over the training set (and over its residual
    lineage, for IVF-PQ).  But the subspace problems share their input
    rows, so each Lloyd round for all m subspaces fits in ONE
    assignment projection (m·k distance folds, same expression shapes
    as ``_assign``) followed by ONE global aggregation (m·k·sub
    conditional ``avg`` columns, map-side combined to a single row) —
    1 + iters passes total instead of m·(1 + iters).  At 100 TB the
    training pass count is the build cost, so this is an m× cut, not a
    local-mode trick.

    The per-iteration plan carries the centroids as DATA (one broadcast
    row holding the m×k×sub array), not as inlined literals: literal
    centroids change every iteration, so each Lloyd round would pay a
    fresh whole-stage-codegen compile of the full m·k-distance
    projection — at bench scale that compile IS the iteration cost, and
    the janino cache can never hit.  With the codebook as a data column
    the generated source is identical across iterations, subspace
    counts, and successive index builds in one JVM, so everything after
    the first round runs on cached codegen.  (cluster._assign keeps its
    literal form: single-shot callers pay one compile either way, and
    the flat-literal chain is the faster per-row kernel at corpus
    scale.)

    Output equivalence with the per-subspace loop (proven bit-identical
    by tools/dump_index_state.py): seeds are the SAME k lowest-id rows
    (sliced per subspace after one collect); distances keep ``_assign``'s
    expanded form ‖x‖² − 2·x·c + ‖c‖² with every Σ a left-fold seeded
    +0.0, so each term is bit-equal to the literal/python twin;
    ``array_position(array_min)`` reproduces the least + ordered-CASE
    first-match tie-break (arrmath bit-identity contract); the stacked
    groupBy ``avg`` accumulates the same values in the same row order
    as the per-subspace groupBy(cluster).avg — an empty cluster has no
    group row and keeps its previous centroid."""
    dim = m * sub
    spark = df.sparkSession
    df = df.filter(F.col(vec).isNotNull() & (F.size(F.col(vec)) == dim))
    seed_rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec).cast("array<double>").alias("v"))
        .collect()
    )
    cents = [
        [list(r.v[j * sub : (j + 1) * sub]) for r in seed_rows]
        for j in range(m)
    ]
    slices = df.selectExpr(
        *[
            f"CAST(slice({vec}, {j * sub + 1}, {sub}) AS array<double>)"
            f" AS _s{j}"
            for j in range(m)
        ],
    )
    # d(x, c) = ‖x‖² − 2·x·c + ‖c‖² with the loop-invariant terms
    # HOISTED out of the per-(row, centroid) lambda: ‖x‖² is one fold
    # per (row, subspace) — computed once in a chained projection
    # instead of k times inside the transform — and ‖c‖² is computed
    # driver-side in Python and rides the broadcast row as data
    # (element_at lookups, zero per-row folds).  Only the dot product
    # remains per (row, centroid): ~3× less interpreted fold work per
    # Lloyd round.  Bit-identity holds: the Python csq accumulates the
    # same doubles left-to-right from +0.0 as the SQL fold it replaces
    # (the cluster._assign literal-csq precedent), and the hoisted ‖x‖²
    # is the identical expression evaluated once.
    dist = (
        "_xsq{j}"
        " - 2.0 * aggregate(zip_with(_s{j}, c, (a, b) -> a * b),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        " + element_at(element_at(_csq, {j1}), i + 1)"
    )
    slices = slices.selectExpr(
        "*",
        *[
            f"aggregate(_s{j}, CAST(0 AS DOUBLE),"
            f" (acc, v) -> acc + v * v) AS _xsq{j}"
            for j in range(m)
        ],
    )
    from snowav_spark.io import local_df

    for _ in range(iters):
        csq = [
            [sum(float(v) * float(v) for v in c) for c in cj]
            for cj in cents
        ]
        # one slice: a defaultParallelism-sliced 1-row local relation
        # costs a Python-worker round-trip per slice to broadcast
        # (~1 s/iteration on 32 cores — io.local_df)
        cdf = local_df(
            spark,
            [(
                [[list(map(float, c)) for c in cj] for cj in cents],
                csq,
            )],
            "_cb array<array<array<double>>>, _csq array<array<double>>",
        )
        cls = []
        for j in range(m):
            ds = (
                f"transform(element_at(_cb, {j + 1}), (c, i) -> "
                + dist.format(j=j, j1=j + 1)
                + ")"
            )
            cls.append(
                f"CAST(array_position({ds}, array_min({ds})) - 1 AS INT)"
                f" AS cl{j}"
            )
        assigned = slices.crossJoin(F.broadcast(cdf)).selectExpr(
            *[f"_s{j}" for j in range(m)], *cls
        )
        stack_args = []
        for j in range(m):
            stack_args += [str(j), f"cl{j}", f"_s{j}"]
        row_of = (
            assigned.selectExpr(
                f"stack({m}, {', '.join(stack_args)}) AS (_j, _cl, _v)"
            )
            .groupBy("_j", "_cl")
            .agg(
                *[
                    F.avg(F.element_at("_v", i + 1)).alias(f"c{i}")
                    for i in range(sub)
                ]
            )
            .collect()
        )
        new = {
            (r["_j"], r["_cl"]): [r[f"c{i}"] for i in range(sub)]
            for r in row_of
        }
        cents = [
            [
                new.get((j, ci), cents[j][ci])
                for ci in range(len(cents[j]))
            ]
            for j in range(m)
        ]
    return cents


def cluster_stats(assignments: DataFrame) -> DataFrame:
    """Per-cluster size and mean squared distance (inertia/n) — the
    convergence/quality report; one hash agg."""
    return assignments.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.round(F.avg("dist2"), 6).alias("mean_dist2"),
    )


def cluster_balanced_sample(
    assignments: DataFrame, id_col: str, per_cluster: int, seed: str = "42"
) -> DataFrame:
    """Take up to ``per_cluster`` members of every cluster, chosen by
    deterministic hash order — diversity-preserving downsampling (web-scale
    corpora are dominated by a few dense clusters; balanced sampling keeps
    the tail).  The window sorts each cluster partition only; at 100 TB a
    cluster's members shuffle to one key group, so pair with more clusters
    (larger k) rather than larger per_cluster."""
    w = Window.partitionBy("cluster").orderBy(
        shuffle_key(F.col(id_col), seed), F.col(id_col)
    )
    return (
        assignments.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_cluster)
        .select(id_col, "cluster", F.col("rn").alias("rank_in_cluster"))
    )
