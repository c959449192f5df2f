"""Duplicate-cluster resolution: connected components over near-dup pairs
(SURVEY.md §2.6 EXT — the step that turns a pair list into a deduplicated
corpus).

Every near-dup detector in this package (shingle Jaccard, MinHash+LSH,
SimHash, embedding cosine) emits *pairs*.  Dropping duplicates from a
training corpus needs more: pairs form chains (A~B, B~C but not A~C), so
the keep/drop decision is per *connected component* — keep one canonical
representative per component, drop the rest.

Scale design:

- **hash-min label propagation**: every node starts labeled with its own
  id; each round, a node adopts the minimum label among itself and its
  neighbors.  Converges in ``diameter(G)`` rounds.  Near-dup graphs are
  overwhelmingly small, star-ish clusters (diameter 2–4), so a handful of
  rounds finishes real corpora; pathological chains are bounded by
  ``max_iter``.
- Each round is one shuffle: ``edges ⋈ labels`` → ``groupBy(dst).min``
  — both keyed on node id, so AQE coalesces and the join keys stay
  stable across rounds.  The edge list is never mutated or exploded.
- **Lineage control**: iterative DataFrame loops grow the plan
  exponentially, and each round's result is read twice (convergence
  probe + next round's join); an eager ``localCheckpoint`` per round
  truncates lineage AND materializes the round once (the standard Spark
  idiom for iterative algorithms — GraphFrames checkpoints the same
  way).  On a cluster use reliable ``checkpoint()`` with a checkpoint
  dir; local eager checkpointing is the single-JVM equivalent.
- The convergence check is one ``count()`` per round on the (tiny)
  changed-labels frame.  At 100 TB the alternative is a fixed round
  budget; the ``max_iter`` parameter expresses exactly that.

Determinism: labels are min-ids — pure integer arithmetic, identical in
any engine and under any partitioning, which is why ``q_dedup_resolve``
can be hash-matched against a DuckDB recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, label) for every node appearing in ``edges``; ``label`` is
    the minimum node id of the node's connected component.

    Nodes with no edges are absent (they are their own component — callers
    that need singletons can left-join and coalesce to the node id).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: labels only ever decrease, so Σ label strictly
    # decreases while ANY label changes — one scalar agg per round
    # replaces an old-vs-new compare join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        # One round = one join + one partial-agg shuffle: each node's new
        # label is min over {its own label} ∪ {neighbors' labels}, taken
        # by unioning self-messages with neighbor-messages.
        msgs = sym.join(labels.withColumnRenamed("node", "a"), "a").select(
            F.col("b").alias("node"), "label"
        )
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Eager checkpoint EVERY round: the convergence probe and the next
        # round's join both read new_labels — without materialization each
        # would recompute the whole lineage chain (quadratic total work).
        labels = new_labels.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def resolve_duplicates(
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup pairs → (id, canonical_id) keep/drop map.

    ``canonical_id`` is the minimum id in the duplicate cluster; a row is
    a *survivor* iff ``id == canonical_id``.  Only ids that appear in at
    least one pair are returned — everything else survives trivially.
    """
    cc = connected_components(pairs, src, dst, max_iter)
    return cc.select(
        F.col("node").alias(id_col), F.col("label").alias("canonical_id")
    )


def drop_near_dups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Deduplicated corpus: drop every row whose id belongs to a duplicate
    cluster but is not the cluster's canonical (min-id) representative.

    One anti-join against the loser-id set.  The join strategy is left to
    AQE on purpose: on lightly-duplicated corpora the loser set is tiny
    and AQE broadcasts it (corpus never shuffles); at web-scale dup
    ratios losers can be a third of the corpus, where a forced broadcast
    would OOM the executors — AQE falls back to a shuffled anti-join of
    two id columns, which is the right plan there.
    """
    losers = (
        resolve_duplicates(pairs, id_col, src, dst)
        .filter(F.col(id_col) != F.col("canonical_id"))
        .select(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an edge list — fixed-iteration power method, the
    second iterative-graph primitive next to connected_components
    (duplicate-cluster resolution): rank training documents /  sources
    by link authority before sampling.

    Per iteration: one equi-join (edge ⋈ rank on src) + one
    map-side-combined sum per dst — the same join+agg round shape as
    connected_components, eagerly localCheckpoint'ed so lineage stays
    one round deep (without it iteration k recomputes rounds 1..k-1:
    quadratic total work).  Dangling mass (nodes with no out-links) is
    redistributed uniformly each round via a 1-row aggregate, keeping
    Σ rank = 1 exactly (tested) rather than leaking it.  Rows-only in
    any oracle contract: float summation order makes ranks
    engine-specific; tests pin mass conservation and convergence
    direction instead.

    Output: (node, rank), every node appearing as src or dst.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("s").agg(F.count("*").alias("_deg"))
    # edges with each src's out-degree attached, reused every round
    ed = e.join(out_deg, "s").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # dangling nodes (no out-edges) donate their mass uniformly
        dangling = (
            ranks.join(
                out_deg.withColumnRenamed("s", "node"), "node", "left_anti"
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dm") / n_nodes
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_exact(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 5,
    total_mass: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank in exact integer micro-mass — bit-identical on every
    engine and partitioning, so a fixed-iteration run is oracle
    (hash-match) gradable, unlike the float power method above whose
    rank sums are summation-order-specific.

    Rank is an integer share of ``total_mass``; every step is integer
    arithmetic with explicit floor division (all operands non-negative,
    so floor == trunc and engines cannot disagree):

        init:     rank = total_mass div n
        spread:   each out-neighbor of s receives rank_s div deg_s
        dangling: nodes with no out-edges pool their mass; every node
                  receives dm div n
        update:   rank' = (15·total_mass) div (100·n)
                        + (85 · (inflow + dm div n)) div 100

    The floors shed a few micro-units of mass per round (bounded by
    n + deg per iteration) — deterministic shrinkage, not drift.  The
    integer sums are order-independent, which is the whole point.

    Per-iteration plan shape is identical to :func:`pagerank`: one
    equi-join + one map-side-combined integer sum, lineage cut per round
    by eager localCheckpoint.  At 100 TB the join partitions by the edge
    src key each round; ranks are |nodes|-sized, edges never rescanned
    (checkpointed with out-degree attached).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("s").agg(F.count("*").alias("_deg"))
    ed = e.join(out_deg, "s").localCheckpoint(eager=True)
    base = (100 - damping_pct) * total_mass // (100 * n_nodes)
    ranks = nodes.withColumn(
        "rank", F.lit(total_mass // n_nodes).cast("long")
    )
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                F.expr("rank div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        dangling = ranks.join(
            out_deg.withColumnRenamed("s", "node"), "node", "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("_dm"))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(_in, 0L)"
                        f" + _dm div {n_nodes})) div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list canonicalized to unique (a < b) pairs with
    self-loops and NULL endpoints dropped — shared by every undirected
    operator here (triangle_stats, k_core)."""
    return (
        edges.selectExpr(
            f"least({src}, {dst}) AS a", f"greatest({src}, {dst}) AS b"
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(v, d) over a canonical edge list — one map-side-combined agg."""
    return (
        e.selectExpr("a AS v")
        .unionAll(e.selectExpr("b AS v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph, via DEGREE-ORIENTED wedge closing — the join
    strategy that survives skewed graphs at 100 TB.

    The naive a<b<c three-way self-join (which IS the oracle's
    formulation — same count by a different physical route) fans out as
    Σ d(v)² on raw ids: one celebrity vertex with degree 1M contributes
    10¹² wedges.  Orienting every edge from its lower (degree, id)
    endpoint to the higher makes out-degrees O(√E)-bounded on ANY graph
    (arboricity argument — a vertex's out-neighbors all have degree ≥ its
    own), so the wedge join fans out as Σ d_out(v)² ≤ O(E^1.5) worst
    case and far less in practice, and each triangle is counted EXACTLY
    once (at its orientation-minimal apex).

    Plan: dedup/canonicalize edges (one shuffle) → two broadcast-or-
    shuffle joins against the |V|-row degree table → wedge self-join
    keyed on the apex → closing equi-join on the (v, w) pair.  Wedge
    count Σ d(d−1)/2 and the 3T/W coefficient are exact-integer math,
    so the single output row hash-matches across engines.

    Output: (n_vertices, n_edges, n_wedges, n_triangles, clustering).
    """
    # lazy localCheckpoint (the q_market_basket precedent): the deduped
    # edge subtree feeds the degree agg, both orientation joins, and the
    # n_edges count — materialize it once within the action instead of
    # re-running the dedup shuffle per reference
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = _degrees(e)
    # orient each edge low→high by (degree, id); struct comparison gives
    # the strict total order
    keyed = (
        e.join(deg.withColumnRenamed("v", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("v", "b"), "b")
        .withColumnRenamed("d", "db")
        .selectExpr(
            "CASE WHEN struct(da, a) < struct(db, b) THEN a ELSE b END AS u",
            "CASE WHEN struct(da, a) < struct(db, b) THEN b ELSE a END AS w",
            "CASE WHEN struct(da, a) < struct(db, b) THEN db ELSE da END"
            " AS dw",
        )
    )
    o1 = keyed.select(
        F.col("u"), F.col("w").alias("v1"), F.col("dw").alias("d1")
    )
    o2 = keyed.select(
        F.col("u"), F.col("w").alias("v2"), F.col("dw").alias("d2")
    )
    # wedges at the apex u with (deg, id)-ordered leg pair v1 < v2; the
    # closing edge, being oriented low→high, is exactly (v1 → v2)
    wedges = o1.join(o2, "u").filter(
        F.struct("d1", "v1") < F.struct("d2", "v2")
    )
    closing = keyed.select(
        F.col("u").alias("v1"), F.col("w").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    counts = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").cast("long").alias("n_vertices"),
            # wedge count per vertex in decimal(38,0): d*(d-1) wraps the
            # long at d ~ 4.3e9 (a celebrity vertex is a real input at
            # scale); decimal /2 is exact (d*(d-1) is even; DIV would
            # re-bound to BIGINT and wrap) and the summed total is
            # re-bounded to long only at the output column
            F.sum(
                F.expr(
                    "CAST(d AS DECIMAL(38,0)) * (d - 1) / 2"
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("n_wedges"),
        )
    )
    return counts.crossJoin(tri).selectExpr(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        # CAST both branches: a bare 0.0 (or 3.0) literal parses as
        # DECIMAL in Spark SQL — the ratio must be computed in IEEE
        # doubles end-to-end or the 6th decimal can diverge from engines
        # (DuckDB) that promote decimal division to double
        "CASE WHEN n_wedges = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "round(CAST(3 AS DOUBLE) * n_triangles / n_wedges, 6) "
        "END AS clustering",
    )


def endpoint_assortativity(ep: DataFrame) -> DataFrame:
    """Pearson correlation of (x, y) integer endpoint-degree pairs —
    the moment kernel behind degree assortativity, factored out so the
    overflow path is unit-testable with synthetic huge degrees.

    ``ep`` must hold the SYMMETRIZED endpoint pairs (each undirected
    edge contributes both (dx, dy) and (dy, dx)).  Every moment is
    accumulated AND multiplied in decimal(38,0), never long: sx grows
    ~linearly with 2·|E|, so the raw int64 product m·sxx − sx² wraps
    silently (non-ANSI Spark) around sf≈3–4k — inside the 100 TB design
    point — while decimal keeps ~1e38 of headroom and the single
    decimal→double conversion before sqrt rounds identically to
    DuckDB's HUGEINT promotion.  One map-side-combined 6-moment
    aggregate; no window, no sort.
    """
    dec = lambda e: F.expr(e).cast("decimal(38,0)")  # noqa: E731
    s = ep.agg(
        F.count("*").cast("decimal(38,0)").alias("m"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    return s.selectExpr(
        "CAST(m AS BIGINT) AS n_endpoints",
        "CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0 "
        "THEN CAST(0 AS DOUBLE) ELSE round("
        "CAST(m * sxy - sx * sy AS DOUBLE) "
        "/ sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) "
        "/ sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 6) END "
        "AS assortativity",
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every vertex has degree ≥ k — the graph-curation filter that strips
    weakly-connected fringe (bot rings and spam clusters survive as
    dense cores; one-off interactions peel away).

    Iterative peeling, each round fully distributed: degrees are ONE
    map-side-combined aggregate, the under-k vertex set broadcasts back
    as a semi-join filter on the edge list, and the shrinking edge
    frame is ``localCheckpoint``-ed per round (the connected_components
    lineage discipline — a 50-round loop otherwise compounds a plan
    Catalyst re-optimizes from scratch each action).  Terminates when a
    round removes nothing (the fixpoint IS the k-core: every survivor
    has degree ≥ k within the surviving subgraph) or the graph empties.
    Worst-case rounds are graph-diameter-ish; real graphs converge in a
    handful.

    Returns (vertex, degree) rows of the k-core — exact and unique, so
    tests pin it against a Python brute force.  Not SQL-oracle-able:
    peeling is a non-monotone fixpoint (recursive CTEs only grow).
    Raises RuntimeError if ``max_rounds`` is exhausted before the
    fixpoint: an approximate k-core is a SUPERSET that silently defeats
    the filter's purpose, and a long peeling chain (each round strips
    one tail vertex) is a real input — raise loudly and let the caller
    raise the budget."""
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # one degree materialization per round: the weak probe, the edge
        # filter, and (on the fixpoint round) the returned frame all read
        # it — without the checkpoint each would rebuild the agg lineage
        deg = _degrees(e).localCheckpoint(eager=True)
        weak = deg.filter(F.col("d") < k).select("v")
        if weak.isEmpty():
            return deg.select(
                F.col("v").alias("vertex"), F.col("d").alias("degree")
            )
        # join strategy left to AQE (the drop_near_dups rationale): in
        # early rounds the under-k set can be O(|V|) — a forced broadcast
        # would OOM exactly on the sparse graphs peeling exists for
        e = (
            e.join(weak.withColumnRenamed("v", "a"), "a", "anti")
            .join(weak.withColumnRenamed("v", "b"), "b", "anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if e.isEmpty():
            # graph peeled away entirely: empty core, same schema/types
            # as the fixpoint path (vertex keeps the input id type)
            empty = _degrees(e).select(
                F.col("v").alias("vertex"), F.col("d").alias("degree")
            )
            return empty
    raise RuntimeError(
        f"k_core: no fixpoint within max_rounds={max_rounds} "
        "(long peeling chain?) — raise max_rounds"
    )
