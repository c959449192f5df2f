"""Physical-plan audit: assert the scale-critical plan properties hold.

For each audited query this checks explain output for the properties the
100 TB design depends on: filters pushed to the parquet scan, column-pruned
ReadSchema, broadcast joins for dims, partial (map-side) aggregation before
every exchange, no Python UDFs on built-in paths, whole-stage codegen
present, single-scan rollups, and sort-free top-k.  Exit 1 on any failure.

Usage: python tools/audit_plans.py
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple(df) -> str:
    """Simple mode shows WholeStageCodegen stage markers '*(n)' — but only
    once AQE has finalized the plan, so execute the query first."""
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def n_scans(plan: str) -> int:
    """Count parquet scan nodes (each appears once in the tree and once in
    the detail section of formatted output → count detail Locations)."""
    return plan.count("Location: InMemoryFileIndex")


def main() -> int:
    from snowav_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark(shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"})
    qs = m.queries()
    failures: list[str] = []

    def check(name: str, plan: str, must: list[str], must_not: list[str] = ()):
        for s in must:
            if s.lower() not in plan.lower():
                failures.append(f"{name}: MISSING {s!r}")
        for s in must_not:
            if s.lower() in plan.lower():
                failures.append(f"{name}: UNEXPECTED {s!r}")

    # 1. filter pushdown + column pruning reach the scan
    p = formatted(qs["q_filter_daterange"](spark, SF))
    check("q_filter_daterange", p, ["PushedFilters: [IsNotNull(l_shipdate)"])
    p = formatted(qs["q_scan_project"](spark, SF))
    check(
        "q_scan_project(pruning)",
        p,
        ["ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate:timestamp"],
    )

    # 1b. stats probe never touches data pages: aggregate pushed to footers
    p = formatted(qs["q_scan_stats"](spark, SF))
    check(
        "q_scan_stats",
        p,
        ["PushedAggregation: [COUNT(*), MIN(l_quantity)"],
        ["Exchange hashpartitioning"],
    )

    # 2. dims broadcast; no Python in the join path
    p = formatted(qs["q_join_dim"](spark, SF))
    check("q_join_dim", p, ["BroadcastHashJoin"], must_not=["PythonUDF"])

    # 3. map-side partial aggregation before every exchange
    p = formatted(qs["q_zonal_mean"](spark, SF))
    check("q_zonal_mean", p, ["partial_avg", "HashAggregate"], ["PythonUDF"])
    p = formatted(qs["q_end_last"](spark, SF))
    check("q_end_last", p, ["partial_max_by"])
    if p.count("Exchange") // 2 > 1:  # tree + detail per node
        failures.append("q_end_last: expected exactly one shuffle")

    # 4. rollup: per-band + total rows from ONE scan (Expand), not two
    p = formatted(qs["q_rollup_total"](spark, SF))
    check("q_rollup_total", p, ["Expand"])
    if n_scans(p) != 1:
        failures.append(f"q_rollup_total: expected 1 parquet scan, saw {n_scans(p)}")

    # 5. top-k never globally sorts
    p = formatted(qs["q_topk"](spark, SF))
    check("q_topk", p, ["TakeOrderedAndProject"])

    # 6. whole-stage codegen spans the hot paths; vector math stays JVM-side
    s = simple(qs["q_zonal_mean"](spark, SF))
    check("q_zonal_mean(codegen)", s, ["*("])
    s = simple(qs["q_dedup_embed"](spark, SF))
    check("q_dedup_embed", s, ["*("], ["BatchEvalPython", "PythonUDF"])
    s = simple(qs["q_sim_topk"](spark, SF))
    check("q_sim_topk", s, [], ["BatchEvalPython", "PythonUDF"])

    # 6b. cleaning pipeline is one codegen projection chain — no UDFs, one
    # pruned scan
    p = formatted(qs["q_clean_text"](spark, SF))
    check(
        "q_clean_text",
        p,
        ["ReadSchema: struct<doc_id:bigint,text:string"],
        ["PythonUDF", "Exchange"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_clean_text: expected 1 scan, saw {n_scans(p)}")

    # 6c. LSH dedup never materializes a cartesian product: candidates come
    # from an equi-join on (table, bucket) and only the bucket-assignment
    # UDF is Python (Arrow-vectorized), never a row-at-a-time UDF
    p = formatted(qs["q_dedup_embed_lsh"](spark, SF))
    check(
        "q_dedup_embed_lsh",
        p,
        ["ArrowEvalPython"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
    )

    # 6d. sequence packing runs as grouped Arrow batches
    p = formatted(qs["q_pack_sequences"](spark, SF))
    check("q_pack_sequences", p, ["FlatMapGroupsInPandas"], ["CartesianProduct"])

    # 6e. IVF probe is a filtered scan + Arrow cell-assignment, never a
    # cartesian product against the corpus
    p = formatted(qs["q_ann_ivf"](spark, SF))
    check(
        "q_ann_ivf",
        p,
        ["ArrowEvalPython", "TakeOrderedAndProject"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
    )

    # 6f. column profiler: multiple COUNT(DISTINCT)s still ONE scan
    p = formatted(qs["q_profile"](spark, SF))
    check("q_profile", p, ["Expand"], ["PythonUDF"])
    if n_scans(p) != 1:
        failures.append(f"q_profile: expected 1 scan, saw {n_scans(p)}")

    # 6g. decontamination: eval n-gram set broadcast, training side never
    # in a cartesian product; per-doc count is map-side combined
    p = formatted(qs["q_decontam"](spark, SF))
    check(
        "q_decontam",
        p,
        ["BroadcastHashJoin", "partial_count"],
        ["CartesianProduct", "PythonUDF", "SortMergeJoin"],
    )

    # 6h. quantization: stats ride a 1-row broadcast back onto the corpus;
    # NO dim-explode of the corpus (the only Generate is the 1-row stack()
    # unpivot of the summary) and no Python
    p = formatted(qs["q_embed_quant"](spark, SF))
    check(
        "q_embed_quant",
        p,
        ["BroadcastNestedLoopJoin", "stack("],
        ["explode", "PythonUDF", "CartesianProduct"],
    )

    # 6i. mixture balancing: group rates broadcast onto the corpus scan
    p = formatted(qs["q_source_mix"](spark, SF))
    check(
        "q_source_mix",
        p,
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "PythonUDF"],
    )

    # 6j. epoch order: per-partition top-k, never a global sort of the corpus
    p = formatted(qs["q_shuffle_order"](spark, SF))
    check("q_shuffle_order", p, ["TakeOrderedAndProject"], ["PythonUDF"])

    # 6k. k-means assignment is pure codegen projection + partial agg
    p = formatted(qs["q_cluster_kmeans"](spark, SF))
    check(
        "q_cluster_kmeans",
        p,
        ["partial_avg", "HashAggregate"],
        ["PythonUDF", "CartesianProduct", "Generate"],
    )

    # 6l. chunking is a pure flat map: one pruned scan, no KEY shuffle,
    # no Python.  r11's spread_scan adds exactly one round-robin
    # exchange above the single-row-group scan (OPTIMIZATION_r11.md
    # change 7) so the heavy per-row Generate parallelizes; a
    # hashpartitioning exchange would still be a defect.
    p = formatted(qs["q_chunk_docs"](spark, SF))
    # spread_scan no-ops when planned partitions already cover >= 1/4 of
    # the session cores, so only assert its exchange where it engages —
    # computed by the gate's OWN predicate on the same input DataFrame
    # (ADVICE r11: a hand-rolled `cores > 4` re-derivation assumed the
    # fixture scan plans exactly 1 partition and would false-fail on a
    # multi-file SF dir).
    from snowav_spark import io as _io

    spread_engages = _io.spread_engaged(
        _io.load_table(spark, SF, "documents")
    )
    check(
        "q_chunk_docs",
        p,
        ["Generate", "ReadSchema: struct<doc_id:bigint,text:string"]
        + (["RoundRobinPartitioning"] if spread_engages else []),
        ["hashpartitioning", "PythonUDF"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_chunk_docs: expected 1 scan, saw {n_scans(p)}")

    # 6m. portable MinHash: ONE aggregate over the exploded shingles with
    # map-side combine (partial_min), band join is an equi-join, no Python
    p = formatted(qs["q_minhash_lsh_md5"](spark, SF))
    check(
        "q_minhash_lsh_md5",
        p,
        ["partial_min"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "PythonUDF"],
    )

    # 6n. portable SimHash: one explode + ONE map-side-combined vote agg
    p = formatted(qs["q_simhash_md5"](spark, SF))
    check(
        "q_simhash_md5",
        p,
        ["partial_sum", "Generate"],
        ["CartesianProduct", "PythonUDF"],
    )

    # 6o. PII audit: one codegen projection on a 2-column pruned scan —
    # no UDF, no KEY shuffle, nothing but regexp expressions.  r11's
    # spread_scan adds exactly one round-robin exchange above the
    # single-row-group scan (OPTIMIZATION_r11.md change 7) so the regex
    # chain parallelizes; a hashpartitioning exchange would still be a
    # defect.
    p = formatted(qs["q_pii_redact"](spark, SF))
    check(
        "q_pii_redact",
        p,
        ["ReadSchema: struct<doc_id:bigint,text:string"]
        + (["RoundRobinPartitioning"] if spread_engages else []),
        ["hashpartitioning", "PythonUDF", "Generate"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_pii_redact: expected 1 scan, saw {n_scans(p)}")

    # 6p. n-gram doc frequency: NULL filter pushed to the scan, map-side
    # partial count before the single exchange, sort-free top-k
    p = formatted(qs["q_ngram_freq"](spark, SF))
    check(
        "q_ngram_freq",
        p,
        [
            "PushedFilters: [IsNotNull(text)",
            "partial_count",
            "TakeOrderedAndProject",
        ],
        ["PythonUDF"],
    )

    # 6q. LM-filter scorers: the vocabulary-sized model joins BROADCAST
    # (the exploded token stream must never shuffle), NULL filter pushed
    # to the scan, per-doc agg combines map-side, no Python UDFs
    p = formatted(qs["q_unigram_logprob"](spark, SF))
    check(
        "q_unigram_logprob",
        p,
        [
            "BroadcastHashJoin",
            "PushedFilters: [IsNotNull(text)",
            "partial_count",
            "partial_avg",
        ],
        ["PythonUDF", "SortMergeJoin"],
    )
    p = formatted(qs["q_oov_rate"](spark, SF))
    check(
        "q_oov_rate",
        p,
        [
            "BroadcastHashJoin",
            "PushedFilters: [IsNotNull(text)",
            "TakeOrderedAndProject",  # vocab top-V never sorts the corpus
        ],
        ["PythonUDF", "SortMergeJoin"],
    )

    # 6r. rolling distinct actives: bounded sequence/explode fan-out with
    # the observed-day dim broadcast for the semi clip — no range
    # self-join, no cartesian
    p = formatted(qs["q_rolling_active"](spark, SF))
    check(
        "q_rolling_active",
        p,
        ["Generate", "BroadcastHashJoin", "partial_count"],
        ["CartesianProduct", "PythonUDF"],
    )

    # 6s. percent-of-total: the grand total rides a 1-row broadcast
    # (BroadcastNestedLoopJoin), never an empty-partition window over the
    # whole frame on one reducer
    p = formatted(qs["q_share_of_total"](spark, SF))
    check(
        "q_share_of_total",
        p,
        ["BroadcastNestedLoopJoin", "partial_sum"],
        ["CartesianProduct", "PythonUDF", "Window"],
    )

    # 6t. global deciles: cut array broadcast onto the scan; the only
    # Window runs over the tiny value-frequency frame, and assignment is
    # a codegen array comparison — no Python, no cartesian
    p = formatted(qs["q_global_decile"](spark, SF))
    check(
        "q_global_decile",
        p,
        ["BroadcastNestedLoopJoin"],
        ["CartesianProduct", "PythonUDF"],
    )

    # 6u. fuzzy join: candidates from an equi-join on trigrams, verify is
    # codegen levenshtein — the cartesian theta-join must never appear
    p = formatted(qs["q_fuzzy_join"](spark, SF))
    check(
        "q_fuzzy_join",
        p,
        ["levenshtein"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "PythonUDF"],
    )

    # 6v. overlap matrix / span dedup: self equi-joins, map-side combine,
    # nothing cartesian and nothing Python
    p = formatted(qs["q_overlap_matrix"](spark, SF))
    check(
        "q_overlap_matrix",
        p,
        ["partial_count"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "PythonUDF"],
    )
    p = formatted(qs["q_span_dedup"](spark, SF))
    check(
        "q_span_dedup",
        p,
        ["Generate", "partial_count"],
        ["CartesianProduct", "PythonUDF"],
    )

    # 6w. PQ ANN: encode + ADC are PURE codegen (no Arrow, no Python —
    # unlike the LSH/IVF families' vectorized bucket assignment), and
    # top-k is sort-free
    p = formatted(qs["q_pq_ann"](spark, SF))
    check(
        "q_pq_ann",
        p,
        ["TakeOrderedAndProject"],
        ["PythonUDF", "ArrowEvalPython", "BatchEvalPython", "CartesianProduct"],
    )

    # 6w2. IVF-PQ at-rest search, two stages: (a) the returned re-rank
    # plan reads the float store through a PUSHED shortlist In-filter —
    # no broadcast join against (and no rescan of) the whole corpus —
    # with sort-free top-k; (b) the ADC probe stage (which collected its
    # shortlist eagerly, so it isn't in the returned plan) carries the
    # probed cells as PARTITION filters and is pure codegen over codes
    p = formatted(qs["q_ivfpq_ann"](spark, SF))
    check(
        "q_ivfpq_ann",
        p,
        ["In(vec_id", "TakeOrderedAndProject"],
        ["PythonUDF", "BatchEvalPython", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin"],
    )
    from snowav_spark import contract as _contract
    from snowav_spark.ops import quantize as _quantize

    adc = _quantize.search_ivfpq_index(
        spark, _contract._IVFPQ_PATHS[SF], [0.0] * 64, "vec_id",
        k_out=10, nprobe=4,
    )
    check(
        "q_ivfpq_ann/adc",
        formatted(adc),
        ["PartitionFilters: [cell", "TakeOrderedAndProject"],
        ["PythonUDF", "ArrowEvalPython", "BatchEvalPython",
         "CartesianProduct"],
    )

    # 6w2b. metadata-FILTERED IVF-PQ search (q_ann_filtered): the ADC
    # probe stage must carry BOTH the probed cells as PARTITION filters
    # AND the metadata predicate as a PUSHED data filter on the code
    # scan — the "top-k WHERE label=…" production query is served
    # entirely from the pruned index directories
    qs["q_ann_filtered"](spark, SF)  # ensure the metadata index exists
    fadc = _quantize.search_ivfpq_index(
        spark, _contract._IVFPQ_META_PATHS[SF], [0.0] * 64, "vec_id",
        k_out=10, nprobe=4, where="label = 2",
    )
    pf = formatted(fadc)
    check(
        "q_ann_filtered/adc",
        pf,
        ["PartitionFilters: [cell", "PushedFilters: [",
         "EqualTo(label,2", "TakeOrderedAndProject"],
        ["PythonUDF", "ArrowEvalPython", "BatchEvalPython",
         "CartesianProduct"],
    )
    # the returned (re-rank) plan: pushed shortlist In-filter, sort-free
    # top-k — same contract as the unfiltered key
    p = formatted(qs["q_ann_filtered"](spark, SF))
    check(
        "q_ann_filtered",
        p,
        ["In(vec_id", "TakeOrderedAndProject"],
        ["PythonUDF", "BatchEvalPython", "CartesianProduct",
         "SortMergeJoin", "BroadcastNestedLoopJoin"],
    )

    # 6w3. inverted-index retrieval: the postings scan is pruned to the
    # query terms' buckets at the PARTITION level, doc-freq is map-side
    # combined, and top-k is sort-free
    p = formatted(qs["q_text_index"](spark, SF))
    check(
        "q_text_index",
        p,
        ["PartitionFilters: [bucket", "TakeOrderedAndProject"],
        ["PythonUDF", "CartesianProduct", "SortMergeJoin"],
    )

    # 6x. round-8 TPC-H shapes: decorrelated scalar subqueries must be
    # 1-row broadcasts (BroadcastNestedLoopJoin), dims broadcast, and
    # nothing falls back to a real cartesian or a Python UDF
    # (Catalyst rewrites the crossJoin + max-equality filter into an
    # equi BroadcastHashJoin — even better than the expected 1-row BNLJ)
    p = formatted(qs["q_top_supplier"](spark, SF))
    check(
        "q_top_supplier",
        p,
        ["BroadcastHashJoin"],
        ["CartesianProduct", "PythonUDF", "SortMergeJoin"],
    )
    p = formatted(qs["q_national_share"](spark, SF))
    check(
        "q_national_share",
        p,
        ["BroadcastNestedLoopJoin", "partial_sum"],
        ["CartesianProduct", "PythonUDF"],
    )
    p = formatted(qs["q_supplier_cnt"](spark, SF))
    check(
        "q_supplier_cnt",
        p,
        ["BroadcastHashJoin"],
        ["CartesianProduct", "PythonUDF", "BroadcastNestedLoopJoin"],
    )

    # 6x2. cross-correlation: one conditional hash agg + a 1-row moment
    # aggregate — no window, no join, no Python
    p = formatted(qs["q_cross_corr"](spark, SF))
    check(
        "q_cross_corr",
        p,
        ["partial_sum"],
        ["Window", "PythonUDF", "CartesianProduct", "SortMergeJoin"],
    )

    # 6w3b. metadata-filtered text retrieval (q_text_filtered): the
    # postings scan keeps its bucket PARTITION pruning AND the metadata
    # predicate is PUSHED into the |docs|-row _doc_meta sidecar scan;
    # the id semi-join must stay broadcast (never a sort-merge of the
    # scored frame)
    p = formatted(qs["q_text_filtered"](spark, SF))
    check(
        "q_text_filtered",
        p,
        ["PartitionFilters: [bucket", "EqualTo(lang,en",
         "TakeOrderedAndProject"],
        ["PythonUDF", "CartesianProduct", "SortMergeJoin"],
    )

    # 6w4. media perceptual-hash dedup: hash extraction is Arrow-batched
    # mapInPandas (payload bytes never shuffle — no exchange carries the
    # payload column), the pair join is a banded equi-join
    p = formatted(qs["q_media_phash"](spark, SF))
    check(
        "q_media_phash",
        p,
        ["MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    for ln in p.splitlines():
        if "Exchange" in ln and "payload" in ln:
            failures.append("q_media_phash: payload column in an exchange")

    # 6x. sketch rollup: DataSketches aggregate is JVM-side with partial
    # (map-side) sketch building before the exchange
    p = formatted(qs["q_sketch_rollup"](spark, SF))
    check(
        "q_sketch_rollup",
        p,
        ["hll_sketch_agg", "ObjectHashAggregate"],
        ["PythonUDF", "CartesianProduct"],
    )

    # 6y. keep-best survivorship: one max_by hash aggregate with map-side
    # combine — no window, no second text pass
    p = formatted(qs["q_dedup_keep_best"](spark, SF))
    check(
        "q_dedup_keep_best",
        p,
        ["partial_max_by"],
        ["Window", "PythonUDF"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_dedup_keep_best: expected 1 scan, saw {n_scans(p)}")

    # 6z. z-score screen: the per-group moment table joins back BROADCAST
    # (the raw table is never shuffled on data volume)
    p = formatted(qs["q_zscore_outlier"](spark, SF))
    check(
        "q_zscore_outlier",
        p,
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "PythonUDF", "Window"],
    )

    # 6aa. unpivot is a zero-shuffle Expand projection over the wide agg
    p = formatted(qs["q_unpivot"](spark, SF))
    check("q_unpivot", p, ["Expand"], ["PythonUDF", "Generate"])

    # 6ab. gap-fill: spine explode + ONE window sharing the group key
    p = formatted(qs["q_gap_fill"](spark, SF))
    check(
        "q_gap_fill",
        p,
        ["Generate", "Window", "partial_avg"],
        ["CartesianProduct", "PythonUDF"],
    )

    # 6ac. multi-granularity time rollup: hour/day/month buckets from ONE
    # Expand scan, never the UNION-ALL's three scans
    p = formatted(qs["q_time_rollup"](spark, SF))
    check("q_time_rollup", p, ["Expand", "partial_count"], ["PythonUDF"])
    if n_scans(p) != 1:
        failures.append(f"q_time_rollup: expected 1 scan, saw {n_scans(p)}")

    # 7. window queries aggregate to the daily frame before the window sort
    p = formatted(qs["q_cumsum"](spark, SF))
    check("q_cumsum", p, ["Window", "partial_sum"])
    # raw events are ~2k/day at sf0.01; the window input must be the daily
    # aggregate (one row per (day, type)), which implies an agg exchange
    # between scan and window. Two exchanges total: agg + window partition.
    if p.count("Exchange") // 2 != 2:
        failures.append("q_cumsum: expected agg exchange + window exchange")

    # 8. round-5 operators
    # skyline: the quadratic NOT-EXISTS form would plan a nested-loop
    # join; the bucketed plan must have none, and its windows must be
    # partitioned (the only unpartitioned window runs on the ≤64-row
    # bucket frame, upstream of a partial agg)
    p = formatted(qs["q_skyline"](spark, SF))
    check(
        "q_skyline",
        p,
        ["partial_min", "Window", "BroadcastHashJoin"],
        ["CartesianProduct", "PythonUDF"],
    )
    # exactly ONE nested-loop node is legal: the 1-row bounds crossJoin
    # (same shape as q_share_of_total); the quadratic NOT-EXISTS form
    # would add corpus-sized ones
    if p.count("BroadcastNestedLoopJoin") // 2 > 1:
        failures.append("q_skyline: more than the 1-row bounds BNLJ")
    # interval join: equi-join on the time bucket, never a pure theta join
    p = formatted(qs["q_interval_join"](spark, SF))
    check(
        "q_interval_join",
        p,
        ["partial_count"],
        ["BroadcastNestedLoopJoin", "CartesianProduct", "PythonUDF"],
    )
    # bigram LM: pair array built in ONE projection over ONE scan (no
    # exploded-token self-join re-scanning documents)
    p = formatted(qs["q_bigram_lm"](spark, SF))
    check("q_bigram_lm", p, ["Generate", "partial_count"], ["PythonUDF"])
    if n_scans(p) != 1:
        failures.append(f"q_bigram_lm: expected 1 scan, saw {n_scans(p)}")
    # mode: no window — two hash aggregates with map-side partials
    p = formatted(qs["q_mode_daily"](spark, SF))
    check("q_mode_daily", p, ["partial_min_by"], ["Window", "PythonUDF"])
    # scd2: every window partitions on the user key (no empty-frame
    # global window)
    p = formatted(qs["q_scd2"](spark, SF))
    check(
        "q_scd2",
        p,
        ["windowspecdefinition(user_id"],  # every window keyed on user
        ["PythonUDF"],
    )
    # coverage: top-k via TakeOrdered (never a global vocab sort); the
    # count table is checkpointed so the corpus scans once
    p = formatted(qs["q_coverage"](spark, SF))
    check("q_coverage", p, ["TakeOrderedAndProject"], ["PythonUDF"])
    if n_scans(p) > 1:
        failures.append(f"q_coverage: expected ≤1 scan, saw {n_scans(p)}")
    # winsorize: bounds broadcast, map-side partial agg, no window
    p = formatted(qs["q_winsorize"](spark, SF))
    check(
        "q_winsorize",
        p,
        ["BroadcastHashJoin", "partial_count"],
        ["Window", "PythonUDF", "CartesianProduct"],
    )

    # market basket: distinct (order,brand) table checkpointed (scan count
    # 0 in the visible plan), per-brand counts broadcast, no cartesian
    p = formatted(qs["q_market_basket"](spark, SF))
    check(
        "q_market_basket",
        p,
        ["BroadcastHashJoin", "partial_count"],
        ["CartesianProduct", "PythonUDF"],
    )
    # running distinct: ONE corpus scan, first-seen collapse partials,
    # running-sum window partitioned by event type (never global)
    p = formatted(qs["q_running_distinct"](spark, SF))
    check(
        "q_running_distinct",
        p,
        ["windowspecdefinition(event_type", "partial_min"],
        ["PythonUDF"],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_running_distinct: expected 1 scan, saw {n_scans(p)}"
        )
    # rfm: cut-value quartiles, NOT ntile — no window at all, no cartesian
    # beyond the 1-row broadcast NLJs for ref-day and cuts
    p = formatted(qs["q_rfm"](spark, SF))
    check(
        "q_rfm",
        p,
        ["BroadcastNestedLoopJoin", "partial_count"],
        ["Window", "CartesianProduct", "PythonUDF"],
    )

    # top paths: per-session path built in one grouped agg, top-10 via
    # TakeOrdered (never a global path sort), single scan
    p = formatted(qs["q_top_paths"](spark, SF))
    check(
        "q_top_paths",
        p,
        ["TakeOrderedAndProject", "partial_count"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_top_paths: expected 1 scan, saw {n_scans(p)}")
    # weighted median: value-frequency collapse first (partial sums), then
    # group-partitioned windows over the collapsed table only
    p = formatted(qs["q_weighted_median"](spark, SF))
    check(
        "q_weighted_median",
        p,
        ["windowspecdefinition(l_returnflag", "partial_sum"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_weighted_median: expected 1 scan, saw {n_scans(p)}"
        )

    # rank family: ONE Window node + ONE sort serves all four ranking
    # functions, over the aggregate only (single scan)
    p = formatted(qs["q_rank_family"](spark, SF))
    check("q_rank_family", p, [], ["PythonUDF", "CartesianProduct"])
    n_windows = sum(1 for l in p.splitlines() if ") Window" in l)
    n_sorts = sum(1 for l in p.splitlines() if ") Sort" in l)
    if n_windows != 1 or n_sorts != 1 or n_scans(p) != 1:
        failures.append(
            f"q_rank_family: expected 1 window/1 sort/1 scan, saw "
            f"{n_windows}/{n_sorts}/{n_scans(p)}"
        )

    # first touch: NO window (min_by struct agg, unlike the oracle's
    # row_number form), single scan
    p = formatted(qs["q_first_touch"](spark, SF))
    check(
        "q_first_touch",
        p,
        ["partial_min_by"],
        ["Window", "PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_first_touch: expected 1 scan, saw {n_scans(p)}")
    # benford: one 9-row agg + 1-row broadcast total, no cartesian
    p = formatted(qs["q_benford"](spark, SF))
    check(
        "q_benford",
        p,
        ["BroadcastNestedLoopJoin", "partial_count"],
        ["Window", "PythonUDF", "CartesianProduct"],
    )

    # twap: ONE window partitioned by (type, user) entities — never a
    # per-type global sort — then a partial-agg rollup
    p = formatted(qs["q_twap"](spark, SF))
    check(
        "q_twap",
        p,
        ["windowspecdefinition(event_type", "partial_sum"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_twap: expected 1 scan, saw {n_scans(p)}")

    # period-over-period: monthly collapse precedes the lag window (the
    # window sees the bounded month table, not the fact table)
    p = formatted(qs["q_period_over_period"](spark, SF))
    check(
        "q_period_over_period",
        p,
        ["partial_sum", "lag(revenue"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_period_over_period: expected 1 scan, saw {n_scans(p)}"
        )
    # top-N + Other: rank window over the aggregated brand table, regroup
    # sums integer micros (no double re-aggregation)
    p = formatted(qs["q_topn_other"](spark, SF))
    check(
        "q_topn_other",
        p,
        ["BroadcastHashJoin", "row_number", "partial_sum"],
        ["PythonUDF", "CartesianProduct"],
    )

    # trend slope: daily collapse precedes the moment aggregate, no
    # window, single scan
    p = formatted(qs["q_trend_slope"](spark, SF))
    check(
        "q_trend_slope",
        p,
        ["partial_sum", "partial_count"],
        ["Window", "PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_trend_slope: expected 1 scan, saw {n_scans(p)}")

    # gini: the rank window runs over the VALUE-FREQUENCY table (a
    # partial-agg collapse precedes the Window), never over raw rows
    p = formatted(qs["q_gini"](spark, SF))
    check(
        "q_gini",
        p,
        ["Window", "partial_count"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_gini: expected 1 scan, saw {n_scans(p)}")

    # diversity: two stacked hash aggregates, both map-side combined
    p = formatted(qs["q_diversity"](spark, SF))
    check(
        "q_diversity",
        p,
        ["partial_count"],
        ["Window", "PythonUDF", "CartesianProduct", "SortAggregate"],
    )
    if n_scans(p) != 1:
        failures.append(f"q_diversity: expected 1 scan, saw {n_scans(p)}")

    # ewma: all 16 lags collapse into ONE Window node over the daily
    # collapse (partial_sum before the exchange)
    p = formatted(qs["q_ewma"](spark, SF))
    check("q_ewma", p, ["Window", "partial_sum"], ["PythonUDF"])
    if p.count("Window") > 2:  # tree node + detail section
        failures.append("q_ewma: expected a single Window node")
    if n_scans(p) != 1:
        failures.append(f"q_ewma: expected 1 scan, saw {n_scans(p)}")

    # keyword tags: codegen lambda filter + explode of matches only;
    # count is map-side combined; no Python, no join at all
    p = formatted(qs["q_keyword_tags"](spark, SF))
    check(
        "q_keyword_tags",
        p,
        ["Generate", "partial_count"],
        # NB: 'join' the literal keyword appears in the plan's array
        # argument, so assert on physical join node names, not "Join"
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(f"q_keyword_tags: expected 1 scan, saw {n_scans(p)}")

    # conversion lag: both join inputs are pre-aggregated per user
    # (partial_min before the exchange); equi-join, no cartesian
    p = formatted(qs["q_conversion_lag"](spark, SF))
    check(
        "q_conversion_lag",
        p,
        ["partial_min", "Join"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # linear attribution: the 7-day lookback is the two-bucket BAND join
    # (equi-join on user+bucket, explode fan-out of exactly 2), never a
    # theta-only join (no cartesian / nested-loop node)
    p = formatted(qs["q_attribution_linear"](spark, SF))
    check(
        "q_attribution_linear",
        p,
        ["Generate", "Window", "partial_count"],
        ["PythonUDF", "CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    if n_scans(p) != 2:  # purchases + views branches of one table
        failures.append(
            f"q_attribution_linear: expected 2 scans, saw {n_scans(p)}"
        )

    # streaks: distinct collapses before the row_number window (partial
    # agg present); no join at all
    p = formatted(qs["q_streaks"](spark, SF))
    check(
        "q_streaks",
        p,
        ["Window", "partial_count"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(f"q_streaks: expected 1 scan, saw {n_scans(p)}")

    # chi-square: ONE corpus scan (cell frame checkpointed, then three
    # re-aggregations of it joined back broadcast); the 1-row grand total
    # arrives via BroadcastNestedLoopJoin, never a cartesian
    p = formatted(qs["q_chi_square"](spark, SF))
    # (the corpus collapse sits behind the localCheckpoint, so its
    # partial_count is not visible in this plan — scan count is the
    # invariant here)
    check(
        "q_chi_square",
        p,
        ["BroadcastHashJoin", "BroadcastNestedLoopJoin"],
        ["PythonUDF", "CartesianProduct", "SortMergeJoin", "Window"],
    )
    if n_scans(p) > 1:
        failures.append(f"q_chi_square: expected <=1 scan, saw {n_scans(p)}")

    # autocorr: lag window over the daily collapse only (partial agg
    # before the exchange); moments are plain aggregates — no join
    p = formatted(qs["q_autocorr"](spark, SF))
    check(
        "q_autocorr",
        p,
        ["Window", "partial_count"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(f"q_autocorr: expected 1 scan, saw {n_scans(p)}")

    # ttr: explode → vocabulary-sized hash agg; no window, no join
    p = formatted(qs["q_ttr"](spark, SF))
    check(
        "q_ttr",
        p,
        ["Generate", "partial_count"],
        [
            "PythonUDF",
            "CartesianProduct",
            "Window",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(f"q_ttr: expected 1 scan, saw {n_scans(p)}")

    # seasonality: one corpus scan to day-cells (checkpointed), calendar
    # and totals re-aggregated from it, everything joined back broadcast
    p = formatted(qs["q_seasonality"](spark, SF))
    check(
        "q_seasonality",
        p,
        ["BroadcastHashJoin", "BroadcastNestedLoopJoin"],
        ["PythonUDF", "CartesianProduct", "SortMergeJoin", "Window"],
    )
    if n_scans(p) > 1:
        failures.append(
            f"q_seasonality: expected <=1 scan, saw {n_scans(p)}"
        )

    # cusum changepoint: daily cells checkpointed, per-type totals joined
    # back broadcast, both windows share the per-type partition
    p = formatted(qs["q_cusum_change"](spark, SF))
    check(
        "q_cusum_change",
        p,
        ["Window", "BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "SortMergeJoin"],
    )
    if n_scans(p) > 1:
        failures.append(
            f"q_cusum_change: expected <=1 scan, saw {n_scans(p)}"
        )

    # source jaccard: vocab frame checkpointed; the pair counts come from
    # a token-keyed EQUI self-join (shuffle join is the right shape — the
    # frame is vocabulary-sized, not broadcastable in general); per-source
    # totals broadcast back; never a cartesian, never a window
    p = formatted(qs["q_source_jaccard"](spark, SF))
    check(
        "q_source_jaccard",
        p,
        ["BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window", "BroadcastNestedLoop"],
    )
    if n_scans(p) > 1:
        failures.append(
            f"q_source_jaccard: expected <=1 scan, saw {n_scans(p)}"
        )

    # growth accounting: one scan -> distinct (user, day) -> two windows
    # on ONE per-user partition -> hash agg; no joins at all
    p = formatted(qs["q_growth_accounting"](spark, SF))
    check(
        "q_growth_accounting",
        p,
        ["Window"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_growth_accounting: expected 1 scan, saw {n_scans(p)}"
        )

    # activity histogram: distinct -> per-user agg -> histogram agg; pure
    # hash-agg pipeline, no windows, no joins
    p = formatted(qs["q_activity_histogram"](spark, SF))
    check(
        "q_activity_histogram",
        p,
        ["HashAggregate"],
        [
            "PythonUDF",
            "CartesianProduct",
            "Window",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_activity_histogram: expected 1 scan, saw {n_scans(p)}"
        )

    # interarrival: distinct -> per-user lag window -> bucket hash agg
    p = formatted(qs["q_interarrival"](spark, SF))
    check(
        "q_interarrival",
        p,
        ["Window"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_interarrival: expected 1 scan, saw {n_scans(p)}"
        )

    # fano: one corpus collapse (partial agg before the exchange) -> exact
    # integer moments; no window, no join
    p = formatted(qs["q_fano"](spark, SF))
    check(
        "q_fano",
        p,
        ["partial_count"],
        [
            "PythonUDF",
            "CartesianProduct",
            "Window",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(f"q_fano: expected 1 scan, saw {n_scans(p)}")

    # peak concurrency: sessionize windows + day-span/endpoint explodes +
    # per-day sweep window; session-frame-sized after the first agg,
    # never a join, ONE corpus scan (endpoints explode, not unionAll)
    p = formatted(qs["q_peak_concurrency"](spark, SF))
    check(
        "q_peak_concurrency",
        p,
        ["Window", "Generate"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) != 1:
        failures.append(
            f"q_peak_concurrency: expected 1 scan, saw {n_scans(p)}"
        )

    # churn: the checkpointed activity frame feeds BOTH branches (0
    # visible corpus scans — lineage truncated), the max-day scalar is
    # the 1-row BNLJ broadcast, the only window is the bounded per-user
    # lead — never a shifted self-join of the activity frame
    p = formatted(qs["q_churn"](spark, SF))
    check(
        "q_churn",
        p,
        ["Window", "BroadcastNestedLoopJoin"],
        [
            "PythonUDF",
            "CartesianProduct",
            "SortMergeJoin",
            "BroadcastHashJoin",
        ],
    )
    if n_scans(p) > 1:
        failures.append(f"q_churn: expected <=1 scan, saw {n_scans(p)}")

    # top-share: orders collapse map-side per customer BEFORE the segment
    # join; the checkpointed |customers| frame feeds BOTH the p99 and the
    # final agg (≤1 visible scan); cuts broadcast back; no window,
    # nothing cartesian
    p = formatted(qs["q_top_share"](spark, SF))
    check(
        "q_top_share",
        p,
        ["BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window", "SortMergeJoin"],
    )
    if n_scans(p) > 1:
        failures.append(f"q_top_share: expected <=1 scan, saw {n_scans(p)}")

    # new-vs-returning: first-date side pre-aggregated (partial_min)
    # before the custkey equi-join; month rollup is a hash agg — no
    # window, nothing cartesian
    p = formatted(qs["q_new_vs_returning"](spark, SF))
    check(
        "q_new_vs_returning",
        p,
        ["partial_min", "partial_count"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # session-duration: one per-user window for sessionization, then two
    # hash aggs; the ≤4-row bucket rollup must not re-sort globally
    p = formatted(qs["q_session_duration"](spark, SF))
    check(
        "q_session_duration",
        p,
        ["Window", "partial_min", "partial_max"],
        ["PythonUDF", "CartesianProduct"],
    )
    if n_scans(p) > 1:
        failures.append(
            f"q_session_duration: expected <=1 scan, saw {n_scans(p)}"
        )

    # Q5-shaped regional volume: the year filter reaches the orders scan,
    # every dim joins as a broadcast, nothing cartesian, no window
    p = formatted(qs["q_regional_volume"](spark, SF))
    check(
        "q_regional_volume",
        p,
        [
            "GreaterThanOrEqual(o_orderdate",
            "BroadcastHashJoin",
            "partial_count",
        ],
        ["PythonUDF", "CartesianProduct", "Window", "SortMergeJoin"],
    )

    # Q8-shaped market share: ONE aggregation computes numerator and
    # denominator (no second scan/self-join of filtered copies)
    p = formatted(qs["q_market_share"](spark, SF))
    check(
        "q_market_share",
        p,
        ["BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window", "SortMergeJoin"],
    )
    if n_scans(p) > 7:  # 6 tables + at most one re-read of nation
        failures.append(
            f"q_market_share: expected <=7 scans, saw {n_scans(p)}"
        )

    # HHI: two hash aggs, decimal accumulator, no window, one scan
    p = formatted(qs["q_hhi"](spark, SF))
    check("q_hhi", p, ["partial_count"], ["PythonUDF", "Window"])
    if n_scans(p) != 1:
        failures.append(f"q_hhi: expected 1 scan, saw {n_scans(p)}")

    # Q4-shaped late orders: LeftSemi with the non-equi residual INSIDE
    # the join (each order emits once); date filter pushed to orders scan
    # Q4-shaped EXISTS: fact joins the date-filtered orders slice
    # (broadcastable) with the residual inside the join — NO left-semi
    # (that formulation can only build on the fact side and sorts the
    # whole fact: the r06 1M→2M probe measured it); lines collapse to
    # orders via partial agg before the final 5-row rollup
    p = formatted(qs["q_late_orders"](spark, SF))
    check(
        "q_late_orders",
        p,
        ["BroadcastHashJoin", "GreaterThanOrEqual(o_orderdate", "partial"],
        ["PythonUDF", "CartesianProduct", "Window", "SortMergeJoin"],
    )

    # Q14-shaped promo share: part pruned to two columns at the scan;
    # numerator+denominator in one agg
    p = formatted(qs["q_promo_share"](spark, SF))
    check(
        "q_promo_share",
        p,
        ["ReadSchema: struct<p_partkey:bigint,p_type:string>"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # fan-out profile: lineitem collapses to (key, cnt) BEFORE the left
    # join (partial_count under the join), never after
    p = formatted(qs["q_fanout_profile"](spark, SF))
    check(
        "q_fanout_profile",
        p,
        ["partial_count"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q3-shaped shipping priority: segment filter pushed to customer scan,
    # sort-free top-10 (TakeOrderedAndProject), broadcast customer dim
    p = formatted(qs["q_ship_priority"](spark, SF))
    check(
        "q_ship_priority",
        p,
        ["TakeOrderedAndProject", "EqualTo(c_mktsegment,BUILDING)", "BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q7-shaped trade pairs: the two-nation filter reaches the nation scans
    # (In(n_name)), dims broadcast, no fact self-join (exactly 2 fact scans
    # + 4 dim scans = 6)
    p = formatted(qs["q_trade_pairs"](spark, SF))
    check(
        "q_trade_pairs",
        p,
        ["In(n_name, [NATION_3,NATION_8])", "BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window", "SortMergeJoin"],
    )

    # Q10-shaped returned report: returnflag pushed to lineitem scan,
    # quarter filter pushed to orders scan, sort-free top-20
    p = formatted(qs["q_returned_report"](spark, SF))
    check(
        "q_returned_report",
        p,
        ["TakeOrderedAndProject", "EqualTo(l_returnflag,R)"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q2-shaped argmin join-back: per-part min collapses map-side
    # (partial_min) before the join; no window rank over the fact
    p = formatted(qs["q_cheapest_supplier"](spark, SF))
    check(
        "q_cheapest_supplier",
        p,
        ["partial_min"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q17-shaped correlated-avg filter: per-part avg collapses map-side
    # (partial_avg) before the join-back; part pruned to 2 columns
    p = formatted(qs["q_small_qty_rev"](spark, SF))
    check(
        "q_small_qty_rev",
        p,
        ["partial_avg", "ReadSchema: struct<p_partkey:bigint,p_brand:string>"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q18-shaped big orders: the HAVING cut (sum_qty > 300) is applied to
    # the per-order aggregate BEFORE the orders join, never after
    p = formatted(qs["q_big_orders"](spark, SF))
    check(
        "q_big_orders",
        p,
        ["partial_sum", "sum_qty#", "> 300.0"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q19-shaped bracket filter: the derived part-only residue of the
    # disjunction reaches the part scan as pushed Or() filters
    p = formatted(qs["q_bracket_filter"](spark, SF))
    check(
        "q_bracket_filter",
        p,
        ["Or(And(EqualTo(p_brand,Brand#11)", "BroadcastHashJoin"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q21-shaped waiting suppliers: both EXISTS quantifiers collapse into
    # one per-order aggregate (no correlated self-joins, no window); the
    # status filter reaches the orders scan
    p = formatted(qs["q_waiting_suppliers"](spark, SF))
    check(
        "q_waiting_suppliers",
        p,
        ["EqualTo(o_orderstatus,F)", "Expand"],
        ["PythonUDF", "CartesianProduct", "Window"],
    )

    # Q22-shaped idle customers: 1-row scalar broadcast (BroadcastNestedLoop
    # over a single aggregate row is the intended fan-out), LeftAnti against
    # the date-pruned orders scan
    p = formatted(qs["q_idle_customers"](spark, SF))
    check(
        "q_idle_customers",
        p,
        ["LeftAnti", "GreaterThanOrEqual(o_orderdate"],
        ["PythonUDF", "Window", "SortMergeJoin"],
    )

    # ---- global unpartitioned-window sweep (VERDICT r5 item 7) ----------
    # A Window with an empty partition spec is a single-reducer global sort
    # — the canonical 100 TB scale-killer.  Every key where one is ALLOWED
    # is listed here with the invariant that bounds its frame; anything new
    # fails the audit so a genuinely unbounded global window can't hide
    # among the known-safe ones.
    BOUNDED_GLOBAL_WINDOWS = {
        # frame is the day-collapsed series: |days| rows, calendar-bounded
        "q_lag_delta": 1,
        # frame is the |months|-row monthly rollup (3 spec reuses)
        "q_period_over_period": 3,
        # row_number over the 100 TakeOrdered survivors only
        "q_shuffle_order": 1,
        # prefix-min over a ≤64-row bucket frame (bucket-partitioned pass
        # is separate; this is the final tiny frame)
        "q_skyline": 1,
        # running sum over the TakeOrdered top-max(k) vocabulary rows
        "q_coverage": 2,
        # rank over the ≤|brand-vocabulary|-row aggregate
        "q_topn_other": 1,
        # cut assignment over the value-DOMAIN-bounded frequency table
        "q_global_decile": 1,
        # cumulative + total over the ≤30-row zone×band aggregate
        "q_abc_class": 2,
        # one row_number per fused retriever list, each over ≤depth(=100)
        # TakeOrdered survivors only (rrf_fuse truncates BEFORE ranking)
        "q_hybrid_rrf": 2,
    }

    def unpartitioned_windows(plan: str) -> int:
        """Count windowspecdefinition(...) specs with no partition columns:
        a partitioned spec leads with bare partition attrs; an
        unpartitioned one leads either with an ordering expression
        (ASC/DESC before the first top-level comma) or — for orderless
        global specs like sum(x) OVER () — directly with the
        specifiedwindowframe.  Both forms are single-reducer exchanges
        and both must face the whitelist."""
        n = 0
        for mm in re.finditer(r"windowspecdefinition\(", plan):
            i, depth, arg = mm.end(), 1, ""
            while i < len(plan) and depth:
                c = plan[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                if depth == 0 or (depth == 1 and c == ","):
                    break
                arg += c
                i += 1
            if (
                " ASC" in arg
                or " DESC" in arg
                or arg.startswith("specifiedwindowframe")
            ):
                n += 1
        return n

    # self-test: the detector must flag a synthetic global window and
    # accept a partitioned one, else the sweep below proves nothing
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _li = spark.read.parquet(f"{SF}/lineitem.parquet")
    _bad = formatted(_li.withColumn("rn", _F.row_number().over(_W.orderBy("l_orderkey"))))
    _bad2 = formatted(  # orderless global: sum(x) OVER ()
        _li.withColumn("t", _F.sum("l_quantity").over(_W.partitionBy()))
    )
    _good = formatted(
        _li.withColumn(
            "rn",
            _F.row_number().over(_W.partitionBy("l_returnflag").orderBy("l_orderkey")),
        )
    )
    _good2 = formatted(  # partitioned orderless: sum OVER (PARTITION BY x)
        _li.withColumn(
            "t", _F.sum("l_quantity").over(_W.partitionBy("l_returnflag"))
        )
    )
    if (
        unpartitioned_windows(_bad) != 1
        or unpartitioned_windows(_bad2) != 1
        or unpartitioned_windows(_good) != 0
        or unpartitioned_windows(_good2) != 0
    ):
        failures.append("window-sweep: self-test failed (detector broken)")

    # ---- low-cardinality fact-window sweep (VERDICT r6 item 2) ----------
    # A Window partitioned SOLELY by a handful-of-values key, running
    # DIRECTLY over a fact-table scan, sorts ~N/|key| rows on one task —
    # parallelism bounded by key cardinality, a linear-in-corpus straggler
    # (q_median_gap's original per-event_type lag).  Flag any Window in the
    # optimized logical plan whose partition columns are all drawn from the
    # known low-card vocabulary AND whose subtree reaches a source relation
    # before any Aggregate/Deduplicate collapse.  Windows over collapsed
    # (domain-bounded) frames pass; fact windows must carry at least one
    # corpus-growing partition column (day, user, key, ...).
    LOW_CARD_COLS = {
        "event_type", "l_returnflag", "l_linestatus", "o_orderstatus",
        "o_orderpriority", "zone", "band", "lang", "source", "variable",
        "basin_id", "segment", "cls", "r_name", "n_name", "run_id",
        "p_brand", "grain", "priority",
    }
    LOW_CARD_FACT_WINDOWS: dict[str, int] = {
        # per-lang NTILE(10) is the documented NON-scale variant; the 100 TB
        # path is its twin q_global_decile (exact order-statistic cuts from
        # a value-frequency table, no per-group global sort)
        "q_decile_stats": 1,
    }

    def _split_top(args: str) -> list[str]:
        out, depth, cur = [], 0, ""
        for c in args:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if c == "," and depth == 0:
                out.append(cur.strip())
                cur = ""
            else:
                cur += c
        if cur.strip():
            out.append(cur.strip())
        return out

    def low_card_fact_windows(df) -> int:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()

        def depth_of(ln: str) -> int:
            i = 0
            while i < len(ln) and ln[i] in " :+-":
                i += 1
            return i

        n = 0
        for li, ln in enumerate(lines):
            if "Window [" not in ln:
                continue
            mm = re.search(r"windowspecdefinition\((.*)$", ln)
            if not mm:
                continue
            # balanced-paren capture of the spec args
            raw, d, args = mm.group(1), 1, ""
            for c in raw:
                if c == "(":
                    d += 1
                elif c == ")":
                    d -= 1
                    if d == 0:
                        break
                args += c
            parts = []
            for a in _split_top(args):
                if (" ASC" in a or " DESC" in a
                        or a.startswith("specifiedwindowframe")):
                    break
                parts.append(a.split("#")[0].strip())
            if not parts or any(p not in LOW_CARD_COLS for p in parts):
                continue
            # walk the window's subtree: collapsed before any relation?
            wd = depth_of(ln)
            bounded = False
            for nxt in lines[li + 1:]:
                if depth_of(nxt) <= wd and nxt.strip():
                    break
                # WindowGroupLimit = map-side per-group top-k before the
                # shuffle: the per-group sort sees ≤ k·n_map_partitions
                # rows, bounded by parallelism, not corpus size
                if ("Aggregate" in nxt or "Deduplicate" in nxt
                        or "WindowGroupLimit" in nxt):
                    bounded = True
                    break
                if "Relation" in nxt or "FileScan" in nxt:
                    break
            if not bounded:
                n += 1
        return n

    # self-test: per-type window straight over the fact must flag; the
    # same window over a per-(type, day) collapse must pass
    _ev = spark.read.parquet(f"{SF}/lineitem.parquet")
    _bad3 = _ev.withColumn(
        "rn",
        _F.row_number().over(
            _W.partitionBy("l_returnflag").orderBy("l_orderkey")
        ),
    )
    _good3 = (
        _ev.groupBy("l_returnflag", "l_orderkey")
        .count()
        .withColumn(
            "rn",
            _F.row_number().over(
                _W.partitionBy("l_returnflag").orderBy("l_orderkey")
            ),
        )
    )
    if low_card_fact_windows(_bad3) != 1 or low_card_fact_windows(_good3) != 0:
        failures.append("low-card-window sweep: self-test failed")

    for name, fn in qs.items():
        df = fn(spark, SF)
        n = unpartitioned_windows(formatted(df))
        allowed = BOUNDED_GLOBAL_WINDOWS.get(name, 0)
        if n > allowed:
            failures.append(
                f"{name}: {n} unpartitioned Window spec(s), "
                f"{allowed} whitelisted — single-reducer global sort risk"
            )
        nl = low_card_fact_windows(df)
        if nl > LOW_CARD_FACT_WINDOWS.get(name, 0):
            failures.append(
                f"{name}: {nl} low-cardinality-partitioned fact Window(s) — "
                "parallelism bounded by key cardinality"
            )

    for f in failures:
        print("FAIL:", f)
    print(
        "ALL PLAN AUDITS PASSED" if not failures else f"{len(failures)} failures"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
