"""Round-5 operators: skyline, SCD2 segments, interval join, bigram LM,
reservoir-per-group, pagerank.  Oracle parity runs in test_contract /
tools/check.py; these pin semantics the oracle can't (edge cases,
invariants, determinism under repartitioning)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from snowav_spark.ops import graph, joins, sampling, skyline, text, windows

TS = datetime.datetime


# ------------------------------------------------------------- skyline


def test_skyline_matches_bruteforce(spark):
    """Randomized cross-check: the bucketed prefix-min plan must equal
    the quadratic dominance definition, including duplicate points and
    y-ties at different x."""
    import numpy as np

    rng = np.random.RandomState(3)
    pts = [
        (i, float(rng.randint(0, 30)), int(rng.randint(0, 30)))
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    got = {
        (r.x, r.y)
        for r in skyline.skyline_points(df, "x", "y", "pid", buckets=7)
        .collect()
    }
    uniq = {(x, y) for _, x, y in pts}
    expect = {
        (x, y)
        for (x, y) in uniq
        if not any(
            sx <= x and sy <= y and (sx < x or sy < y) for (sx, sy) in uniq
        )
    }
    assert got == expect


def test_skyline_counts_and_representative(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4), (4, 2.0, 9), (5, None, 1)],
        ["pid", "x", "y"],
    )
    out = {
        (r.x, r.y): (r.n_rows, r.min_id)
        for r in skyline.skyline_points(df, "x", "y", "pid").collect()
    }
    # (1.0,5) kept twice (coincident duplicates don't dominate each
    # other); (2.0,4) kept (better y); (2.0,9) dominated; NULL dropped
    assert out == {(1.0, 5): (2, 1), (2.0, 4): (1, 3)}


# ------------------------------------------------------------ SCD2


def test_scd2_segments_null_safe_and_tiebreaks(spark):
    rows = [
        # user 1: a a b a — three segments; NULL attr run collapses
        (1, TS(2024, 1, 1), "a", 10),
        (1, TS(2024, 1, 2), "a", 11),
        (1, TS(2024, 1, 3), "b", 12),
        (1, TS(2024, 1, 4), "a", 13),
        # user 2: NULL NULL x — NULL→NULL is NOT a change
        (2, TS(2024, 1, 1), None, 20),
        (2, TS(2024, 1, 2), None, 21),
        (2, TS(2024, 1, 3), "x", 22),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out = windows.scd2_segments(df, "user_id", "ts", "event_type", "event_id")
    got = sorted(
        (
            (r.user_id, r.valid_from),
            (r.user_id, r.event_type, r.valid_from, r.valid_to, r.n_events),
        )
        for r in out.collect()
    )
    assert [g for _, g in got] == [
        (1, "a", TS(2024, 1, 1), TS(2024, 1, 3), 2),
        (1, "b", TS(2024, 1, 3), TS(2024, 1, 4), 1),
        (1, "a", TS(2024, 1, 4), None, 1),
        (2, None, TS(2024, 1, 1), TS(2024, 1, 3), 2),
        (2, "x", TS(2024, 1, 3), None, 1),
    ]


# ------------------------------------------------------ interval join


def test_interval_join_boundaries_and_overlaps(spark):
    pts = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 0, 0, 0)),
            (2, TS(2024, 1, 2, 12, 0, 0)),
            (3, TS(2024, 1, 4, 0, 0, 0)),  # == end of w0: excluded
            (4, TS(2024, 2, 1)),  # outside everything
        ],
        ["eid", "ts"],
    )
    ivl = spark.createDataFrame(
        [
            (0, TS(2024, 1, 1), TS(2024, 1, 4)),
            (1, TS(2024, 1, 2), TS(2024, 1, 5)),
            (2, TS(2024, 1, 3), TS(2024, 1, 3)),  # degenerate: matches none
        ],
        ["wid", "ws", "we"],
    )
    out = joins.interval_join(pts, ivl, "ts", "wid", "ws", "we", 86_400)
    got = sorted((r.eid, r.wid) for r in out.collect())
    # half-open [start, end): eid1→w0 only; eid2→w0,w1 (overlap
    # multi-match); eid3→w1 (w0 end-exclusive); eid4 nowhere
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1)]


def test_interval_join_bucket_width_invariance(spark):
    """The bucket width is a physical knob — any width must give the
    same matches."""
    pts = spark.createDataFrame(
        [(i, TS(2024, 1, 1 + i % 20, i % 24)) for i in range(60)],
        ["eid", "ts"],
    )
    ivl = spark.createDataFrame(
        [(w, TS(2024, 1, 1 + w), TS(2024, 1, 4 + w)) for w in range(10)],
        ["wid", "ws", "we"],
    )
    ref = None
    for width in (3_600, 86_400, 7 * 86_400):
        got = sorted(
            (r.eid, r.wid)
            for r in joins.interval_join(
                pts, ivl, "ts", "wid", "ws", "we", width
            ).collect()
        )
        if ref is None:
            ref = got
        assert got == ref, width


# ----------------------------------------------------------- bigram LM


def test_bigram_counts_probabilities_normalize(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "solo"), (4, None)],
        ["doc_id", "text"],
    )
    out = {
        (r.w1, r.w2): (r.n_pair, r.n_w1, r.p)
        for r in text.bigram_counts(df, "text").collect()
    }
    # pairs: (a,b)x3, (b,a)x1, (b,c)x1; 'solo' and NULL contribute none
    assert out[("a", "b")] == (3, 3, 1.0)
    assert out[("b", "a")] == (1, 2, 0.5)
    assert out[("b", "c")] == (1, 2, 0.5)
    assert len(out) == 3
    # P(w2|w1) sums to 1 per opener
    from collections import defaultdict

    sums = defaultdict(float)
    for (w1, _), (_, _, p) in out.items():
        sums[w1] += p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_bigram_counts_single_token_doc_no_reversed_pair(spark):
    """Spark's sequence() DESCENDS when start > stop — an unguarded
    1-token doc would emit a reversed bogus pair."""
    df = spark.createDataFrame([(1, "only")], ["doc_id", "text"])
    assert text.bigram_counts(df, "text").count() == 0


# ----------------------------------------------------------- reservoir


def test_reservoir_per_group_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        [(i % 4, i) for i in range(200)], ["grp", "k"]
    )
    a = sorted(
        (r.grp, r.k, r.rk)
        for r in sampling.reservoir_per_group(df, "grp", "k", 5).collect()
    )
    b = sorted(
        (r.grp, r.k, r.rk)
        for r in sampling.reservoir_per_group(
            df.repartition(13), "grp", "k", 5
        ).collect()
    )
    assert a == b
    assert len(a) == 20  # 4 groups × 5
    assert all(1 <= rk <= 5 for _, _, rk in a)


# ------------------------------------------------------------ pagerank


def test_pagerank_mass_conserved_and_ordering(spark):
    # star: everyone links to hub 0; hub is dangling
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], ["s", "d"]
    )
    pr = {r.node: r.rank for r in graph.pagerank(edges, "s", "d", iters=10).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9  # dangling mass recycled
    assert all(abs(pr[i] - pr[1]) < 1e-12 for i in range(2, 6))
    assert pr[0] > pr[1] * 3  # the hub dominates


def test_pagerank_cycle_uniform(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], ["s", "d"]
    )
    pr = [r.rank for r in graph.pagerank(edges, "s", "d", iters=15).collect()]
    assert all(abs(x - 1 / 3) < 1e-9 for x in pr)


# ------------------------------------------- round-5b contract compositions
# These three live as compositions in contract.py, so the tests plant
# minimal parquet tables in tmp_path and drive the contract key itself.


def _plant(spark, tmp_path, name, rows, cols):
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_market_basket_support_confidence_lift(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # order 1: brands A,B (B twice — distinct collapse counts it once);
    # order 2: brands A,B; order 3: brand A only.
    _plant(
        spark, tmp_path, "lineitem",
        [(1, 10), (1, 20), (1, 21), (2, 11), (2, 22), (3, 12)],
        ["l_orderkey", "l_partkey"],
    )
    _plant(
        spark, tmp_path, "part",
        [(10, "A"), (11, "A"), (12, "A"), (20, "B"), (21, "B"), (22, "B")],
        ["p_partkey", "p_brand"],
    )
    rows = QUERIES["q_market_basket"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.brand_a, r.brand_b, r.support) == ("A", "B", 2)
    assert abs(r.confidence - round(2 / 3, 6)) < 1e-12  # vs n(A)=3
    assert abs(r.lift - 1.0) < 1e-12  # 2·3 / (3·2)


def test_running_distinct_first_seen_per_type(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # user 1 re-appearing on day 5 is NOT new; user 1 under type b is a
    # fresh first-seen (the collapse is per (type, user))
    _plant(
        spark, tmp_path, "events",
        [(1, TS(2024, 1, 1, 8), "a"), (1, TS(2024, 1, 5, 9), "a"),
         (2, TS(2024, 1, 5, 10), "a"), (1, TS(2024, 1, 2, 7), "b")],
        ["user_id", "ts", "event_type"],
    )
    out = {
        (r.event_type, str(r.day)): (r.new_users, r.cum_users)
        for r in QUERIES["q_running_distinct"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("a", "2024-01-01"): (1, 1),
        ("a", "2024-01-05"): (1, 2),
        ("b", "2024-01-02"): (1, 1),
    }


def test_rfm_quartile_cells(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # customer k: k orders of 100·k each, last order day 11-k →
    # recency k-1, frequency k, monetary 100·k² — every dimension is
    # strictly ordered so customer k lands in bucket k on all three.
    rows = []
    for k in range(1, 5):
        for j in range(k):
            rows.append((k, float(100 * k), TS(2024, 1, 11 - k - j)))
    _plant(
        spark, tmp_path, "orders", rows,
        ["o_custkey", "o_totalprice", "o_orderdate"],
    )
    out = {
        (r.r_bucket, r.f_bucket, r.m_bucket): (
            r.n_customers,
            r.avg_recency,
            r.avg_monetary,
        )
        for r in QUERIES["q_rfm"](spark, str(tmp_path)).collect()
    }
    assert out == {
        (k, k, k): (1, float(k - 1), float(100 * k * k))
        for k in range(1, 5)
    }


def test_top_paths_ordering_cap_and_null_drop(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # user 1 day 1: c(08:00) then a(09:00) → path "c>a" (ts order, not
    # insertion or alphabetical); a NULL event_type row is dropped, not
    # joined as an empty element; user 2 emits 25 'x' events → capped at 20.
    rows = [
        (1, 101, TS(2024, 1, 1, 9), "a"),
        (1, 100, TS(2024, 1, 1, 8), "c"),
        (1, 102, TS(2024, 1, 1, 10), None),
    ]
    rows += [(2, 200 + i, TS(2024, 1, 1, 6, i), "x") for i in range(25)]
    spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {r.path: r.n_sessions for r in QUERIES["q_top_paths"](
        spark, str(tmp_path)
    ).collect()}
    assert out == {"c>a": 1, ">".join(["x"] * 20): 1}


def test_top_paths_tie_pinned_by_event_id(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # identical timestamps: order falls back to event_id
    rows = [(1, 2, TS(2024, 1, 1, 8), "b"), (1, 1, TS(2024, 1, 1, 8), "a")]
    spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    [r] = QUERIES["q_top_paths"](spark, str(tmp_path)).collect()
    assert r.path == "a>b"


def test_weighted_median_half_total_and_null_nan_drop(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # group A: weights 1@0.0, 3@0.1, 2@0.2 (total 6; cum at 0.1 is 4 ≥ 3)
    # group B: single value; NULL and NaN rows must not perturb either.
    rows = [
        ("A", 1.0, 0.0), ("A", 3.0, 0.1), ("A", 2.0, 0.2),
        ("B", 5.0, 0.05),
        ("A", 9.0, None), ("A", 9.0, float("nan")), ("A", None, 0.0),
    ]
    spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_discount"]
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.l_returnflag: (r.wmedian_discount, r.total_qty)
        for r in QUERIES["q_weighted_median"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (0.1, 6), "B": (0.05, 5)}


def test_weighted_median_even_split_takes_lower(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # 2·cw >= tw at the LOWER value when weights split evenly: w=(2,2) →
    # at v=0.1 cum 2, total 4, 2·2 >= 4 → median 0.1
    rows = [("A", 2.0, 0.1), ("A", 2.0, 0.3)]
    spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_discount"]
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    [r] = QUERIES["q_weighted_median"](spark, str(tmp_path)).collect()
    assert (r.wmedian_discount, r.total_qty) == (0.1, 4)


def test_first_touch_tiebreak_and_conversion(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    rows = [
        # user 1: tie at 08:00 → event_id 1 wins (first = "view"),
        # converts later
        (1, 2, TS(2024, 1, 1, 8), "click"),
        (1, 1, TS(2024, 1, 1, 8), "view"),
        (1, 3, TS(2024, 1, 2), "purchase"),
        # user 2: first = "click", never converts
        (2, 4, TS(2024, 1, 1), "click"),
        # user 3: converts immediately (first = "purchase")
        (3, 5, TS(2024, 1, 1), "purchase"),
        # NULL user dropped
        (None, 6, TS(2024, 1, 1), "view"),
    ]
    spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.first_type: (r.n_users, r.n_conv, r.conv_rate)
        for r in QUERIES["q_first_touch"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "view": (1, 1, 1.0),
        "click": (1, 0, 0.0),
        "purchase": (1, 1, 1.0),
    }


def test_benford_digits_from_exact_cents(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # 19.99 → 1999 cents → digit 1; 0.07 → 7 cents → digit 7 (sub-unit
    # values take their cents' leading digit); 999.0 → digit 9;
    # zero/negative/NULL dropped
    rows = [(19.99,), (0.07,), (999.0,), (0.0,), (-5.0,), (None,)]
    spark.createDataFrame(rows, ["o_totalprice"]).coalesce(1).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.digit: (r.n, r.share)
        for r in QUERIES["q_benford"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "1": (1, round(1 / 3, 6)),
        "7": (1, round(1 / 3, 6)),
        "9": (1, round(1 / 3, 6)),
    }


def test_twap_holding_time_weighting(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # user 1, type a: value 10 held 10s, then 20 held 30s, last event
    # contributes no holding time → twap = (10·10 + 20·30) / 40 = 17.5.
    # user 2 contributes a single event (no duration) → drops entirely.
    # zero-duration pair (same ts) drops the zero-length holding.
    rows = [
        (1, 1, TS(2024, 1, 1, 0, 0, 0), "a", 10.0),
        (1, 2, TS(2024, 1, 1, 0, 0, 10), "a", 20.0),
        (1, 3, TS(2024, 1, 1, 0, 0, 40), "a", 99.0),
        (2, 4, TS(2024, 1, 1), "a", 1000.0),
        (3, 5, TS(2024, 1, 1, 1), "b", 5.0),
        (3, 6, TS(2024, 1, 1, 1), "b", 7.0),  # 0s apart: no holding
        (3, 7, TS(2024, 1, 1, 1, 0, 4), "b", 9.0),
    ]
    spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type", "value"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.twap, r.total_dur_s)
        for r in QUERIES["q_twap"](spark, str(tmp_path)).collect()
    }
    # type b: event 6 (value 7, tie broken by event_id) holds 4s → twap 7
    assert out == {"a": (17.5, 40), "b": (7.0, 4)}


def test_period_over_period_pct_and_first_null(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 5), 100.0), (TS(2024, 1, 20), 100.0),  # Jan: 200
        (TS(2024, 2, 10), 300.0),                           # Feb: 300
        (TS(2024, 4, 1), 150.0),                            # Apr: 150 (gap)
    ]
    spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        str(r.month): (r.revenue, r.prev_revenue, r.pct_change)
        for r in QUERIES["q_period_over_period"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "2024-01-01": (200.0, None, None),
        "2024-02-01": (300.0, 200.0, 0.5),
        # calendar gaps compare against the previous PRESENT month
        "2024-04-01": (150.0, 300.0, -0.5),
    }


def test_topn_other_folds_tail_exactly(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    # 5 brands with revenues 500,400,300,200,100 → top3 kept, Other=300
    li, parts = [], []
    for i, rev in enumerate([500.0, 400.0, 300.0, 200.0, 100.0]):
        parts.append((i, f"B{i}"))
        li.append((1, i, rev))
    spark.createDataFrame(
        li, ["l_orderkey", "l_partkey", "l_extendedprice"]
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(parts, ["p_partkey", "p_brand"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "part.parquet"))
    out = {
        r.brand_group: (r.n_brands, r.revenue)
        for r in QUERIES["q_topn_other"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "B0": (1, 500.0),
        "B1": (1, 400.0),
        "B2": (1, 300.0),
        "Other": (2, 300.0),
    }


def test_trend_slope_exact_line_and_degenerate(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    rows = []
    # type "up": daily totals 10, 20, 30 on days 0,1,2 → slope exactly 10
    for i, v in enumerate([10.0, 20.0, 30.0]):
        rows.append((TS(2024, 1, 1 + i, 9), "up", v))
    # type "flat": constant 5 over two days → slope 0
    rows += [(TS(2024, 1, 1), "flat", 5.0), (TS(2024, 1, 2), "flat", 5.0)]
    # type "one": a single day → denominator 0 → NULL, not Infinity
    rows += [(TS(2024, 1, 1), "one", 7.0)]
    # same-day rows sum into one daily point first
    rows += [(TS(2024, 1, 1, 1), "up", 0.0)]
    spark.createDataFrame(rows, ["ts", "event_type", "value"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_days, r.slope_per_day)
        for r in QUERIES["q_trend_slope"](spark, str(tmp_path)).collect()
    }
    assert out == {"up": (3, 10.0), "flat": (2, 0.0), "one": (1, None)}


# ------------------------------------------------- round-5c additions


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))


def test_gini_hand_computed(spark, tmp_path):
    """Frequency-table Gini == textbook ranked-row Gini, incl. ties,
    equal-value groups (gini 0), singletons (gini 0), NULL drop."""
    from snowav_spark.contract import QUERIES

    _write_docs(
        spark,
        tmp_path,
        [
            # A: lengths [1, 1, 2] → 2Σrx=18, s=4, n=3 → (18-16)/12
            (1, "t", "en", "A", 1),
            (2, "t", "en", "A", 1),
            (3, "t", "en", "A", 2),
            # B: all equal → 0
            (4, "t", "en", "B", 5),
            (5, "t", "en", "B", 5),
            # C: singleton → 0; NULL length dropped
            (6, "t", "en", "C", 7),
            (7, "t", "en", "C", None),
        ],
    )
    out = {
        r.source: (r.n_docs, r.gini)
        for r in QUERIES["q_gini"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (3, round(2 / 12, 6)), "B": (2, 0.0), "C": (1, 0.0)}


def test_diversity_simpson_exact(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    _write_docs(
        spark,
        tmp_path,
        [
            # A: en,en,fr → 1 - (4+1)/9 = 4/9
            (1, "t", "en", "A", 1),
            (2, "t", "en", "A", 1),
            (3, "t", "fr", "A", 1),
            # B: one lang → 0.0; NULL lang dropped
            (4, "t", "de", "B", 1),
            (5, "t", None, "B", 1),
        ],
    )
    out = {
        r.source: (r.n_docs, r.n_langs, r.simpson)
        for r in QUERIES["q_diversity"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (3, 2, round(4 / 9, 6)), "B": (1, 1, 0.0)}


def test_ewma_power_of_two_weights(spark, tmp_path):
    """Day 1 seeds at the raw value; day 2 is (4·2¹⁵ + 2·2¹⁴)/(2¹⁵+2¹⁴)
    = 10/3; a gap in the calendar does NOT reset the lookback (row-based
    lag over observed days)."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1), "a", 2.0),
        (TS(2024, 1, 2), "a", 4.0),
        # calendar gap: next observation 3 days later still lags day 2
        (TS(2024, 1, 5), "a", 4.0),
        # same-day rows collapse to a daily total first
        (TS(2024, 1, 1, 5), "b", 1.0),
        (TS(2024, 1, 1, 7), "b", 2.0),
    ]
    spark.createDataFrame(rows, ["ts", "event_type", "value"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.event_type, str(r.day)): r.ewma
        for r in QUERIES["q_ewma"](spark, str(tmp_path)).collect()
    }
    w0, w1, w2 = 1 << 15, 1 << 14, 1 << 13
    assert out[("a", "2024-01-01")] == 2.0
    assert out[("a", "2024-01-02")] == round(
        (4 * w0 + 2 * w1) / (w0 + w1), 6
    )
    assert out[("a", "2024-01-05")] == round(
        (4 * w0 + 4 * w1 + 2 * w2) / (w0 + w1 + w2), 6
    )
    assert out[("b", "2024-01-01")] == 3.0


def test_keyword_tags_matches_and_nulls(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a query and a join", "en", "A", 1),
            (2, "query again", "en", "A", 1),
            (3, "nothing of note", "en", "A", 1),
            (4, None, "en", "A", 1),
            (5, "hash join stream", "en", "B", 1),
        ],
    )
    out = {
        (r.source, r.keyword): r.n_docs
        for r in QUERIES["q_keyword_tags"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("A", "query"): 2,
        ("A", "join"): 1,
        ("B", "hash"): 1,
        ("B", "join"): 1,
        ("B", "stream"): 1,
    }


def test_conversion_lag_semantics(spark, tmp_path):
    """Purchase strictly after FIRST view; earliest qualifying purchase
    wins; purchase-before-view users and view-only users excluded."""
    from snowav_spark.contract import QUERIES

    rows = [
        # user 1: view 09:00, purchases 09:01:30 and 10:00 → lag 90 s
        (TS(2024, 1, 1, 9, 0, 0), 1, "view"),
        (TS(2024, 1, 1, 9, 1, 30), 1, "purchase"),
        (TS(2024, 1, 1, 10, 0, 0), 1, "purchase"),
        # user 1 second view later — first_view stays 09:00
        (TS(2024, 1, 1, 9, 30, 0), 1, "view"),
        # user 2: purchase BEFORE the only view → excluded
        (TS(2024, 1, 2, 8, 0, 0), 2, "purchase"),
        (TS(2024, 1, 2, 9, 0, 0), 2, "view"),
        # user 3: view only → excluded
        (TS(2024, 1, 3, 9, 0, 0), 3, "view"),
        # user 4: same first-view DAY as user 1, lag 30 s → avg (90+30)/2
        (TS(2024, 1, 1, 12, 0, 0), 4, "view"),
        (TS(2024, 1, 1, 12, 0, 30), 4, "purchase"),
    ]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        str(r.day): (r.n_converted, r.avg_lag_s)
        for r in QUERIES["q_conversion_lag"](spark, str(tmp_path)).collect()
    }
    assert out == {"2024-01-01": (2, 60.0)}


def test_attribution_linear_credit_split(spark, tmp_path):
    """7-day lookback, half-open [p−7d, p); equal integer micro-credits
    per touch (floor), credit conservation ≤ 1 per purchase."""
    from snowav_spark.contract import QUERIES

    rows = [
        # purchase for user 1 at Jan 10 12:00; views Jan 9 (in), Jan 4
        # (in, exactly 7d-1s before? Jan 3 12:00:00 is the boundary:
        # v.ts >= p.ts - 7d), Jan 3 11:59 (out), purchase-time view (out)
        (1, TS(2024, 1, 10, 12, 0, 0), 1, "purchase"),
        (2, TS(2024, 1, 9, 10, 0, 0), 1, "view"),
        (3, TS(2024, 1, 3, 12, 0, 0), 1, "view"),   # boundary: included
        (4, TS(2024, 1, 3, 11, 59, 59), 1, "view"),  # too old
        (5, TS(2024, 1, 10, 12, 0, 0), 1, "view"),   # not strictly before
        # user 2: three views one day → credit 3·⌊1e6/3⌋ = 0.999999
        (6, TS(2024, 1, 20, 12, 0, 0), 2, "purchase"),
        (7, TS(2024, 1, 19, 8, 0, 0), 2, "view"),
        (8, TS(2024, 1, 19, 9, 0, 0), 2, "view"),
        (9, TS(2024, 1, 19, 10, 0, 0), 2, "view"),
        # user 3: purchase with no prior view → contributes nothing
        (10, TS(2024, 1, 25, 12, 0, 0), 3, "purchase"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        str(r.day): (r.n_touches, r.credit)
        for r in QUERIES["q_attribution_linear"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "2024-01-09": (1, 0.5),
        "2024-01-03": (1, 0.5),
        "2024-01-19": (3, 999999 / 1e6),
    }


def test_streaks_gaps_and_islands(spark, tmp_path):
    from snowav_spark.contract import QUERIES

    rows = []
    # user 1: days 1,2,3 then 5 → max streak 3
    for d in (1, 2, 3, 5):
        rows.append((TS(2024, 1, d, 9), 1, "view"))
    # user 2: days 1, 3, 5 → max streak 1; duplicate same-day rows collapse
    for d in (1, 1, 3, 5):
        rows.append((TS(2024, 1, d, 10), 2, "click"))
    # user 3: 4 consecutive days → max streak 4
    for d in (10, 11, 12, 13):
        rows.append((TS(2024, 1, d, 11), 3, "view"))
    # user 4: single day → streak 1
    rows.append((TS(2024, 2, 1, 9), 4, "view"))
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.max_streak: r.n_users
        for r in QUERIES["q_streaks"](spark, str(tmp_path)).collect()
    }
    assert out == {3: 1, 1: 2, 4: 1}


def test_chi_square_independent_table_is_zero(spark, tmp_path):
    """A contingency table that exactly factorizes (o = rt*ct/N for every
    cell) must yield chi2_part == 0.0 for every type; breaking one cell
    makes it strictly positive."""
    from snowav_spark.contract import QUERIES

    mon, tue = TS(2024, 1, 1, 9), TS(2024, 1, 2, 9)  # Mon=1, Tue=2
    rows = []
    for ts, n in ((mon, 2), (tue, 4)):
        rows += [(ts, 1, "a")] * n
    for ts, n in ((mon, 1), (tue, 2)):
        rows += [(ts, 2, "b")] * n
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_obs, r.chi2_part)
        for r in QUERIES["q_chi_square"](spark, str(tmp_path)).collect()
    }
    assert out == {"a": (6, 0.0), "b": (3, 0.0)}

    skew = tmp_path / "skew"
    skew.mkdir()
    spark.createDataFrame(
        rows + [(mon, 3, "b")] * 5, ["ts", "user_id", "event_type"]
    ).coalesce(1).write.parquet(str(skew / "events.parquet"))
    out2 = {
        r.event_type: r.chi2_part
        for r in QUERIES["q_chi_square"](spark, str(skew)).collect()
    }
    assert out2["a"] > 0 and out2["b"] > 0


def test_autocorr_alternating_and_constant(spark, tmp_path):
    """An alternating daily series has lag-1 autocorrelation exactly −1;
    a constant series has zero variance → NULL (not NaN, not a crash)."""
    from snowav_spark.contract import QUERIES

    rows = []
    for d, n in ((1, 1), (2, 2), (3, 1), (4, 2), (5, 1)):
        rows += [(TS(2024, 1, d, 8), 1, "alt")] * n
    for d in (1, 2, 3, 4):
        rows += [(TS(2024, 1, d, 8), 2, "flat")] * 3
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_pairs, r.autocorr)
        for r in QUERIES["q_autocorr"](spark, str(tmp_path)).collect()
    }
    assert out["alt"] == (4, -1.0)
    assert out["flat"] == (3, None)


def test_ttr_hand_counted(spark, tmp_path):
    """source s1: tokens {a:2, b:1, c:1} → 4 tokens, 3 types, 2 hapax;
    consecutive spaces produce no empty token; NULL text is ignored."""
    from snowav_spark.contract import QUERIES

    docs = [
        (1, "a  b a", "s1"),
        (2, "c", "s1"),
        (3, None, "s1"),
        (4, "x x x", "s2"),
    ]
    spark.createDataFrame(docs, ["doc_id", "text", "source"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: (r.n_tokens, r.n_types, r.n_hapax, r.ttr, r.hapax_ratio)
        for r in QUERIES["q_ttr"](spark, str(tmp_path)).collect()
    }
    assert out["s1"] == (4, 3, 2, 0.75, 0.666667)
    assert out["s2"] == (3, 1, 0, 0.333333, 0.0)


def test_seasonality_normalizes_by_calendar_coverage(spark, tmp_path):
    """Two Mondays vs one Tuesday in the span: 4 Monday events over 2
    Mondays vs 1 Tuesday event over 1 Tuesday, type total 5 over 3 days
    → Mon index (4·3)/(2·5)=1.2, Tue index (1·3)/(1·5)=0.6."""
    from snowav_spark.contract import QUERIES

    rows = (
        [(TS(2024, 1, 1, 9), 1, "a")] * 2
        + [(TS(2024, 1, 8, 9), 1, "a")] * 2
        + [(TS(2024, 1, 2, 9), 1, "a")]
    )
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.dow: (r.n_events, r.dow_index)
        for r in QUERIES["q_seasonality"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (4, 1.2), 2: (1, 0.6)}


def test_cusum_change_level_shift(spark, tmp_path):
    """A series jumping 1/day -> 5/day after day 4 peaks its centered
    cumulative sum at day 4 (|s|=64, nd=8 -> cusum_max 8.0); a constant
    series has cusum 0 with the tie resolving to the earliest day."""
    from snowav_spark.contract import QUERIES

    rows = []
    for d in (1, 2, 3, 4):
        rows += [(TS(2024, 1, d, 9), 1, "a")]
    for d in (5, 6, 7, 8):
        rows += [(TS(2024, 1, d, 9), 1, "a")] * 5
    for d in (1, 2, 3):
        rows += [(TS(2024, 1, d, 9), 2, "flat")] * 2
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_days, r.cusum_max, r.change_day)
        for r in QUERIES["q_cusum_change"](spark, str(tmp_path)).collect()
    }
    assert out["a"] == (8, 8.0, datetime.date(2024, 1, 4))
    assert out["flat"] == (3, 0.0, datetime.date(2024, 1, 1))


def test_source_jaccard_hand_counted(spark, tmp_path):
    """Vocab s1={a,b,c}, s2={b,c,d} -> |common|=2, jaccard 2/4=0.5;
    disjoint pairs produce NO row (inner join on shared tokens);
    duplicate tokens within a source count once."""
    from snowav_spark.contract import QUERIES

    docs = [
        (1, "a b", "s1"),
        (2, "b c", "s1"),
        (3, "b c d", "s2"),
        (4, "x", "s3"),
    ]
    spark.createDataFrame(docs, ["doc_id", "text", "source"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.s1, r.s2): (r.n_common, r.jaccard)
        for r in QUERIES["q_source_jaccard"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {("s1", "s2"): (2, 0.5)}


def test_growth_accounting_classes(spark, tmp_path):
    """user 1 active on days 1,2,4 (new/retained/resurrected);
    user 2 on days 2,3 (new/retained); same-day duplicates collapse."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1, 9), 1, "view"),
        (TS(2024, 1, 1, 10), 1, "view"),
        (TS(2024, 1, 2, 9), 1, "view"),
        (TS(2024, 1, 4, 9), 1, "view"),
        (TS(2024, 1, 2, 9), 2, "view"),
        (TS(2024, 1, 3, 9), 2, "view"),
    ]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.day.day: (r.n_new, r.n_retained, r.n_resurrected)
        for r in QUERIES["q_growth_accounting"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        1: (1, 0, 0),
        2: (1, 1, 0),
        3: (0, 1, 0),
        4: (0, 0, 1),
    }


def test_top_share_threshold_and_ties(spark, tmp_path):
    """Segment s1: totals 100,200,300,400 → p99 = 300+0.97·100 = 397 →
    only the 400-customer is top (share 0.4); multi-order customers
    aggregate BEFORE the percentile.  Segment s2: totals 400,400,200,
    remaining — ties AT the cut (p99=400) are all included."""
    from snowav_spark.contract import QUERIES

    orders = []
    # s1 customers 1..4: customer k has k orders summing to 100·k
    for k in range(1, 5):
        for j in range(k):
            orders.append((k, 100.0 * k / k))  # k orders of 100.0 each
    # s2 customers 5..7: totals 400, 400, 200
    orders += [(5, 400.0), (6, 400.0), (7, 200.0)]
    _plant(
        spark, tmp_path, "orders",
        [(c, float(v)) for c, v in orders],
        ["o_custkey", "o_totalprice"],
    )
    _plant(
        spark, tmp_path, "customer",
        [(k, "s1") for k in range(1, 5)] + [(k, "s2") for k in (5, 6, 7)],
        ["c_custkey", "c_mktsegment"],
    )
    out = {
        r.segment: (r.n_top, r.share)
        for r in QUERIES["q_top_share"](spark, str(tmp_path)).collect()
    }
    assert out["s1"] == (1, round(400 / 1000, 6))
    assert out["s2"] == (2, round(800 / 1000, 6))


def test_new_vs_returning_first_date_ties(spark, tmp_path):
    """Customer 1: two orders ON the first date (both 'new' — date
    equality, not a pick-one) plus a later order ('returning');
    customer 2: single order (new).  Months split correctly."""
    from snowav_spark.contract import QUERIES

    _plant(
        spark, tmp_path, "orders",
        [
            (1, 100.0, TS(2024, 1, 5)),
            (1, 50.0, TS(2024, 1, 5)),
            (1, 70.0, TS(2024, 2, 10)),
            (2, 30.0, TS(2024, 2, 1)),
        ],
        ["o_custkey", "o_totalprice", "o_orderdate"],
    )
    out = {
        (r.month, r.cohort): (r.n_orders, r.revenue)
        for r in QUERIES["q_new_vs_returning"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("2024-01", "new"): (2, 150.0),
        ("2024-02", "returning"): (1, 70.0),
        ("2024-02", "new"): (1, 30.0),
    }


def test_churn_attribution_and_identity(spark, tmp_path):
    """Same fixture as growth accounting: u1 on days 1,2,4; u2 on
    days 2,3.  Churn lands on the day AFTER the last consecutive
    active day (u1 churns on day 3, both churn on days 4/5 - but
    day 5 > max(day)=4 is excluded), and the growth identity
    DAU_t - DAU_{t-1} = new + resurrected - churned holds exactly."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1, 9), 1, "view"),
        (TS(2024, 1, 2, 9), 1, "view"),
        (TS(2024, 1, 4, 9), 1, "view"),
        (TS(2024, 1, 2, 9), 2, "view"),
        (TS(2024, 1, 3, 9), 2, "view"),
    ]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    churn = {
        r.day.day: r.n_churned
        for r in QUERIES["q_churn"](spark, str(tmp_path)).collect()
    }
    # u1 active 1,2 then gap -> churned on 3; u2 active 2,3 -> churned
    # on 4; u1's last day is 4 -> would churn on 5 but 5 > max day.
    assert churn == {3: 1, 4: 1}
    growth = {
        r.day.day: (r.n_new, r.n_retained, r.n_resurrected)
        for r in QUERIES["q_growth_accounting"](
            spark, str(tmp_path)
        ).collect()
    }
    dau = {1: 1, 2: 2, 3: 1, 4: 1}
    for d in (2, 3, 4):
        n_new, _, n_res = growth.get(d, (0, 0, 0))
        assert dau[d] - dau[d - 1] == n_new + n_res - churn.get(d, 0)


def test_activity_histogram_counts_users(spark, tmp_path):
    """u1,u2 active 3 distinct days, u3 one day; same-day duplicate
    events collapse before the per-user count."""
    from snowav_spark.contract import QUERIES

    rows = []
    for u in (1, 2):
        for d in (1, 2, 3):
            rows += [(TS(2024, 1, d, 9), u, "view")]
    rows += [(TS(2024, 1, 5, 9), 3, "view"), (TS(2024, 1, 5, 11), 3, "view")]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.n_days: r.n_users
        for r in QUERIES["q_activity_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {3: 2, 1: 1}


def test_interarrival_buckets_and_boundaries(spark, tmp_path):
    """Gaps of 30 s / 30 min / exactly 24 h land in lt_1m / lt_1h /
    ge_1d (the 24 h boundary is exclusive for lt_1d); duplicate
    timestamps collapse before the lag so no zero gap appears."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1, 9, 0, 0), 1, "view"),
        (TS(2024, 1, 1, 9, 0, 30), 1, "view"),
        (TS(2024, 1, 1, 9, 0, 30), 1, "click"),  # dup ts
        (TS(2024, 1, 1, 9, 30, 30), 1, "view"),
        (TS(2024, 1, 2, 9, 30, 30), 1, "view"),
    ]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.bucket: (r.n_gaps, r.min_us, r.max_us, r.sum_us)
        for r in QUERIES["q_interarrival"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "lt_1m": (1, 30_000_000, 30_000_000, 30_000_000),
        "lt_1h": (1, 1_800_000_000, 1_800_000_000, 1_800_000_000),
        "ge_1d": (1, 86_400_000_000, 86_400_000_000, 86_400_000_000),
    }


def test_fano_hand_counted(spark, tmp_path):
    """Constant daily counts -> fano 0; counts (1,3) -> sample variance
    2 over mean 2 -> fano 1.0; a single-day type is excluded (n>1)."""
    from snowav_spark.contract import QUERIES

    rows = []
    for d in (1, 2, 3):
        rows += [(TS(2024, 1, d, 9), 1, "a")] * 2
    rows += [(TS(2024, 1, 1, 9), 1, "b")]
    rows += [(TS(2024, 1, 2, 9), 1, "b")] * 3
    rows += [(TS(2024, 1, 1, 9), 1, "c")]
    spark.createDataFrame(rows, ["ts", "user_id", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_days, r.mean_daily, r.fano)
        for r in QUERIES["q_fano"](spark, str(tmp_path)).collect()
    }
    assert out == {"a": (3, 2.0, 0.0), "b": (2, 2.0, 1.0)}


def test_peak_concurrency_sweep_and_midnight(spark, tmp_path):
    """Overlapping sessions count toward the same peak; a session whose
    start equals another's end overlaps it (+1 sweeps before -1); a
    session crossing midnight is active on BOTH days."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1, 9, 0), 1, 1),
        (TS(2024, 1, 1, 9, 10), 1, 2),
        (TS(2024, 1, 1, 9, 5), 2, 3),
        (TS(2024, 1, 1, 10, 0), 3, 4),
        (TS(2024, 1, 1, 10, 20), 3, 5),
        (TS(2024, 1, 1, 23, 50), 4, 6),
        (TS(2024, 1, 2, 0, 10), 4, 7),
        (TS(2024, 1, 1, 11, 0), 5, 8),
        (TS(2024, 1, 1, 11, 30), 5, 9),
        (TS(2024, 1, 1, 11, 30), 6, 10),
    ]
    spark.createDataFrame(
        rows, ["ts", "user_id", "event_id"]
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.day.day: (r.n_sessions, r.peak_concurrency)
        for r in QUERIES["q_peak_concurrency"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (6, 2), 2: (1, 1)}


def test_hhi_hand_counted(spark, tmp_path):
    """Day 1: type a×3 + b×1 → HHI = (9+1)/16 = 0.625; day 2: uniform
    2×2 → 0.5; NULL types excluded before counting."""
    from snowav_spark.contract import QUERIES

    rows = [
        (TS(2024, 1, 1, 9), "a"),
        (TS(2024, 1, 1, 10), "a"),
        (TS(2024, 1, 1, 11), "a"),
        (TS(2024, 1, 1, 12), "b"),
        (TS(2024, 1, 1, 13), None),
        (TS(2024, 1, 2, 9), "a"),
        (TS(2024, 1, 2, 10), "a"),
        (TS(2024, 1, 2, 11), "b"),
        (TS(2024, 1, 2, 12), "b"),
    ]
    spark.createDataFrame(rows, ["ts", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.day.day: (r.n_types, r.n_events, r.hhi)
        for r in QUERIES["q_hhi"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (2, 4, 0.625), 2: (2, 4, 0.5)}


def _plant_snowflake(spark, tmp_path, orders, lineitem):
    """Shared star-schema dims for the Q5/Q8-shaped contract tests:
    nations 0/7 in ASIA-side region 0, nations 7/8 in EUROPE region 1
    (region fixture carries both names so each query's literal filter
    selects its own slice)."""
    _plant(
        spark, tmp_path, "region",
        [(0, "ASIA"), (1, "EUROPE")], ["r_regionkey", "r_name"],
    )
    _plant(
        spark, tmp_path, "nation",
        [(0, "NATION_0", 0), (7, "NATION_7", 1), (8, "NATION_8", 1)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    _plant(
        spark, tmp_path, "customer",
        [(1, 0), (2, 7)], ["c_custkey", "c_nationkey"],
    )
    _plant(
        spark, tmp_path, "supplier",
        [(10, 0), (11, 7), (12, 8)], ["s_suppkey", "s_nationkey"],
    )
    _plant(
        spark, tmp_path, "orders", orders,
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    _plant(
        spark, tmp_path, "lineitem", lineitem,
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )


def test_regional_volume_same_nation_and_daterange(spark, tmp_path):
    """Only lines where customer and supplier share a nation inside the
    filtered region-year survive: cross-nation supplier, out-of-range
    year, and non-ASIA customer are each dropped."""
    from snowav_spark.contract import QUERIES

    orders = [
        (100, 1, TS(1996, 5, 1)),   # ASIA customer, in range
        (101, 1, TS(1995, 5, 1)),   # out of date range
        (102, 2, TS(1996, 6, 1)),   # EUROPE customer -> not ASIA
    ]
    lineitem = [
        (100, 10, 100.0, 0.1),      # same nation 0 -> revenue 90
        (100, 11, 500.0, 0.0),      # supplier nation 7 != customer 0
        (101, 10, 700.0, 0.0),      # date-filtered
        (102, 11, 900.0, 0.0),      # region-filtered
    ]
    _plant_snowflake(spark, tmp_path, orders, lineitem)
    out = [
        (r.n_name, r.revenue, r.n_items)
        for r in QUERIES["q_regional_volume"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert out == [("NATION_0", 90.0, 1)]


def test_market_share_conditional_aggregate(spark, tmp_path):
    """1996: NATION_7 supplies 200 of 300 EUROPE revenue → share
    0.666667; 1997: NATION_7 absent → NULL numerator and NULL share,
    denominator still counts; ASIA customer excluded entirely."""
    from snowav_spark.contract import QUERIES

    orders = [
        (200, 2, TS(1996, 3, 1)),   # EUROPE customer
        (201, 2, TS(1997, 3, 1)),   # EUROPE, later year
        (202, 1, TS(1996, 4, 1)),   # ASIA customer -> excluded
    ]
    lineitem = [
        (200, 11, 200.0, 0.0),      # supplier NATION_7
        (200, 12, 100.0, 0.0),      # supplier NATION_8
        (201, 12, 50.0, 0.0),
        (202, 10, 999.0, 0.0),      # excluded with its order
    ]
    _plant_snowflake(spark, tmp_path, orders, lineitem)
    out = {
        r.yr: (r.nation_rev, r.total_rev, r.share)
        for r in QUERIES["q_market_share"](spark, str(tmp_path)).collect()
    }
    assert out == {
        1996: (200.0, 300.0, 0.666667),
        1997: (None, 50.0, None),
    }


def test_late_orders_semi_once_and_boundary(spark, tmp_path):
    """An order with two late lines counts ONCE (semi join); exactly
    +30 days is NOT late (strict >); out-of-window orders excluded."""
    from snowav_spark.contract import QUERIES

    _plant(
        spark, tmp_path, "orders",
        [
            (1, "1-URGENT", TS(1996, 2, 1)),
            (2, "1-URGENT", TS(1996, 3, 1)),
            (3, "5-LOW", TS(1996, 4, 1)),
            (4, "1-URGENT", TS(1995, 2, 1)),
        ],
        ["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, TS(1996, 3, 15)),   # late
            (1, TS(1996, 4, 15)),   # late again -> still one order
            (2, TS(1996, 3, 31)),   # exactly +30d -> NOT late
            (3, TS(1996, 6, 1)),    # late, different priority
            (4, TS(1996, 2, 1)),    # order outside window
        ],
        ["l_orderkey", "l_shipdate"],
    )
    out = {
        r.o_orderpriority: r.n_late
        for r in QUERIES["q_late_orders"](spark, str(tmp_path)).collect()
    }
    assert out == {"1-URGENT": 1, "5-LOW": 1}


def test_promo_share_conditional_and_null_month(spark, tmp_path):
    """Promo share is numerator/denominator from one agg; a month with
    no promo revenue yields NULL share; lines whose part is missing
    from the dim are dropped by the inner join."""
    from snowav_spark.contract import QUERIES

    _plant(
        spark, tmp_path, "part",
        [(1, "PROMO"), (2, "STANDARD")],
        ["p_partkey", "p_type"],
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, 100.0, 0.0, TS(2024, 1, 5)),
            (2, 300.0, 0.0, TS(2024, 1, 6)),
            (2, 50.0, 0.0, TS(2024, 2, 1)),
            (9, 999.0, 0.0, TS(2024, 2, 2)),   # no matching part
        ],
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    out = {
        r.month: (r.promo_rev, r.total_rev, r.promo_share)
        for r in QUERIES["q_promo_share"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01": (100.0, 400.0, 0.25),
        "2024-02": (None, 50.0, None),
    }


def test_fanout_profile_zero_bucket(spark, tmp_path):
    """Orders with no lines land in the n_lines=0 bucket; multi-line
    orders bucket by their exact count."""
    from snowav_spark.contract import QUERIES

    _plant(
        spark, tmp_path, "orders",
        [(1,), (2,), (3,), (4,)], ["o_orderkey"],
    )
    _plant(
        spark, tmp_path, "lineitem",
        [(1,), (1,), (1,), (2,), (3,)], ["l_orderkey"],
    )
    out = {
        r.n_lines: r.n_orders
        for r in QUERIES["q_fanout_profile"](spark, str(tmp_path)).collect()
    }
    assert out == {0: 1, 1: 2, 3: 1}


def test_rolling_median_odd_even_frames(spark, tmp_path):
    """Growing frames: day1 [3]→3.0; day2 [1,3]→2.0 (mean of middles);
    day3 [1,2,3]→2.0 (exact middle, outlier-robust vs the mean 2.67)."""
    from snowav_spark.contract import QUERIES

    rows = (
        [(TS(2024, 1, 1, h), "a") for h in range(3)]
        + [(TS(2024, 1, 2, 9), "a")]
        + [(TS(2024, 1, 3, h), "a") for h in range(2)]
    )
    spark.createDataFrame(rows, ["ts", "event_type"]).coalesce(
        1
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.day.day: (r.cnt, r.med7)
        for r in QUERIES["q_rolling_median"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (3, 3.0), 2: (1, 2.0), 3: (2, 2.0)}


def test_pagerank_exact_cycle_uniform_and_bounded(spark):
    """Integer micro-mass PageRank: a symmetric cycle stays exactly
    uniform (bit-identical integer ranks), and total mass never exceeds
    the initial pool (floors only shed mass, deterministically)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["s", "d"]
    )
    total = 10**12
    pr = graph.pagerank_exact(edges, "s", "d", iters=5, total_mass=total)
    ranks = [r.rank for r in pr.collect()]
    assert len(ranks) == 3
    assert len(set(ranks)) == 1  # exact uniformity, not approximate
    assert sum(ranks) <= total
    assert sum(ranks) >= total - 3 * 5 * 10  # bounded floor leakage


def test_pagerank_exact_dangling_mass_recycled(spark):
    """A sink node's mass must flow back: with a->b only, b is dangling;
    without recycling b's rank would grow unboundedly relative to a."""
    edges = spark.createDataFrame([("a", "b")], ["s", "d"])
    pr = {r.node: r.rank for r in graph.pagerank_exact(edges, "s", "d", iters=10).collect()}
    assert pr["b"] > pr["a"] > 0
    assert pr["a"] + pr["b"] <= 10**12
