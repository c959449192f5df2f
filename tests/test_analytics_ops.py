"""Edge-case units for the round-4 analytics operators: rolling distinct
actives, transition counts, grouped top-k, fixed-point z-score outliers,
keep-best dup resolution, temperature-weighted mixing.

The contract gate (tests/test_contract.py) already hash-matches each
operator's contract key against DuckDB on the fixtures; these tests plant
the inputs the fixtures don't contain — duplicate texts, score ties,
activity gaps, constant-value groups, NULL order keys.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from snowav_spark.ops import dedup, sampling, scalars, windows


def _ts(d, h=0):
    return datetime.datetime(2024, 1, d, h)


# ---------------------------------------------------------------- rolling


def test_rolling_active_windows_and_gaps(spark):
    # users: u1 active days 1,2,10; u2 active day 2 only.
    ev = spark.createDataFrame(
        [
            (1, _ts(1), "a"),
            (1, _ts(1, 5), "a"),  # same user-day twice → counted once
            (1, _ts(2), "a"),
            (2, _ts(2), "a"),
            (1, _ts(10), "a"),
        ],
        ["user_id", "ts", "event_type"],
    )
    out = {
        r["day"].isoformat(): r["active_users"]
        for r in windows.rolling_active(ev, "ts", "user_id", days=7).collect()
    }
    # only OBSERVED days appear — days 3..9 had no activity, so no rows,
    # even though day-1/2 activity would fall inside their trailing window.
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-10"}
    assert out["2024-01-01"] == 1          # u1
    assert out["2024-01-02"] == 2          # u1 + u2
    # day 10: window [4..10] — u1's day-10 activity only (days 1/2 expired)
    assert out["2024-01-10"] == 1


def test_rolling_active_dedups_across_window_days(spark):
    # u1 active on days 1 AND 3: day 3's window sees it twice but the
    # user must count once.
    ev = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(3)), (2, _ts(3))], ["user_id", "ts"]
    )
    out = {
        r["day"].isoformat(): r["active_users"]
        for r in windows.rolling_active(ev, "ts", "user_id", days=7).collect()
    }
    assert out["2024-01-03"] == 2


# ------------------------------------------------------------ transitions


def test_transition_counts_order_and_ties(spark):
    # u1: a(t1) -> b(t2) -> b(t2) tie broken by id -> c(t3)
    ev = spark.createDataFrame(
        [
            (1, _ts(1, 1), "a", 10),
            (1, _ts(1, 2), "b", 11),
            (1, _ts(1, 2), "b", 12),  # tie on ts with id 11
            (1, _ts(1, 3), "c", 13),
            (2, _ts(1, 1), "z", 20),  # single event → no transition
        ],
        ["user_id", "ts", "event_type", "event_id"],
    )
    out = {
        (r.from_type, r.next_type): r.n
        for r in windows.transition_counts(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert out == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1}


# ----------------------------------------------------------------- top-k


def test_topk_per_group_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [
            ("s1", 1, 100),
            ("s1", 2, 100),  # tie with id 1 → id 1 ranks first
            ("s1", 3, 50),
            ("s1", 4, None),  # NULL order key sorts last
            ("s2", 5, 7),
        ],
        ["source", "doc_id", "n_chars"],
    )
    out = windows.topk_per_group(df, "source", "n_chars", 3, "doc_id")
    got = {(r.source, r.doc_id): r.rnk for r in out.collect()}
    assert got == {
        ("s1", 1): 1,
        ("s1", 2): 2,
        ("s1", 3): 3,
        ("s2", 5): 1,
    }
    # k larger than the group: NULL-key row ranks last but IS included
    all4 = windows.topk_per_group(df, "source", "n_chars", 4, "doc_id")
    got4 = {(r.source, r.doc_id): r.rnk for r in all4.collect()}
    assert got4[("s1", 4)] == 4


def test_topk_per_group_null_tiebreak(spark):
    """ADVICE r4: a NULL TIEBREAK value must rank last (DuckDB ASC
    default), not first (Spark ASC default) — regression for the
    .asc() → .asc_nulls_last() fix."""
    df = spark.createDataFrame(
        [("s1", None, 100), ("s1", 2, 100), ("s1", 3, 100)],
        ["source", "doc_id", "n_chars"],
    )
    got = {
        r.doc_id: r.rnk
        for r in windows.topk_per_group(
            df, "source", "n_chars", 3, "doc_id"
        ).collect()
    }
    assert got == {2: 1, 3: 2, None: 3}


# ---------------------------------------------------------------- z-score


def test_zscore_outlier_flags_planted_outlier(spark):
    # a lone outlier's own z is bounded by sqrt(n-1) (it inflates the
    # stddev it is judged against), so give it 30 inliers: z ≈ 5.5 > 3.
    vals = [("g", 10.0 + (i % 3 - 1)) for i in range(30)]
    vals.append(("g", 1000.0))  # the outlier
    vals.append(("const", 5.0))
    vals.append(("const", 5.0))  # zero-variance group
    vals.append(("g", None))  # NULLs excluded from n and moments
    df = spark.createDataFrame(vals, ["event_type", "value"])
    out = {
        r.event_type: r
        for r in scalars.zscore_outlier_stats(
            df, "event_type", "value", 3.0
        ).collect()
    }
    assert out["g"].n == 31  # 30 inliers + outlier; NULL excluded
    assert out["g"].n_outliers == 1
    # constant group: var clamps to ≥0, stddev 0, strict > → no outliers
    assert out["const"].n == 2
    assert out["const"].n_outliers == 0
    assert out["const"].stddev_value == 0.0
    assert math.isclose(out["const"].mean_value, 5.0)


def test_zscore_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    rows = [("t", rng.uniform(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    a = scalars.zscore_outlier_stats(df, "event_type", "value").collect()
    b = scalars.zscore_outlier_stats(
        df.repartition(13), "event_type", "value"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# -------------------------------------------------------------- keep-best


def test_keep_best_survivor_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "dup text", 10),
            (2, "dup text", 30),   # best score → survivor
            (3, "dup text", 30),   # tie → lower id (2) wins
            (4, "unique", 5),
            (5, None, 99),         # NULL text excluded entirely
        ],
        ["doc_id", "text", "n_chars"],
    )
    out = {
        r.kept_id: r
        for r in dedup.keep_best(df, "doc_id", "text", "n_chars").collect()
    }
    assert set(out) == {2, 4}
    assert out[2].n_copies == 3
    assert out[2].best_score == 30
    assert out[4].n_copies == 1


# ------------------------------------------------------------ temperature


def test_temperature_balance_rates_and_membership(spark):
    rows = [(i, "big") for i in range(400)] + [
        (i, "small") for i in range(400, 500)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sampling.temperature_balance(df, "doc_id", "source")
    per = {
        r.source: r
        for r in kept.groupBy("source")
        .agg(F.first("_rate").alias("rate"), F.count("*").alias("n"))
        .collect()
    }
    # smallest source keeps everything (rate exactly 1.0)
    assert per["small"].rate == 1.0
    assert per["small"].n == 100
    # big source: rate sqrt(100/400) = 0.5 — between full balance (0.25)
    # and none (1.0); kept count near 200
    assert math.isclose(per["big"].rate, 0.5)
    assert abs(per["big"].n - 200) < 40
    # determinism under partitioning
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in sampling.temperature_balance(
            df.repartition(7), "doc_id", "source"
        )
        .select("doc_id")
        .collect()
    )
    assert a == b


# --------------------------------------------------------- global deciles


def test_global_quantile_cuts_exact_order_stats(spark):
    # values 1..10 once each, q=5 → thresholds ceil(k*10/5) = 2,4,6,8
    # → cuts are the 2nd,4th,6th,8th order statistics = 2,4,6,8.
    df = spark.createDataFrame([(i,) for i in range(1, 11)], ["v"])
    cuts = {
        r.k: r.cut
        for r in sampling.global_quantile_cuts(df, "v", q=5).collect()
    }
    assert cuts == {1: 2, 2: 4, 3: 6, 4: 8}


def test_global_quantile_cuts_max_domain_guard(spark):
    """VERDICT r4 item 3: the exact frequency-table plan is only safe
    while the value domain is small — exceeding max_domain must fail
    loudly (in-plan assert_true), not silently funnel a huge frequency
    table through one reducer."""
    import pytest

    df = spark.range(100).select(F.col("id").alias("v"))
    with pytest.raises(Exception, match="max_domain"):
        sampling.global_quantile_cuts(df, "v", q=4, max_domain=50).collect()
    # at/below the bound the same data passes
    ok = sampling.global_quantile_cuts(df, "v", q=4, max_domain=100)
    assert {r.k: r.cut for r in ok.collect()} == {1: 24, 2: 49, 3: 74}


def test_global_decile_assign_boundary_mass_stays_low(spark):
    # heavy tie mass AT a cut: 8×5 then 2×9, q=2 → threshold ceil(10/2)=5
    # → cut = 5; tile = 1 + #{cuts < x}: all the 5s stay in tile 1.
    rows = [(5,)] * 8 + [(9,), (9,)]
    df = spark.createDataFrame(rows, ["v"])
    out = sampling.global_decile_assign(df, "v", q=2)
    got = {
        (r.v, r.tile): r.n
        for r in out.groupBy("v", "tile").agg(F.count("*").alias("n")).collect()
    }
    assert got == {(5, 1): 8, (9, 2): 2}


def test_global_decile_assign_partitions_everything(spark, sf_dir):
    from snowav_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    tiled = sampling.global_decile_assign(docs, "n_chars", q=10)
    n_in = docs.filter(F.col("n_chars").isNotNull()).count()
    assert tiled.count() == n_in
    tiles = sorted(
        r.tile for r in tiled.select("tile").distinct().collect()
    )
    assert tiles[0] >= 1 and tiles[-1] <= 10
    # tiles are near-balanced: every tile within ±1% of N/10 + tie slack
    per = [r.n for r in tiled.groupBy("tile").agg(F.count("*").alias("n")).collect()]
    assert max(per) - min(per) < n_in * 0.1 + 10


def test_keep_best_null_scores_match_oracle_semantics(spark, duck):
    """NULL scores: Spark's max_by(struct) treats a NULL field as
    smallest — the same survivor DuckDB's row_number ORDER BY score DESC
    (nulls last by default) picks; an all-NULL cluster falls back to the
    lowest id in both.  Probed empirically; pinned here so an engine
    upgrade that changes struct-NULL ordering fails loudly."""
    df = spark.createDataFrame(
        [
            (1, "t", None),
            (2, "t", 5),
            (3, "t", None),
            (4, "u", None),
            (5, "u", None),
        ],
        ["doc_id", "text", "n_chars"],
    )
    got = sorted(
        map(tuple, dedup.keep_best(df, "doc_id", "text", "n_chars").collect())
    )
    want = sorted(
        duck.execute(
            """
            SELECT digest, count(*) AS n_copies,
                   max(CASE WHEN rn = 1 THEN doc_id END) AS kept_id,
                   max(n_chars) AS best_score
            FROM (SELECT md5(text) AS digest, doc_id, n_chars,
                         row_number() OVER (PARTITION BY md5(text)
                                            ORDER BY n_chars DESC,
                                                     doc_id ASC) AS rn
                  FROM (VALUES (1,'t',NULL),(2,'t',5),(3,'t',NULL),
                               (4,'u',NULL),(5,'u',NULL))
                       t(doc_id, text, n_chars)
                  WHERE text IS NOT NULL)
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------- span dedup


def test_span_dup_stats_planted_spans(spark):
    # doc1 & doc2 share the 5-gram "a b c d e"; doc3 is all-unique;
    # doc4 repeats the shared span twice (both positions must count);
    # doc5 is too short for any 5-gram → not emitted.
    df = spark.createDataFrame(
        [
            (1, "a b c d e x y"),        # spans: 3, dup: 1 (position 0)
            (2, "q a b c d e"),          # spans: 2, dup: 1 (position 1)
            (3, "u1 u2 u3 u4 u5 u6"),    # spans: 2, dup: 0
            (4, "a b c d e a b c d e"),  # 6 spans; 'a b c d e' at 0 and 5
            (5, "too short"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac)
        for r in dedup.span_dup_stats(df, "doc_id", "text", n=5).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (3, 1, round(1 / 3, 6))
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (2, 0, 0.0)
    # doc4: within-doc repeat alone is NOT cross-doc dup — but the span
    # is shared with docs 1/2, so both its positions count; the interior
    # spans ("b c d e a" etc.) are unique to doc4.
    assert out[4] == (6, 2, round(2 / 6, 6))


# --------------------------------------------------------------- gap fill


def test_gap_fill_daily_planted_gaps(spark):
    # group g: days 1, 4 observed → spine 1..4, days 2-3 forward-filled.
    # group h: single day → spine of one, nothing to fill.
    ev = spark.createDataFrame(
        [
            ("g", _ts(1), 10.0),
            ("g", _ts(1, 6), 20.0),   # day-1 mean = 15
            ("g", _ts(4), 40.0),
            ("h", _ts(2), 7.0),
        ],
        ["event_type", "ts", "value"],
    )
    out = {
        (r.event_type, r.day.day): (r.mean_value, r.filled_value)
        for r in windows.gap_fill_daily(
            ev, "ts", "event_type", "value"
        ).collect()
    }
    assert out[("g", 1)] == (15.0, 15.0)
    assert out[("g", 2)] == (None, 15.0)   # hole: carried forward
    assert out[("g", 3)] == (None, 15.0)
    assert out[("g", 4)] == (40.0, 40.0)
    assert out[("h", 2)] == (7.0, 7.0)
    assert len(out) == 5  # spine bounded by each group's own min..max


# ------------------------------------------------------- random projection


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property, measured: project 64→16 dims and check (a) exact
    shape/determinism, (b) pairwise squared distances correlate strongly
    with the originals on real fixture embeddings."""
    import numpy as np

    from snowav_spark.io import load_table
    from snowav_spark.ops import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    proj = similarity.random_projection(
        emb, "vec_id", "embedding", dim=64, out_dim=16
    )
    rows = {r.vec_id: (list(r.embedding), list(r.proj)) for r in proj.collect()}
    assert all(len(p) == 16 for _, p in rows.values())
    # determinism under different partitioning
    again = {
        r.vec_id: list(r.proj)
        for r in similarity.random_projection(
            emb.repartition(7), "vec_id", "embedding", 64, 16
        ).collect()
    }
    assert all(again[k] == p for k, (_, p) in rows.items())

    ids = sorted(rows)[:60]
    orig = np.array([rows[i][0] for i in ids])
    prj = np.array([rows[i][1] for i in ids])
    d_o, d_p = [], []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d_o.append(((orig[a] - orig[b]) ** 2).sum())
            d_p.append(((prj[a] - prj[b]) ** 2).sum())
    # i.i.d. fixture vectors concentrate all pairwise distances near one
    # value (high-dim concentration), so CORRELATION is uninformative
    # here — the JL guarantee is the unbiased ratio, asserted tightly:
    ratio = np.mean(np.array(d_p) / np.array(d_o))
    assert 0.8 < ratio < 1.2, ratio


def test_random_projection_collision_guard(spark):
    """ADVICE r4: inputs already containing the _rpv helper or out_col
    must be rejected loudly instead of producing ambiguous/wrong
    projections."""
    import pytest

    from snowav_spark.ops import similarity

    base = spark.createDataFrame(
        [(1, [0.0] * 4)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="_rpv"):
        similarity.random_projection(
            base.withColumn("_rpv", F.lit(1)), "vec_id", "embedding", 4, 2
        )
    with pytest.raises(ValueError, match="proj"):
        similarity.random_projection(
            base.withColumn("proj", F.lit(1)), "vec_id", "embedding", 4, 2
        )
    # non-colliding out_col on the same frame is fine
    ok = similarity.random_projection(
        base.withColumn("proj", F.lit(1)),
        "vec_id",
        "embedding",
        4,
        2,
        out_col="proj2",
    )
    assert ok.columns[-1] == "proj2"


def test_random_projection_separates_clustered_data(spark):
    """On data with real distance structure (tight triplets, far-apart
    cluster centers) the projected distances must still separate
    near pairs from far pairs — the property LSH/k-means composition
    relies on."""
    import numpy as np

    from snowav_spark.ops import similarity

    rng = np.random.RandomState(0)
    rows = []
    for c in range(10):
        center = rng.randn(64) * 5.0
        for j in range(3):
            v = center + rng.randn(64) * 0.05
            rows.append((c * 3 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = {
        r.vec_id: np.array(r.proj)
        for r in similarity.random_projection(
            df, "vec_id", "embedding", 64, 16
        ).collect()
    }
    within, across = [], []
    for a in range(30):
        for b in range(a + 1, 30):
            d = float(((proj[a] - proj[b]) ** 2).sum())
            (within if a // 3 == b // 3 else across).append(d)
    # every within-triplet distance below every cross-cluster distance
    assert max(within) < min(across)


# ------------------------------------------------- review-fix regressions


def test_rolling_active_null_user_only_day_emits_nothing(spark):
    """A day whose events are ALL NULL-user is not an observed day —
    matches the oracle's WHERE user_id IS NOT NULL in the innermost CTE
    (without that filter the SQL side would emit the day with other
    users' window counts while Spark drops it)."""
    ev = spark.createDataFrame(
        [(1, _ts(1)), (None, _ts(5))], ["user_id", "ts"]
    )
    out = {
        r["day"].day: r["active_users"]
        for r in windows.rolling_active(ev, "ts", "user_id", days=7).collect()
    }
    assert out == {1: 1}


def test_keep_best_rejects_non_numeric_ids(spark):
    import pytest

    df = spark.createDataFrame(
        [("doc-1", "t", 5), ("doc-2", "t", 9)], ["doc_id", "text", "n"]
    )
    with pytest.raises(ValueError, match="integral id"):
        dedup.keep_best(df, "doc_id", "text", "n")


def test_zscore_all_nan_group_counts_zero_outliers(spark):
    """NULL moments (all-NaN group) must yield n_outliers 0, not NULL —
    the oracle's CASE ... ELSE 0 says so, and a bare boolean cast would
    propagate NULL through the sum on the Spark side only."""
    df = spark.createDataFrame(
        [("bad", float("nan")), ("bad", float("nan")), ("ok", 1.0), ("ok", 2.0)],
        ["event_type", "value"],
    )
    out = {
        r.event_type: r
        for r in scalars.zscore_outlier_stats(df, "event_type", "value").collect()
    }
    assert out["bad"].n_outliers == 0
    assert out["bad"].mean_value is None
    assert out["ok"].n_outliers == 0


def test_morton_key_survives_null_columns(spark, tmp_path):
    from snowav_spark import sinks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a long, b long"
    )
    # all-NULL clustering column: constant dimension, not a crash
    keyed = df.withColumn("k", sinks.morton_key(df, ["a", "b"], 8))
    ks = [r.k for r in keyed.collect()]
    assert all(k is not None for k in ks)
    # partial NULLs: NULL cells cluster at the curve origin, key non-NULL
    df2 = spark.createDataFrame(
        [(1, 10), (2, None), (300, 20)], ["a", "b"]
    )
    ks2 = {r.a: r.k for r in df2.withColumn(
        "k", sinks.morton_key(df2, ["a", "b"], 8)).collect()}
    assert all(k is not None for k in ks2.values())


def test_curate_rejects_unknown_survivor_mode(spark):
    import pytest

    from snowav_spark.pipeline_llm import CurationConfig, curate

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="exact_survivor"):
        curate(df, CurationConfig(exact_survivor="keep-best"))


# ------------------------------------------------------------ burst dedup


def test_first_per_burst_chains_and_gaps(spark):
    import datetime as dt

    def t(m, s=0):
        return dt.datetime(2024, 1, 1, 12, m, s)

    ev = spark.createDataFrame(
        [
            (1, 1, "a", t(0)),
            (2, 1, "a", t(3)),    # within 5 min of #1 → dropped
            (3, 1, "a", t(7)),    # within 5 of #2 (chain!) → dropped
            (4, 1, "a", t(20)),   # new burst → kept
            (5, 1, "b", t(1)),    # different key → its own burst
            (6, 2, "a", t(2)),    # different user → its own burst
            (7, 1, "a", t(20)),   # exact tie with #4: id 4 is opener
        ],
        ["event_id", "user_id", "event_type", "ts"],
    )
    kept = sorted(
        r.event_id
        for r in windows.first_per_burst(
            ev, ["user_id", "event_type"], "ts", 5, "event_id"
        ).collect()
    )
    # chain semantics: each event within gap of its PREDECESSOR extends
    # the burst, so #3 dies even though it is >5 min from opener #1
    assert kept == [1, 4, 5, 6]


# ---------------------------------------------------------- overlap matrix


def test_overlap_matrix_symmetry_and_diagonal(spark, sf_dir):
    """The co-occurrence matrix must be symmetric, its diagonal must be
    the per-segment distinct-user counts, and off-diagonal cells can
    never exceed either diagonal."""
    import __spark_entry__ as entrymod

    m = {
        (r.type_a, r.type_b): r.n_users
        for r in entrymod.queries()["q_overlap_matrix"](
            spark, sf_dir
        ).collect()
    }
    types = sorted({a for a, _ in m})
    for a in types:
        for b in types:
            assert m[(a, b)] == m[(b, a)]
            if a != b:
                assert m[(a, b)] <= min(m[(a, a)], m[(b, b)])


# -------------------------------------------------------------- fuzzy join


def test_fuzzy_join_finds_typos_and_respects_distance(spark):
    from snowav_spark.ops import joins

    canon = spark.createDataFrame(
        [(1, "ALGERIA"), (2, "ARGENTINA"), (3, "PERU")], ["cid", "name"]
    )
    dirty = spark.createDataFrame(
        [
            (10, "ALGERIA"),    # exact → dist 0
            (11, "ALGERIE"),    # 1 edit
            (12, "AGENTINA"),   # 1 deletion from ARGENTINA
            (13, "BRAZIL"),     # no match within 2
            (14, "PE"),         # shorter than a trigram → whole-string gram
        ],
        ["did", "name"],
    )
    out = {
        (r.did, r.cid): r.dist
        for r in joins.fuzzy_join(
            dirty, canon, "did", "cid", "name", "name", max_dist=2
        ).collect()
    }
    assert out[(10, 1)] == 0
    assert out[(11, 1)] == 1
    assert out[(12, 2)] == 1
    assert not any(d == 13 for d, _ in out)
    # "PE" blocks on its whole-string gram, which matches no trigram of
    # "PERU" → correctly absent (documented short-string limitation)
    assert not any(d == 14 for d, _ in out)


def test_fuzzy_join_max_df_drops_hot_grams(spark):
    from snowav_spark.ops import joins

    # every name shares the hot prefix "cust-"; with max_df=2 the
    # prefix grams are dropped from blocking and only the suffix grams
    # (unique per pair) can block
    canon = spark.createDataFrame(
        [(i, f"cust-{chr(97 + i) * 4}") for i in range(20)], ["cid", "name"]
    )
    dirty = spark.createDataFrame(
        [(100 + i, f"cust-{chr(97 + i) * 4}x") for i in range(20)],
        ["did", "name"],
    )
    out = joins.fuzzy_join(
        dirty, canon, "did", "cid", "name", "name",
        max_dist=2, max_df=2,
    )
    got = {(r.did, r.cid) for r in out.collect()}
    # each dirty row still finds its canonical twin via suffix grams
    assert {(100 + i, i) for i in range(20)} <= got


def test_fuzzy_join_colliding_key_and_value_names(spark):
    """Every name-collision combination must work: both keys 'id', and a
    value column named like the other side's key."""
    from snowav_spark.ops import joins

    left = spark.createDataFrame([(1, "ALGERIA")], ["id", "name"])
    right = spark.createDataFrame([(7, "ALGERIE")], ["id", "name"])
    out = joins.fuzzy_join(left, right, "id", "id", "name", "name", 2)
    assert out.columns == ["l_id", "r_id", "l_name", "r_name", "dist"]
    row = out.collect()[0]
    assert (row.l_id, row.r_id, row.dist) == (1, 7, 1)

    # value column named like the right key
    l2 = spark.createDataFrame([(1, "PERUU")], ["lid", "name"])
    r2 = spark.createDataFrame([("PERU", "x")], ["name", "other"])
    out2 = joins.fuzzy_join(l2, r2, "lid", "name", "name", "name", 2)
    # keys distinct ('lid' vs 'name'); values collide with each other →
    # l_/r_ prefixed; r_key 'name' stays
    assert set(out2.columns) == {"lid", "name", "l_name", "r_name", "dist"}
    assert out2.count() == 1


def test_fuzzy_join_max_df_counts_both_sides(spark):
    """A gram hot only on the RIGHT side must also be dropped from
    blocking (previously only left-side document frequency was capped)."""
    from snowav_spark.ops import joins

    left = spark.createDataFrame([(1, "zzzq")], ["did", "name"])
    # right: many names sharing gram 'zzz' — hot on the right only
    right = spark.createDataFrame(
        [(i, f"zzz{chr(97 + i)}") for i in range(10)], ["cid", "name"]
    )
    out = joins.fuzzy_join(
        left, right, "did", "cid", "name", "name", max_dist=2, max_df=3
    )
    # 'zzz' dropped (right df=10 > 3); remaining left grams 'zzq' match
    # nothing → no candidates at all, NOT 10 near-cartesian candidates
    assert out.count() == 0


def test_keep_best_accepts_decimal_ids_and_names_missing_column(spark):
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "t", 5), (2, "t", 9)], ["doc_id", "text", "n"]
    ).withColumn("doc_id", F.col("doc_id").cast("decimal(38,0)"))
    out = dedup.keep_best(df, "doc_id", "text", "n").collect()
    assert out[0].kept_id == 2
    with pytest.raises(ValueError, match="no column"):
        dedup.keep_best(df, "nope", "text", "n")


# ------------------------------------------------------------- drift bins


def test_drift_bins_feed_psi(spark, sf_dir):
    """PSI computed from the exact-count frame: identical windows give
    PSI ~ 0; a shifted synthetic current window gives PSI > threshold.
    (The contract key keeps ln() out of the hash-matched frame — PSI is
    this 10-row driver-side reduction.)"""
    import math as m

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_drift_bins"](spark, sf_dir).collect()
    assert sum(r.n_ref for r in rows) > 0 and sum(r.n_cur for r in rows) > 0

    def psi(pairs):
        out = 0.0
        for p, q_ in pairs:
            p, q_ = max(p, 1e-6), max(q_, 1e-6)
            out += (p - q_) * m.log(p / q_)
        return out

    # fixture halves come from the same generator → tiny drift
    assert psi([(r.rate_ref, r.rate_cur) for r in rows]) < 0.1
    # planted shift: current = reference bins moved up one → large PSI
    shifted = [(r.rate_ref, 0.0) for r in rows]
    assert psi(shifted) > 0.5


def test_triangle_stats_matches_brute_force(spark):
    """Degree-oriented wedge closing counts every triangle exactly once:
    verified against a pure-Python brute force on K4, a path, a messy
    multigraph (dups, reversed edges, self-loops), and a random graph."""
    import random
    from itertools import combinations

    from snowav_spark.ops import graph

    def brute(edges):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        vs = sorted({v for e in es for v in e})
        tri = sum(
            1
            for a, b, c in combinations(vs, 3)
            if (a, b) in es and (a, c) in es and (b, c) in es
        )
        deg = {v: 0 for v in vs}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        wed = sum(d * (d - 1) // 2 for d in deg.values())
        return len(vs), len(es), wed, tri

    rng = random.Random(7)
    cases = [
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],  # K4
        [(1, 2), (2, 3), (3, 4)],  # path: 0 triangles
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3)],  # dups + self-loop
        [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(60)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        r = graph.triangle_stats(df).collect()[0]
        assert (
            r.n_vertices, r.n_edges, r.n_wedges, r.n_triangles
        ) == brute(edges)
        if r.n_wedges:
            assert r.clustering == round(
                3.0 * r.n_triangles / r.n_wedges, 6
            )


def test_graph_moments_survive_int64_overflow(spark):
    """The graph moment kernels must stay exact where raw int64
    products wrap: degrees ~5e9 make d*(d-1) and sx*sx exceed 2^63.
    Pins VERDICT r7 item 2 — decimal(38,0) accumulation in Spark,
    HUGEINT in the DuckDB oracle.

    (a) the wedge-sum expression used by triangle_stats;
    (b) endpoint_assortativity on synthetic huge-degree pairs, checked
        against exact Python bigint moments.
    """
    import math

    from snowav_spark.ops import graph

    # (a) wedge expression: d = 5e9 -> d*(d-1) = 2.5e19 > 2^63 ~ 9.2e18
    big_ds = [5_000_000_000, 4_999_999_999, 3]
    df = spark.createDataFrame([(d,) for d in big_ds], "d long")
    got = df.agg(
        F.sum(
            F.expr("CAST(d AS DECIMAL(38,0)) * (d - 1) / 2").cast(
                "decimal(38,0)"
            )
        ).alias("w")
    ).collect()[0].w
    assert int(got) == sum(d * (d - 1) // 2 for d in big_ds)

    # (b) assortativity with degrees around 4e9: sxx ~ 3e19 per row and
    # sx*sx ~ 1e39-scale products would wrap a long many times over
    pairs = [
        (4_000_000_000, 3_900_000_000),
        (3_900_000_000, 4_000_000_000),
        (4_100_000_000, 2),
        (2, 4_100_000_000),
        (7, 11),
        (11, 7),
    ]
    ep = spark.createDataFrame(pairs, "x long, y long")
    row = graph.endpoint_assortativity(ep).collect()[0]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    want = round(
        float(m * sxy - sx * sy)
        / math.sqrt(float(m * sxx - sx * sx))
        / math.sqrt(float(m * syy - sy * sy)),
        6,
    )
    assert row.n_endpoints == m
    assert row.assortativity == want


def test_k_core_matches_brute_force(spark):
    """Iterative peeling reaches the exact k-core fixpoint: verified
    against Python brute force for k ∈ {2,3,4} on a triangle-with-tail,
    a clique, a path that peels to empty, and a random multigraph."""
    import random

    from snowav_spark.ops import graph

    def brute(edges, k):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            weak = {v for v, d in deg.items() if d < k}
            if not weak:
                return deg
            es = {
                (a, b) for a, b in es if a not in weak and b not in weak
            }
            if not es:
                return {}

    rng = random.Random(13)
    cases = [
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],
        [(a, b) for a in range(5) for b in range(a + 1, 5)],  # K5
        [(1, 2), (2, 3), (3, 4)],  # peels to empty at k=2
        [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(50)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        for k in (2, 3, 4):
            got = {
                r.vertex: r.degree for r in graph.k_core(df, k).collect()
            }
            assert got == brute(edges, k)


def test_k_core_long_chain_and_budget_raise(spark):
    """A triangle with a 40-vertex tail peels ~20 rounds before the
    2-core (the triangle) remains — the fixpoint must be exact, never a
    silently-empty frame; an insufficient max_rounds raises loudly."""
    import pytest

    from snowav_spark.ops import graph

    tail = [(i, i + 1) for i in range(3, 43)]  # 3-4-5-...-43
    edges = [(1, 2), (2, 3), (1, 3)] + tail
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.degree for r in graph.k_core(df, 2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.k_core(df, 2, max_rounds=3)
