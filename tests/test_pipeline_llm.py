"""End-to-end curation pipeline: planted junk, exact twins, and near-dup
chains must each be removed by the right stage, and the survivors must be
packed completely."""

from __future__ import annotations

import pytest

from snowav_spark.pipeline_llm import CurationConfig, curate


@pytest.fixture(scope="module")
def corpus(spark):
    base = "quick brown fox jumps over the lazy dog near the river bank today again"
    rows = [
        (0, base),
        (1, base + "."),                        # normalized-exact twin of 0
        (2, base.replace("today", "tonight")),  # near-dup of 0
        (3, "an entirely different document about spark catalyst tungsten engines"),
        (4, "a a a a the the the a a the"),     # all stopwords → low quality
        (5, "https://spam.example/now?ref=1"),  # URL-only → empty after clean
        (6, "contact me at bob@example.com for more information about engines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_stages(corpus):
    res = curate(
        corpus,
        CurationConfig(
            min_quality=0.5, jaccard_threshold=0.5, pack_capacity=64,
            pack_shards=2,
        ),
        count_stages=True,
    )
    kept = sorted(r.doc_id for r in res.corpus.collect())
    # 1 dies to exact dedup (twin of 0), 2 to near-dedup, 4 to quality,
    # 5 to empty-after-clean; 0, 3, 6 survive
    assert kept == [0, 3, 6]
    # the survivor map records 2's canonical
    m = {r.doc_id: r.canonical_id for r in res.survivors_map.collect()}
    assert m[2] == 0
    # PII never reaches the curated corpus
    texts = " ".join(r._clean for r in res.corpus.collect())
    assert "bob" not in texts and "email" in texts
    # every survivor is packed exactly once
    packed_ids = sorted(r.doc_id for r in res.packed.collect())
    assert packed_ids == kept
    assert res.stage_counts["raw"] == 7


def test_curate_observe_counts_match_eager_counts(corpus, tmp_path):
    """count_stages="observe" rides the sink write (zero extra scans —
    CollectMetrics nodes in the same plan) and reports the same stage
    counts the eager count_stages=True run materializes."""
    cfg = CurationConfig(
        min_quality=0.5, jaccard_threshold=0.5, pack_capacity=64,
        pack_shards=2,
    )
    eager = curate(corpus, cfg, count_stages=True)
    res = curate(corpus, cfg, count_stages="observe")
    assert res.stage_counts == {}  # nothing materialized yet
    # the caller's own action — one corpus write — fills every upstream
    # observation
    res.corpus.write.mode("overwrite").parquet(str(tmp_path / "c"))
    got = res.observed_counts()
    assert got == eager.stage_counts
    assert got["raw"] == 7


def test_curate_lang_gate(spark):
    en = "the quick brown fox jumps over the lazy dog and the cat watches them"
    rows = [(0, en), (1, en.replace("the", "der").replace("and", "und"))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = curate(
        df,
        CurationConfig(min_quality=-100.0, keep_langs=("en",),
                       jaccard_threshold=0.99, pack_shards=1),
    )
    assert [r.doc_id for r in res.corpus.collect()] == [0]


def test_curate_repetition_and_rule_gates(spark):
    rows = [
        (0, "a normally varied document with plenty of distinct useful words inside"),
        (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = curate(
        df,
        CurationConfig(
            min_quality=-100.0, max_dup_frac=0.5, rule_flags=True,
            jaccard_threshold=0.99, pack_shards=1,
        ),
    )
    assert [r.doc_id for r in res.corpus.collect()] == [0]


def test_curate_incremental_against_index(spark, corpus):
    from snowav_spark.ops import dedup

    # first run builds the corpus; its index feeds the second run
    first = curate(corpus, CurationConfig(jaccard_threshold=0.5))
    index = dedup.dedup_index(first.corpus, "doc_id", "_clean")
    batch = spark.createDataFrame(
        [
            (100, "quick brown fox jumps over the lazy dog near the river bank today again"),
            (101, "a brand new never before seen document about query planners"),
        ],
        ["doc_id", "text"],
    )
    res = curate(
        batch, CurationConfig(jaccard_threshold=0.5), corpus_index=index
    )
    assert sorted(r.doc_id for r in res.corpus.select("doc_id").collect()) == [101]


def test_curate_decontamination_gate(spark, corpus):
    eval_df = spark.createDataFrame(
        [(900, "an entirely different document about spark catalyst tungsten engines")],
        ["doc_id", "text"],
    )
    clean_cfg = CurationConfig(jaccard_threshold=0.5)
    base = curate(corpus, clean_cfg)
    base_ids = {r.doc_id for r in base.corpus.select("doc_id").collect()}
    assert 3 in base_ids  # present without the gate
    res = curate(corpus, clean_cfg, eval_df=eval_df, count_stages=True)
    ids = {r.doc_id for r in res.corpus.select("doc_id").collect()}
    assert 3 not in ids  # leaked doc dropped
    assert ids == base_ids - {3}
    assert res.stage_counts["decontaminated"] == len(ids)


def test_curate_keep_best_survivor(spark):
    """exact_survivor='best': the LONGEST member of a normalized-digest
    cluster survives instead of the lowest id."""
    base = "quick brown fox jumps over the lazy dog near the river today"
    rows = [
        (0, base),
        (1, base + "..."),  # same normalized text, longer raw capture
        (2, "an entirely different document about spark catalyst engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res_min = curate(df, CurationConfig(jaccard_threshold=0.99))
    res_best = curate(
        df, CurationConfig(jaccard_threshold=0.99, exact_survivor="best")
    )
    assert sorted(r.doc_id for r in res_min.corpus.collect()) == [0, 2]
    assert sorted(r.doc_id for r in res_best.corpus.collect()) == [1, 2]


def test_curate_balance_stages(spark):
    """balance='uniform'/'temperature': per-source downsampling after
    dedup, deterministic, rates ordered none ≥ temperature ≥ uniform."""
    rows = [
        (i, f"document number {i} with unique words w{i} x{i} y{i} z{i}",
         "big" if i < 160 else "small")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    cfg = dict(jaccard_threshold=0.99, min_quality=0.0)
    none = curate(df, CurationConfig(**cfg)).corpus.count()
    uni = curate(
        df, CurationConfig(**cfg, balance="uniform", balance_col="source")
    ).corpus
    temp = curate(
        df, CurationConfig(**cfg, balance="temperature", balance_col="source")
    ).corpus
    n_uni = uni.count()
    n_temp = temp.count()
    assert none == 200
    assert n_uni < n_temp < none  # sqrt-temperature keeps more than uniform
    # the balanced corpora still carry all columns (balance drops _rate)
    assert "_rate" not in uni.columns
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate(df, CurationConfig(**cfg, balance="nope"))


def test_curate_stream_cli_e2e_growing_dir_batch_parity(spark, tmp_path):
    """VERDICT r8 item 8: the user-facing composition — CLI
    ``curate-stream`` over a GROWING directory across two passes:
    ingest → in-horizon near-dup flag → corpus append → index append.
    Asserts (a) growth: pass 2 lands only the new window's docs,
    (b) flag-don't-drop: the near dup is present and flagged,
    (c) exact in-horizon twin died at the digest stage,
    (d) BATCH PARITY: searching the stream-maintained index equals a
    fresh batch build over the same curated corpus."""
    import datetime

    from snowav_spark import cli
    from snowav_spark.ops import text as t

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " changed"
    novel = " ".join(f"x{i}" for i in range(40))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 12, 30, 0)
    t2 = datetime.datetime(2024, 1, 1, 15, 0, 0)
    flush = datetime.datetime(2024, 1, 2, 6, 0, 0)
    cols = ["doc_id", "text", "ts"]
    src = str(tmp_path / "grow_in")
    out = str(tmp_path / "grow_out")

    def drop(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        assert cli.main([
            "curate-stream", "--input", src, "--output", out,
            "--text-index", "--index-buckets", "8",
            "--timeout", "180",
        ]) == 0

    # pass 0: every doc sits in the newest (still-open) window — the
    # documented normal first-run case must report an EMPTY pass, not
    # crash on the zero-row sink (round-9 review finding)
    drop([(0, base, t0), (1, near, t0), (2, base, t0)])
    run()
    import os

    # nothing emitted -> no corpus dir yet; the CLI reported rc 0 with
    # "0 rows" instead of crashing on the missing path
    assert not os.path.isdir(out + "/corpus")

    # pass 1: a later doc closes the first window
    drop([(3, novel, t2)])
    run()
    got = {r.doc_id: r for r in spark.read.parquet(out + "/corpus").collect()}
    assert set(got) == {0, 1}  # window(t0) closed by t2's arrival
    assert 2 not in got  # exact in-horizon twin: digest-deduped
    assert not got[0].near_dup_flag
    assert got[1].near_dup_flag and got[1].owned_bands < got[1].bands

    # pass 2: the directory GREW — only the t2 window's docs land
    drop([(4, "ducks on the calm lake today ok", flush)])
    run()
    got = {r.doc_id: r for r in spark.read.parquet(out + "/corpus").collect()}
    assert set(got) == {0, 1, 3}
    assert not got[3].near_dup_flag

    # batch parity: stream-maintained index == fresh build over the
    # same curated corpus (identical BM25 scores, any query)
    corpus = spark.read.parquet(out + "/corpus")
    rebuilt = str(tmp_path / "rebuilt_idx")
    t.build_text_index(corpus, "doc_id", "text", rebuilt, n_buckets=8)
    for query in (["w1"], ["x1", "changed"], ["w5", "x3"]):
        s = [
            (r.doc_id, round(r.bm25, 9))
            for r in t.search_text_index(
                spark, out + "/text_index", query, k=10
            ).collect()
        ]
        b = [
            (r.doc_id, round(r.bm25, 9))
            for r in t.search_text_index(
                spark, rebuilt, query, k=10
            ).collect()
        ]
        assert s == b and len(s) > 0
