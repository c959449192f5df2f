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
