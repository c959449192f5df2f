"""Single-scan data-quality expectations (ops/expectations.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from snowav_spark.ops import expectations as ex


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "en", 0.9, "d1"),
        (2, "en", 0.4, "d2"),
        (3, "de", 1.5, "d3"),  # quality out of range
        (3, "fr", 0.2, "d4"),  # duplicate id
        (None, "xx", 0.5, "bad"),  # null id, lang not allowed, bad pattern
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "quality", "tag"])


def test_report_rows_and_verdicts(df):
    report = {
        r.rule: r
        for r in ex.check(
            df,
            [
                ex.not_null("doc_id"),
                ex.unique("doc_id"),
                ex.in_range("quality", 0.0, 1.0),
                ex.in_set("lang", ["en", "de", "fr"]),
                ex.matches("tag", r"^d[0-9]+$"),
                ex.min_rows(3),
                ex.max_null_fraction("doc_id", 0.5),
            ],
        ).collect()
    }
    assert not report["not_null(doc_id)"].passed
    assert report["not_null(doc_id)"].violations == 1
    assert not report["unique(doc_id)"].passed
    assert report["unique(doc_id)"].violations == 1  # 4 non-null, 3 distinct
    assert not report["in_range(quality,0,1)"].passed
    assert report["in_range(quality,0,1)"].violations == 1
    assert not report["in_set(lang)"].passed
    assert not report["matches(tag)"].passed
    assert report["min_rows(3)"].passed
    assert report["min_rows(3)"].observed == 5
    assert report["max_null_fraction(doc_id,0.5)"].passed  # 1/5 ≤ 0.5


def test_single_scan_plan(df):
    """The whole suite must cost ONE aggregate pass — one scan node, no
    joins, regardless of rule count."""
    report = ex.check(
        df.write.mode("overwrite").parquet("/tmp/_ex_probe") or
        df.sparkSession.read.parquet("/tmp/_ex_probe"),
        [ex.not_null("doc_id"), ex.unique("doc_id"), ex.min_rows(1)],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        report.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_enforce_raises_with_detail(df):
    with pytest.raises(ValueError, match=r"not_null\(doc_id\): 1"):
        ex.enforce(df, [ex.not_null("doc_id"), ex.min_rows(1)])
    ex.enforce(df, [ex.min_rows(1)])  # passing suite is silent


def test_unique_approx_mode(spark):
    big = spark.range(1000).select(F.col("id").alias("k"))
    r = ex.check(big, [ex.unique("k", approx=True)]).collect()[0]
    # approx mode tolerates the estimator's own error band (rsd·n), so
    # a truly-unique column reports ZERO violations — no phantom dupes
    # from HLL under-estimates, and never negative
    assert r.violations == 0


def test_curate_input_expectations_gate(spark):
    """curate() with input_expectations fails fast on a malformed corpus
    before any curation stage runs."""
    from snowav_spark.pipeline_llm import CurationConfig, curate

    bad = spark.createDataFrame(
        [(1, "hello world"), (None, "x")], ["doc_id", "text"]
    )
    cfg = CurationConfig(
        input_expectations=(ex.not_null("doc_id"), ex.min_rows(1))
    )
    with pytest.raises(ValueError, match="not_null"):
        curate(bad, cfg)
