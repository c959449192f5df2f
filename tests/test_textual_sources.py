"""JSONL / CSV corpus sources: schema-first read, corrupt-record
quarantine, JSONL round-trip (sources/textual.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from snowav_spark.sources import textual


GOOD = [
    '{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}',
    '{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5}',
    '{"doc_id": 3, "text": "uno dos tres", "lang": "es", "source": "s0", "n_chars": 12}',
]
BAD = [
    "this is not json at all",
    '{"doc_id": "NOT_A_NUMBER", "text": "typed wrong"}',
    '{"doc_id": 4, "text": "truncated...',
]


def _write_lines(path: str, lines: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_read_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "corpus")
    os.makedirs(p)
    _write_lines(os.path.join(p, "part-0.jsonl"), GOOD[:2] + BAD[:2])
    _write_lines(os.path.join(p, "part-1.jsonl"), [GOOD[2], BAD[2]])

    df = textual.read_jsonl(spark, p)
    good, bad = textual.split_quarantine(df)

    assert good.count() == 3
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 3]
    # marker column is stripped from the clean side
    assert textual.CORRUPT_COL not in good.columns

    badly = bad.collect()
    assert len(badly) == 3
    # every quarantined row preserves its raw line for auditing
    raw = {r[textual.CORRUPT_COL] for r in badly}
    assert BAD[0] in raw and BAD[1] in raw
    # clean rows feed the standard operators unchanged
    assert (
        good.groupBy("lang").count().filter(F.col("lang") == "en").first()["count"]
        == 1
    )


def test_jsonl_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    _write_lines(os.path.join(src, "d.jsonl"), GOOD)
    good, _ = textual.split_quarantine(textual.read_jsonl(spark, src))

    out = str(tmp_path / "out")
    textual.write_jsonl(good.repartition(2), out)
    back, back_bad = textual.split_quarantine(textual.read_jsonl(spark, out))
    assert back_bad.count() == 0
    assert sorted(r.doc_id for r in back.collect()) == [1, 2, 3]
    # one shard file per partition
    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == 2


def test_csv_read_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "csv")
    os.makedirs(p)
    _write_lines(
        os.path.join(p, "docs.csv"),
        [
            "doc_id,text,lang,source,n_chars",
            "1,alpha beta,en,s0,10",
            "oops,not a number,en,s0,xyz",
            "2,gamma,de,s1,5",
        ],
    )
    df = textual.read_csv_docs(spark, p)
    good, bad = textual.split_quarantine(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "oops" in bad.first()[textual.CORRUPT_COL]


def test_blank_lines_skipped_null_literal_quarantined(spark, tmp_path):
    """Blank/whitespace lines are separators (skipped, not phantom NULL
    docs); a bare `null` JSON literal parses to no record and must land
    in quarantine with the raw line (review finding)."""
    p = str(tmp_path / "blanky")
    os.makedirs(p)
    _write_lines(
        os.path.join(p, "d.jsonl"),
        [GOOD[0], "", "   ", GOOD[1], "null", ""],
    )
    good, bad = textual.split_quarantine(textual.read_jsonl(spark, p))
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert good.filter(F.col("doc_id").isNull()).count() == 0
    badly = bad.collect()
    assert len(badly) == 1
    assert badly[0][textual.CORRUPT_COL] == "null"


def test_explicit_schema_no_inference(spark, tmp_path):
    """The reader must take the declared schema verbatim (no inference
    pass): a field absent from the schema never surfaces."""
    p = str(tmp_path / "extra")
    os.makedirs(p)
    _write_lines(
        os.path.join(p, "d.jsonl"),
        ['{"doc_id": 9, "text": "x", "lang": "en", "source": "s", '
         '"n_chars": 1, "surprise_field": 42}'],
    )
    good, bad = textual.split_quarantine(textual.read_jsonl(spark, p))
    assert bad.count() == 0
    assert "surprise_field" not in good.columns
    assert good.first().doc_id == 9
