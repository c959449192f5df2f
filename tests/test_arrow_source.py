"""snowav_arrow source tests: both IPC framings, multi-file parallel
reads, nested/null columns through Spark's Arrow bridge, schema-drift
refusal, and a realistic documents-corpus round trip."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from snowav_spark import sources
from snowav_spark.sources import arrow_source


def _write_file(path: str, table: pa.Table) -> None:
    with pa.ipc.new_file(path, table.schema) as w:
        w.write_table(table)


def _write_stream(path: str, table: pa.Table) -> None:
    with pa.ipc.new_stream(path, table.schema) as w:
        w.write_table(table)


def test_reads_both_framings_and_multiple_files(spark, tmp_path):
    sources.register(spark)
    t1 = pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]})
    # explicit schema: an all-None column would otherwise infer type
    # null and (correctly) trip the schema-drift refusal
    t2 = pa.table(
        {"doc_id": pa.array([3], pa.int64()),
         "text": pa.array([None], pa.string())},
        schema=t1.schema,
    )
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    _write_file(os.path.join(d, "a.arrow"), t1)  # file framing (ARROW1)
    _write_stream(os.path.join(d, "b.arrow"), t2)  # stream framing
    df = spark.read.format("snowav_arrow").load(d)
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows == {1: "alpha beta", 2: "gamma", 3: None}
    # partitions are files
    assert len(arrow_source.ArrowIPCReader({"path": d}).partitions()) == 2


def test_nested_and_list_columns(spark, tmp_path):
    sources.register(spark)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float32())
            ),
            "meta": pa.array(
                [{"lang": "en"}, {"lang": "es"}],
                pa.struct([("lang", pa.string())]),
            ),
        }
    )
    p = str(tmp_path / "emb")
    os.makedirs(p)
    _write_file(os.path.join(p, "e.feather"), t)
    df = spark.read.format("snowav_arrow").load(p)
    got = df.select(
        "vec_id", F.element_at("embedding", 1).alias("e0"), "meta.lang"
    ).orderBy("vec_id").collect()
    assert [r.lang for r in got] == ["en", "es"]
    assert abs(got[0].e0 - 0.1) < 1e-6


def test_schema_drift_refused(spark, tmp_path):
    sources.register(spark)
    d = str(tmp_path / "drift")
    os.makedirs(d)
    _write_file(
        os.path.join(d, "a.arrow"), pa.table({"x": pa.array([1], pa.int64())})
    )
    _write_file(
        os.path.join(d, "b.arrow"),
        pa.table({"x": pa.array([1.5], pa.float64())}),
    )
    df = spark.read.format("snowav_arrow").load(d)
    with pytest.raises(Exception, match="schema differs"):
        df.collect()


def test_corpus_round_trip_through_engine_ops(spark, tmp_path):
    """A documents corpus delivered as Arrow IPC flows straight into
    the engine's text operators."""
    from snowav_spark.ops import text as t

    sources.register(spark)
    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                ["spark data engines"] * 3 + ["ducks on the lake"] * 3
            ),
        }
    )
    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write_file(os.path.join(d, "part0.arrow"), docs)
    df = spark.read.format("snowav_arrow").load(d)
    top = {
        r.word: r.n for r in t.top_terms(df, "text", 3).collect()
    }
    # every term appears 3x; top-3 tie-breaks alphabetically
    assert top == {"data": 3, "ducks": 3, "engines": 3}


def test_planning_schema_is_captured_at_init(tmp_path):
    """ADVICE r9: the per-task schema check must validate against the
    schema captured when the reader was PLANNED, not re-derive it from
    whatever file is alphabetically first at execution time.  Here a
    new earlier-sorting file with a different schema appears after
    planning; a re-deriving reader would adopt it as the baseline and
    pass the drifted file — the captured reader must refuse it."""
    from snowav_spark.sources.arrow_source import (
        ArrowIPCReader,
        _FilePartition,
    )

    d = str(tmp_path / "late")
    os.makedirs(d)
    _write_file(
        os.path.join(d, "m.arrow"),
        pa.table({"x": pa.array([1], pa.int64())}),
    )
    reader = ArrowIPCReader({"path": d})  # planning: schema = int64 x
    drifted = os.path.join(d, "a.arrow")  # sorts before m.arrow
    _write_file(drifted, pa.table({"x": pa.array([1.5], pa.float64())}))
    with pytest.raises(ValueError, match="schema differs"):
        list(reader.read(_FilePartition(drifted)))
    # the original file still validates against the captured baseline
    rows = list(reader.read(_FilePartition(os.path.join(d, "m.arrow"))))
    assert sum(b.num_rows for b in rows) == 1
