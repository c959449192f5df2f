"""ORC format coverage + small-files compaction: roundtrip equality,
predicate/partition pruning on the ORC read path, and the compaction
rewrite reducing file counts without changing content."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from snowav_spark import sinks
from snowav_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_orc")
    sinks.write_columnar(li, path, fmt="orc")
    back = sinks.read_columnar(spark, path, fmt="orc")
    assert _rows(back) == _rows(li)
    # filters and column pruning reach the ORC scan
    q = back.filter(F.col("l_quantity") > 30).select("l_orderkey")
    p = _explain(q)
    assert "PushedFilters:" in p and "l_quantity" in p.split("PushedFilters:")[1].splitlines()[0]
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_orc_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_orc_part")
    sinks.write_columnar(li, path, fmt="orc", partition_by=("l_returnflag",))
    back = sinks.read_columnar(spark, path, fmt="orc")
    q = back.filter(F.col("l_returnflag") == "A")
    p = _explain(q)
    assert "PartitionFilters:" in p
    pf = p.split("PartitionFilters:")[1].splitlines()[0]
    assert "l_returnflag" in pf
    assert q.count() == li.filter(F.col("l_returnflag") == "A").count()


def test_unsupported_format_rejected(spark, tmp_path):
    li = load_table(spark, SF, "region")
    import pytest

    with pytest.raises(ValueError):
        sinks.write_columnar(li, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        sinks.read_columnar(spark, str(tmp_path / "x"), fmt="csvish")


def _file_count(path, ext):
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(ext)
    )


def test_compact_partitions_reduces_files_keeps_content(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "frag")
    # simulate micro-batch fragmentation: 40 files for a tiny table
    sinks.write_columnar(li.repartition(40), path, fmt="parquet")
    assert _file_count(path, ".parquet") == 40
    before = _rows(spark.read.parquet(path))
    n_after = sinks.compact_partitions(
        spark, path, fmt="parquet", target_rows_per_file=1_000_000
    )
    assert n_after == 1
    assert _file_count(path, ".parquet") == 1
    assert _rows(spark.read.parquet(path)) == before
    assert not os.path.exists(path + "._compact_staged")
    assert not os.path.exists(path + "._compact_old")


def test_compact_partitions_partitioned_layout_preserved(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "frag_part")
    sinks.write_columnar(
        li.repartition(12), path, fmt="parquet",
        partition_by=("l_returnflag",),
    )
    before = _rows(spark.read.parquet(path).select("l_orderkey", "l_quantity", "l_returnflag"))
    sinks.compact_partitions(
        spark, path, fmt="parquet", partition_by=("l_returnflag",),
        target_rows_per_file=1_000_000,
    )
    after_df = spark.read.parquet(path)
    # partition directories survive the rewrite (pruning still works)
    p = _explain(after_df.filter(F.col("l_returnflag") == "A"))
    assert "PartitionFilters:" in p
    assert _rows(after_df.select("l_orderkey", "l_quantity", "l_returnflag")) == before


def test_compact_partitions_splits_oversized_partition(spark, tmp_path):
    """A partition bigger than target_rows_per_file must yield MULTIPLE
    files (per-partition salt sized from per-partition counts), while a
    tiny partition stays one file — hashing partition cols alone would
    give every partition exactly one file regardless of size."""
    big = spark.range(3000).select(
        F.col("id").alias("v"), F.lit("big").alias("p")
    )
    small = spark.range(10).select(
        F.col("id").alias("v"), F.lit("small").alias("p")
    )
    path = str(tmp_path / "skewed")
    sinks.write_columnar(
        big.unionByName(small).repartition(20), path,
        fmt="parquet", partition_by=("p",),
    )
    before = _rows(spark.read.parquet(path))
    sinks.compact_partitions(
        spark, path, fmt="parquet", partition_by=("p",),
        target_rows_per_file=1000,
    )
    assert _rows(spark.read.parquet(path)) == before
    assert _file_count(os.path.join(path, "p=big"), ".parquet") >= 3
    assert _file_count(os.path.join(path, "p=small"), ".parquet") == 1


def test_compact_partitions_rejects_missing_and_recovers(spark, tmp_path):
    import shutil

    import pytest

    with pytest.raises(ValueError, match="local directory"):
        sinks.compact_partitions(spark, str(tmp_path / "nope"))
    # simulate a crash between the two swap moves: data stranded at
    # ._compact_old with path absent — next invocation must restore it
    li = spark.range(100).select(F.col("id").alias("v"))
    path = str(tmp_path / "crashy")
    sinks.write_columnar(li.repartition(5), path, fmt="parquet")
    shutil.move(path, path + "._compact_old")
    n_after = sinks.compact_partitions(spark, path, target_rows_per_file=1000)
    assert n_after == 1
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "._compact_old")
