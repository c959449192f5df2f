"""Z-order clustered writes: correctness (round trip) and the actual
pruning property — per-file parquet footer min/max ranges must be narrow
in BOTH keyed dimensions, where a lexicographic sort is narrow only in
its leading column.  Measured from the real file footers via pyarrow, not
asserted from folklore."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from snowav_spark import sinks
from snowav_spark.io import load_table


def _file_spans(path: str, cols: list[str]) -> list[dict[str, float]]:
    """Per-file normalized (max-min)/span for each col, from footer stats."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files
    # global spans for normalization
    glo: dict[str, float] = {}
    ghi: dict[str, float] = {}
    spans = []
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                s = col.statistics
                lo[name] = min(lo.get(name, s.min), s.min)
                hi[name] = max(hi.get(name, s.max), s.max)
        per_file.append((lo, hi))
        for c in cols:
            glo[c] = min(glo.get(c, lo[c]), lo[c])
            ghi[c] = max(ghi.get(c, hi[c]), hi[c])
    for lo, hi in per_file:
        spans.append(
            {
                c: (hi[c] - lo[c]) / ((ghi[c] - glo[c]) or 1.0)
                for c in cols
            }
        )
    return spans


def test_zorder_roundtrip_and_prunes_both_dims(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.dayofmonth("ts").alias("day"),
        "value",
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lex")
    sinks.write_zordered(ev, zpath, ["user_id", "day"], n_files=8)
    # lexicographic straw man: same file count, sorted (user_id, day)
    (
        ev.repartitionByRange(8, "user_id", "day")
        .sortWithinPartitions("user_id", "day")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # correctness: layout changes nothing about the rows
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert (
        back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    )
    assert "_zkey" not in back.columns

    zs = _file_spans(zpath, ["user_id", "day"])
    ls = _file_spans(lpath, ["user_id", "day"])
    z_user = sum(s["user_id"] for s in zs) / len(zs)
    z_day = sum(s["day"] for s in zs) / len(zs)
    l_user = sum(s["user_id"] for s in ls) / len(ls)
    l_day = sum(s["day"] for s in ls) / len(ls)
    # lexicographic: leading column razor-sharp, second column useless
    # (every file spans ~the full day range).  Z-order: BOTH dimensions
    # materially narrower than the full span — that is what lets footer
    # stats prune a filter on either column.
    assert l_user < 0.35          # sanity: straw man behaves as expected
    assert l_day > 0.9
    assert z_user < 0.75
    assert z_day < 0.75
    # the operational claim: a predicate on the NON-leading column can
    # skip files under z-order, never under the lexicographic layout
    # (every lex file spans ~all days).  Count files whose day range is
    # disjoint from `day <= 7`.
    def prunable(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        n = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(rg).column(ci).statistics.min
                for rg in range(md.num_row_groups)
                for ci in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(ci).path_in_schema == "day"
            )
            if lo > 7:
                n += 1
        return n

    assert prunable(lpath) == 0
    assert prunable(zpath) >= 1


def test_morton_key_bit_budget_guard(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    import pytest

    with pytest.raises(ValueError):
        sinks.morton_key(ev, ["user_id", "value", "event_id", "ts"], 16)
