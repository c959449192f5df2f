"""Sequence packing for training-data pipelines (SURVEY.md §2.6 EXT).

LLM pretraining consumes fixed-length context windows; feeding one short
document per window wastes most of the batch.  Packing concatenates
documents into bins of ``capacity`` tokens (first-fit-decreasing, the
standard high-fill heuristic) and records each document's bin and offset
so the trainer can build attention masks.

Scale design — packing is a *sequential* decision process, so the trick
is bounding the sequential part:

- The corpus is split into ``n_shards`` deterministic shards
  (``id % n_shards``); FFD runs *within* a shard via ``applyInPandas``
  (Arrow-batched, one pass, no Python row loop for the hot arithmetic).
  Shards are embarrassingly parallel; fill efficiency is within noise of
  global FFD because any realistic shard still holds thousands of docs —
  FFD's fill ratio depends on the length *distribution*, which every
  shard samples.
- At 100 TB, pick ``n_shards`` so a shard's (id, len) pairs fit an
  executor comfortably: the packer only needs the two integer columns,
  NOT the text — callers join assignments back to content afterwards,
  so document bytes are never shuffled through the packer.
- Output (id → shard, bin, offset) is deterministic: shards are modular
  arithmetic and FFD breaks ties by id, so results are identical under
  any input partitioning (asserted by tools/check.py --permute).

Documents longer than ``capacity`` get a bin of their own and keep their
full length — trimming policy (truncate/split) belongs to the caller.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    n_shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing packing of (id, len) rows into bins of
    ``capacity``, sharded for parallelism.

    Returns (id, len, shard, bin, offset): ``bin`` is the bin index
    within the shard, ``offset`` the document's start position in its
    bin.  Global bin id = (shard, bin).

    Rows with NULL id or NULL length are unpackable and dropped up
    front — a NULL length reaches the FFD loop as NaN, never fits any
    bin, and crashes the ``int(ln)`` new-bin insert (found by
    tools/fuzz_fixtures.py nulls variant).
    """
    df = df.filter(F.col(id_col).isNotNull() & F.col(len_col).isNotNull())
    slim = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(len_col).cast("long").alias("len"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["len", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        # First-fit-decreasing over a live per-bin fill list.  The
        # per-row python loop is the algorithm's irreducible sequential
        # core; it touches two ints per row and never the payload.
        fill: list[int] = []
        bins = pd.array([0] * len(pdf), dtype="int64")
        offsets = pd.array([0] * len(pdf), dtype="int64")
        for i, ln in enumerate(pdf["len"].to_numpy()):
            for b, f in enumerate(fill):
                if f + ln <= capacity:
                    bins[i] = b
                    offsets[i] = f
                    fill[b] = f + ln
                    break
            else:
                # new bin; an oversized doc (ln > capacity) fills it past
                # capacity, so nothing else — not even zero-length docs —
                # joins it
                bins[i] = len(fill)
                offsets[i] = 0
                fill.append(int(ln))
        pdf["bin"] = bins
        pdf["offset"] = offsets
        return pdf[["id", "len", "shard", "bin", "offset"]]

    out = slim.groupBy("shard").applyInPandas(
        pack, "id long, len long, shard int, bin long, offset long"
    )
    return out.withColumnsRenamed({"id": id_col, "len": len_col})


def packing_stats(packed: DataFrame, len_col: str, capacity: int) -> DataFrame:
    """Fill-efficiency report: one row with bin count, mean fill ratio,
    and wasted-token total — the number a pipeline owner actually tracks."""
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum(len_col).alias("fill"), F.count("*").alias("n_docs")
    )
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.round(
            F.avg(F.least(F.col("fill"), F.lit(capacity)) / F.lit(capacity)), 6
        ).alias("avg_fill"),
        F.sum(
            F.greatest(F.lit(capacity) - F.col("fill"), F.lit(0))
        ).alias("wasted_tokens"),
    )
