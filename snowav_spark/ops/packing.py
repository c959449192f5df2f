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
        import numpy as np

        pdf = pdf.sort_values(
            ["len", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        # First-fit-decreasing via a max-residual segment tree: find the
        # LEFTMOST bin with residual ≥ len in O(log n) instead of a
        # linear scan over every open bin (the scan made the per-shard
        # loop O(d²) — measured 6× wall growth for a 2× corpus at the
        # 500k-doc probe; the tree restores ~linear).  Leaves start at
        # `capacity` (an untouched leaf IS the next new bin — opened
        # bins always form a prefix, so outputs are bit-identical to
        # the scan version).  An oversized doc (len > capacity) targets
        # residual == capacity, i.e. the leftmost untouched bin, and
        # drives its residual negative so nothing ever joins it.
        lens = pdf["len"].to_numpy()
        d = len(lens)
        size = 1
        while size < max(d, 1):
            size *= 2
        tree = np.full(2 * size, capacity, dtype=np.int64)
        bins = np.zeros(d, dtype=np.int64)
        offsets = np.zeros(d, dtype=np.int64)
        for i in range(d):
            ln = int(lens[i])
            target = ln if ln <= capacity else capacity
            node = 1
            while node < size:
                node = 2 * node
                if tree[node] < target:
                    node += 1
            bins[i] = node - size
            offsets[i] = capacity - tree[node]
            tree[node] -= ln
            node //= 2
            while node:
                tree[node] = max(tree[2 * node], tree[2 * node + 1])
                node //= 2
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
