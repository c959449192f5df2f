"""Scale probe for the streaming index maintainers: per-drop latency of
ann_index_stream (IVF-PQ) and text_index_stream (inverted index) as the
persisted index grows.

Stages N vectors/docs across DROPS file drops, runs an availableNow
StreamingQuery per drop over ONE checkpoint (the probe_tws restart-replay
pattern), and times each drop end-to-end (including query startup).  The
design claim under test: APPEND cost is linear in the batch and
independent of how large the index already is (frozen sidecars, blind
cell/bucket appends) — so per-drop wall time must stay FLAT while the
at-rest index grows by a batch per drop.  A growing per-drop time would
mean an accidental index rescan in the append path.

Run from a QUIESCENT machine.  Usage:
    python tools/probe_index_stream.py [n_per_drop] [drops]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    drops = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dim = 64

    from pyspark.sql import functions as F

    from snowav_spark.session import get_spark
    from snowav_spark.streaming import incremental

    spark = get_spark(
        app_name="probe-index-stream",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_idx_stream_")
    report: dict = {"n_per_drop": n, "drops": drops, "ann": [], "text": []}

    # ---- ANN stream: synthetic embeddings, one parquet drop per batch
    emb_src = f"{root}/emb_in"
    ann_idx = f"{root}/ann_idx"
    ann_ckpt = f"{root}/ann_ckpt"

    def emb_batch(lo: int):
        return (
            spark.range(lo, lo + n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: (
                        F.pmod(F.hash(F.col("id"), i), F.lit(1000))
                        / F.lit(500.0)
                        - 1.0
                    ),
                ).alias("embedding"),
            )
        )

    schema = "vec_id long, embedding array<double>"
    for d in range(drops):
        emb_batch(d * n).write.mode("append").parquet(emb_src)
        t0 = time.perf_counter()
        q = incremental.ann_index_stream(
            spark.readStream.schema(schema).parquet(emb_src),
            ann_idx, ann_ckpt, n_cells=max(8, n // 6_250),
            m=8, k=16, iters=1, dim=dim,
            train_fraction=min(1.0, 50_000 / n),
        )
        q.awaitTermination(600)
        wall = round(time.perf_counter() - t0, 2)
        rows = spark.read.parquet(ann_idx).count()
        report["ann"].append({"drop": d, "wall_s": wall, "index_rows": rows})

    # ---- text stream: synthetic docs (the scale_probe generator shape)
    doc_src = f"{root}/doc_in"
    t_idx = f"{root}/text_idx"
    t_ckpt = f"{root}/text_ckpt"

    def doc_batch(lo: int):
        words = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.hash(F.col("id"), i), F.lit(5000)).cast("string"),
            ),
        )
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
        )

    dschema = "doc_id long, text string"
    for d in range(drops):
        doc_batch(d * n).write.mode("append").parquet(doc_src)
        t0 = time.perf_counter()
        q = incremental.text_index_stream(
            spark.readStream.schema(dschema).parquet(doc_src),
            t_idx, t_ckpt, n_buckets=max(16, n // 3_125),
        )
        q.awaitTermination(600)
        wall = round(time.perf_counter() - t0, 2)
        stats = (
            spark.read.parquet(t_idx + "/_corpus_stats")
            .groupBy()
            .sum("n_docs")
            .collect()[0][0]
        )
        report["text"].append({"drop": d, "wall_s": wall, "n_docs": stats})

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
