"""Scale probe for near_dedup_stream: per-drop latency, throughput and
state growth for the streaming MinHash-LSH bucket-ownership operator.

Stages N_DOCS synthetic docs (~32 tokens, DUP_FRAC exact/near dups of
earlier docs) across DROPS file drops, runs an availableNow
StreamingQuery per drop over ONE checkpoint (the restart-replay pattern
of probe_tws probe B), and reads stateOperators metrics from the last
progress of each drop:

- dedup state rows should track distinct (band,bucket) ≈ bands x novel
  docs in-horizon (NOT total docs — dups add no state);
- per-drop wall time should stay flat as lifetime docs grow (per-batch
  cost is O(batch), the design claim);
- dup docs are the ones whose owned_bands < bands in the sink.

Run from a QUIESCENT machine.  Usage:
python tools/probe_neardup_stream.py [n_docs] [drops]
"""

from __future__ import annotations

import datetime
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    drops = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dup_frac = 0.2
    bands = 8

    from pyspark.sql import functions as F

    from snowav_spark.session import get_spark
    from snowav_spark.streaming import incremental

    spark = get_spark(
        app_name="probe-neardup-stream",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    per_drop = n_docs // drops
    td = tempfile.mkdtemp()
    src, out, ckpt = f"{td}/in", f"{td}/out", f"{td}/ck"

    def synth_drop(d: int) -> list[tuple]:
        rows = []
        base_id = d * per_drop
        for i in range(per_drop):
            doc_id = base_id + i
            if doc_id > 0 and rng.random() < dup_frac:
                # near-dup of an earlier doc: same token stream, last
                # token changed (high-Jaccard, loses most bands)
                src_doc = int(rng.integers(0, doc_id))
                toks = [f"t{src_doc}_{k}" for k in range(32)]
                toks[-1] = "CHANGED"
            else:
                toks = [f"t{doc_id}_{k}" for k in range(32)]
            ts = datetime.datetime(2024, 1, 1, d, (i * 60) // per_drop % 60)
            rows.append((doc_id, " ".join(toks), ts))
        return rows

    results = []
    schema = "doc_id bigint, text string, ts timestamp"
    for d in range(drops):
        df = spark.createDataFrame(synth_drop(d), schema)
        df.coalesce(4).write.mode("append").parquet(src)
        stream = incremental.stream_source(
            spark, src, spark.read.parquet(src).schema
        )
        nd = incremental.near_dedup_stream(
            stream, "ts", watermark="30 minutes", window_len="15 minutes",
            bands=bands,
        )
        t0 = time.time()
        q = incremental.run_to_sink(nd, out, ckpt, once=True)
        q.awaitTermination(600)
        wall = round(time.time() - t0, 2)
        prog = q.lastProgress
        state = (
            [
                {
                    "op": so.get("operatorName", "?"),
                    "rows": so.get("numRowsTotal"),
                }
                for so in prog.get("stateOperators", [])
            ]
            if prog
            else []
        )
        results.append(
            {
                "drop": d,
                "wall_s": wall,
                "docs_per_s": round(per_drop / wall),
                "state": state,
            }
        )
        print(json.dumps(results[-1]))

    emitted = spark.read.parquet(out)
    n_out = emitted.count()
    n_partial = emitted.filter(F.col("owned_bands") < bands).count()
    print(
        json.dumps(
            {
                "total_docs": per_drop * drops,
                "emitted_docs": n_out,
                "partial_owners(dup suspects)": n_partial,
            }
        )
    )
    shutil.rmtree(td, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
