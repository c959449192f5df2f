"""A/B the explicit ``repartition("tbl", "bk", "_sub")`` exchange inside
similarity._bounded_cobucket_pairs at synthetic scale (VERDICT r11 item 1:
the r11 trade was measured only at sf0.1, where it costs ~11%; the at-scale
claim was argued, not measured).

Each invocation is ONE fresh JVM and ONE arm (the exchange forced on or
off via SNOWAV_COBUCKET_EXCHANGE), so arms never share codegen caches or
JIT state.  The corpus is gen_embeddings(n) written to parquet first —
a real multi-partition scan, the layout the gate must behave under — and
the timed action is the full dedup_pairs_lsh query into a noop sink
(guide §1.4).  Optionally ``hot`` identical vectors are appended so one
bucket exceeds ``max_bucket`` and the salting/sub-bucket machinery (the
regime the exchange exists for) actually engages.

Usage:
  python tools/probe_cobucket_exchange.py N MODE [HOT] [BITS] [MAX_BUCKET]
    N          corpus size (plus HOT extra identical vectors)
    MODE       on | off   (forces the exchange arm)
    HOT        identical vectors appended (default 0)
    BITS       LSH bits per table (default 20 — constant-occupancy sizing
               per the dedup_pairs_lsh docstring, not the fixture's 3)
    MAX_BUCKET salting cap (default 4096)

Prints one JSON line: {"mode", "n", "hot", "bits", "runs": [sec, ...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1])
    mode = sys.argv[2]
    hot = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    bits = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    max_bucket = int(sys.argv[5]) if len(sys.argv) > 5 else 4096
    assert mode in ("on", "off")
    os.environ["SNOWAV_COBUCKET_EXCHANGE"] = mode

    from snowav_spark.ops import similarity
    from snowav_spark.session import get_spark
    from tools.scale_probe import gen_embeddings

    spark = get_spark("probe-cobucket-exchange")
    root = tempfile.mkdtemp(prefix="probe_cob_")
    try:
        emb = gen_embeddings(spark, n)
        if hot:
            one = emb.filter("vec_id = 0").select("embedding")
            dup = (
                spark.range(n, n + hot)
                .select(F.col("id").alias("vec_id"))
                .crossJoin(F.broadcast(one))
            )
            emb = emb.unionByName(dup.select("vec_id", "embedding"))
        src = f"{root}/emb.parquet"
        emb.write.parquet(src)
        corpus = spark.read.parquet(src)

        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(
                f"cobucket-exchange {mode} run{i}"
            )
            t0 = time.perf_counter()
            out = similarity.dedup_pairs_lsh(
                corpus, "vec_id", "embedding", 0.4,
                tables=10, bits=bits, max_bucket=max_bucket,
            )
            out.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "mode": mode, "n": n, "hot": hot, "bits": bits,
            "max_bucket": max_bucket, "runs": runs,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
