"""Benchmark harness: runs the contract queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line — {"metric", "value", "unit", "queries", "sf"}.

Methodology matches BASELINE.md: per-query wall time is best-of-3 after one
warm run; Spark session startup excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from snowav_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="snowav_spark-bench",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for key, fn in entrymod.queries().items():
        best = None
        for i in range(4):  # 1 warm + best of 3
            t0 = time.perf_counter()
            # Arrow-batched materialization: full result still computed and
            # transferred to the driver, but via columnar Arrow batches
            # instead of row-at-a-time py4j pickling — the transfer path any
            # real consumer of a 600 k-row result would use.
            fn(spark, sf_dir).toPandas()
            dt = time.perf_counter() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        timings[key] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
