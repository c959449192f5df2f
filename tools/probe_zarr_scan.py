"""Reproducible Zarr scan probes behind the round-10 SCALE.md claims:

1. codec parity  — a blosc-lz4 store scans in the same wall time as its
   raw twin (per-task row emission dominates; decode is noise),
2. linear growth — doubling the chunk count ≈ doubles scan wall,
3. pushdown      — pushed coordinate predicates prune chunk partitions
   at planning (verified by partition COUNT, not timing).

Usage: python tools/probe_zarr_scan.py [nt]   (default 64 chunks at 1x;
2x runs nt*2).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build(nt: int, compressor: str | None) -> str:
    from snowav_spark.sources import zarr

    rng = np.random.default_rng(2)
    d = tempfile.mkdtemp()
    p = os.path.join(d, "swe")
    arr = np.cumsum(rng.standard_normal((nt, 256, 256)), axis=1)
    zarr.write_array(p, arr, (1, 256, 256), compressor=compressor)
    return p


def timed_scan(spark, path: str) -> float:
    df = spark.read.format("snowav_zarr").load(path)
    df.agg({"value": "sum"}).collect()  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.agg({"value": "sum"}).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 2)


def main() -> None:
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from snowav_spark import sources
    from snowav_spark.session import get_spark
    from snowav_spark.sources.zarr_source import ZarrReader

    spark = get_spark(
        app_name="zarr-scan-probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sources.register(spark)

    raw_1x = build(nt, None)
    blosc_1x = build(nt, "blosc-lz4")
    blosc_2x = build(nt * 2, "blosc-lz4")
    out = {
        "nt": nt,
        "raw_1x_sec": timed_scan(spark, raw_1x),
        "blosc_1x_sec": timed_scan(spark, blosc_1x),
        "blosc_2x_sec": timed_scan(spark, blosc_2x),
    }
    out["codec_overhead"] = round(
        out["blosc_1x_sec"] / max(out["raw_1x_sec"], 1e-9), 2
    )
    out["growth_ratio"] = round(
        out["blosc_2x_sec"] / max(out["blosc_1x_sec"], 1e-9), 2
    )

    # pushdown pruning: partition counts, deterministic (no timing)
    from pyspark.sql.datasource import GreaterThanOrEqual

    r = ZarrReader({"path": blosc_2x})
    n_full = len(r.partitions())
    r = ZarrReader({"path": blosc_2x})
    list(r.pushFilters([GreaterThanOrEqual(("t",), nt * 2 - nt // 4)]))
    n_pruned = len(r.partitions())
    out["partitions_full"] = n_full
    out["partitions_after_t_pushdown"] = n_pruned
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
