"""NetCDF ingest throughput probe: classic CDF vs HDF5-backed NetCDF-4.

Writes synthetic (time, y, x) model-output files at two sizes with the
in-repo writers, times ingest.read_netcdf_outputs end-to-end (tall frame
→ per-date mean, forcing a full scan), and prints rows/s plus the
size-doubling growth ratio.  Linear growth (~2x time for 2x data) is the
pass condition — the mapInPandas path is file-per-task, so at cluster
scale the same numbers hold per executor core.

Run on a QUIESCENT host (SCALE.md methodology): concurrent Spark jobs
skew ratios badly.

Usage: python tools/probe_ingest.py [--steps 24] [--ny 200] [--nx 250]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_files(root: Path, fmt: str, n_files: int, steps: int, ny: int, nx: int):
    from snowav_spark.sources import hdf5, netcdf3

    paths = []
    for f in range(n_files):
        rng = np.random.RandomState(f)
        swe = (rng.rand(steps, ny, nx) * 1000).astype(np.float32)
        t = np.arange(f * steps, (f + 1) * steps, dtype=np.float64)
        p = str(root / f"{fmt}_{f}.nc")
        variables = {
            "time": (["time"], t, {"units": "days since 2020-10-01"}),
            "specific_mass": (["time", "y", "x"], swe, {}),
        }
        dims = {"time": steps, "y": ny, "x": nx}
        if fmt == "classic":
            netcdf3.write(p, dims=dims, variables=variables)
        else:
            hdf5.write(
                p, dims=dims, variables=variables,
                chunks={"specific_mass": (1, ny, nx)}, deflate=1, shuffle=True,
            )
        paths.append(p)
    return paths


def time_ingest(spark, paths, label: str) -> float:
    from pyspark.sql import functions as F

    from snowav_spark import ingest

    t0 = time.perf_counter()
    tall = ingest.read_netcdf_outputs(spark, paths, ["specific_mass"])
    n = tall.groupBy("date").agg(F.avg("value")).count()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s ({n} dates)")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--ny", type=int, default=200)
    ap.add_argument("--nx", type=int, default=250)
    ap.add_argument("--files", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cells = args.steps * args.ny * args.nx
    with tempfile.TemporaryDirectory() as td:  # JVM/Arrow warmup, untimed
        wp = make_files(Path(td), "classic", 1, 2, 8, 8)
        time_ingest(spark, wp, "warmup")
    for fmt in ("classic", "nc4"):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td)
            small = make_files(root, fmt, args.files, args.steps, args.ny, args.nx)
            (root / "big").mkdir()
            big = make_files(
                root / "big", fmt, args.files * 2, args.steps, args.ny, args.nx
            )
            print(f"{fmt}: {args.files} files x {cells:,} cells "
                  f"({cells * 4 / 1e6:.0f} MB raw each)")
            t_small = time_ingest(spark, small, f"{fmt} 1x")
            t_big = time_ingest(spark, big, f"{fmt} 2x")
            rate = args.files * cells / t_small / 1e6
            print(f"  {fmt}: {rate:.1f}M cells/s at 1x; "
                  f"2x-files growth ratio {t_big / t_small:.2f}")


if __name__ == "__main__":
    main()
