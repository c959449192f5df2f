"""Measure z-order data skipping on real parquet footers at sf0.1.

Writes lineitem twice — z-ordered on (l_partkey, l_suppkey) and
range-sorted on l_partkey alone — then counts row groups whose footer
min/max overlap a ~10% box predicate in each dimension, and times the
same selective aggregate on both layouts (the wall-clock effect of the
skipped row groups).  Run: python tools/probe_zorder.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.session import get_spark
from snowav_spark.sinks import rowgroup_overlap, write_zordered

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_FILES = 64


def timed_agg(spark, path, pk_box, sk_box):
    df = spark.read.parquet(path).filter(
        F.col("l_partkey").between(*pk_box)
        & F.col("l_suppkey").between(*sk_box)
    )
    t0 = time.time()
    df.agg(F.sum("l_extendedprice"), F.count("*")).collect()
    return round(time.time() - t0, 4)


def main() -> None:
    spark = get_spark(
        app_name="probe-zorder",
        master="local[8]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    li = load_table(spark, SF_DIR, "lineitem")
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    sk_max = li.agg(F.max("l_suppkey")).first()[0]
    pk_box = (int(pk_max * 0.45), int(pk_max * 0.55))
    sk_box = (int(sk_max * 0.45), int(sk_max * 0.55))

    with tempfile.TemporaryDirectory() as td:
        zpath, spath = f"{td}/z", f"{td}/s"
        t0 = time.time()
        write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=N_FILES)
        z_write = round(time.time() - t0, 2)
        t0 = time.time()
        (
            li.repartitionByRange(N_FILES, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(spath)
        )
        s_write = round(time.time() - t0, 2)

        out: dict = {
            "sf_dir": SF_DIR,
            "rows": li.count(),
            "n_files": N_FILES,
            "write_s": {"zorder": z_write, "sort_partkey": s_write},
        }
        for name, box in (
            ("box_2d", {"l_partkey": pk_box, "l_suppkey": sk_box}),
            ("partkey_only", {"l_partkey": pk_box}),
            ("suppkey_only", {"l_suppkey": sk_box}),
        ):
            zh, zt = rowgroup_overlap(zpath, box)
            sh, st = rowgroup_overlap(spath, box)
            out[name] = {
                "zorder": f"{zh}/{zt}",
                "sort_partkey": f"{sh}/{st}",
            }
        # warm both once (JVM/codegen), then time best-of-3
        timed_agg(spark, zpath, pk_box, sk_box)
        timed_agg(spark, spath, pk_box, sk_box)
        out["scan_2d_s"] = {
            "zorder": min(
                timed_agg(spark, zpath, pk_box, sk_box) for _ in range(3)
            ),
            "sort_partkey": min(
                timed_agg(spark, spath, pk_box, sk_box) for _ in range(3)
            ),
        }
        print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
