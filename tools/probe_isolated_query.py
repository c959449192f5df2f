"""Isolated fresh-JVM timing for named contract keys at a given SF dir.

One JVM, bench methodology (1 warm + best-of-3, toPandas action — the
same action bench.py times).  Arms that differ by env seams are compared
by invoking this script once per arm so JIT/codegen caches never mix.

Usage: python tools/probe_isolated_query.py SF_DIR KEY [KEY ...]
Prints one JSON line: {"sf_dir", "keys": {key: best_sec}, "env": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from snowav_spark.session import get_spark

    spark = get_spark("probe-isolated", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        best = None
        for i in range(4):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).toPandas()
            dt = time.perf_counter() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    seams = {
        k: v
        for k, v in os.environ.items()
        if k.startswith("SNOWAV_")
    }
    print(json.dumps({"sf_dir": sf_dir, "keys": out, "env": seams}))
    spark.stop()


if __name__ == "__main__":
    main()
