"""Write `.explain("formatted")` for the named contract keys to files.

Usage: python tools/capture_plans.py OUT_DIR SUFFIX key [key ...]
       python tools/capture_plans.py OUT_DIR SUFFIX @top20

Writes OUT_DIR/<key>_<SUFFIX>.txt per key.  @topN expands to the N
slowest keys of BENCH_DETAIL.json.
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    if keys and keys[0].startswith("@top"):
        n = int(keys[0][4:])
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)
        keys = [
            k
            for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ] + keys[1:]
    os.makedirs(out_dir, exist_ok=True)

    from snowav_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark(
        "capture-plans", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    for key in keys:
        df = qs[key](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
