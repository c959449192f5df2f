"""Time contract.build_indexes alone (the bench's index_build_sec rows)
without running the 203-query suite.  Usage:

    python tools/time_index_build.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from snowav_spark import contract
    from snowav_spark.session import get_spark

    spark = get_spark(
        "time-index-build", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    out = contract.build_indexes(spark, sf_dir)
    out["total"] = round(time.perf_counter() - t0, 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
