"""Regenerate the flagship-pipeline golden files (tests/golden/*) from
the deterministic synthetic grid defined in tests/test_golden_e2e.py.

Run ONLY when a semantic change to the flagship pipeline is intended;
commit the refreshed goldens with the change that caused them.

Usage: python tools/make_golden.py
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    from snowav_spark.session import get_spark
    import test_golden_e2e as g

    spark = get_spark(shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"})
    with tempfile.TemporaryDirectory() as td:
        got, md, tex, svgs = g.run_flagship(spark, pathlib.Path(td))
    gold = pathlib.Path(g.GOLD_DIR)
    gold.mkdir(exist_ok=True)
    got.to_parquet(g.GOLD_STORE, index=False)
    with open(g.GOLD_REPORT, "w") as f:
        f.write(md)
    with open(g.GOLD_TEX, "w") as f:
        f.write(tex)
    with open(g.GOLD_SVG, "w") as f:
        f.write(svgs["swe_volume_swe_mm.svg"])
    print(f"golden store rows: {len(got)} -> {g.GOLD_STORE}")
    print(f"golden report: {len(md)} chars -> {g.GOLD_REPORT}")
    print(f"golden tex: {len(tex)} chars -> {g.GOLD_TEX}")
    print(f"golden svg: {len(svgs['swe_volume_swe_mm.svg'])} chars -> {g.GOLD_SVG}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
