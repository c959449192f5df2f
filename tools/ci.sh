#!/bin/sh
# Full local verification: unit/integration tests, then the DuckDB oracle
# gate at BOTH sf0.01 and sf0.1 (ulp-boundary flips are scale-dependent),
# with the --permute summation-order re-run at sf0.01.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check.py --permute
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/check.py
