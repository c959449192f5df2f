"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and its ``oracle_sql()``
twin on DuckDB, then compares row count, sorted column names, and an
order-insensitive canonicalized value multiset.  Exit code 1 on any
mismatch.  Usage:

    python tools/check.py [key ...]      # default: all keys
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(v):
    """Canonicalize a cell value so Spark and DuckDB rows compare equal.

    Deliberately STRICT, to model the driver's value hash (round-1/2
    evidence: the driver distinguishes -0.0 from 0.0, sees double
    summation noise at full precision, and — because it goes through
    pandas — renders DuckDB HUGEINT sums as float64, so an int column on
    one side and a float column on the other NEVER match):

    - floats print at full repr precision (17 significant digits), keep
      the sign of zero, and keep their ``.0`` so int 0 != float 0.0;
    - ints print bare;
    - no tolerance anywhere — outputs must be bit-deterministic by
      construction (integer sums, per-row scalar math, or rounding whose
      granularity provably exceeds cross-engine summation noise).
    """
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return canon(float(v))
    except ImportError:
        pass
    return str(v)


def _arrow_rows(tbl):
    """Arrow table → list of python-value row tuples (as_py semantics:
    decimal128 → Decimal, date32 → date, timestamp → datetime)."""
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


def rowset(cols, rows):
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    from snowav_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    argv = [a for a in sys.argv[1:] if a != "--permute"]
    permute = "--permute" in sys.argv[1:]
    keys = argv or list(qs)
    failures = []
    for key in keys:
        if key not in qs:
            print(f"{key}: NO SUCH QUERY")
            failures.append(key)
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[key](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = _arrow_rows(sdf.toArrow())
        except Exception as e:
            print(f"{key}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(key)
            continue
        t_spark = time.perf_counter() - t0
        if permute:
            # Re-execute with a different shuffle-partition count: a
            # different summation order surfaces ulp/signed-zero
            # nondeterminism locally before the driver's hash sees it.
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            try:
                p_rows = _arrow_rows(qs[key](spark, SF_DIR).toArrow())
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "8")
            if rowset(s_cols, s_rows) != rowset(s_cols, p_rows):
                print(f"{key}: NONDETERMINISTIC across partitioning (8 vs 1)")
                failures.append(key)
                continue
        if key not in oracles:
            print(f"{key}: rows-only ({len(s_rows)} rows, {t_spark:.2f}s) — no oracle")
            if len(s_rows) == 0:
                print(f"    WARNING: zero rows")
            continue
        try:
            # Fetch through Arrow, like the driver: a DuckDB HUGEINT
            # (uncast integer sum) surfaces as decimal128 and mismatches
            # Spark's int64, while DATE stays date32 — this is the only
            # representation consistent with every driver pass/fail seen
            # in rounds 1–2.
            d_tbl = con.execute(oracles[key]).arrow()
            d_cols = list(d_tbl.column_names)
            d_rows = _arrow_rows(d_tbl)
        except Exception as e:
            print(f"{key}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(key)
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"{key}: SCHEMA MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"{key}: ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            sset, dset = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            if sset != dset:
                diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                print(f"{key}: VALUE MISMATCH ({len([1 for a,b in zip(sset,dset) if a!=b])} rows)")
                for a, b in diffs:
                    print(f"    spark: {a[:160]}")
                    print(f"    duck : {b[:160]}")
                ok = False
        if ok:
            print(f"{key}: OK ({len(s_rows)} rows, {t_spark:.2f}s)")
        else:
            failures.append(key)

    print(
        f"\n{len(keys) - len(failures)}/{len(keys)} passed"
        + (f"; FAILED: {failures}" if failures else "")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
