"""Oracle-comparison helpers shared by tests/ and tools/check.py.

Mirrors the driver's t2 gate: row count + sorted-column schema +
order-insensitive canonicalized value multiset, Spark vs DuckDB.
"""

from __future__ import annotations

import datetime
import decimal
import math

DUCKDB_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(con, sf_dir: str) -> None:
    """Register the fixture parquet files as DuckDB views (driver parity)."""
    for t in DUCKDB_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def canon(v) -> str:
    """Canonicalize a cell so Spark and DuckDB values compare equal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows) -> list[str]:
    """Order-insensitive multiset of rows, columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == hash-match)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        return problems
    sset, dset = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
    bad = [(a, b) for a, b in zip(sset, dset) if a != b]
    if bad:
        problems.append(f"{len(bad)} mismatched rows; first: "
                        f"spark={bad[0][0][:200]} duck={bad[0][1][:200]}")
    return problems
