"""Driver-parity tests: every contract query hash-matches its DuckDB oracle
at sf0.001, and every query without an oracle at least returns rows with a
stable schema (the driver's weaker rows-only check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from snowav_spark.testing import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(spark, duck, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    problems = compare(df, duck, ORACLES[key])
    assert not problems, f"{key}: {problems}"


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
