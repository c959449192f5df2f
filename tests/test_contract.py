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


def test_assortativity_semantics(spark):
    """The symmetrized endpoint-degree pairs behind q_assortativity land
    the textbook signs: a star is perfectly disassortative (numpy
    Pearson over the same pairs = -1), and a degree-regular cycle has
    zero degree variance (the key's zero-variance guard territory)."""
    import numpy as np

    from snowav_spark.ops import graph

    def endpoint_pairs(edges):
        e = graph._canonical_edges(
            spark.createDataFrame(edges, "src long, dst long"),
            "src", "dst",
        )
        deg = graph._degrees(e)
        pair = (
            e.join(deg.withColumnRenamed("v", "a"), "a")
            .withColumnRenamed("d", "x")
            .join(deg.withColumnRenamed("v", "b"), "b")
            .withColumnRenamed("d", "y")
            .select("x", "y")
        )
        ep = pair.unionAll(pair.selectExpr("y AS x", "x AS y"))
        return np.array([(r.x, r.y) for r in ep.collect()], dtype=float)

    # star K1,4: every edge joins the degree-4 hub to a degree-1 leaf
    rows = endpoint_pairs([(0, i) for i in range(1, 5)])
    assert abs(np.corrcoef(rows[:, 0], rows[:, 1])[0, 1] - (-1.0)) < 1e-9

    # cycle C5: all degrees equal -> zero variance
    e = graph._canonical_edges(
        spark.createDataFrame(
            [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
        ),
        "src", "dst",
    )
    assert {r.d for r in graph._degrees(e).collect()} == {2}
