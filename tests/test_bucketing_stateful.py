"""Bucketed co-located joins (exchange-free) and applyInPandasWithState
running totals across micro-batches."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from snowav_spark.io import load_table
from snowav_spark.sinks import write_bucketed
from snowav_spark.streaming import incremental, stateful


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf; managed tables land in the default
    # ./spark-warehouse (gitignored) and are dropped below
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        sort_col="o_orderkey",
    )
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    # at fixture scale Spark rightly prefers broadcast; disable it so the
    # bucketed sort-merge path (the 100 TB big-big case) is what we assert
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        # co-bucketed join: the join itself requires NO shuffle; the only
        # exchange allowed is the tiny post-join groupBy
        pre_join = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in pre_join, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it matches the plain join's result
    plain = (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .join(orders, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_stateful_running_totals_across_batches(spark, sf_dir, tmp_path):
    """State must persist across two availableNow runs via the checkpoint."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    half1 = ev.filter(F.dayofmonth("ts") <= 15)
    half2 = ev.filter(F.dayofmonth("ts") > 15)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half1.write.parquet(src)

    def run_once():
        stream = incremental.stream_source(spark, src, half1.schema)
        totals = stateful.running_totals_stream(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            totals.writeStream.foreachBatch(sink)  # file sinks reject
            .outputMode("update")  # update mode; foreachBatch accepts it
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {
        r.event_type: (r.running_sum, r.running_count)
        for r in spark.read.parquet(out).collect()
    }
    # second batch arrives; totals must CONTINUE from state, not restart
    half2.write.mode("append").parquet(src)
    run_once()
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        cur = latest.get(r.event_type)
        if cur is None or r.running_count > cur[1]:
            latest[r.event_type] = (r.running_sum, r.running_count)
    expected = {
        r.event_type: (round(r.s, 6), r.n)
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    for et, (s, n) in expected.items():
        assert latest[et][1] == n, f"{et}: count {latest[et][1]} != {n}"
        assert latest[et][0] == pytest.approx(s, abs=1e-3)
        assert first[et][1] < n  # first run really was partial


def test_growth_stream_matches_batch_decomposition(spark, sf_dir, tmp_path):
    """Streaming growth accounting must reproduce the batch
    q_growth_accounting decomposition exactly when days arrive in
    event-time order, with (first_day, last_day) state carried across
    two availableNow runs via the checkpoint."""
    from snowav_spark.contract import QUERIES

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    half1 = ev.filter(F.dayofmonth("ts") <= 15)
    half2 = ev.filter(F.dayofmonth("ts") > 15)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half1.write.parquet(src)

    def run_once():
        stream = incremental.stream_source(spark, src, half1.schema)
        cls = stateful.growth_accounting_stream(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            cls.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # cross-run state: user first seen in half1 and returning in half2
    # must classify retained/resurrected, never new again
    half2.write.mode("append").parquet(src)
    run_once()

    got = {
        (r.day, r.cls): r.n
        for r in spark.read.parquet(out)
        .groupBy("day", "cls")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expect = {}
    for r in QUERIES["q_growth_accounting"](spark, sf_dir).collect():
        for cls, n in (
            ("new", r.n_new),
            ("retained", r.n_retained),
            ("resurrected", r.n_resurrected),
        ):
            if n:
                expect[(r.day, cls)] = n
    assert got == expect
    # every (user, day) classified exactly once across both runs
    n_pairs = ev.select(F.to_date("ts").alias("d"), "user_id").distinct().count()
    assert spark.read.parquet(out).count() == n_pairs


def test_churn_stream_matches_batch_behind_watermark(spark, sf_dir, tmp_path):
    """Streaming churn (resurrection-witnessed + event-time timeout)
    must equal the batch q_churn decomposition for every churn day the
    watermark has fully passed; the only permitted difference is the
    live edge (the batch key's final-day row, which the stream can only
    emit once tomorrow's watermark arrives)."""
    from snowav_spark.contract import QUERIES

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    half1 = ev.filter(F.dayofmonth("ts") <= 15)
    half2 = ev.filter(F.dayofmonth("ts") > 15)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half1.write.parquet(src)

    def run_once():
        stream = incremental.stream_source(spark, src, half1.schema)
        churn = stateful.churn_stream(stream, delay="0 seconds")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            churn.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    half2.write.mode("append").parquet(src)
    run_once()

    got = {
        r.day: r.n
        for r in spark.read.parquet(out)
        .filter(F.col("kind") == "churn")
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # in-order replay: no out-of-order days may surface
    assert (
        spark.read.parquet(out).filter(F.col("kind") == "late_dropped").count()
        == 0
    )
    batch = {
        r.day: r.n_churned
        for r in QUERIES["q_churn"](spark, sf_dir).collect()
    }
    max_day = ev.select(F.max(F.to_date("ts"))).first()[0]
    expect = {d: n for d, n in batch.items() if d < max_day}
    assert got == expect
    # the live edge is exactly the final-day batch row (when present)
    assert set(batch) - set(got) <= {max_day}


def test_scd2_stream_matches_batch_closed_segments(spark, sf_dir, tmp_path):
    """Streaming SCD2 must emit exactly the CLOSED segments the batch
    operator produces (valid_to non-NULL), with state carrying open
    segments across two availableNow runs via the checkpoint."""
    from snowav_spark.ops import windows as w_ops

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    ).filter(F.col("user_id").isNotNull())
    half1 = ev.filter(F.dayofmonth("ts") <= 15)
    half2 = ev.filter(F.dayofmonth("ts") > 15)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half1.write.parquet(src)

    def run_once():
        stream = incremental.stream_source(spark, src, half1.schema)
        seg = stateful.scd2_stream(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            seg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    half2.write.mode("append").parquet(src)
    run_once()

    got = sorted(
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    # batch reference: closed segments only (valid_to IS NOT NULL).
    # The two halves arrive in event-time order, so streaming order ==
    # batch order here.
    expect = sorted(
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.n_events)
        for r in w_ops.scd2_segments(
            ev, "user_id", "ts", "event_type", "event_id"
        )
        .filter(F.col("valid_to").isNotNull())
        .collect()
    )
    assert got == expect


def test_growth_stream_surfaces_out_of_order_days(spark, tmp_path):
    """A day arriving BELOW the user's last classified day cannot be
    reclassified from (first, last) state — it must surface as
    cls='late_dropped', never vanish silently (ADVICE r5)."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )
    import datetime as dt

    schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("ts", TimestampType(), True),
        ]
    )
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = incremental.stream_source(spark, src, schema)
        cls = stateful.growth_accounting_stream(stream)
        q = (
            cls.writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    d = lambda day: dt.datetime(2023, 1, day, 12, 0)  # noqa: E731
    spark.createDataFrame([(1, d(5))], schema).write.parquet(src)
    run_once()
    spark.createDataFrame([(1, d(3)), (1, d(6))], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = {(r.day, r.cls) for r in spark.read.parquet(out).collect()}
    assert got == {
        (dt.date(2023, 1, 5), "new"),
        (dt.date(2023, 1, 3), "late_dropped"),
        (dt.date(2023, 1, 6), "retained"),
    }


def _protobuf_available() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's driver worker needs google.protobuf "
    "(absent in this container; operator is still exercised for plan "
    "construction below)",
)
def test_transform_with_state_topk_leaderboard(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: MapState-backed running top-k
    per event_type in exact micro-units, state carried across two
    availableNow runs via the checkpoint (RocksDB provider)."""
    from snowav_spark.streaming import tws

    schema = "event_type STRING, user_id BIGINT, value DOUBLE"
    rows1 = [("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 1.0), ("b", 9, 2.0)]
    rows2 = [("a", 2, 20.0), ("a", 4, 7.0)]  # user 2 overtakes, 4 enters
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:

        def run_once():
            stream = incremental.stream_source(
                spark, src, spark.createDataFrame([], schema).schema
            )
            board = tws.top_spenders_stream(stream, k=2)
            q = (
                board.writeStream.foreachBatch(
                    lambda b, i: b.withColumn("batch", F.lit(i))
                    .write.mode("append")
                    .parquet(out)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame(rows1, schema).write.parquet(src)
        run_once()
        spark.createDataFrame(rows2, schema).write.mode("append").parquet(
            src
        )
        run_once()

        df = spark.read.parquet(out)
        last = df.filter(F.col("batch") == df.agg(F.max("batch")).collect()[0][0])
        got = {
            (r.event_type, r.rank): (r.user_id, r.total_v)
            for r in last.collect()
        }
        # after both batches: a → user 2 = 25.0 leads, user 1 = 10.0
        assert got[("a", 1)] == (2, 25.0)
        assert got[("a", 2)] == (1, 10.0)
        # first batch's board must have had user 1 leading group a
        first = {
            (r.event_type, r.rank): (r.user_id, r.total_v)
            for r in df.filter(F.col("batch") == 0).collect()
        }
        assert first[("a", 1)] == (1, 10.0)
        assert first[("b", 1)] == (9, 2.0)
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_plan_constructs(spark):
    """Even without protobuf (needed only by the runtime driver worker),
    the transformWithState plan must CONSTRUCT: operator wiring, output
    schema, and processor registration are validated at build time."""
    from snowav_spark.streaming import tws

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "'a' AS event_type", "value AS user_id",
            "cast(value AS DOUBLE) AS value",
        )
    )
    board = tws.top_spenders_stream(stream, k=2)
    assert [f.name for f in board.schema.fields] == [
        "event_type", "rank", "user_id", "total_v",
    ]
    assert board.isStreaming


def test_topk_processor_logic_unit():
    """Drive TopSpendersProcessor.handleInputRows directly with a fake
    MapState — the exact-micro accumulation and pinned tie-break are pure
    Python and testable without the streaming runtime."""
    import pandas as pd

    from snowav_spark.streaming import tws

    class FakeMap:
        def __init__(self):
            self.d = {}

        def containsKey(self, k):
            return k in self.d

        def getValue(self, k):
            return self.d[k]

        def updateValue(self, k, v):
            self.d[k] = v

        def iterator(self):
            return iter(self.d.items())

    class FakeList:
        def __init__(self):
            self.rows = []

        def exists(self):
            return bool(self.rows)

        def get(self):
            return iter(self.rows)

        def put(self, rows):
            self.rows = [tuple(r) for r in rows]

    p = tws.TopSpendersProcessor(k=2)
    p.totals = FakeMap()
    p.board = FakeList()
    batch = pd.DataFrame(
        {"user_id": [1, 2, 1, 3], "value": [10.0, 5.0, 2.5, float("nan")]}
    )
    (out,) = list(p.handleInputRows(("a",), iter([batch]), None))
    assert out["user_id"].tolist() == [1, 2]
    assert out["total_v"].tolist() == [12.5, 5.0]
    assert out["rank"].tolist() == [1, 2]
    # second batch: user 2 overtakes; NaN/out-of-domain rows dropped
    batch2 = pd.DataFrame({"user_id": [2], "value": [100.0]})
    (out2,) = list(p.handleInputRows(("a",), iter([batch2]), None))
    assert out2["user_id"].tolist() == [2, 1]
    assert out2["total_v"].tolist() == [105.0, 12.5]


def test_topk_processor_incremental_board_matches_rescan():
    """The cached-board fast path must equal a cold full rescan in every
    regime: monotone growth, a NEGATIVE delta on a board member (forces
    the rescan path — its replacement can be any map entry), and a cold
    cache after 'restart' (new processor instance over the same state)."""
    import pandas as pd

    from snowav_spark.streaming import tws

    class FakeMap:
        def __init__(self, d=None):
            self.d = dict(d or {})

        def containsKey(self, k):
            return k in self.d

        def getValue(self, k):
            return self.d[k]

        def updateValue(self, k, v):
            self.d[k] = v

        def iterator(self):
            return iter(self.d.items())

    class FakeList:
        def __init__(self):
            self.rows = []

        def exists(self):
            return bool(self.rows)

        def get(self):
            return iter(self.rows)

        def put(self, rows):
            self.rows = [tuple(r) for r in rows]

    def board_of(out):
        return list(zip(out["user_id"], out["total_v"]))

    def cold_board(state, k=2):
        p = tws.TopSpendersProcessor(k=k)
        p.totals = FakeMap(state.d)
        p.board = FakeList()
        (out,) = list(
            p.handleInputRows(("a",), iter([pd.DataFrame(
                {"user_id": [], "value": []})]), None)
        )
        return board_of(out)

    p = tws.TopSpendersProcessor(k=2)
    p.totals = FakeMap()
    p.board = FakeList()
    batches = [
        {"user_id": [1, 2, 3], "value": [10.0, 8.0, 6.0]},   # build
        {"user_id": [3, 4], "value": [1.0, 7.5]},            # monotone merge
        {"user_id": [1], "value": [-9.0]},                   # board member drops
        {"user_id": [5], "value": [7.9]},                    # newcomer enters
    ]
    for b in batches:
        (out,) = list(p.handleInputRows(("a",), iter([pd.DataFrame(b)]), None))
        assert board_of(out) == cold_board(p.totals), b
    # after the negative batch, user 1 (10-9=1) must have been replaced
    assert 1 not in {u for u, _ in board_of(out)}
