"""Scale probe for the stateful-streaming surfaces (VERDICT r6 item 8):
per-batch latency and state growth at 1M events with out-of-order
arrival.

Two probes, matching what this container can actually run:

A. **TWS processor logic** (streaming/tws.py TopSpendersProcessor) —
   the transformWithStateInPandas ENGINE needs google.protobuf (absent
   here; the e2e test skips with that reason), but the processor's
   per-batch Python cost and state-size behavior are measurable by
   driving handleInputRows directly against a dict-backed MapState shim
   (the same shim the unit test uses).  This isolates exactly the code
   WE wrote; RocksDB round-trip costs are the engine's, not ours.

B. **applyInPandasWithState end-to-end** (streaming/stateful.py
   growth_accounting_stream) — a real StreamingQuery over staged file
   drops, availableNow per drop, with SHUFFLED (out-of-order) event
   arrival and a checkpoint restart between drops (replay).  Per-user
   state (two longs) makes state rows == distinct users, so
   stateOperators.numRowsTotal tracks growth directly.

Run from a QUIESCENT machine (SCALE.md round-5 postmortem: overlapped
probes fabricate ratios).

Usage: python tools/probe_tws.py [n_events] [n_batches]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


class _FakeMap:
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


class _FakeList:
    def __init__(self):
        self.rows = []

    def exists(self):
        return bool(self.rows)

    def get(self):
        return iter(self.rows)

    def put(self, rows):
        self.rows = [tuple(r) for r in rows]


def probe_processor(n_events: int, n_batches: int, n_users: int) -> None:
    from snowav_spark.streaming import tws

    rng = np.random.default_rng(7)
    types = [f"t{i}" for i in range(5)]
    per_group: dict[str, tws.TopSpendersProcessor] = {}
    for t in types:
        p = tws.TopSpendersProcessor(k=3)
        p.totals = _FakeMap()
        p.board = _FakeList()
        per_group[t] = p

    per_batch = n_events // n_batches
    print(
        f"A) TWS processor logic: {n_events} events, {n_batches} batches,"
        f" {n_users} users, {len(types)} groups"
    )
    for b in range(n_batches):
        # out-of-order by construction: users drawn randomly every batch
        uid = rng.integers(0, n_users, per_batch)
        val = rng.random(per_batch) * 100
        tix = rng.integers(0, len(types), per_batch)
        t0 = time.time()
        for gi, t in enumerate(types):
            m = tix == gi
            pdf = pd.DataFrame({"user_id": uid[m], "value": val[m]})
            for _ in per_group[t].handleInputRows((t,), iter([pdf]), None):
                pass
        dt = time.time() - t0
        state_rows = sum(len(p.totals.d) for p in per_group.values())
        print(
            f"  batch {b}: {dt:.3f}s, state rows {state_rows}"
            f" ({per_batch} events)"
        )


def probe_engine(n_events: int, n_drops: int) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from snowav_spark.session import get_spark
    from snowav_spark.streaming import stateful

    spark = get_spark(
        shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"}
    )
    td = tempfile.mkdtemp(prefix="tws_probe_")
    src, out, ckpt = f"{td}/src", f"{td}/out", f"{td}/ckpt"
    rng = np.random.default_rng(11)
    n_users = n_events // 10
    per_drop = n_events // n_drops
    print(
        f"B) applyInPandasWithState engine (growth_accounting_stream):"
        f" {n_events} events, {n_drops} drops, {n_users} users,"
        f" checkpoint restart after each drop"
    )
    base = pd.Timestamp("2024-01-01")
    for d in range(n_drops):
        uid = rng.integers(0, n_users, per_drop)
        # days mostly advance with the drop but ~10% arrive out of order
        day = np.full(per_drop, d * 3) + rng.integers(0, 3, per_drop)
        late = rng.random(per_drop) < 0.10
        day[late] = rng.integers(0, max(d * 3, 1), late.sum())
        ts = base + pd.to_timedelta(day, unit="D")
        pdf = pd.DataFrame({"user_id": uid, "ts": ts})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            src
        )
        stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
        t0 = time.time()
        q = (
            stateful.growth_accounting_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.time() - t0
        prog = q.lastProgress
        state_rows = (
            prog["stateOperators"][0]["numRowsTotal"]
            if prog and prog.get("stateOperators")
            else -1
        )
        print(
            f"  drop {d}: {dt:.2f}s wall (incl. restart), state rows"
            f" {state_rows}"
        )
    got = spark.read.parquet(out)
    by_cls = {r["cls"]: r["n"] for r in got.groupBy("cls").agg(
        F.count("*").alias("n")).collect()}
    print(f"  classified rows by cls: {by_cls}")
    shutil.rmtree(td, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    probe_processor(n, b, n_users=n // 10)
    probe_engine(n, max(b // 2, 2))
