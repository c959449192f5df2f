"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.7; prompt: 'applyInPandasWithState for custom stateful
operators').

The example operator is the reference's season-to-date accumulation
(basin_total's cumulative SWI) as a *stream*: per group, carry a running
total across micro-batches in managed state, emitting the updated total
each trigger.  State is (sum, count) per key — O(groups) memory, exactly
the shape that runs forever on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("running_sum", DoubleType(), False),
        StructField("running_count", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType(), False),
        StructField("n", LongType(), False),
    ]
)


def _accumulate(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (s, n) = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        s += float(pdf["value"].sum())
        n += int(len(pdf))
    state.update((s, n))
    yield pd.DataFrame(
        {"event_type": [key[0]], "running_sum": [round(s, 6)], "running_count": [n]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Season-to-date running totals per event_type, maintained in managed
    state across micro-batches.  Use outputMode('update') on the sink."""
    return events.groupBy("event_type").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("valid_from", TimestampType(), False),
        StructField("valid_to", TimestampType(), False),
        StructField("n_events", LongType(), False),
    ]
)

# state = the OPEN segment: (attr nullable, valid_from epoch-µs, count).
# Epoch longs rather than timestamps keep the state codec trivial and
# the compare exact.
SCD2_STATE = StructType(
    [
        StructField("attr", StringType(), True),
        StructField("vf_us", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def _scd2_track(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur = list(state.get) if state.exists else None
    out: dict[str, list] = {
        "user_id": [],
        "event_type": [],
        "valid_from": [],
        "valid_to": [],
        "n_events": [],
    }
    frames = [p for p in pdfs if len(p)]
    if frames:
        df = pd.concat(frames).sort_values(["ts", "event_id"])
        for ts, attr in zip(df["ts"], df["event_type"]):
            attr = None if pd.isna(attr) else attr
            us = int(pd.Timestamp(ts).value // 1_000)
            if cur is None:
                cur = [attr, us, 1]
            elif attr == cur[0] or (attr is None and cur[0] is None):
                cur[2] += 1
            else:
                out["user_id"].append(int(key[0]))
                out["event_type"].append(cur[0])
                out["valid_from"].append(pd.Timestamp(cur[1] * 1_000))
                out["valid_to"].append(pd.Timestamp(us * 1_000))
                out["n_events"].append(cur[2])
                cur = [attr, us, 1]
    if cur is not None:
        state.update(tuple(cur))
    yield pd.DataFrame(out).astype(
        {
            "user_id": "int64",
            "event_type": "object",
            "valid_from": "datetime64[ns]",
            "valid_to": "datetime64[ns]",
            "n_events": "int64",
        }
    )


GROWTH_OUTPUT = StructType(
    [
        StructField("day", DateType(), False),
        StructField("cls", StringType(), False),
    ]
)

# state = (first active day, last active day) as proleptic ordinals —
# two longs per user, O(users) memory, runs forever.
GROWTH_STATE = StructType(
    [
        StructField("first_d", LongType(), False),
        StructField("last_d", LongType(), False),
    ]
)


def _classify_growth(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import datetime as _dt

    first_d, last_d = state.get if state.exists else (None, None)
    days: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            days.extend(
                pd.Timestamp(t).date().toordinal() for t in pdf["ts"]
            )
    out_day: list = []
    out_cls: list = []
    for d in sorted(set(days)):
        if first_d is None:
            cls = "new"
            first_d = last_d = d
        elif d == last_d:
            continue  # same-day re-delivery — benign, already classified
        elif d < last_d:
            # cross-batch out-of-order arrival: history this operator
            # cannot reclassify (state is only (first, last)).  Emit it
            # as its own class instead of dropping silently, so batch
            # parity drift is observable downstream (ADVICE r5).
            out_day.append(_dt.date.fromordinal(d))
            out_cls.append("late_dropped")
            continue
        elif d == last_d + 1:
            cls = "retained"
            last_d = d
        else:
            cls = "resurrected"
            last_d = d
        out_day.append(_dt.date.fromordinal(d))
        out_cls.append(cls)
    if first_d is not None:
        state.update((first_d, last_d))
    yield pd.DataFrame({"day": out_day, "cls": out_cls})


def growth_accounting_stream(events: DataFrame) -> DataFrame:
    """Streaming DAU decomposition — the stateful twin of the batch
    ``q_growth_accounting`` contract key: each newly observed
    (user, day) activity is classified NEW (first day ever), RETAINED
    (also active the previous day) or RESURRECTED (returning after a
    gap) the moment it arrives, carrying only (first_day, last_day)
    per user in managed state.  Downstream a per-day
    ``groupBy(day, cls).count()`` (or a foreachBatch merge into a
    rollup store) yields the live new/retained/resurrected counters a
    growth dashboard plots — without ever rescanning history, which is
    the point at 100 TB: the batch key re-reads the corpus, this
    maintains the same decomposition from two longs per user.

    Ordering contract (same as scd2_stream): each user's days must
    arrive non-decreasing across micro-batches (guaranteed when the
    source respects event time); a same-day re-delivery is skipped as
    already-classified, and a day STRICTLY older than the user's last
    classified day — history this operator cannot reclassify from
    (first, last) state — is emitted as cls='late_dropped' so batch
    parity drift is observable (alert on its volume) rather than
    silently absorbed.  Emits one row per
    newly observed (user, day) — append semantics, each classified
    exactly once.  Input columns: user_id, ts.  NULL user_id/ts rows
    are dropped up front — the batch twin filters them identically,
    and a NaT reaching pd.Timestamp(...).date() would kill the query
    (a poison-pill replay loop, since restarts re-read the batch).
    """
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _classify_growth,
        outputStructType=GROWTH_OUTPUT,
        stateStructType=GROWTH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CHURN_OUTPUT = StructType(
    [
        StructField("day", DateType(), False),  # churn day = last_day + 1
        # 'churn' | 'late_dropped' — the latter surfaces out-of-order
        # days this operator cannot reclassify (ADVICE r5); filter
        # kind == 'churn' for the counter, alert on late_dropped volume
        StructField("kind", StringType(), False),
    ]
)

CHURN_STATE = StructType([StructField("last_d", LongType(), False)])

_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()


def _detect_churn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import datetime as _dt

    if state.hasTimedOut:
        # the whole day after the user's last activity passed the
        # watermark with no new events: the user churned on that day
        (last_d,) = state.get
        state.remove()
        yield pd.DataFrame(
            {"day": [_dt.date.fromordinal(last_d + 1)], "kind": ["churn"]}
        )
        return
    last_d = state.get[0] if state.exists else None
    days: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            days.extend(
                pd.Timestamp(t).date().toordinal() for t in pdf["ts"]
            )
    out: list = []
    kinds: list = []
    for d in sorted(set(days)):
        if last_d is not None and d == last_d:
            continue  # same-day re-delivery — benign
        if last_d is not None and d < last_d:
            # out-of-order history: surface it instead of silent drop
            out.append(_dt.date.fromordinal(d))
            kinds.append("late_dropped")
            continue
        if last_d is not None and d > last_d + 1:
            # resurrection witnesses the gap: churn known immediately,
            # no need to wait for the timeout
            out.append(_dt.date.fromordinal(last_d + 1))
            kinds.append("churn")
        last_d = d
    if last_d is not None:
        state.update((last_d,))
        # fire once the whole candidate churn day (last_d + 1) is past
        # the watermark; clamp to wm+1 — late data can make the nominal
        # deadline already-past, and Spark rejects deadlines <= wm
        deadline_ms = (last_d + 2 - _EPOCH_ORD) * 86_400_000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline_ms, wm + 1))
    yield pd.DataFrame({"day": out, "kind": kinds})


def churn_stream(events: DataFrame, delay: str = "1 day") -> DataFrame:
    """Streaming churn detection — the stateful twin of the batch
    ``q_churn`` contract key, and the operator that NEEDS event-time
    timeouts: churn is the *absence* of activity, which no arriving
    record can witness.  Two emission paths cover it exactly once per
    gap: a returning user's resurrection proves the earlier gap
    immediately (emit on data), and a user who never returns is caught
    by the state timeout once the watermark passes the end of the day
    after their last activity (emit on timeout, state freed — O(1) per
    quiet user, so state shrinks as users churn instead of growing
    forever).  Downstream ``groupBy(day).count()`` is the live churn
    counter; summed with ``growth_accounting_stream`` classes it closes
    the DAU identity DAUₜ−DAUₜ₋₁ = new + resurrected − churned without
    rescanning history.

    Frontier semantics: churn on day c is emittable once the watermark
    passes the start of c+1, so the stream lags the batch key by one
    day at the live edge (the batch key's max-day row needs the full
    corpus; the stream's needs tomorrow's watermark) — the standard
    completeness/latency tradeoff, asserted in the parity test.
    A user reappearing after their timeout fired starts fresh state;
    the churn already emitted for them stays correct.  Input columns:
    user_id, ts (watermark applied here with ``delay``).  NULL
    user_id/ts rows are dropped up front (same rationale as
    growth_accounting_stream)."""
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect_churn,
            outputStructType=CHURN_OUTPUT,
            stateStructType=CHURN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD type-2 build — the stateful twin of
    ``ops.windows.scd2_segments``: per user the OPEN validity segment
    lives in managed state (three scalars — O(users) memory, runs
    forever); an attribute change CLOSES the previous segment and emits
    it downstream (append semantics: each history row is emitted exactly
    once, when it closes).  The final open segment stays in state, never
    emitted — exactly the "current" row a dimension merge would upsert.

    Ordering contract: events are sequenced by (ts, event_id) WITHIN
    each micro-batch; cross-batch order is the arrival order, so feed
    this from a source that respects event time (or accept
    arrival-order semantics, the standard CDC-stream tradeoff).
    Input columns: user_id, ts, event_type, event_id.  NULL
    user_id/ts rows are dropped up front — a NULL-keyed group would
    crash int(key[0]) and poison the query (same rationale as
    growth_accounting_stream).
    """
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_track,
        outputStructType=SCD2_OUTPUT,
        stateStructType=SCD2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
