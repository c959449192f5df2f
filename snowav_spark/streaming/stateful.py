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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
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
