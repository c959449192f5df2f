"""load_table must normalize every physical timestamp encoding the driver
fixtures have shipped (INT64 nanos, µs NTZ, µs LTZ/adjusted-to-UTC) to the
same TIMESTAMP_NTZ wall times — round-2 regression: a fixture flip from
nanos to µs broke unix_micros-based sessionization mid-round."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from snowav_spark.io import clear_cache, load_table

WALL = [
    datetime.datetime(2024, 1, 1, 12, 30, 0),
    datetime.datetime(2024, 1, 2, 23, 59, 59, 500000),
    # odd microseconds: the ns epoch is NOT exactly double-representable
    # (ulp 256 at ~1.7e18), so this catches a float-division ns→µs path
    # that truncates one µs low on ~1.6% of values
    datetime.datetime(2024, 1, 3, 7, 7, 7, 123457),
    datetime.datetime(2024, 1, 4, 1, 2, 3, 999999),
]


def _write_events(tmp_path, ts_array):
    n = len(ts_array)
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, n + 1), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10 * i for i in range(1, n + 1)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5 * i for i in range(1, n + 1)], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("ns"),           # INT64 TIMESTAMP(NANOS) — round-1 form
        pa.timestamp("us"),           # naive µs — round-2 form (NTZ)
        pa.timestamp("us", tz="UTC"), # adjusted-to-UTC — hypothetical flip
    ],
    ids=["nanos", "us_ntz", "us_ltz"],
)
def test_ts_normalized_to_ntz_same_wall_time(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, pa.array(WALL, ts_type))
    clear_cache()
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        got = sorted(r.ts for r in df.select("ts").collect())
        assert got == WALL
    finally:
        clear_cache()  # tmp_path dirs are reused names across params
