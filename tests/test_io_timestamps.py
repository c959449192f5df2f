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
]


def _write_events(tmp_path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "buy"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
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
