"""Spark 4 Python Data Source for gridded model output → tall rows.

Reference parity: ref:snowav/framework/outputs.py reads NetCDF on the
driver and keeps every timestep in RAM.  This is the idiomatic Spark slot
for that reader (SURVEY §4 'custom work #1'): a registered DataSource whose
**partitions are files**, so

- each executor task opens exactly one grid file (no driver-side loads),
- Spark parallelizes across files and retries per file,
- the tall (date, y, x, variable, value) schema is declared up front, so
  Catalyst prunes columns like any other source.

Format here is the container-testable stand-in: one CSV per (variable,
date) named ``<variable>_<YYYY-MM-DD>.csv`` holding a dense grid (row i =
grid row, comma-separated values).  The NetCDF variant swaps the
``_read_grid`` body for a netCDF4 call — partitioning, schema, and task
shape are identical (see ingest.read_netcdf_outputs).

Usage::

    from snowav_spark import sources
    sources.register(spark)
    df = spark.read.format("snowav_raster").load("/path/to/griddir")
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import date

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RASTER_SCHEMA = StructType(
    [
        StructField("date", DateType(), False),
        StructField("y", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("variable", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str
    variable: str
    day: str  # ISO date — kept as str so the partition pickles cheaply


class RasterGridReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snowav_raster requires a load(path) directory")

    def partitions(self):
        parts = [
            _FilePartition(os.path.join(self.dir, name), variable, day)
            for name, variable, day in _grid_files(self.dir)
        ]
        if not parts:
            raise ValueError(f"no <variable>_<date>.csv grids under {self.dir}")
        return parts

    def read(self, partition: _FilePartition):
        yield from _grid_rows(partition.path, partition.variable, partition.day)


def _grid_rows(path: str, variable: str, day: str):
    d = date.fromisoformat(day)
    with open(path) as f:
        for y, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            for x, cell in enumerate(line.split(",")):
                yield (d, y, x, variable, float(cell))


def _grid_files(dirpath: str) -> list[tuple[str, str, str]]:
    """Sorted (filename, variable, iso-day) grid files under dirpath."""
    out = []
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".csv"):
            continue
        stem = name[: -len(".csv")]
        try:
            variable, day = stem.rsplit("_", 1)
            date.fromisoformat(day)
        except ValueError:
            continue
        out.append((name, variable, day))
    return out


class RasterGridStreamReader(SimpleDataSourceStreamReader):
    """EP2 as a true stream (ref:snowav/framework/framework.py's
    snowav(awsm=...) daily coupling, SURVEY §3 EP2 option b): the model
    drops one grid file per (variable, day) into the directory; each
    micro-batch reads exactly the files that appeared since the last
    offset.

    Offset = the SET of processed filenames (sorted list in the
    checkpoint JSON).  A high-water-mark name is NOT sound here: grid
    names sort by variable before date (``depth_m_…`` < ``swe_mm_…``),
    so a day's second variable arriving after the first's batch would
    sort below the mark and be silently skipped — a real bug this
    scheme replaced.  The set is exact under any arrival order, and its
    size is bounded by the run's file count (a daily model coupling —
    bulk backfills use the batch source, whose partitions are files
    read ON executors).  ``readBetweenOffsets`` replays exactly the
    files in ``end − start``, which is what makes a failed batch's
    retry read the same rows."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snowav_raster requires a load(path) directory")

    def initialOffset(self) -> dict:
        return {"seen": []}

    @staticmethod
    def _seen(offset: dict) -> set:
        return set(offset.get("seen", []))

    def _rows_for(self, names: set) -> list[tuple]:
        # materialized list (callers hand out iter(list) — a picklable
        # list_iterator): the simple-reader protocol reads on the DRIVER,
        # caches the iterator, and pickles it out to the plan; a plain
        # generator can't pickle and a bare list fails its next() calls.
        rows: list[tuple] = []
        for name, variable, day in _grid_files(self.dir):
            if name in names:
                rows.extend(
                    _grid_rows(os.path.join(self.dir, name), variable, day)
                )
        return rows

    def read(self, start: dict):
        seen = self._seen(start)
        new = {n for n, _, _ in _grid_files(self.dir) if n not in seen}
        if not new:
            return iter([]), dict(start)
        end = {"seen": sorted(seen | new)}
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_for(self._seen(end) - self._seen(start)))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing to clean up


class RasterGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snowav_raster"

    def schema(self) -> StructType:
        return RASTER_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return RasterGridReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return RasterGridStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(RasterGridDataSource)
