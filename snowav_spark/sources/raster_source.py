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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
        parts = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".csv"):
                continue
            stem = name[: -len(".csv")]
            try:
                variable, day = stem.rsplit("_", 1)
                date.fromisoformat(day)
            except ValueError:
                continue  # not a grid file; ignore
            parts.append(
                _FilePartition(os.path.join(self.dir, name), variable, day)
            )
        if not parts:
            raise ValueError(f"no <variable>_<date>.csv grids under {self.dir}")
        return parts

    def read(self, partition: _FilePartition):
        d = date.fromisoformat(partition.day)
        with open(partition.path) as f:
            for y, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                for x, cell in enumerate(line.split(",")):
                    yield (d, y, x, partition.variable, float(cell))


class RasterGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snowav_raster"

    def schema(self) -> StructType:
        return RASTER_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return RasterGridReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(RasterGridDataSource)
