"""Spark 4 Python Data Source for NetCDF model output → tall rows.

Reference parity: ref:snowav/framework/outputs.py opens ``snow.nc`` /
``em.nc`` with netCDF4 on the driver and keeps every timestep in RAM.
This is the fully-Spark-native slot: ``spark.read.format("snowav_netcdf")``
over a directory of NetCDF files (classic CDF-1/2/5 *or* HDF5-backed
NetCDF-4 — sources.open_dataset sniffs per file, no native library).

Scale design — better than file-per-task:

- **Partitions are (file, variable, timestep-range)**, planned from
  header-only opens on the driver (mmap faults in just the header
  pages).  A 10-year daily cube splits into many tasks instead of one
  giant one, so executor memory per task is ``steps_per_task`` grids
  and stragglers shrink with the split, not the file.
- **Executors read slabs**: ``Dataset.values(var, first=slice(lo, hi))``
  prunes chunks by the B-tree's leading offset (HDF5) or strides records
  (classic), faulting in only the requested timesteps.
- **Rows leave Python as Arrow RecordBatches** (one per timestep), the
  Python-DataSource fast path — no per-cell Python tuples.

Usage::

    from snowav_spark.sources import netcdf_source
    netcdf_source.register(spark)
    df = (spark.read.format("snowav_netcdf")
          .option("variables", "specific_mass,thickness")
          .load("/path/to/run_dir"))
"""

from __future__ import annotations

import os
from dataclasses import dataclass

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
        # nullable: masked (out-of-basin) cells arrive as NULL so Spark
        # aggregates skip them — the reference's masked-mean semantics
        StructField("value", DoubleType(), True),
    ]
)


@dataclass
class _SlabPartition(InputPartition):
    path: str
    variable: str
    lo: int  # first timestep (inclusive)
    hi: int  # last timestep (exclusive)
    time_var: str


def _list_netcdf(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith((".nc", ".nc4", ".cdf"))
    )


def _data_variables(ds, time_var: str) -> list[str]:
    """Auto-discovery shared by the batch and stream readers: every 3-D
    variable led by the time dim, excluding the coordinate itself — the
    (time, y, x) model-output grids."""
    return [
        n
        for n, v in sorted(ds.variables.items())
        if n != time_var and v.dims and v.dims[0] == time_var
        and len(v.dims) == 3
    ]


class NetCDFReader(DataSourceReader):
    """Batch reader: one time SLAB (steps_per_task steps of one
    variable in one file) = one input partition.

    Date/variable predicate PUSHDOWN (round 10, mirrors the Zarr
    reader): pushed ``date`` comparisons and ``variable`` equality or
    membership prune slabs at PLANNING — the time coordinate is a tiny
    1-D variable the planner already has the header for, so a
    ``WHERE date >= '2020-03-01'`` over a water-year archive plans only
    the intersecting slabs.  Inexact (a slab spans several dates), so
    every accepted filter is also re-evaluated row-level by Spark."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snowav_netcdf requires a load(path) file or dir")
        self.variables = [
            v for v in (options.get("variables") or "").split(",") if v
        ]
        self.time_var = options.get("time_var", "time")
        self.steps_per_task = int(options.get("steps_per_task", "8"))
        self._date_lo = None  # closed datetime.date bounds
        self._date_hi = None
        self._vars: set | None = None

    def pushFilters(self, filters):
        import datetime

        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        day = datetime.timedelta(days=1)
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            val = getattr(f, "value", None)
            if col == "date" and isinstance(val, datetime.date):
                lo = hi = None
                if isinstance(f, EqualTo):
                    lo, hi = val, val
                elif isinstance(f, GreaterThan):
                    lo = val + day
                elif isinstance(f, GreaterThanOrEqual):
                    lo = val
                elif isinstance(f, LessThan):
                    hi = val - day
                elif isinstance(f, LessThanOrEqual):
                    hi = val
                if lo is not None:
                    self._date_lo = (
                        lo if self._date_lo is None
                        else max(self._date_lo, lo)
                    )
                if hi is not None:
                    self._date_hi = (
                        hi if self._date_hi is None
                        else min(self._date_hi, hi)
                    )
            elif col == "variable" and isinstance(f, EqualTo) and isinstance(
                val, str
            ):
                v = {val}
                self._vars = v if self._vars is None else self._vars & v
            elif col == "variable" and isinstance(f, In) and all(
                isinstance(x, str) for x in val
            ):
                v = set(val)
                self._vars = v if self._vars is None else self._vars & v
            yield f  # inexact pushdown: Spark re-evaluates row-level

    def _slab_dates(self, ds):
        """Per-timestep dates of one file — the 1-D time coordinate,
        read once at planning (bytes, not grids)."""
        from snowav_spark.ingest import _num2date

        tv = ds.variables[self.time_var]
        tvals = ds.values(self.time_var).astype(float)
        dts = _num2date(
            tvals, str(tv.attrs.get("units", "days since 1970-01-01"))
        )
        import pandas as pd

        return [pd.Timestamp(d).date() for d in dts]

    def partitions(self):
        from snowav_spark.sources import open_dataset

        want_dates = (
            self._date_lo is not None or self._date_hi is not None
        )
        parts: list[_SlabPartition] = []
        for p in _list_netcdf(self.path):
            ds = open_dataset(p)  # header-only cost: data reads are lazy
            if self.time_var not in ds.variables:
                raise ValueError(f"{p}: no time variable {self.time_var!r}")
            steps = int(ds.dims.get(self.time_var, 0))
            names = self.variables or _data_variables(ds, self.time_var)
            dates = self._slab_dates(ds) if want_dates and steps else None
            for var in names:
                if var not in ds.variables:
                    raise ValueError(f"{p}: no variable {var!r}")
                if self._vars is not None and var not in self._vars:
                    continue
                for lo in range(0, steps, self.steps_per_task):
                    hi = min(lo + self.steps_per_task, steps)
                    if dates is not None:
                        s_lo = min(dates[lo:hi])
                        s_hi = max(dates[lo:hi])
                        if (
                            self._date_lo is not None
                            and s_hi < self._date_lo
                        ) or (
                            self._date_hi is not None
                            and s_lo > self._date_hi
                        ):
                            continue
                    parts.append(
                        _SlabPartition(p, var, lo, hi, self.time_var)
                    )
        if not parts:
            if self._vars is not None or want_dates:
                # predicate pruned everything: zero-row marker
                return [_SlabPartition("", "", 0, 0, self.time_var)]
            raise ValueError(f"no NetCDF files with timesteps under {self.path}")
        return parts

    def read(self, part: _SlabPartition):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from snowav_spark.ingest import _num2date
        from snowav_spark.sources import masked_to_nan, open_dataset

        if not part.path:
            return  # pruned-to-nothing marker partition: zero rows
        ds = open_dataset(part.path)
        tv = ds.variables[part.time_var]
        tvals = ds.values(
            part.time_var, first=slice(part.lo, part.hi)
        ).astype(float)
        dates = _num2date(
            tvals, str(tv.attrs.get("units", "days since 1970-01-01"))
        )
        # ONE slab read per partition: a chunk whose time extent spans
        # several steps (netCDF4-c defaults are not always time=1) is
        # located and decompressed once, not once per step; memory is
        # bounded at steps_per_task grids either way.  masked_to_nan maps
        # _FillValue/missing_value sentinels to NaN (netCDF4 parity).
        slab = masked_to_nan(
            ds.values(part.variable, first=slice(part.lo, part.hi)),
            ds.variables[part.variable].attrs,
        )
        for i, d in enumerate(dates):
            grid = slab[i]
            ys, xs = np.indices(grid.shape)
            n = grid.size
            vals = grid.ravel()
            yield pa.record_batch(
                [
                    pa.array([pd.Timestamp(d).date()] * n, pa.date32()),
                    pa.array(ys.ravel().astype("int32"), pa.int32()),
                    pa.array(xs.ravel().astype("int32"), pa.int32()),
                    pa.array([part.variable] * n, pa.string()),
                    # masked cells → Arrow nulls (mask=True marks null)
                    pa.array(vals, pa.float64(), mask=np.isnan(vals)),
                ],
                names=["date", "y", "x", "variable", "value"],
            )


class NetCDFStreamReader(SimpleDataSourceStreamReader):
    """EP2 as a stream over REAL model output: the coupled model drops
    one NetCDF file per run into the directory; each micro-batch reads
    exactly the files that appeared since the checkpointed offset.

    Offset = the SET of processed filenames (sorted list in the
    checkpoint JSON) — exact under ANY arrival order; a
    high-water-mark name silently skips files that sort below the mark
    (see raster_source.RasterGridStreamReader, where per-variable
    grid names made that a real bug).  ``readBetweenOffsets`` replays
    exactly the files in ``end − start``, so a failed batch's retry
    reads the same rows.  Reads happen driver-side per the
    simple-reader protocol — right for the one-file-per-day cadence;
    bulk backfills use the batch source, whose slab partitions read on
    executors."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snowav_netcdf requires a load(path) directory")
        self.variables = [
            v for v in (options.get("variables") or "").split(",") if v
        ]
        self.time_var = options.get("time_var", "time")

    def initialOffset(self) -> dict:
        return {"seen": []}

    @staticmethod
    def _seen(offset: dict) -> set:
        return set(offset.get("seen", []))

    def _rows(self, names: set) -> list[tuple]:
        import numpy as np
        import pandas as pd

        from snowav_spark.ingest import _num2date
        from snowav_spark.sources import masked_to_nan, open_dataset

        rows: list[tuple] = []
        for p in _list_netcdf(self.path):
            name = os.path.basename(p)
            if name not in names:
                continue
            ds = open_dataset(p)
            tv = ds.variables[self.time_var]
            dates = _num2date(
                ds.values(self.time_var).astype(float),
                str(tv.attrs.get("units", "days since 1970-01-01")),
            )
            # NOTE: a distinct binding from the `names` PARAMETER (the set
            # of new filenames) — rebinding it here once skipped every
            # later file in a multi-file micro-batch.
            var_names = self.variables or _data_variables(ds, self.time_var)
            for var in var_names:
                for ti, d in enumerate(dates):
                    grid = masked_to_nan(
                        ds.values(var, first=slice(ti, ti + 1))[0],
                        ds.variables[var].attrs,
                    )
                    day = pd.Timestamp(d).date()
                    # vectorized row construction (ravel + zip), not a
                    # per-cell double loop: one dropped 1500x1500 grid is
                    # 2.25M cells — numpy builds the index/value columns,
                    # Python only zips them into the protocol's tuples
                    ys, xs = np.indices(grid.shape)
                    # masked cells → None (SQL NULL), matching the batch
                    # reader's Arrow null mask
                    vals = grid.ravel().astype(object)
                    vals[~np.isfinite(grid.ravel())] = None
                    rows.extend(
                        zip(
                            [day] * grid.size,
                            ys.ravel().tolist(),
                            xs.ravel().tolist(),
                            [var] * grid.size,
                            vals.tolist(),
                        )
                    )
        return rows

    def read(self, start: dict):
        seen = self._seen(start)
        new = {
            os.path.basename(p)
            for p in _list_netcdf(self.path)
            if os.path.basename(p) not in seen
        }
        if not new:
            return iter([]), dict(start)
        end = {"seen": sorted(seen | new)}
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(self._seen(end) - self._seen(start)))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing to clean up


class NetCDFDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snowav_netcdf"

    def schema(self) -> StructType:
        return RASTER_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return NetCDFReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return NetCDFStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(NetCDFDataSource)
