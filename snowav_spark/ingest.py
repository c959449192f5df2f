"""Raster ingestion: gridded model output → tall DataFrame.

Reference parity: ref:snowav/framework/outputs.py opens ``snow.nc`` /
``em.nc`` with netCDF4, selects variable bands, subsets timesteps — and
loads everything into driver RAM.  Here ingestion is distributed:

- **NetCDF path** (gated: netCDF4/xarray are not in this container): list
  files → ``binaryFile``-style distribution of *paths* → ``mapInPandas``
  opens each file on an executor and emits tall (date, y, x, variable,
  value) batches.  One file never needs to fit on the driver, and files
  parallelize across executors.  The Spark 4 Python DataSource API is the
  long-term slot (SURVEY §4).
- **Synthetic path** (always available): deterministic gridded fixture
  generator used by the gold e2e test — same schema, same tall shape.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

TOPO_SCHEMA = StructType(
    [
        StructField("y", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("elevation", DoubleType(), False),
        StructField("basin_id", StringType(), False),
    ]
)


def _num2date(nums, units: str):
    """Minimal CF 'X since Y' time decoding ('days/hours/minutes/seconds
    since <ISO date[time]>') — what the reference's snow.nc carries."""
    unit, _, anchor = units.partition(" since ")
    # CF/udunits accepts singular and plural unit names ('day'/'days');
    # normalize to the stem so both decode.
    stem = unit.strip().lower().rstrip("s")
    step = pd.to_timedelta(
        1, unit={"day": "D", "hour": "h", "minute": "m", "second": "s"}[stem]
    )
    origin = pd.Timestamp(anchor.strip())
    return [origin + float(n) * step for n in nums]


def read_netcdf_outputs(
    spark: SparkSession, paths: list[str], variables: list[str],
    time_var: str = "time",
) -> DataFrame:
    """Distributed NetCDF → tall frame.  Each executor task opens one file
    and streams its grids out as Arrow batches; the driver only ships the
    path list.

    No native library needed: classic (CDF-1/2/5) files parse via
    sources/netcdf3.py and HDF5-backed NetCDF-4 files via sources/hdf5.py
    (both pure NumPy, dispatched by magic bytes); when netCDF4 is
    installed it is preferred."""
    paths_df = spark.createDataFrame([(p,) for p in paths], ["path"])

    def read_file(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        try:  # executor-side import; optional
            import netCDF4 as nc
        except ImportError:
            nc = None
        from snowav_spark.sources import masked_to_nan, open_dataset

        for pdf in batches:
            for path in pdf["path"]:
                if nc is not None:
                    ds = nc.Dataset(path)
                    # python datetimes (not cftime objects — pd.Timestamp
                    # can't convert those); honor time_var like the
                    # pure-python branch; fill MASKED cells (out-of-basin
                    # in real model output) with NaN — np.asarray would
                    # silently emit the raw _FillValue as data
                    dates = nc.num2date(
                        ds[time_var][:],
                        ds[time_var].units,
                        only_use_cftime_datetimes=False,
                        only_use_python_datetimes=True,
                    )
                    read_step = lambda v, ti: np.ma.filled(  # noqa: E731
                        np.ma.masked_invalid(ds[v][ti]).astype(float), np.nan
                    )
                else:
                    ds = open_dataset(path)
                    tv = ds.variables[time_var]
                    dates = _num2date(
                        ds.values(time_var).astype(float),
                        str(tv.attrs.get("units", "days since 1970-01-01")),
                    )
                    # slab read: one timestep faulted in at a time, so a
                    # multi-GiB (time, y, x) cube never needs cube-sized
                    # executor memory — mmap pages + one grid per step;
                    # masked_to_nan fills _FillValue/missing_value
                    # sentinels with NaN, matching the netCDF4 branch
                    read_step = lambda v, ti: masked_to_nan(  # noqa: E731
                        ds.values(v, first=slice(ti, ti + 1))[0],
                        ds.variables[v].attrs,
                    )
                for var in variables:
                    for ti, d in enumerate(dates):
                        grid = read_step(var, ti)
                        ys, xs = np.indices(grid.shape)
                        yield pd.DataFrame(
                            {
                                "date": pd.Timestamp(d).date(),
                                "y": ys.ravel().astype("int32"),
                                "x": xs.ravel().astype("int32"),
                                "variable": var,
                                "value": grid.ravel(),
                            }
                        )

    return paths_df.mapInPandas(read_file, RASTER_SCHEMA)


def read_zarr_outputs(
    spark: SparkSession, path: str, time_var: str = "time"
) -> DataFrame:
    """Zarr model output → the same tall (date, y, x, variable, value)
    frame read_netcdf_outputs emits, so every downstream operator
    (banding, zonal stats, the EP1 pipeline) is container-agnostic.

    ``path`` is a Zarr v2 group whose (t, y, x) member arrays are the
    model variables and whose 1-D ``time`` member carries CF
    "X since Y" units (the snow.nc convention re-expressed as Zarr).
    The time axis is DRIVER-read (it is |timesteps| scalars) and
    broadcast as a (t → date) dim join onto the chunk-partitioned
    ``snowav_zarr`` scan — the data chunks never route through the
    driver.  Without a time member, t maps to days since 1970-01-01
    (index dates — synthetic/test stores).
    """
    import datetime

    from snowav_spark.sources import zarr as zmod

    dates = None
    if zmod.is_zarr_group(path) and time_var in zmod.group_arrays(path):
        tdir = os.path.join(path, time_var)
        nums = zmod.read_array(tdir).astype(float)
        units = zmod.read_attrs(tdir).get(
            "units", "days since 1970-01-01"
        )
        dates = [pd.Timestamp(d).date() for d in _num2date(nums, units)]
        # every variable's t-extent must fit the time axis — checked
        # from the drivers' .zarray metas (no Spark action): a data
        # chunk appended before the time array update would otherwise
        # vanish in the inner dim join, silently truncating EP1 reports
        for name in zmod.group_arrays(path):
            if name == time_var:
                continue
            shape = zmod.read_array_meta(os.path.join(path, name))["shape"]
            t_extent = shape[0] if len(shape) == 3 else 1
            if t_extent > len(dates):
                raise ValueError(
                    f"zarr group {path}: variable {name!r} has "
                    f"{t_extent} timesteps but {time_var!r} carries "
                    f"{len(dates)} — update the time array (or rerun "
                    "after the writer finishes its append)"
                )
    df = (
        spark.read.format("snowav_zarr")
        .load(path)
        .filter(F.col("variable") != time_var)
    )
    if dates is None:
        mx = df.agg(F.max("t")).first()[0]
        dates = [
            datetime.date(1970, 1, 1) + datetime.timedelta(days=i)
            for i in range(int(mx or 0) + 1)
        ]
    dim = spark.createDataFrame(
        [(i, d) for i, d in enumerate(dates)], "t int, date date"
    )
    return df.join(F.broadcast(dim), "t").select(
        "date", "y", "x", "variable", "value"
    )


def synthetic_raster(
    spark: SparkSession,
    ny: int,
    nx: int,
    dates: list,
    variables: list[str],
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic gridded output (the gold-test fixture,
    SURVEY §5.3): value = f(y, x, day-index, variable-index) with a fixed
    seed — no RNG state dependence, reproducible everywhere."""
    import numpy as np

    rng = np.random.default_rng(seed)
    offsets = {v: float(rng.integers(0, 100)) for v in variables}
    rows = []
    for di, d in enumerate(dates):
        for vi, var in enumerate(variables):
            base = offsets[var]
            for y in range(ny):
                for x in range(nx):
                    # smooth deterministic field: gradient + day trend
                    val = base + 0.5 * y + 0.25 * x + 3.0 * di + 0.1 * vi
                    rows.append((d, y, x, var, float(val)))
    return spark.createDataFrame(rows, RASTER_SCHEMA)


def synthetic_topo(
    spark: SparkSession, ny: int, nx: int, edges: list[float]
) -> DataFrame:
    """Matching topo dim: elevation gradient + two overlapping basins
    (left half = A, right 60% = B → middle strip belongs to both — the
    reference's masks overlap the same way).  Overlap is expressed by
    duplicating (y, x) rows per basin, which is exactly how a mask join
    behaves."""
    rows = []
    for y in range(ny):
        for x in range(nx):
            elev = edges[0] + (edges[-1] - edges[0]) * (y / max(ny - 1, 1))
            if x < int(nx * 0.6):
                rows.append((y, x, float(elev), "basin_A"))
            if x >= int(nx * 0.4):
                rows.append((y, x, float(elev), "basin_B"))
    return spark.createDataFrame(rows, TOPO_SCHEMA)
