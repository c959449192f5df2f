from snowav_spark.sources.arrow_source import ArrowIPCDataSource
from snowav_spark.sources.netcdf_source import NetCDFDataSource
from snowav_spark.sources.raster_source import RasterGridDataSource
from snowav_spark.sources.zarr_source import ZarrDataSource


def register(spark) -> None:
    """Register every custom Python DataSource on a session (idempotent):
    ``snowav_raster`` (CSV grid files), ``snowav_netcdf`` (classic or
    HDF5-backed NetCDF model output), ``snowav_zarr`` (chunked Zarr
    v2/v3 array stores, one executor task per chunk), and
    ``snowav_arrow`` (Arrow IPC / Feather v2 corpora, batches passed
    to the JVM as-is)."""
    spark.dataSource.register(RasterGridDataSource)
    spark.dataSource.register(NetCDFDataSource)
    spark.dataSource.register(ZarrDataSource)
    spark.dataSource.register(ArrowIPCDataSource)


def open_dataset(path_or_bytes):
    """Open any NetCDF file by magic-byte sniffing: classic CDF-1/2/5 →
    sources.netcdf3, HDF5-backed NetCDF-4 → sources.hdf5.  Both return
    the same duck-typed Dataset (dims / attrs / variables / values), so
    ingest code never needs to know which container format a model run
    produced (ref:snowav/framework/outputs.py opens both via netCDF4)."""
    from snowav_spark.sources import hdf5, netcdf3

    if isinstance(path_or_bytes, (bytes, bytearray)):
        head = bytes(path_or_bytes[:8])
    else:
        with open(path_or_bytes, "rb") as f:
            head = f.read(8)
    if head[:3] == b"CDF":
        return netcdf3.read(path_or_bytes)
    if head == hdf5.MAGIC:
        return hdf5.read(path_or_bytes)
    raise ValueError("not a NetCDF file (neither classic CDF nor HDF5 magic)")


def masked_to_nan(grid, attrs):
    """Shared fill-sentinel masking for the pure-Python read paths.

    Real model output (ref:snowav/framework/outputs.py writes via netCDF4)
    marks out-of-basin cells with the variable's ``_FillValue`` /
    ``missing_value`` attribute (e.g. 9.96921e36); the netCDF4 library
    auto-masks those on read and ingest fills them with NaN.  The pure
    NumPy readers (sources.netcdf3 / sources.hdf5) return raw stored
    values, so every call site that feeds grids into aggregates must map
    sentinel and non-finite cells to NaN through THIS helper — otherwise
    the same file yields different results depending on whether netCDF4
    is installed.

    ``attrs`` is the variable's attribute dict.  ``missing_value`` may be
    an array per CF convention; every listed sentinel is masked.  Returns
    a float64 copy (never mutates the mmap-backed source array).
    """
    import numpy as np

    arr = np.array(grid, dtype=np.float64, copy=True)
    for key in ("_FillValue", "missing_value"):
        fv = attrs.get(key)
        if fv is None:
            continue
        for f in np.atleast_1d(np.asarray(fv, dtype=np.float64)).tolist():
            if np.isfinite(f):
                arr[arr == f] = np.nan
    arr[~np.isfinite(arr)] = np.nan
    return arr


__all__ = [
    "NetCDFDataSource",
    "RasterGridDataSource",
    "register",
    "open_dataset",
    "masked_to_nan",
]
