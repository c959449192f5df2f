from snowav_spark.sources.netcdf_source import NetCDFDataSource
from snowav_spark.sources.raster_source import RasterGridDataSource


def register(spark) -> None:
    """Register every custom Python DataSource on a session (idempotent):
    ``snowav_raster`` (CSV grid files) and ``snowav_netcdf`` (classic or
    HDF5-backed NetCDF model output)."""
    spark.dataSource.register(RasterGridDataSource)
    spark.dataSource.register(NetCDFDataSource)


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


__all__ = [
    "NetCDFDataSource",
    "RasterGridDataSource",
    "register",
    "open_dataset",
]
