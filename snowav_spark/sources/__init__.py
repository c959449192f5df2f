from snowav_spark.sources.raster_source import RasterGridDataSource, register

__all__ = ["RasterGridDataSource", "register"]
