"""snowav_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of USDA-ARS-NWRC/snowav, rebuilt Spark-first.

The reference (see SURVEY.md) is a single-process scientific ETL tool that
reduces gridded snow-model output to a long-format summary table and then to
pivoted report frames.  This engine re-expresses every one of those
operations — plus the LLM-data-pipeline extensions from SURVEY.md §2.6 — as
declarative Spark DataFrame plans so Catalyst/Tungsten/AQE pick the physical
strategy and the same code scales from local[32] to a 1000-executor cluster.

Layout
------
- ``session``    : SparkSession builder with engine defaults (AQE, nanos shim)
- ``io``         : fixture/table loaders (schema fixes applied on read)
- ``ops.banded`` : elevation-band digitize + zonal statistics + rollup
- ``ops.methods``: the reference's ``collect(method=...)`` query surface
- ``ops.joins``  : dim joins, run comparison, validation, as-of, point extract
- ``ops.windows``: cumulative/lag/rank/moving windows, top-k, pivot, unions
- ``ops.scalars``: unit conversion, water-year math, strings, JSON, percentiles
- ``ops.text``   : text stats, tokenization, language-ID, quality, fingerprints
- ``ops.dedup``  : exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``ops.similarity``: cosine top-k, LSH-bucketed ANN, batch k-NN join
- ``ops.multimodal``: binary media columns — typed metadata + Pandas-UDF plumbing
- ``streaming``  : incremental mode (Structured Streaming + watermarks)
- ``sinks``      : partitioned parquet results store with idempotent re-run
"""

from snowav_spark.session import get_spark, ENGINE_CONF
from snowav_spark.io import load_table, load_tables, TABLES

__version__ = "0.1.0"

__all__ = ["get_spark", "ENGINE_CONF", "load_table", "load_tables", "TABLES"]
