"""The §2.8 UDF extension surface: pandas_udf cold-content masking and
applyInPandas per-basin summaries."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from snowav_spark import ingest
from snowav_spark.ops import udf


def test_available_swe_pandas_udf(spark):
    df = spark.createDataFrame(
        [(100.0, 0.0), (200.0, -10.0), (50.0, -5.0), (80.0, -4.9)],
        ["swe_mm", "coldcont"],
    )
    got = [r.av for r in df.select(udf.available_swe("swe_mm", "coldcont").alias("av")).collect()]
    # threshold -5.0: >= keeps, < zeroes
    assert got == [100.0, 0.0, 50.0, 80.0]


def test_basin_percentile_summary_matches_numpy(spark):
    import numpy as np

    dates = [datetime.date(2024, 1, 1)]
    raster = ingest.synthetic_raster(spark, 6, 6, dates, ["swe_mm"])
    topo = ingest.synthetic_topo(spark, 6, 6, [0.0, 50.0, 100.0])
    joined = raster.join(topo, ["y", "x"]).select("basin_id", "date", "value")
    out = {r.basin_id: r for r in udf.basin_percentile_summary(joined).collect()}
    # independent check for basin_A (x < 60% of 6 → x in 0..2... int(6*0.6)=3 → x<3)
    pdf = joined.filter(F.col("basin_id") == "basin_A").toPandas()
    v = pdf["value"].to_numpy()
    assert out["basin_A"].n_px == len(v)
    assert out["basin_A"].p50 == float(np.quantile(v, 0.5))
    assert set(out) == {"basin_A", "basin_B"}
