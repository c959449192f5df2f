"""Pure-NumPy NetCDF-3 reader/writer + distributed ingest e2e.

The container has no netCDF4, so these tests exercise the classic-format
fallback path (sources/netcdf3.py) end-to-end: write CDF-1 fixtures →
read_netcdf_outputs (mapInPandas) → tall frame → zonal aggregate.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowav_spark import ingest
from snowav_spark.sources import netcdf3


@pytest.fixture(scope="module")
def nc_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("nc")
    paths = []
    for f in range(2):  # two files, two timesteps each
        rng = np.random.RandomState(f)
        swe = rng.rand(2, 3, 4).astype(np.float64) * 1000
        depth = rng.rand(2, 3, 4).astype(np.float32) * 5
        time = np.array([f * 2, f * 2 + 1], dtype=np.int32)
        p = str(root / f"snow_{f}.nc")
        netcdf3.write(
            p,
            dims={"time": 2, "y": 3, "x": 4},
            variables={
                "time": (
                    ["time"],
                    time,
                    {"units": "days since 2020-10-01"},
                ),
                "specific_mass": (["time", "y", "x"], swe, {}),
                "thickness": (["time", "y", "x"], depth, {}),
            },
            attrs={"title": "synthetic model output"},
        )
        paths.append((p, swe, depth))
    return paths


def test_roundtrip_header_and_values(nc_files):
    path, swe, depth = nc_files[0]
    ds = netcdf3.read(path)
    assert ds.dims == {"time": 2, "y": 3, "x": 4}
    assert ds.attrs["title"] == "synthetic model output"
    assert ds.variables["time"].attrs["units"] == "days since 2020-10-01"
    np.testing.assert_array_equal(ds.values("specific_mass"), swe)
    # float32 round-trips exactly (stored as f4, widened on read)
    np.testing.assert_array_equal(
        ds.values("thickness"), depth.astype(np.float64).astype(np.float32)
    )


def test_rejects_non_classic(tmp_path):
    p = tmp_path / "bogus.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="classic"):
        netcdf3.read(str(p))


def test_distributed_ingest_e2e(spark, nc_files):
    tall = ingest.read_netcdf_outputs(
        spark,
        [p for p, _, _ in nc_files],
        ["specific_mass", "thickness"],
    )
    # 2 files × 2 timesteps × 3×4 grid × 2 variables
    assert tall.count() == 2 * 2 * 3 * 4 * 2
    # dates decode through the CF units string
    dates = {str(r.date) for r in tall.select("date").distinct().collect()}
    assert dates == {"2020-10-01", "2020-10-02", "2020-10-03", "2020-10-04"}
    # per-(date, variable) mean matches numpy exactly
    got = {
        (str(r.date), r.variable): r.m
        for r in tall.groupBy("date", "variable")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    _, swe0, _ = nc_files[0]
    assert got[("2020-10-01", "specific_mass")] == pytest.approx(
        float(swe0[0].mean()), abs=1e-12
    )
