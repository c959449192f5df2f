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

def _cdf2_record_file(numrecs_field: int) -> tuple[bytes, dict]:
    """Hand-assembled CDF-2 (64-bit offsets) file with an unlimited dim,
    TWO interleaved record variables and one fixed variable — the
    record-slab striding + 8-byte-begin branch the writer (CDF-1, fixed
    dims only) can never produce.  ``numrecs_field=-1`` exercises the
    STREAMING convention (record count inferred from file length)."""
    import struct

    def name(s: bytes) -> bytes:
        return struct.pack(">i", len(s)) + s + b"\x00" * (-len(s) % 4)

    absent = b"\x00" * 8
    grid = np.arange(6, dtype=">f4").reshape(2, 3)
    t = np.array([10, 11, 12], dtype=">i4")
    swe = np.arange(18, dtype=">f8").reshape(3, 2, 3)

    dim_list = (
        struct.pack(">ii", 0x0A, 3)
        + name(b"time") + struct.pack(">i", 0)   # unlimited
        + name(b"y") + struct.pack(">i", 2)
        + name(b"x") + struct.pack(">i", 3)
    )

    def var(nm, dimids, nc_type, vsize, begin):
        return (
            name(nm)
            + struct.pack(">i", len(dimids))
            + b"".join(struct.pack(">i", d) for d in dimids)
            + absent                      # no per-var attrs
            + struct.pack(">ii", nc_type, vsize)
            + struct.pack(">q", begin)    # CDF-2: 64-bit begin
        )

    # Layout: header | grid (fixed, 24 B) | records r=0..2 of (t[r] pad4,
    # swe[r]) — recsize = 4 + 48 = 52.
    def header(g0, t0, s0):
        return (
            b"CDF\x02"
            + struct.pack(">i", numrecs_field)
            + dim_list
            + absent                      # no global attrs
            + struct.pack(">ii", 0x0B, 3)
            + var(b"grid", [1, 2], 5, 24, g0)
            + var(b"t", [0], 4, 4, t0)
            + var(b"swe", [0, 1, 2], 6, 48, s0)
        )

    hlen = len(header(0, 0, 0))
    g0 = hlen
    t0 = g0 + 24
    s0 = t0 + 4
    body = grid.tobytes()
    for r in range(3):
        body += t[r : r + 1].tobytes() + swe[r].tobytes()
    expect = {
        "grid": grid.astype("=f4"),
        "t": t.astype("=i4"),
        "swe": swe.astype("=f8"),
    }
    return header(g0, t0, s0) + body, expect


@pytest.mark.parametrize("numrecs_field", [3, -1], ids=["explicit", "streaming"])
def test_cdf2_unlimited_record_vars(tmp_path, numrecs_field):
    buf, expect = _cdf2_record_file(numrecs_field)
    p = tmp_path / "rec.nc"
    p.write_bytes(buf)
    ds = netcdf3.read(str(p))
    assert ds.dims == {"time": 3, "y": 2, "x": 3}
    assert ds.numrecs == 3
    assert ds.variables["swe"].is_record and ds.variables["t"].is_record
    assert not ds.variables["grid"].is_record
    assert ds.variables["swe"].shape == (3, 2, 3)
    np.testing.assert_array_equal(ds.values("grid"), expect["grid"])
    np.testing.assert_array_equal(ds.values("t"), expect["t"])
    np.testing.assert_array_equal(ds.values("swe"), expect["swe"])
    # slab reads (record AND fixed variables) equal full-read slices
    for name in ("grid", "t", "swe"):
        for sl in (slice(0, 1), slice(1, 3), slice(2, 2)):
            np.testing.assert_array_equal(
                ds.values(name, first=sl), expect[name][sl]
            )


@pytest.mark.parametrize("version", [2, 5])
def test_cdf2_cdf5_roundtrip(tmp_path, version):
    rng = np.random.RandomState(version)
    swe = rng.rand(3, 4).astype(np.float64)
    counts = np.arange(12, dtype=np.int32).reshape(3, 4)
    p = str(tmp_path / f"v{version}.nc")
    netcdf3.write(
        p,
        dims={"y": 3, "x": 4},
        variables={
            "swe": (["y", "x"], swe, {"units": "mm"}),
            "counts": (["y", "x"], counts, {}),
        },
        attrs={"title": f"cdf{version}", "level": np.int32(7)},
        version=version,
    )
    with open(p, "rb") as f:
        assert f.read(4) == b"CDF" + bytes([version])
    ds = netcdf3.read(p)
    assert ds.dims == {"y": 3, "x": 4}
    assert ds.attrs["title"] == f"cdf{version}"
    assert int(ds.attrs["level"]) == 7
    assert ds.variables["swe"].attrs["units"] == "mm"
    np.testing.assert_array_equal(ds.values("swe"), swe)
    np.testing.assert_array_equal(ds.values("counts"), counts)


def test_cdf5_wide_types_roundtrip(tmp_path):
    """The five CDF-5-only external types (ubyte/ushort/uint/int64/uint64)
    survive a write→read cycle; CDF-1 refuses them with a clear error."""
    vals = {
        "u1": np.array([0, 255], dtype=np.uint8),
        "u2": np.array([0, 65535], dtype=np.uint16),
        "u4": np.array([0, 2**32 - 1], dtype=np.uint32),
        "i8": np.array([-(2**62), 2**62], dtype=np.int64),
        "u8": np.array([0, 2**63 + 7], dtype=np.uint64),
    }
    p = str(tmp_path / "wide.nc")
    netcdf3.write(
        p,
        dims={"n": 2},
        variables={k: (["n"], v, {}) for k, v in vals.items()},
        version=5,
    )
    ds = netcdf3.read(p)
    for k, v in vals.items():
        got = ds.values(k)
        assert got.dtype == v.dtype.newbyteorder("=")
        np.testing.assert_array_equal(got, v)
    with pytest.raises(ValueError, match="CDF-5"):
        netcdf3.write(
            str(tmp_path / "bad.nc"),
            dims={"n": 2},
            variables={"i8": (["n"], vals["i8"], {})},
            version=1,
        )


def test_cdf5_begin_offset_past_4gib(tmp_path):
    """A variable whose begin offset exceeds 2^32 parses and reads exactly
    (the point of the 64-bit formats).  header_pad makes the file sparse,
    so the test costs a few data pages, not 4 GiB, and the mmap'd reader
    faults in only the header + the variable's pages."""
    pad = 2**32 + 4096
    swe = np.arange(6, dtype=np.float64).reshape(2, 3)
    p = str(tmp_path / "big.nc")
    netcdf3.write(
        p,
        dims={"y": 2, "x": 3},
        variables={"swe": (["y", "x"], swe, {})},
        version=5,
        header_pad=pad,
    )
    ds = netcdf3.read(p)
    assert ds.variables["swe"].begin > 2**32
    np.testing.assert_array_equal(ds.values("swe"), swe)
    # CDF-1 must refuse a begin it cannot represent
    with pytest.raises(ValueError, match="CDF-1"):
        netcdf3.write(
            str(tmp_path / "bad1.nc"),
            dims={"y": 2, "x": 3},
            variables={"swe": (["y", "x"], swe, {})},
            version=1,
            header_pad=pad,
        )
