"""Pure-NumPy HDF5 / NetCDF-4 reader+writer + distributed ingest e2e.

The container has no h5py/netCDF4, so these tests exercise the
sources/hdf5.py subset the netCDF-4 C library emits: round-trips through
our own writer (superblock v0, v1 object headers, dimension scales,
DIMENSION_LIST via the global heap, chunked+deflate+shuffle data), a
hand-assembled superblock-v2 / OHDR / link-message / compact-layout /
vlen-string file for the "new-style group" paths the writer never
produces, and the magic-sniffing ingest dispatch next to classic CDF
(ref:snowav/framework/outputs.py reads both via netCDF4).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowav_spark import ingest
from snowav_spark.sources import hdf5, netcdf3, open_dataset


@pytest.fixture(scope="module")
def nc4_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("nc4")
    paths = []
    for f in range(2):
        rng = np.random.RandomState(100 + f)
        swe = rng.rand(2, 3, 4).astype(np.float64) * 1000
        depth = rng.rand(2, 3, 4).astype(np.float32) * 5
        time = np.array([f * 2, f * 2 + 1], dtype=np.float64)
        p = str(root / f"snow_{f}.nc")
        hdf5.write(
            p,
            dims={"time": 2, "y": 3, "x": 4},
            variables={
                "time": (["time"], time, {"units": "days since 2020-10-01"}),
                "specific_mass": (["time", "y", "x"], swe, {"units": "kg/m^2"}),
                "thickness": (["time", "y", "x"], depth, {}),
            },
            attrs={"title": "synthetic netCDF-4 output"},
            chunks={"specific_mass": (1, 2, 3)},
            deflate=4,
            shuffle=True,
        )
        paths.append((p, swe, depth))
    return paths


def test_roundtrip_contiguous_and_chunked(nc4_files):
    path, swe, depth = nc4_files[0]
    ds = hdf5.read(path)
    assert ds.dims == {"time": 2, "y": 3, "x": 4}
    assert ds.attrs["title"] == "synthetic netCDF-4 output"
    assert set(ds.variables) == {"time", "specific_mass", "thickness"}
    v = ds.variables["specific_mass"]
    assert v.dims == ["time", "y", "x"] and v.attrs["units"] == "kg/m^2"
    # chunked + deflate + shuffle + edge chunks (chunk (1,2,3) vs (2,3,4))
    np.testing.assert_array_equal(ds.values("specific_mass"), swe)
    # contiguous float32
    np.testing.assert_array_equal(ds.values("thickness"), depth)
    # coordinate variable doubles as its dimension's scale
    assert ds.variables["time"].dims == ["time"]
    assert ds.variables["time"].attrs["units"] == "days since 2020-10-01"


def test_hidden_dim_scales_and_attr_types(tmp_path):
    p = str(tmp_path / "t.nc")
    hdf5.write(
        p,
        dims={"a": 3, "b": 2},
        variables={
            "m": (
                ["a", "b"],
                np.arange(6, dtype=np.int32).reshape(3, 2),
                {"fill": np.int32(-9), "coeffs": np.array([0.5, 1.5])},
            )
        },
        attrs={"n_iters": np.int64(12)},
    )
    ds = hdf5.read(p)
    # a/b have no coordinate variable: bookkeeping scales stay hidden
    assert set(ds.variables) == {"m"}
    assert ds.dims == {"a": 3, "b": 2}
    assert ds.variables["m"].attrs["fill"] == -9
    np.testing.assert_array_equal(
        ds.variables["m"].attrs["coeffs"], np.array([0.5, 1.5])
    )
    assert ds.attrs["n_iters"] == 12
    np.testing.assert_array_equal(
        ds.values("m"), np.arange(6, dtype=np.int32).reshape(3, 2)
    )


def test_string_array_attrs_roundtrip(tmp_path):
    """A fixed-string ARRAY attribute keeps every element (a collapse
    to the first element was a review finding) and pads to the longest."""
    p = str(tmp_path / "sa.nc")
    hdf5.write(
        p,
        dims={"n": 2},
        variables={
            "v": (["n"], np.zeros(2), {"flags": ["dry", "wet", "unknown"]})
        },
        attrs={"sources": ["gauge", "model"]},
    )
    ds = hdf5.read(p)
    assert ds.variables["v"].attrs["flags"] == ["dry", "wet", "unknown"]
    assert ds.attrs["sources"] == ["gauge", "model"]


def test_int_dtypes_and_big_endian_inputs(tmp_path):
    p = str(tmp_path / "i.nc")
    cases = {
        "i16": np.arange(4, dtype=">i2"),
        "u32": np.arange(4, dtype="<u4") * 7,
        "i64": np.arange(4, dtype=np.int64) - 2,
    }
    hdf5.write(
        p,
        dims={"n": 4},
        variables={k: (["n"], v, {}) for k, v in cases.items()},
    )
    ds = hdf5.read(p)
    for k, v in cases.items():
        got = ds.values(k)
        np.testing.assert_array_equal(got, v.astype(v.dtype.newbyteorder("=")))
        assert got.dtype.kind == v.dtype.kind and got.dtype.itemsize == v.dtype.itemsize


def test_open_dataset_dispatch(tmp_path, nc4_files):
    classic = str(tmp_path / "c.nc")
    netcdf3.write(
        classic,
        dims={"n": 2},
        variables={"v": (["n"], np.array([1.0, 2.0]), {})},
    )
    assert isinstance(open_dataset(classic), netcdf3.Dataset)
    assert isinstance(open_dataset(nc4_files[0][0]), hdf5.NC4Dataset)
    bogus = tmp_path / "bogus.nc"
    bogus.write_bytes(b"not a netcdf file at all")
    with pytest.raises(ValueError, match="magic"):
        open_dataset(str(bogus))


def test_distributed_ingest_mixed_formats(spark, nc4_files, tmp_path):
    """One classic CDF file + two HDF5 files through the SAME
    read_netcdf_outputs call — executors sniff per file."""
    rng = np.random.RandomState(7)
    swe3 = rng.rand(1, 3, 4) * 100
    classic = str(tmp_path / "classic.nc")
    netcdf3.write(
        classic,
        dims={"time": 1, "y": 3, "x": 4},
        variables={
            "time": (["time"], np.array([4], dtype=np.int32),
                     {"units": "days since 2020-10-01"}),
            "specific_mass": (["time", "y", "x"], swe3, {}),
        },
    )
    tall = ingest.read_netcdf_outputs(
        spark,
        [p for p, _, _ in nc4_files] + [classic],
        ["specific_mass"],
    )
    # (2 files × 2 steps + 1 file × 1 step) × 3×4 grid
    assert tall.count() == 5 * 12
    dates = {str(r.date) for r in tall.select("date").distinct().collect()}
    assert dates == {f"2020-10-0{d}" for d in range(1, 6)}
    got = {
        (str(r.date), r.variable): r.m
        for r in tall.groupBy("date", "variable")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    _, swe0, _ = nc4_files[0]
    assert got[("2020-10-01", "specific_mass")] == pytest.approx(
        float(swe0[0].mean()), abs=1e-9
    )
    assert got[("2020-10-05", "specific_mass")] == pytest.approx(
        float(swe3[0].mean()), abs=1e-9
    )


def _v2_file(creation_order: bool = False) -> bytes:
    """Hand-assembled HDF5 file with the 'latest-format' structures the
    writer never emits: superblock v2, an OHDR root group carrying Link
    Info + a hard Link message, a dataset with COMPACT layout, and a
    version-3 attribute whose value is a VLEN STRING in a global heap —
    the shapes netCDF-4's new-style groups produce.  With
    ``creation_order`` the root OHDR sets flag 0x04 (attribute/link
    creation order tracked — netCDF-4 new-style groups ALWAYS do this),
    which inserts a 2-byte creation-order field in every message
    header."""
    UNDEF = 0xFFFFFFFFFFFFFFFF
    data = np.arange(6, dtype="<i2").reshape(2, 3)

    # global heap at 48: one 5-byte string object + free-space terminator
    gcol_addr = 48
    gobj = struct.pack("<HH4xQ", 1, 1, 5) + b"hello\x00\x00\x00"
    gfree = struct.pack("<HH4xQ", 0, 0, 16)
    gcol = b"GCOL" + struct.pack("<B3xQ", 1, 16 + len(gobj) + len(gfree))
    gcol += gobj + gfree

    # dataset object header (v1) with compact layout + vlen-string attr
    ds_addr = gcol_addr + len(gcol)
    m_space = struct.pack("<BBB5xQQ", 1, 2, 0, 2, 3)
    m_dtype = bytes([0x10, 0x08, 0, 0]) + struct.pack("<IHH", 2, 0, 16)
    m_layout = struct.pack("<BBH", 3, 0, data.nbytes) + data.tobytes()
    # attr v3: vlen-string datatype (base = 1-byte string), v2 scalar space
    dt_vls = bytes([0x19, 0x01, 0, 0]) + struct.pack("<I", 16)
    dt_vls += bytes([0x13, 0, 0, 0]) + struct.pack("<I", 1)
    sp_scalar = struct.pack("<BBBB", 2, 0, 0, 0)
    aname = b"note\x00"
    m_attr = struct.pack(
        "<BBHHHB", 3, 0, len(aname), len(dt_vls), len(sp_scalar), 0
    )
    m_attr += aname + dt_vls + sp_scalar
    m_attr += struct.pack("<IQI", 5, gcol_addr, 1)

    def v1msg(t: int, body: bytes) -> bytes:
        body = body + b"\x00" * (-len(body) % 8)
        return struct.pack("<HHB3x", t, len(body), 0) + body

    ds_msgs = (
        v1msg(0x0001, m_space)
        + v1msg(0x0003, m_dtype)
        + v1msg(0x0008, m_layout)
        + v1msg(0x000C, m_attr)
    )
    ds_oh = struct.pack("<BxHII4x", 1, 4, 1, len(ds_msgs)) + ds_msgs

    # root group: OHDR v2 with link-info + one hard link to the dataset
    root_addr = ds_addr + len(ds_oh)
    m_linfo = struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)
    lname = b"v"
    m_link = struct.pack("<BBB", 1, 0, len(lname)) + lname
    m_link += struct.pack("<Q", ds_addr)

    def v2msg(t: int, body: bytes, order: int = 0) -> bytes:
        head = struct.pack("<BHB", t, len(body), 0)
        if creation_order:
            head += struct.pack("<H", order)
        return head + body

    root_msgs = v2msg(0x0002, m_linfo, 0) + v2msg(0x0006, m_link, 1)
    oh_flags = 0x04 if creation_order else 0
    root_oh = b"OHDR" + struct.pack("<BBB", 2, oh_flags, len(root_msgs))
    root_oh += root_msgs + b"\x00" * 4  # checksum (unvalidated)

    eof = root_addr + len(root_oh)
    sb = hdf5.MAGIC + struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQI", 0, UNDEF, eof, root_addr, 0)

    out = bytearray(eof)
    out[0 : len(sb)] = sb
    out[gcol_addr : gcol_addr + len(gcol)] = gcol
    out[ds_addr : ds_addr + len(ds_oh)] = ds_oh
    out[root_addr : root_addr + len(root_oh)] = root_oh
    return bytes(out)


@pytest.mark.parametrize("creation_order", [False, True])
def test_superblock_v2_link_messages_compact_vlen_string(creation_order):
    raw = _v2_file(creation_order)
    h5 = hdf5.H5File(raw)
    tree = h5.walk()
    assert list(tree) == ["v"]
    obj = tree["v"]
    assert obj.attrs["note"] == "hello"
    np.testing.assert_array_equal(
        h5.read_dataset(obj), np.arange(6, dtype=np.int16).reshape(2, 3)
    )
    # plain HDF5 (no dimension scales) → phony dims via the nc4 layer
    ds = hdf5.read(raw)
    assert ds.variables["v"].dims == ["phony_dim_0", "phony_dim_1"]
    assert ds.dims == {"phony_dim_0": 2, "phony_dim_1": 3}


def test_slab_reads_match_full_reads(nc4_files):
    """first=slice(...) slab reads equal full-read slices for both
    layouts — chunked (chunks pruned by leading offset, incl. a slab
    that splits a chunk) and contiguous (page-offset arithmetic)."""
    path, swe, depth = nc4_files[0]
    ds = hdf5.read(path)
    for name, ref in (("specific_mass", swe), ("thickness", depth)):
        for sl in (slice(0, 1), slice(1, 2), slice(0, 2), slice(1, 1)):
            np.testing.assert_array_equal(ds.values(name, first=sl), ref[sl])
    with pytest.raises(ValueError, match="stride"):
        ds.values("specific_mass", first=slice(0, 2, 2))


def test_netcdf_datasource(spark, nc4_files, tmp_path):
    """spark.read.format('snowav_netcdf'): partitions are (file,
    variable, timestep-range) slabs; executors emit Arrow batches; a
    classic CDF file in the same directory reads through the same
    source (per-file magic sniffing)."""
    import shutil

    from snowav_spark.sources import netcdf_source

    root = tmp_path / "run"
    root.mkdir()
    for p, _, _ in nc4_files:
        shutil.copy(p, root / os.path.basename(p))
    swe3 = np.full((1, 3, 4), 7.25)
    netcdf3.write(
        str(root / "z_classic.nc"),
        dims={"time": 1, "y": 3, "x": 4},
        variables={
            "time": (["time"], np.array([4], dtype=np.int32),
                     {"units": "days since 2020-10-01"}),
            "specific_mass": (["time", "y", "x"], swe3, {}),
        },
    )
    netcdf_source.register(spark)
    df = (
        spark.read.format("snowav_netcdf")
        .option("variables", "specific_mass")
        .option("steps_per_task", "1")
        .load(str(root))
    )
    # 3 files x (2+2+1 steps) x 1 variable, one slab partition per step
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 5 * 12
    got = {
        (str(r.date), r.variable): r.m
        for r in df.groupBy("date", "variable")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    _, swe0, _ = nc4_files[0]
    assert got[("2020-10-01", "specific_mass")] == pytest.approx(
        float(swe0[0].mean()), abs=1e-9
    )
    assert got[("2020-10-05", "specific_mass")] == pytest.approx(7.25)
    # default variable discovery: every 3-D time-led var, not the coord
    auto = (
        spark.read.format("snowav_netcdf")
        .load(str(root / os.path.basename(nc4_files[0][0])))
    )
    assert {r.variable for r in auto.select("variable").distinct().collect()} == {
        "specific_mass",
        "thickness",
    }


def test_netcdf_pushdown_prunes_slabs(nc4_files, tmp_path):
    """Date/variable pushdown (round 10): pushed filters prune slab
    partitions at planning.  Unit level on the reader, plus an e2e
    corruption proof that pruned slabs are never read."""
    import datetime

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from snowav_spark.sources.netcdf_source import NetCDFReader

    path, swe, depth = nc4_files[0]  # 2 timesteps, 2 data variables
    opts = {"path": path, "steps_per_task": "1"}
    r = NetCDFReader(dict(opts))
    assert len(r.partitions()) == 4  # 2 vars x 2 steps

    r = NetCDFReader(dict(opts))
    back = list(r.pushFilters(
        [EqualTo(("variable",), "specific_mass")]
    ))
    assert len(back) == 1  # filter returned for row-level re-eval
    assert len(r.partitions()) == 2

    r = NetCDFReader(dict(opts))
    list(r.pushFilters(
        [GreaterThanOrEqual(("date",), datetime.date(2020, 10, 2))]
    ))
    assert len(r.partitions()) == 2  # second step of each variable

    r = NetCDFReader(dict(opts))
    list(r.pushFilters(
        [GreaterThanOrEqual(("date",), datetime.date(2030, 1, 1))]
    ))
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].path == ""  # zero-row marker
    assert list(r.read(parts[0])) == []


def test_netcdf_pushdown_e2e(spark, nc4_files):
    """E2E: the filtered scan returns the same rows with pushdown as a
    full-scan-then-filter, and the variable filter plans fewer tasks."""
    from snowav_spark.sources import netcdf_source

    netcdf_source.register(spark)
    path, swe, _ = nc4_files[0]
    df = (
        spark.read.format("snowav_netcdf")
        .option("steps_per_task", "1")
        .load(path)
    )
    full = df.count()
    sel = df.filter(
        (F.col("variable") == "specific_mass")
        & (F.col("date") >= "2020-10-02")
    )
    rows = sel.collect()
    assert full == 4 * 12 and len(rows) == 12
    assert {r.variable for r in rows} == {"specific_mass"}
    assert all(str(r.date) >= "2020-10-02" for r in rows)


def test_netcdf_stream_reads_only_new_files(spark, tmp_path):
    """Streaming over NetCDF drops: run 1 sees file A; file B (a
    NetCDF-4 container this time) arrives; run 2 emits ONLY B's rows —
    offsets checkpoint across restarts, formats mix freely."""
    from snowav_spark.sources import netcdf_source

    gdir = tmp_path / "drops"
    gdir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, day_num, fill, fmt):
        grid = np.full((1, 2, 2), fill)
        variables = {
            "time": (["time"], np.array([day_num], dtype=np.float64),
                     {"units": "days since 2020-10-01"}),
            "specific_mass": (["time", "y", "x"], grid, {}),
        }
        dims = {"time": 1, "y": 2, "x": 2}
        if fmt == "classic":
            netcdf3.write(str(gdir / name), dims=dims, variables=variables)
        else:
            hdf5.write(str(gdir / name), dims=dims, variables=variables)

    netcdf_source.register(spark)

    def run_once():
        q = (
            spark.readStream.format("snowav_netcdf")
            .option("variables", "specific_mass")
            .load(str(gdir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop("a_20201001.nc", 0, 1.5, "classic")
    run_once()
    assert spark.read.parquet(out).count() == 4
    drop("b_20201002.nc", 1, 2.5, "nc4")
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 8
    by_day = {
        str(r.date): r.m
        for r in got.groupBy("date").agg(F.avg("value").alias("m")).collect()
    }
    assert by_day == {"2020-10-01": 1.5, "2020-10-02": 2.5}


def test_netcdf_stream_two_files_one_batch(spark, tmp_path):
    """TWO files arriving in ONE micro-batch both emit rows.  Regression:
    _rows rebound its `names` parameter (the new-FILENAME set) to the
    variable list inside the loop, so every file after the first failed
    the `name not in names` check and was silently skipped while the end
    offset still recorded it — permanent data loss on backfills."""
    from snowav_spark.sources import netcdf_source

    gdir = tmp_path / "drops2"
    gdir.mkdir()
    for i, fill in enumerate([1.0, 3.0]):
        netcdf3.write(
            str(gdir / f"day{i}.nc"),
            dims={"time": 1, "y": 2, "x": 2},
            variables={
                "time": (["time"], np.array([i], dtype=np.float64),
                         {"units": "days since 2020-10-01"}),
                "specific_mass": (["time", "y", "x"],
                                  np.full((1, 2, 2), fill), {}),
            },
        )
    netcdf_source.register(spark)
    q = (
        spark.readStream.format("snowav_netcdf")
        .option("variables", "specific_mass")
        .load(str(gdir))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out2"))
    assert got.count() == 8
    by_day = {
        str(r.date): r.m
        for r in got.groupBy("date").agg(F.avg("value").alias("m")).collect()
    }
    assert by_day == {"2020-10-01": 1.0, "2020-10-02": 3.0}


def test_fill_value_masked_to_nan(spark, tmp_path):
    """_FillValue/missing_value sentinels become NaN on every pure-Python
    read path (netCDF4-branch parity): real model output masks
    out-of-basin cells with ~9.97e36, which must never enter aggregates."""
    from snowav_spark.sources import masked_to_nan, netcdf_source

    fill = 9.96921e36
    grid = np.array([[[1.0, 2.0], [fill, 4.0]]])
    # unit check incl. an array-valued missing_value and an inf cell
    arr = masked_to_nan(
        np.array([1.0, fill, -5.0, np.inf]),
        {"_FillValue": np.float64(fill), "missing_value": np.array([-5.0])},
    )
    assert np.isnan(arr[[1, 2, 3]]).all() and arr[0] == 1.0

    for fmt, writer in (("classic", netcdf3.write), ("nc4", hdf5.write)):
        p = str(tmp_path / f"fv_{fmt}.nc")
        writer(
            p,
            dims={"time": 1, "y": 2, "x": 2},
            variables={
                "time": (["time"], np.array([0], dtype=np.float64),
                         {"units": "days since 2020-10-01"}),
                "specific_mass": (["time", "y", "x"], grid,
                                  {"_FillValue": np.float64(fill)}),
            },
        )
        tall = ingest.read_netcdf_outputs(spark, [p], ["specific_mass"])
        vals = [r.value for r in tall.collect()]
        assert sorted(v for v in vals if v is not None) == [1.0, 2.0, 4.0]
        assert vals.count(None) == 1  # masked cell is SQL NULL
        # aggregates skip the masked cell (reference's masked-mean parity)
        assert tall.agg(F.avg("value")).first()[0] == pytest.approx(7.0 / 3)

    # batch DataSource path masks too (Arrow null mask)
    netcdf_source.register(spark)
    df = (
        spark.read.format("snowav_netcdf")
        .option("variables", "specific_mass")
        .load(str(tmp_path / "fv_nc4.nc"))
    )
    got = [r.value for r in df.collect()]
    assert got.count(None) == 1


def test_lookup3_known_vectors():
    """Jenkins lookup3 (HDF5's metadata checksum + btree-v2 name hash)
    against the public-domain reference's self-test values."""
    assert hdf5._lookup3(b"") == 0xDEADBEEF
    assert hdf5._lookup3(b"", 0xDEADBEEF) == 0xBD5B7DDE
    assert hdf5._lookup3(b"Four score and seven years ago") == 0x17770551
    assert hdf5._lookup3(b"Four score and seven years ago", 1) == 0xCD628161


def test_dense_attrs_roundtrip(tmp_path):
    """>8 attributes on one object crosses the netCDF4-c compact
    threshold: the writer moves them to a fractal heap + name B-tree v2
    (ATTR_INFO message) and the reader loads them back — the first
    real-world netCDF-4 family the pure-NumPy path refused (VERDICT r6
    missing #2)."""
    many = {f"a{i:02d}": np.float64(i) for i in range(9)}
    many.update(
        units="kg/m^2",
        long_name="snow water equivalent",
        _FillValue=np.float64(9.96921e36),
        valid_range=np.array([0.0, 5000.0]),
        flag_values=["dry", "wet"],
    )
    arr = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    p = str(tmp_path / "dense.nc")
    hdf5.write(
        p,
        dims={"time": 2, "y": 3, "x": 4},
        variables={
            "time": (["time"], np.array([0.0, 1.0]),
                     {"units": "days since 2020-10-01"}),
            "swe": (["time", "y", "x"], arr, many),
        },
    )
    ds = hdf5.read(p)
    v = ds.variables["swe"]
    assert v.dims == ["time", "y", "x"]  # DIMENSION_LIST survived densely
    assert len(v.attrs) == 14
    assert v.attrs["units"] == "kg/m^2"
    assert v.attrs["a05"] == 5.0
    assert float(v.attrs["_FillValue"]) == 9.96921e36
    np.testing.assert_array_equal(v.attrs["valid_range"], [0.0, 5000.0])
    assert v.attrs["flag_values"] == ["dry", "wet"]
    np.testing.assert_array_equal(ds.values("swe"), arr)
    np.testing.assert_array_equal(ds.values("swe", first=slice(1, 2)), arr[1:])
    # compact stays compact: the time coordinate has few attrs
    raw = open(p, "rb").read()
    assert raw.count(b"FRHP") == 1 and raw.count(b"BTHD") == 1


def test_dense_attrs_structural_layout(tmp_path):
    """Byte-assert the on-disk dense structures (the SNOD lesson: a
    round-trip through our own reader can hide a layout bug a validating
    library would reject): FRHP geometry fields, trailing lookup3
    checksums on FRHP/BTHD/BTLF, and leaf records sorted by name hash."""
    p = str(tmp_path / "layout.nc")
    hdf5.write(
        p,
        dims={"n": 2},
        variables={
            "v": (["n"], np.arange(2.0),
                  {f"k{i}": np.int32(i) for i in range(9)}),
        },
    )
    buf = open(p, "rb").read()
    i = buf.find(b"FRHP")
    assert buf[i + 4] == 0  # version
    id_len, flt_len = struct.unpack_from("<HH", buf, i + 5)
    assert (id_len, flt_len) == (8, 0)
    (max_managed,) = struct.unpack_from("<I", buf, i + 10)
    assert max_managed == 4096
    width, start, maxdir = struct.unpack_from("<HQQ", buf, i + 110)
    (max_heap_bits,) = struct.unpack_from("<H", buf, i + 128)
    root, nrows = struct.unpack_from("<QH", buf, i + 132)
    assert (width, max_heap_bits, nrows) == (4, 40, 0)
    assert start <= maxdir and buf[root : root + 4] == b"FHDB"
    (chks,) = struct.unpack_from("<I", buf, i + 142)
    assert chks == hdf5._lookup3(buf[i : i + 142])  # trailing checksum
    b = buf.find(b"BTHD")
    assert buf[b + 5] == 8  # tree type: attribute name index
    (rec_size,) = struct.unpack_from("<H", buf, b + 10)
    assert rec_size == 17
    leaf_addr, nrec = struct.unpack_from("<QH", buf, b + 16)
    (bchk,) = struct.unpack_from("<I", buf, b + 34)
    assert bchk == hdf5._lookup3(buf[b : b + 34])
    assert buf[leaf_addr : leaf_addr + 4] == b"BTLF" and nrec == 10
    hashes = [
        struct.unpack_from("<I", buf, leaf_addr + 6 + 17 * k + 13)[0]
        for k in range(nrec)
    ]
    assert hashes == sorted(hashes)  # name-hash ordered (the tree key)
    used = 6 + 17 * nrec
    (lchk,) = struct.unpack_from("<I", buf, leaf_addr + used)
    assert lchk == hdf5._lookup3(buf[leaf_addr : leaf_addr + used])
    # FHDB header: version, back-pointer to the heap header, offset 0
    assert buf[root + 4] == 0
    (hdr_back,) = struct.unpack_from("<Q", buf, root + 5)
    assert hdr_back == i
    assert buf[root + 13 : root + 18] == b"\x00" * 5


def _dense_indirect_file() -> bytes:
    """Hand-assembled (writer-independent) dense-attribute file exercising
    the paths our writer never emits: an ATTR_INFO message with creation
    order tracked AND indexed (flags 0x03 → extra fields), and a fractal
    heap whose root is an INDIRECT block — the attribute lives in the
    doubling table's SECOND direct block, so the reader must walk
    row/column geometry, not just add offsets."""
    UNDEF = 0xFFFFFFFFFFFFFFFF
    W, S, BITS = 4, 512, 40  # width, start block size, heap-address bits
    osz = BITS // 8

    # attribute message v3 for note="hi" (scalar vlen-free fixed string)
    aname = b"note\x00"
    dt = bytes([0x13, 0, 0, 0]) + struct.pack("<I", 2)
    sp = struct.pack("<BBBB", 2, 0, 0, 0)  # v2 scalar dataspace
    attr = struct.pack("<BBHHHB", 3, 0, len(aname), len(dt), len(sp), 0)
    attr += aname + dt + sp + b"hi"

    # second direct block (row 0, col 1): heap offsets [S, 2S)
    heap_off = S + 18  # past the direct-block header
    layout = {}
    pos = 48
    for key, size in (
        ("fhdb0", S), ("fhdb1", S), ("fhib", 4 + 1 + 8 + osz + 8 * W + 4),
        ("frhp", 146), ("btlf", 10 + 17), ("bthd", 38), ("oh", 200),
    ):
        layout[key] = pos
        pos += size
    eof = pos

    out = bytearray(eof)
    sb = hdf5.MAGIC + struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQI", 0, UNDEF, eof, layout["oh"], 0)
    out[: len(sb)] = sb

    for idx in (0, 1):
        a = layout[f"fhdb{idx}"]
        blk = b"FHDB" + bytes([0]) + struct.pack("<Q", layout["frhp"])
        blk += (idx * S).to_bytes(osz, "little")
        out[a : a + len(blk)] = blk
    out[layout["fhdb1"] + 18 : layout["fhdb1"] + 18 + len(attr)] = attr

    a = layout["fhib"]
    ib = b"FHIB" + bytes([0]) + struct.pack("<Q", layout["frhp"])
    ib += (0).to_bytes(osz, "little")
    ib += struct.pack("<QQQQ", layout["fhdb0"], layout["fhdb1"], UNDEF, UNDEF)
    ib += b"\x00" * 4  # checksum (reader skips)
    out[a : a + len(ib)] = ib

    a = layout["frhp"]
    hdr = b"FRHP" + bytes([0]) + struct.pack("<HHBI", 8, 0, 0, 4096)
    hdr += struct.pack(
        "<QQQQQQQQQQQQ",
        0, UNDEF, 2 * S - 36 - len(attr), UNDEF, 2 * S, 2 * S,
        heap_off + len(attr), 1, 0, 0, 0, 0,
    )
    hdr += struct.pack(
        "<HQQHHQH", W, S, 4096, BITS, 1, layout["fhib"], 1  # nrows=1
    )
    hdr += struct.pack("<I", hdf5._lookup3(bytes(hdr)))
    out[a : a + 146] = hdr

    heap_id = bytes([0]) + heap_off.to_bytes(osz, "little") + len(attr).to_bytes(2, "little")
    rec = heap_id + bytes([0]) + struct.pack("<II", 0, hdf5._lookup3(b"note"))
    a = layout["btlf"]
    leaf = b"BTLF" + bytes([0, 8]) + rec
    leaf += struct.pack("<I", hdf5._lookup3(bytes(leaf)))
    out[a : a + len(leaf)] = leaf

    a = layout["bthd"]
    bt = b"BTHD" + bytes([0, 8]) + struct.pack("<IHHBB", 2048, 17, 0, 100, 40)
    bt += struct.pack("<QHQ", layout["btlf"], 1, 1)
    bt += struct.pack("<I", hdf5._lookup3(bytes(bt)))
    out[a : a + 38] = bt

    # root OHDR: dataset with compact data + ATTR_INFO flags=0x03
    data = np.arange(3, dtype="<i2")
    m_space = struct.pack("<BBB5xQ", 1, 1, 0, 3)
    m_dtype = bytes([0x10, 0x08, 0, 0]) + struct.pack("<IHH", 2, 0, 16)
    m_layout = struct.pack("<BBH", 3, 0, data.nbytes) + data.tobytes()
    m_ainfo = struct.pack(
        "<BBHQQQ", 0, 0x03, 1,  # tracked+indexed: max creation index
        layout["frhp"], layout["bthd"], UNDEF,  # order btree absent
    )

    def v2msg(t: int, body: bytes) -> bytes:
        return struct.pack("<BHB", t, len(body), 0) + body

    msgs = (
        v2msg(0x0001, m_space) + v2msg(0x0003, m_dtype)
        + v2msg(0x0008, m_layout) + v2msg(0x0015, m_ainfo)
    )
    oh = b"OHDR" + struct.pack("<BBB", 2, 0, len(msgs)) + msgs + b"\x00" * 4
    a = layout["oh"]
    out[a : a + len(oh)] = oh
    return bytes(out)


def test_dense_attrs_indirect_heap_and_creation_order_flags():
    raw = _dense_indirect_file()
    h5 = hdf5.H5File(raw)
    obj = h5.objects[h5.root]
    assert obj.attrs == {"note": "hi"}
    np.testing.assert_array_equal(
        h5.read_dataset(obj), np.arange(3, dtype=np.int16)
    )


def test_dense_links_hand_built():
    """Dense (fractal-heap) LINK storage: a hand-built new-style root
    group whose only link to its dataset lives in a fractal heap indexed
    by a type-5 name B-tree (hash(4) + 7-byte heap id — the id TRAILS
    the hash, unlike attribute records)."""
    UNDEF = 0xFFFFFFFFFFFFFFFF
    BITS, osz, lsz = 32, 4, 2  # link heaps use 7-byte ids: 1+4+2

    # link message: hard link "v" -> dataset header address (patched)
    def link_msg(target: int) -> bytes:
        return struct.pack("<BBB", 1, 0, 1) + b"v" + struct.pack("<Q", target)

    layout, pos = {}, 48
    for key, size in (
        ("ds", 104), ("fhdb", 512), ("frhp", 146), ("btlf", 10 + 11),
        ("bthd", 38), ("oh", 120),
    ):
        layout[key] = pos
        pos += size
    eof = pos
    out = bytearray(eof)

    sb = hdf5.MAGIC + struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQI", 0, UNDEF, eof, layout["oh"], 0)
    out[: len(sb)] = sb

    # dataset: v1 object header, compact layout
    data = np.arange(4, dtype="<i4")
    m_space = struct.pack("<BBB5xQ", 1, 1, 0, 4)
    m_dtype = bytes([0x10, 0x08, 0, 0]) + struct.pack("<IHH", 4, 0, 32)
    m_layout = struct.pack("<BBH", 3, 0, data.nbytes) + data.tobytes()

    def v1msg(t, body):
        body = body + b"\x00" * (-len(body) % 8)
        return struct.pack("<HHB3x", t, len(body), 0) + body

    ds_msgs = v1msg(0x0001, m_space) + v1msg(0x0003, m_dtype) + v1msg(
        0x0008, m_layout
    )
    ds_oh = struct.pack("<BxHII4x", 1, 3, 1, len(ds_msgs)) + ds_msgs
    out[layout["ds"] : layout["ds"] + len(ds_oh)] = ds_oh

    lm = link_msg(layout["ds"])
    hdr_size = 4 + 1 + 8 + osz
    fhdb = (
        b"FHDB" + bytes([0]) + struct.pack("<Q", layout["frhp"])
        + (0).to_bytes(osz, "little") + lm
    )
    out[layout["fhdb"] : layout["fhdb"] + len(fhdb)] = fhdb

    hdr = b"FRHP" + bytes([0]) + struct.pack("<HHBI", 7, 0, 0, 4096)
    hdr += struct.pack(
        "<QQQQQQQQQQQQ",
        0, UNDEF, 512 - hdr_size - len(lm), UNDEF, 512, 512,
        hdr_size + len(lm), 1, 0, 0, 0, 0,
    )
    hdr += struct.pack("<HQQHHQH", 4, 512, 4096, BITS, 1, layout["fhdb"], 0)
    hdr += struct.pack("<I", hdf5._lookup3(bytes(hdr)))
    out[layout["frhp"] : layout["frhp"] + 146] = hdr

    hid = bytes([0]) + hdr_size.to_bytes(osz, "little") + len(lm).to_bytes(
        lsz, "little"
    )
    rec = struct.pack("<I", hdf5._lookup3(b"v")) + hid  # hash FIRST
    leaf = b"BTLF" + bytes([0, 5]) + rec
    leaf += struct.pack("<I", hdf5._lookup3(bytes(leaf)))
    out[layout["btlf"] : layout["btlf"] + len(leaf)] = leaf

    bt = b"BTHD" + bytes([0, 5]) + struct.pack("<IHHBB", 2048, 11, 0, 100, 40)
    bt += struct.pack("<QHQ", layout["btlf"], 1, 1)
    bt += struct.pack("<I", hdf5._lookup3(bytes(bt)))
    out[layout["bthd"] : layout["bthd"] + 38] = bt

    # root: OHDR with a dense Link Info message (flags=0)
    m_linfo = struct.pack("<BBQQ", 0, 0, layout["frhp"], layout["bthd"])
    msgs = struct.pack("<BHB", 0x0002, len(m_linfo), 0) + m_linfo
    oh = b"OHDR" + struct.pack("<BBB", 2, 0, len(msgs)) + msgs + b"\x00" * 4
    out[layout["oh"] : layout["oh"] + len(oh)] = oh

    h5 = hdf5.H5File(bytes(out))
    tree = h5.walk()
    assert list(tree) == ["v"]
    np.testing.assert_array_equal(
        h5.read_dataset(tree["v"]), np.arange(4, dtype=np.int32)
    )


def test_dense_attrs_through_distributed_ingest(spark, tmp_path):
    """e2e: a dense-attribute netCDF-4 file (units/long_name/_FillValue/…
    like real AWSM output) loads through read_netcdf_outputs, and its
    _FillValue — itself stored DENSELY — still masks cells to NULL."""
    fill = 9.96921e36
    grid = np.array([[[1.0, 2.0], [fill, 4.0]]])
    many = {f"a{i}": np.float64(i) for i in range(8)}
    many.update(units="kg/m^2", _FillValue=np.float64(fill))
    p = str(tmp_path / "dense_e2e.nc")
    hdf5.write(
        p,
        dims={"time": 1, "y": 2, "x": 2},
        variables={
            "time": (["time"], np.array([0.0]),
                     {"units": "days since 2020-10-01"}),
            "specific_mass": (["time", "y", "x"], grid, many),
        },
    )
    tall = ingest.read_netcdf_outputs(spark, [p], ["specific_mass"])
    vals = [r.value for r in tall.collect()]
    assert sorted(v for v in vals if v is not None) == [1.0, 2.0, 4.0]
    assert vals.count(None) == 1


def test_fletcher32_defilter():
    raw = np.arange(8, dtype="<f4").tobytes()
    assert (
        hdf5.H5File._defilter(raw + b"\x12\x34\x56\x78", [(3, ())], 0, 4) == raw
    )
    # masked-out filter is skipped
    assert hdf5.H5File._defilter(raw, [(3, ())], 1, 4) == raw


def test_writer_btree_node_layout(tmp_path):
    """The group B-tree node must reserve room for BOTH boundary keys:
    an 8-byte under-reservation let the SNOD block overwrite key1 (the
    greatest-name heap offset) — invisible to our key-skipping reader
    but corrupt to any validating HDF5 library."""
    p = str(tmp_path / "bt.nc")
    hdf5.write(p, dims={"n": 3}, variables={"v": (["n"], np.arange(3.0), {})})
    buf = open(p, "rb").read()
    i = buf.find(b"TREE")
    key0, child, key1 = struct.unpack_from("<QQQ", buf, i + 24)
    assert key0 == 0 and buf[child : child + 4] == b"SNOD"
    # key1 is a small heap offset, not bytes of the following block
    heap_i = buf.find(b"HEAP")
    (heap_size,) = struct.unpack_from("<Q", buf, heap_i + 8)
    assert 0 < key1 < heap_size


def test_writer_rejects_dim_name_collision(tmp_path):
    with pytest.raises(ValueError, match="coordinate"):
        hdf5.write(
            str(tmp_path / "bad.nc"),
            dims={"time": 2, "y": 3},
            variables={"time": (["y"], np.zeros(3), {})},
        )


def test_filter_pipeline_v2_parsing():
    """Pipeline message v2 omits the name-length field for filter ids
    < 256 (unlike v1) — deflate(6) then shuffle(8) parse positionally."""
    m = bytes([2, 2]) + struct.pack("<HHHI", 1, 0, 1, 6) + struct.pack(
        "<HHHI", 2, 0, 1, 8
    )
    assert hdf5.H5File._parse_filters(m) == [(1, (6,)), (2, (8,))]


# -- property test: random shapes/dtypes/chunkings survive a round trip ------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DTYPES = ["i1", "i2", "i4", "i8", "u1", "u2", "u4", "u8", "f4", "f8"]


@given(
    shape=st.lists(st.integers(1, 9), min_size=1, max_size=3),
    dtype=st.sampled_from(_DTYPES),
    chunked=st.booleans(),
    chunk_seed=st.integers(1, 5),
    compress=st.booleans(),
    data=st.randoms(use_true_random=False),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_roundtrip_property(tmp_path_factory, shape, dtype, chunked,
                            chunk_seed, compress, data):
    """Any dims×dtype×layout combination round-trips bit-exactly,
    including chunk shapes that don't divide the dims (edge chunks) and
    chunks larger than the data."""
    rng = np.random.RandomState(data.randint(0, 2**31 - 1))
    arr = (rng.rand(*shape) * 200 - 100).astype(dtype)
    dims = {f"d{i}": s for i, s in enumerate(shape)}
    kw = {}
    if chunked:
        kw["chunks"] = {"v": tuple(
            max(1, min(s + chunk_seed - 3, 9)) for s in shape
        )}
        if compress:
            kw["deflate"] = 1
            kw["shuffle"] = True
    p = str(tmp_path_factory.mktemp("prop") / "p.nc")
    hdf5.write(p, dims=dims, variables={"v": (list(dims), arr, {})}, **kw)
    ds = hdf5.read(p)
    got = ds.values("v")
    np.testing.assert_array_equal(got, arr)
    assert got.dtype == np.dtype(dtype)
    # slab of the leading axis agrees too
    lo = min(1, shape[0] - 1)
    np.testing.assert_array_equal(
        ds.values("v", first=slice(lo, shape[0])), arr[lo:]
    )


def test_lz4_and_blosc_filters_roundtrip(tmp_path):
    """Registered LZ4 (32004) and blosc (32001) filters (round 10):
    chunked variables written through either codec read back equal to
    their deflate twin — and the raw filter framing is ALSO exercised
    against a hand-built payload, not only the writer's output."""
    import struct

    from snowav_spark.sources.hdf5 import _hdf5_lz4_decode

    rng = np.random.RandomState(7)
    arr = np.round(rng.rand(6, 5, 4) * 100, 1)
    dims = {"t": 6, "y": 5, "x": 4}
    got = {}
    for codec in (None, "lz4", "blosc"):
        p = str(tmp_path / f"c_{codec}.nc")
        hdf5.write(
            p, dims=dims,
            variables={"v": (["t", "y", "x"], arr, {})},
            chunks={"v": (2, 3, 4)},
            deflate=1 if codec is None else None,
            codec=codec,
        )
        got[codec] = hdf5.read(p).values("v")
    np.testing.assert_array_equal(got[None], arr)
    np.testing.assert_array_equal(got["lz4"], arr)
    np.testing.assert_array_equal(got["blosc"], arr)

    # hand-built HDF5-lz4 framing per the hdf5_plugins doc (big-endian
    # sizes; a block stored raw when csize == uncompressed block size)
    data = b"0123456789" * 10
    payload = (
        struct.pack(">QI", 100, 64)
        + struct.pack(">I", 64) + data[:64]   # raw block
        + struct.pack(">I", 36) + data[64:]   # raw leftover block
    )
    assert _hdf5_lz4_decode(payload) == data


def test_unknown_filter_still_raises(tmp_path):
    """zstd (32015) and other unregistered ids keep failing by id."""
    p = str(tmp_path / "z.nc")
    hdf5.write(
        p, dims={"a": 4},
        variables={"v": (["a"], np.arange(4.0), {})},
        chunks={"v": (2,)},
        codec="lz4",
    )
    # flip the filter id 32004 -> 32015 in the file bytes
    raw = open(p, "rb").read()
    import struct as _s

    needle = _s.pack("<H", 32004)
    assert needle in raw
    patched = raw.replace(needle, _s.pack("<H", 32015), 1)
    open(p, "wb").write(patched)
    ds = hdf5.read(p)
    with pytest.raises(ValueError, match="32015"):
        ds.values("v")
