"""Zarr v2 reader/source tests: format round-trips across dtypes,
codecs, orders, separators; sparse (missing-chunk) semantics; edge
trimming; the chunk-partitioned Spark source; and loud refusals on the
unsupported codec/filters/ndim cases."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowav_spark.sources import zarr


def test_roundtrip_dtypes_codecs_orders(tmp_path):
    rng = np.random.RandomState(3)
    cases = [
        (rng.rand(7, 5), (3, 2), "zlib", "C"),
        (rng.rand(7, 5).astype("<f4"), (4, 4), None, "F"),
        ((rng.rand(6) * 100).astype("<i4"), (4,), "zlib", "C"),
        ((rng.rand(3, 4, 5) * 255).astype("|u1"), (2, 2, 2), None, "C"),
        (rng.rand(5, 5).astype(">f8"), (2, 3), "zlib", "C"),
    ]
    for i, (arr, chunks, comp, order) in enumerate(cases):
        p = str(tmp_path / f"a{i}")
        zarr.write_array(p, arr, chunks, compressor=comp, order=order)
        got = zarr.read_array(p)
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)


def test_missing_chunk_is_fill_by_spec(tmp_path):
    """Sparse layout: absent chunk files read as fill_value — treating
    them as zeros or errors would corrupt sparse arrays."""
    arr = np.full((6, 6), -9.0)
    arr[0, 0] = 1.0
    arr[5, 5] = 2.0
    p = str(tmp_path / "sparse")
    zarr.write_array(
        p, arr, (3, 3), fill_value=-9.0, skip_fill_chunks=True
    )
    # only the two corner chunks exist on disk
    files = [n for n in os.listdir(p) if not n.startswith(".")]
    assert sorted(files) == ["0.0", "1.1"]
    np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_nan_fill_value_json_string(tmp_path):
    """Non-finite fills are JSON strings per spec ('NaN'); the reader
    decodes them and missing chunks materialize as NaN."""
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    p = str(tmp_path / "nanfill")
    zarr.write_array(
        p, arr, (2, 1), fill_value=float("nan"), skip_fill_chunks=False
    )
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["fill_value"] == "NaN"
    # drop one chunk: it must come back as NaN, not zero
    os.remove(os.path.join(p, "0.1"))
    got = zarr.read_array(p)
    np.testing.assert_array_equal(got[:, 0], arr[:, 0])
    assert np.isnan(got[:, 1]).all()


def test_nested_dimension_separator(tmp_path):
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    p = str(tmp_path / "nested")
    zarr.write_array(p, arr, (2, 3), dimension_separator="/")
    assert os.path.isfile(os.path.join(p, "1", "1"))
    np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_unsupported_codec_and_filters_raise(tmp_path):
    p = str(tmp_path / "bad")
    os.makedirs(p)
    meta = {
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
        "compressor": {"id": "zstd", "level": 1},
        "fill_value": 0, "order": "C", "filters": None,
    }
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="zstd"):
        zarr.read_array_meta(p)
    meta["compressor"] = None
    meta["filters"] = [{"id": "delta"}]
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="filter"):
        zarr.read_array_meta(p)


def test_group_listing(tmp_path):
    g = str(tmp_path / "grp")
    zarr.write_group(
        g,
        {"swe": np.ones((2, 2)), "depth": np.zeros((2, 2))},
        chunks=(2, 2),
    )
    assert zarr.group_arrays(g) == ["depth", "swe"]


def test_spark_source_reads_group_chunk_parallel(spark, tmp_path):
    """The snowav_zarr source: one partition per chunk, group members
    become variables, edge chunks trim, fills surface as NaN, and a
    zonal mean over the tall rows matches numpy."""
    from snowav_spark import sources

    sources.register(spark)
    rng = np.random.RandomState(11)
    swe = rng.rand(5, 7)  # edge chunks on both dims at (2, 3) chunking
    swe[0, :3] = -99.0  # out-of-basin sentinel via fill_value
    depth = rng.rand(5, 7)
    g = str(tmp_path / "run")
    zarr.write_group(g, {"swe": swe, "depth": depth}, chunks=(2, 3),
                     fill_value=-99.0)

    df = spark.read.format("snowav_zarr").load(g)
    assert df.columns == ["variable", "t", "y", "x", "value"]
    n = df.count()
    assert n == 2 * 5 * 7
    # every cell lands exactly once at its (y, x)
    got = {
        (r.variable, r.y, r.x): r.value
        for r in df.collect()
    }
    assert len(got) == n
    for (var, arr) in (("swe", swe), ("depth", depth)):
        for y in range(5):
            for x in range(7):
                v = got[(var, y, x)]
                if arr[y, x] == -99.0:
                    assert v is None or np.isnan(v)
                else:
                    assert v == arr[y, x]
    # the zonal aggregate downstream operators run: NaN-safe mean
    m = (
        df.filter((F.col("variable") == "swe") & ~F.isnan("value"))
        .agg(F.avg("value"))
        .first()[0]
    )
    assert abs(m - swe[swe != -99.0].mean()) < 1e-12
    # partitions really are chunks: 2 vars x ceil(5/2) x ceil(7/3) = 18
    reader = sources.zarr_source.ZarrReader({"path": g})
    assert len(reader.partitions()) == 2 * 3 * 3


def test_spark_source_single_array_and_1d(spark, tmp_path):
    from snowav_spark import sources

    sources.register(spark)
    arr = np.arange(10, dtype="<f8")
    p = str(tmp_path / "elev")
    zarr.write_array(p, arr, (4,))
    df = spark.read.format("snowav_zarr").load(p)
    rows = df.orderBy("x").collect()
    assert [r.variable for r in rows] == ["elev"] * 10
    assert [r.t for r in rows] == [0] * 10
    assert [r.y for r in rows] == [0] * 10
    assert [r.value for r in rows] == list(map(float, range(10)))


def test_v3_roundtrip_and_spark_source(spark, tmp_path):
    """Zarr v3: zarr.json descriptors, 'c'-prefixed default chunk keys,
    bytes+gzip codec chain, inline attributes — normalized into the
    same read path; the Spark source and EP1 ingest are version-blind."""
    from snowav_spark import sources

    sources.register(spark)
    rng = np.random.RandomState(21)
    cases = [
        (rng.rand(5, 7), (2, 3), "gzip", "/"),
        (rng.rand(4, 4).astype("<f4"), (3, 3), None, "."),
        ((rng.rand(6) * 50).astype("<i4"), (4,), "gzip", "/"),
        (rng.rand(2, 3, 4).astype(">f8"), (1, 2, 2), None, "/"),
    ]
    for i, (arr, chunks, comp, sep) in enumerate(cases):
        p = str(tmp_path / f"v3_{i}")
        zarr.write_array_v3(
            p, arr, chunks, compressor=comp, separator=sep
        )
        got = zarr.read_array(p)
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)

    # group + inline attrs + Spark scan
    g = str(tmp_path / "v3grp")
    zarr.write_group_v3(
        g, {"swe": rng.rand(3, 4)}, chunks=(2, 2),
        attrs={"units": "mm"},
    )
    assert zarr.group_arrays(g) == ["swe"]
    assert zarr.read_attrs(os.path.join(g, "swe"))["units"] == "mm"
    df = spark.read.format("snowav_zarr").load(g)
    got = {(r.y, r.x): r.value for r in df.collect()}
    want = zarr.read_array(os.path.join(g, "swe"))
    assert len(got) == 12
    assert all(got[(y, x)] == want[y, x] for y in range(3) for x in range(4))


def test_v3_sparse_fill_and_unsupported_codecs(tmp_path):
    """v3 fill semantics (missing chunk = fill, 'NaN' JSON string) and
    loud refusals on the codecs the stdlib can't do exactly."""
    arr = np.full((4, 4), -7.0)
    arr[0, 0] = 3.0
    p = str(tmp_path / "v3sparse")
    zarr.write_array_v3(
        p, arr, (2, 2), fill_value=-7.0, skip_fill_chunks=True
    )
    np.testing.assert_array_equal(zarr.read_array(p), arr)

    import json as _json

    bad = str(tmp_path / "v3bad")
    os.makedirs(bad)
    meta = {
        "zarr_format": 3, "node_type": "array", "shape": [2],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2]}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "zstd", "configuration": {}},
        ],
    }
    _json.dump(meta, open(os.path.join(bad, "zarr.json"), "w"))
    with pytest.raises(ValueError, match="zstd"):
        zarr.read_array_meta(bad)
    meta["codecs"] = [{"name": "bytes", "configuration": {}}]
    meta["chunk_grid"] = {"name": "sharding_indexed", "configuration": {}}
    _json.dump(meta, open(os.path.join(bad, "zarr.json"), "w"))
    with pytest.raises(ValueError, match="regular"):
        zarr.read_array_meta(bad)


def test_v3_codec_chain_order_validation(tmp_path):
    """VERDICT r10 item 4: a spec-invalid v3 codec chain — compressor
    before 'bytes', 'bytes' not first, duplicate 'bytes', or a second
    compressor — must be rejected AT METADATA PARSE with the offending
    layout named, not accepted and surfaced later as a misleading
    size-mismatch 'corrupt chunk' error."""
    import json as _json

    def _meta_with(codecs):
        d = str(tmp_path / f"chain{abs(hash(str(codecs)))%99999}")
        os.makedirs(d, exist_ok=True)
        _json.dump(
            {
                "zarr_format": 3, "node_type": "array", "shape": [2],
                "data_type": "float64",
                "chunk_grid": {"name": "regular",
                               "configuration": {"chunk_shape": [2]}},
                "chunk_key_encoding": {"name": "default"},
                "fill_value": 0,
                "codecs": codecs,
            },
            open(os.path.join(d, "zarr.json"), "w"),
        )
        return d

    bytes_c = {"name": "bytes", "configuration": {"endian": "little"}}
    gzip_c = {"name": "gzip", "configuration": {"level": 5}}
    # compressor before the array->bytes step
    with pytest.raises(ValueError, match="before 'bytes'"):
        zarr.read_array_meta(_meta_with([gzip_c, bytes_c]))
    # 'bytes' misplaced behind two compressors: the FIRST offending
    # codec is named (gzip precedes the array->bytes step)
    with pytest.raises(ValueError, match="'gzip' before 'bytes'"):
        zarr.read_array_meta(
            _meta_with([gzip_c, {"name": "zlib"}, bytes_c])
        )
    # duplicate 'bytes'
    with pytest.raises(ValueError, match="duplicate 'bytes'"):
        zarr.read_array_meta(_meta_with([bytes_c, bytes_c]))
    # two compressors
    with pytest.raises(ValueError, match="second compressor"):
        zarr.read_array_meta(
            _meta_with([bytes_c, gzip_c, {"name": "zlib"}])
        )
    # the valid shapes still parse
    zarr.read_array_meta(_meta_with([bytes_c]))
    zarr.read_array_meta(_meta_with([bytes_c, gzip_c]))


def test_zarr_stream_reads_appended_timesteps(spark, tmp_path):
    """Streaming a GROWING store: each availableNow pass picks up only
    the chunk files that appeared since the checkpoint — the model
    appends a timestep by writing new chunks and bumping shape, and the
    second run emits exactly the new rows (no re-read of old chunks)."""
    from snowav_spark import sources

    sources.register(spark)
    g = str(tmp_path / "grow")
    # t=1 initially, chunk-aligned along t (chunks t-dim = 1)
    arr0 = np.full((1, 2, 2), 5.0)
    zarr.write_group(g, {"swe": arr0}, chunks=(1, 2, 2))

    out = str(tmp_path / "zs_out")
    ckpt = str(tmp_path / "zs_ckpt")

    def run_once():
        q = (
            spark.readStream.format("snowav_zarr")
            .load(g)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 4
    assert {r.t for r in first.collect()} == {0}

    # append one timestep: new chunk file 1.0.0 + shape bump
    import json as _json

    arr1 = np.full((1, 2, 2), 7.0)
    meta_path = os.path.join(g, "swe", ".zarray")
    meta = _json.load(open(meta_path))
    raw = arr1.astype("<f8").tobytes()
    import zlib as _z

    open(os.path.join(g, "swe", "1.0.0"), "wb").write(_z.compress(raw, 1))
    meta["shape"] = [2, 2, 2]
    _json.dump(meta, open(meta_path, "w"))

    run_once()
    both = spark.read.parquet(out)
    assert both.count() == 8
    vals = {(r.t, r.y, r.x): r.value for r in both.collect()}
    assert vals[(0, 0, 0)] == 5.0 and vals[(1, 1, 1)] == 7.0


def test_v3_stream_with_dot_keys(spark, tmp_path):
    """v3 arrays with '.'-separated default keys ('c.0.0') stream: the
    name parser strips the 'c' prefix, metadata files are skipped, and
    a grow-resume cycle lands only the new chunk."""
    import json as _json

    from snowav_spark import sources

    sources.register(spark)
    g = str(tmp_path / "v3grow")
    zarr.write_group_v3(
        g, {"swe": np.full((1, 2, 2), 4.0)},
        chunks=(1, 2, 2), separator=".", compressor=None,
    )
    out = str(tmp_path / "v3s_out")
    ckpt = str(tmp_path / "v3s_ckpt")

    def run_once():
        q = (
            spark.readStream.format("snowav_zarr")
            .load(g)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 4

    mp = os.path.join(g, "swe", "zarr.json")
    meta = _json.load(open(mp))
    open(os.path.join(g, "swe", "c.1.0.0"), "wb").write(
        np.full((1, 2, 2), 6.0).astype("<f8").tobytes()
    )
    meta["shape"] = [2, 2, 2]
    _json.dump(meta, open(mp, "w"))
    run_once()
    both = spark.read.parquet(out)
    assert both.count() == 8
    vals = {(r.t, r.y, r.x): r.value for r in both.collect()}
    assert vals[(1, 0, 0)] == 6.0


def test_zarr_stream_rejects_nested_separator(tmp_path):
    from snowav_spark.sources import zarr_source

    p = str(tmp_path / "nested_s")
    zarr.write_array(
        p, np.zeros((2, 2)), (1, 1), dimension_separator="/"
    )
    with pytest.raises(ValueError, match="nested"):
        zarr_source.ZarrStreamReader({"path": p})._arrays()


def test_spark_source_rejects_4d(tmp_path):
    from snowav_spark.sources import zarr_source

    p = str(tmp_path / "a4")
    zarr.write_array(p, np.zeros((2, 2, 2, 2)), (1, 1, 1, 1))
    with pytest.raises(ValueError, match="1-3 dim"):
        zarr_source.ZarrReader({"path": p}).partitions()


def test_stream_rows_null_parity_with_batch(tmp_path):
    """ADVICE r9: the streaming row path must emit SQL NULL (None) for
    fill/non-finite cells, exactly as the batch Arrow path does via its
    validity mask — the same store read batch vs stream must aggregate
    identically (NaN would poison avg/sum that NULL skips)."""
    from snowav_spark.sources import zarr_source

    arr = np.array([[1.0, -9.0], [float("nan"), 4.0]])
    p = str(tmp_path / "parity")
    zarr.write_array(p, arr, (2, 2), fill_value=-9.0)
    meta = zarr.read_array_meta(p)
    rows = list(zarr_source._chunk_rows(p, "v", (0, 0), meta))
    vals = {(t, y, x): v for _, t, y, x, v in rows}
    assert vals[(0, 0, 0)] == 1.0 and vals[(0, 1, 1)] == 4.0
    # fill and NaN cells are None, never float('nan')
    assert vals[(0, 0, 1)] is None and vals[(0, 1, 0)] is None
    # batch path agrees: masked cells are null in the Arrow batch
    (batch,) = list(
        zarr_source._chunk_batches(p, "v", (0, 0), meta)
    )
    col = batch.column("value")
    assert col.null_count == 2


def test_consolidated_metadata_roundtrip_and_planning(spark, tmp_path):
    """Consolidated ``.zmetadata`` (round 10): one read serves the
    whole group's descriptors at planning — proven by REMOVING the
    member .zarray files after consolidating: the listing and the full
    Spark scan still work, byte-equal to the unconsolidated twin."""
    from snowav_spark import sources

    sources.register(spark)
    rng = np.random.RandomState(3)
    swe, depth = rng.rand(5, 7), rng.rand(5, 7)
    g = str(tmp_path / "cons")
    zarr.write_group(g, {"swe": swe, "depth": depth}, chunks=(2, 3),
                     attrs={"units": "m"})
    assert zarr.consolidate_metadata(g) == 2
    before = (
        spark.read.format("snowav_zarr").load(g)
        .orderBy("variable", "y", "x").collect()
    )
    # planner must be able to work from .zmetadata ALONE
    os.remove(os.path.join(g, "swe", ".zarray"))
    os.remove(os.path.join(g, "depth", ".zarray"))
    assert zarr.group_arrays(g) == ["depth", "swe"]
    assert zarr.read_consolidated(g)["swe"]["shape"] == [5, 7]
    after = (
        spark.read.format("snowav_zarr").load(g)
        .orderBy("variable", "y", "x").collect()
    )
    assert after == before and len(after) == 2 * 5 * 7


def test_consolidated_metadata_validates_and_skips_nested(tmp_path):
    """Consolidated entries face the same validation gates as .zarray
    files (unsupported codec fails BY NAME at planning), and nested
    sub-group arrays are not direct members."""
    import json as _json

    g = str(tmp_path / "bad")
    zarr.write_group(g, {"a": np.ones((2, 2))})
    zarr.consolidate_metadata(g)
    p = os.path.join(g, ".zmetadata")
    doc = _json.load(open(p))
    doc["metadata"]["sub/inner/.zarray"] = doc["metadata"]["a/.zarray"]
    _json.dump(doc, open(p, "w"))
    assert sorted(zarr.read_consolidated(g)) == ["a"]  # nested skipped
    doc["metadata"]["a/.zarray"] = dict(
        doc["metadata"]["a/.zarray"], compressor={"id": "zstd"}
    )
    _json.dump(doc, open(p, "w"))
    with pytest.raises(ValueError, match="zstd"):
        zarr.read_consolidated(g)
    doc["zarr_consolidated_format"] = 2
    _json.dump(doc, open(p, "w"))
    with pytest.raises(ValueError, match="consolidated_format"):
        zarr.read_consolidated(g)


def test_pushdown_prunes_chunk_grid(tmp_path):
    """Coordinate predicate pushdown (round 10): pushed t/y/x/variable
    filters prune the chunk grid at PLANNING — the parquet-partition-
    pruning equivalent for Zarr.  Unit level: the reader's partitions()
    after pushFilters()."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        LessThan,
    )

    from snowav_spark.sources.zarr_source import ZarrReader

    p = str(tmp_path / "arr")
    arr = np.arange(16 * 8 * 8, dtype="<f8").reshape(16, 8, 8)
    zarr.write_array(p, arr, (2, 4, 4))  # 8 x 2 x 2 = 32 chunks

    r = ZarrReader({"path": p})
    assert len(r.partitions()) == 32
    # every filter is returned to Spark for row-level re-evaluation
    # (chunk granularity is coarser than rows)
    back = list(r.pushFilters([GreaterThanOrEqual(("t",), 12)]))
    assert len(back) == 1
    assert len(r.partitions()) == 8

    r = ZarrReader({"path": p})
    list(r.pushFilters([EqualTo(("t",), 3), EqualTo(("x",), 7)]))
    assert len(r.partitions()) == 2  # one t-slab x 2 y-chunks x 1 x

    r = ZarrReader({"path": p})
    list(r.pushFilters([LessThan(("t",), 0)]))
    parts = r.partitions()  # pruned to nothing -> one empty marker
    assert len(parts) == 1 and parts[0].meta.get("_empty")
    assert list(r.read(parts[0])) == []

    # 2-d array: dims right-align onto (y, x) — a t filter must NOT
    # prune (there is no t dim; the t column is constant 0)
    p2 = str(tmp_path / "arr2")
    zarr.write_array(p2, np.ones((8, 8)), (4, 4))
    r = ZarrReader({"path": p2})
    list(r.pushFilters([GreaterThanOrEqual(("y",), 4)]))
    assert len(r.partitions()) == 2
    r = ZarrReader({"path": p2})
    list(r.pushFilters([GreaterThanOrEqual(("t",), 1)]))
    assert len(r.partitions()) == 4  # t unbounded on a (y, x) array

    # variable pruning on a single-array load
    r = ZarrReader({"path": p})
    list(r.pushFilters([In(("variable",), ("other", "nope"))]))
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].meta.get("_empty")


def test_pushdown_e2e_skips_pruned_chunk_reads(spark, tmp_path):
    """E2E proof that pruned chunks are never READ: corrupt a chunk
    file outside the predicate — the filtered query succeeds (the
    pruned partition never reaches an executor), the full scan fails.
    Also pins result parity between the pruned and unpruned plans."""
    from snowav_spark import sources

    sources.register(spark)
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled")
        == "true"
    )
    p = str(tmp_path / "arr")
    arr = np.arange(8 * 4 * 4, dtype="<f8").reshape(8, 4, 4)
    zarr.write_array(p, arr, (2, 4, 4))  # 4 t-chunks
    df = spark.read.format("snowav_zarr").load(p)
    expected = [
        (r.t, r.y, r.x, r.value)
        for r in df.filter("t >= 4").orderBy("t", "y", "x").collect()
    ]
    assert len(expected) == 4 * 4 * 4
    # corrupt the t=[0,2) chunk: the zlib stream becomes garbage
    with open(os.path.join(p, "0.0.0"), "wb") as f:
        f.write(b"not a zlib stream")
    got = [
        (r.t, r.y, r.x, r.value)
        for r in spark.read.format("snowav_zarr").load(p)
        .filter("t >= 4").orderBy("t", "y", "x").collect()
    ]
    assert got == expected
    with pytest.raises(Exception):  # unpruned scan must hit the corruption
        spark.read.format("snowav_zarr").load(p).count()


def test_read_array_meta_plain_dir_is_value_error(tmp_path):
    """A directory that is neither v2 nor v3 must raise the module's
    documented ValueError diagnostic, not a raw FileNotFoundError."""
    p = tmp_path / "not_zarr"
    p.mkdir()
    with pytest.raises(ValueError, match="not a zarr v2/v3 array"):
        zarr.read_array_meta(str(p))


# ---------------------------------------------------------------- sharding


def test_sharded_roundtrip_matches_unsharded_twin(tmp_path):
    """v3 sharding_indexed: every (index_location, crc32c, codec)
    combination round-trips equal to the same data written unsharded —
    the shard hop must be invisible above the byte-fetch layer."""
    rng = np.random.RandomState(11)
    arr = rng.rand(7, 10).astype("<f8")
    for loc in ("end", "start"):
        for crc in (True, False):
            for comp in ("gzip", None):
                p = str(tmp_path / f"s_{loc}_{crc}_{comp}")
                zarr.write_array_v3_sharded(
                    p, arr, (4, 6), (2, 3), compressor=comp,
                    index_location=loc, index_crc32c=crc,
                )
                meta = zarr.read_array_meta(p)
                # grid math operates on INNER chunks
                assert meta["chunks"] == [2, 3]
                assert meta["_shard"]["cps"] == [2, 2]
                np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_sharded_sparse_missing_inner_and_missing_shard(tmp_path):
    """skip_fill_chunks leaves all-fill inner chunks as 2^64-1 index
    markers and omits all-fill SHARD FILES entirely; both read back as
    fill by spec."""
    arr = np.full((8, 12), -9.0)
    arr[0, 0] = 1.0  # shard (0,0) has exactly one live inner chunk
    p = str(tmp_path / "sparse")
    zarr.write_array_v3_sharded(
        p, arr, (4, 6), (2, 3), fill_value=-9.0, skip_fill_chunks=True
    )
    meta = zarr.read_array_meta(p)
    # only shard c/0/0 exists on disk
    assert os.path.exists(zarr.chunk_file(p, meta, (0, 0)))
    assert not os.path.exists(zarr.chunk_file(p, meta, (1, 1)))
    idx = zarr.read_shard_index(
        zarr.chunk_file(p, meta, (0, 0)), meta
    )
    live = int((idx[..., 0] != zarr.SHARD_MISSING).sum())
    assert live == 1
    np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_sharded_edge_shards_trim(tmp_path):
    """Array extents that don't fill the last shard: inner chunks
    wholly outside stay missing, partial ones pad-and-trim."""
    rng = np.random.RandomState(13)
    arr = rng.rand(5, 7).astype("<f4")
    p = str(tmp_path / "edge")
    zarr.write_array_v3_sharded(p, arr, (4, 6), (2, 2))
    got = zarr.read_array(p)
    assert got.dtype == arr.dtype
    np.testing.assert_array_equal(got, arr)


def test_sharded_corrupt_index_refused(tmp_path):
    """A crc32c-checked index that fails its checksum must raise, not
    address garbage byte ranges."""
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    p = str(tmp_path / "corrupt")
    zarr.write_array_v3_sharded(p, arr, (4, 6), (2, 3))
    meta = zarr.read_array_meta(p)
    fp = zarr.chunk_file(p, meta, (0, 0))
    b = bytearray(open(fp, "rb").read())
    b[-1] ^= 0xFF
    open(fp, "wb").write(bytes(b))
    zarr._SHARD_INDEX_CACHE.clear()
    with pytest.raises(ValueError, match="crc32c mismatch"):
        zarr.read_array(p)


def test_sharded_geometry_and_nesting_refusals(tmp_path):
    """Loud refusals: shard shape not a multiple of inner chunks, and
    nested sharding (shards-of-shards)."""
    with pytest.raises(ValueError, match="not a positive multiple"):
        zarr.write_array_v3_sharded(
            str(tmp_path / "bad"), np.zeros((4, 4)), (4, 4), (3, 3)
        )
    # handcraft a descriptor with a non-multiple inner shape
    p = tmp_path / "bad2"
    p.mkdir()
    (p / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [4, 4],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [4, 4]}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [3, 3],
            "codecs": [{"name": "bytes"}],
        }}],
    }))
    with pytest.raises(ValueError, match="not a positive multiple"):
        zarr.read_array_meta(str(p))
    p3 = tmp_path / "nested"
    p3.mkdir()
    (p3 / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [4, 4],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [4, 4]}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [2, 2],
            "codecs": [{"name": "sharding_indexed",
                        "configuration": {"chunk_shape": [1, 1]}}],
        }}],
    }))
    with pytest.raises(ValueError, match="nested sharding"):
        zarr.read_array_meta(str(p3))


def test_spark_source_sharded_equals_unsharded_twin(spark, tmp_path):
    """The Spark source over a sharded store: partitions are INNER
    chunks with planner-resolved byte ranges (index parsed once per
    shard at planning), rows identical to the unsharded twin of the
    same data — including NULLs where skip-written fill chunks sit."""
    from snowav_spark import sources
    from snowav_spark.sources import zarr_source

    sources.register(spark)
    rng = np.random.RandomState(17)
    arr = rng.rand(3, 8, 8)
    arr[1, :, :] = -9.0  # a whole-fill timestep → missing inner chunks
    flat = str(tmp_path / "flat")
    shard = str(tmp_path / "shard")
    zarr.write_array_v3(
        flat, arr, (1, 4, 4), fill_value=-9.0, skip_fill_chunks=True
    )
    zarr.write_array_v3_sharded(
        shard, arr, (1, 8, 8), (1, 4, 4),
        fill_value=-9.0, skip_fill_chunks=True,
    )
    parts = zarr_source._array_partitions(shard, "v")
    assert len(parts) == 3 * 2 * 2  # one per INNER chunk
    resolved = [p for p in parts if p.byterange is not None]
    missing = [p for p in parts if p.byterange is None]
    assert len(missing) == 4  # the all-fill timestep's inner chunks
    assert all(os.path.getsize(p.byterange[0]) > 0 for p in resolved)
    a = spark.read.format("snowav_zarr").load(flat).drop("variable")
    b = spark.read.format("snowav_zarr").load(shard).drop("variable")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # fill rows surface as NULL, not dropped
    assert b.filter("t = 1 and value is null").count() == 64


def test_sharded_stream_vanished_shard_degrades_to_fill(tmp_path):
    """ADVICE r10: a shard file recorded in a prior stream offset that
    has VANISHED since (compaction/eviction) must degrade to fill-value
    rows for its in-grid inner chunks — matching the unsharded path's
    missing-chunk semantics — not kill the stream with
    FileNotFoundError."""
    from snowav_spark.sources.zarr_source import ZarrStreamReader

    g = str(tmp_path / "svan")
    arr = np.full((1, 4, 4), 5.0)
    zarr.write_array_v3_sharded(
        g, arr, (1, 4, 4), (1, 2, 2), fill_value=-9.0, separator=".",
    )
    reader = ZarrStreamReader({"path": g})
    var = os.path.basename(g.rstrip("/"))

    live = reader._rows_for({var: ["c.0.0.0"]})
    assert len(live) == 16
    assert all(r[4] == 5.0 for r in live)

    os.remove(os.path.join(g, "c.0.0.0"))
    gone = reader._rows_for({var: ["c.0.0.0"]})
    assert len(gone) == 16  # same grid coverage, now all fill
    assert all(r[4] is None for r in gone)


def test_sharded_stream_reads_appended_shards(spark, tmp_path):
    """Streaming a GROWING sharded store: a shard FILE is one offset
    entry — the second pass parses only the new shard's index and
    emits exactly its inner chunks (missing inner chunks surface as
    NULL rows, never dropped)."""
    import json as _json
    import shutil as _sh

    from snowav_spark import sources

    sources.register(spark)
    g = str(tmp_path / "sgrow")
    arr0 = np.full((1, 4, 4), 5.0)
    arr0[0, 0, 0] = -9.0  # a fill cell inside a live inner chunk
    zarr.write_array_v3_sharded(
        g, arr0, (1, 4, 4), (1, 2, 2),
        fill_value=-9.0, separator=".", skip_fill_chunks=True,
    )

    out = str(tmp_path / "sz_out")
    ckpt = str(tmp_path / "sz_ckpt")

    def run_once():
        q = (
            spark.readStream.format("snowav_zarr")
            .load(g)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 16 and {r.t for r in first.collect()} == {0}
    assert first.filter("value is null").count() == 1

    # append one timestep as a NEW SHARD: build the t=1 data as a twin
    # store's only shard, copy its shard file in, bump the shape
    twin = str(tmp_path / "twin")
    zarr.write_array_v3_sharded(
        twin, np.full((1, 4, 4), 7.0), (1, 4, 4), (1, 2, 2),
        fill_value=-9.0, separator=".",
    )
    _sh.copy(f"{twin}/c.0.0.0", f"{g}/c.1.0.0")
    mp = f"{g}/zarr.json"
    meta = _json.load(open(mp))
    meta["shape"] = [2, 4, 4]
    _json.dump(meta, open(mp, "w"))

    run_once()
    both = spark.read.parquet(out)
    assert both.count() == 32
    vals = {(r.t, r.y, r.x): r.value for r in both.collect()}
    assert vals[(0, 0, 0)] is None  # fill cell -> NULL, not dropped
    assert vals[(0, 3, 3)] == 5.0 and vals[(1, 1, 1)] == 7.0
