"""LZ4 block + Blosc1 chunk codecs (sources/lz4.py, sources/blosc.py).

The decoder-side vectors here are HAND-ASSEMBLED from the public spec
texts (lz4_Block_format.md; c-blosc README_CHUNK_FORMAT.rst) — not
produced by this repo's encoders — so the decoders are graded against
the format, never against their own assumptions.  Encoder output is
then separately required to survive its own decoder (round-trip) and to
reproduce raw-twin Zarr arrays bit-exactly through the full scan path.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from snowav_spark.sources import zarr
from snowav_spark.sources.blosc import (
    BloscError,
    blosc_compress,
    blosc_decompress,
)
from snowav_spark.sources.lz4 import (
    LZ4BlockError,
    lz4_compress,
    lz4_decompress,
    numcodecs_lz4_decode,
    numcodecs_lz4_encode,
)


# --------------------------------------------------------------------------
# LZ4 block decoder vs hand-built spec vectors
# --------------------------------------------------------------------------

def test_lz4_literal_only_block():
    # token 0x50: 5 literals, last sequence => no offset
    assert lz4_decompress(b"\x50hello", 5) == b"hello"


def test_lz4_simple_match():
    # seq1: 8 literals "01234567", match offset=8 len=8
    #   token (8<<4)|(8-4) = 0x84, offset bytes 08 00
    # seq2 (last): 5 literals "ABCDE", token 0x50
    block = b"\x84" + b"01234567" + b"\x08\x00" + b"\x50" + b"ABCDE"
    assert lz4_decompress(block, 21) == b"0123456701234567ABCDE"


def test_lz4_overlapping_match_replicates():
    # RLE shape: 1 literal "a", match offset=1 len=19 (token low nibble
    # 15 + continuation 0x00), then 5 trailing literals
    block = b"\x1f" + b"a" + b"\x01\x00" + b"\x00" + b"\x50" + b"BCDEF"
    assert lz4_decompress(block, 25) == b"a" * 20 + b"BCDEF"


def test_lz4_long_literal_run_lsic():
    # 20 literals: token 0xF0 + continuation byte 5 (15+5)
    block = b"\xf0\x05" + b"x" * 20
    assert lz4_decompress(block, 20) == b"x" * 20


def test_lz4_lsic_255_continuation():
    # 270 literals: 15 + 255 + 0 -> continuation bytes ff 00
    block = b"\xf0\xff\x00" + b"y" * 270
    assert lz4_decompress(block, 270) == b"y" * 270


def test_lz4_empty():
    assert lz4_decompress(b"", 0) == b""
    assert lz4_compress(b"") == b"\x00"
    assert lz4_decompress(lz4_compress(b""), 0) == b""


@pytest.mark.parametrize(
    "block,size,msg",
    [
        (b"\x14" + b"a" + b"\x00\x00" + b"\x50" + b"BCDEF", 10, "zero"),
        (b"\x14" + b"a" + b"\x05\x00" + b"\x50" + b"BCDEF", 10, "before"),
        (b"\x50hel", 5, "literal run past end"),
        (b"\x50hello", 4, "expected 4"),
        (b"\x84" + b"01234567" + b"\x08", 21, "truncated"),
        (b"\x50hello\x50", 10, "truncated"),
    ],
)
def test_lz4_malformed_blocks_raise(block, size, msg):
    with pytest.raises(LZ4BlockError, match=msg):
        lz4_decompress(block, size)


def test_lz4_roundtrip_shapes():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"a",
        b"abcabcabcabcabcabcabcabcabcabc",
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 10_000, dtype=np.uint8)),  # compressible
        np.arange(4096, dtype="<f8").tobytes(),
        b"z" * 100_000,  # long RLE: exercises LSIC + overlap copy
        b"0123456789ab" ,  # exactly 12 bytes: literal-only by spec
    ]
    for data in cases:
        comp = lz4_compress(data)
        assert lz4_decompress(comp, len(data)) == data
    rle = lz4_compress(b"z" * 100_000)
    assert len(rle) < 1000  # matches actually engaged


def test_numcodecs_lz4_framing():
    data = np.arange(1000, dtype="<i4").tobytes()
    enc = numcodecs_lz4_encode(data)
    assert struct.unpack("<I", enc[:4])[0] == len(data)
    assert numcodecs_lz4_decode(enc) == data
    with pytest.raises(LZ4BlockError, match="header"):
        numcodecs_lz4_decode(b"\x01")


# --------------------------------------------------------------------------
# Blosc chunk decoder vs hand-built format vectors
# --------------------------------------------------------------------------

def _header(flags, typesize, nbytes, blocksize, cbytes):
    return struct.pack("<BBBB", 2, 1, flags, typesize) + struct.pack(
        "<III", nbytes, blocksize, cbytes
    )


def test_blosc_memcpy_chunk_hand_built():
    chunk = _header(0x02, 1, 5, 5, 21) + b"hello"
    assert blosc_decompress(chunk) == b"hello"


def test_blosc_single_block_raw_stream_hand_built():
    # codec lz4 (flags 0x20), typesize 1, one block, stream stored raw
    # (csize == neblock); layout: header | bstarts | csize | payload
    chunk = (
        _header(0x20, 1, 5, 5, 29)
        + struct.pack("<I", 20)  # bstart: absolute offset of the block
        + struct.pack("<I", 5)  # stream csize == neblock => raw
        + b"hello"
    )
    assert blosc_decompress(chunk) == b"hello"


def test_blosc_shuffle_split_hand_built():
    # typesize 2, blocksize 256 (>= 128 elements) => split into 2
    # byte-plane streams; flags = lz4 codec | byte-shuffle = 0x21.
    data = b"".join(bytes([i, 255 - i]) for i in range(128))
    plane0 = bytes(range(128))
    plane1 = bytes(255 - i for i in range(128))
    chunk = (
        _header(0x21, 2, 256, 256, 16 + 4 + (4 + 128) * 2)
        + struct.pack("<I", 20)
        + struct.pack("<I", 128) + plane0  # stream 0 raw
        + struct.pack("<I", 128) + plane1  # stream 1 raw
    )
    assert blosc_decompress(chunk) == data


def test_blosc_lz4_stream_hand_built():
    # one genuinely lz4-compressed stream, itself a hand-built block:
    # "0123456701234567ABCDE" (21 bytes) from the lz4 vector above
    payload = b"\x84" + b"01234567" + b"\x08\x00" + b"\x50" + b"ABCDE"
    chunk = (
        _header(0x20, 1, 21, 21, 16 + 4 + 4 + len(payload))
        + struct.pack("<I", 20)
        + struct.pack("<I", len(payload))
        + payload
    )
    assert blosc_decompress(chunk) == b"0123456701234567ABCDE"


def test_blosc_unsupported_features_raise():
    with pytest.raises(BloscError, match="bit-shuffle"):
        blosc_decompress(_header(0x04, 1, 5, 5, 21) + b"hello")
    # codec id 4 = zstd
    with pytest.raises(BloscError, match="zstd"):
        blosc_decompress(
            _header(0x80, 1, 5, 5, 29)
            + struct.pack("<II", 20, 5) + b"hello"
        )
    with pytest.raises(BloscError, match="16-byte"):
        blosc_decompress(b"short")
    with pytest.raises(BloscError, match="says"):
        blosc_decompress(_header(0x02, 1, 5, 5, 99) + b"hello")


def test_blosc_roundtrip_matrix():
    rng = np.random.default_rng(11)
    arrays = [
        np.arange(10_000, dtype="<f8"),
        rng.standard_normal(5_000).astype("<f4"),
        rng.integers(0, 100, 30_000).astype("<i2"),
        np.zeros(100_000, dtype="<i8"),
        rng.integers(0, 256, 333, dtype=np.uint8),  # sub-block leftover
    ]
    for arr in arrays:
        for codec in ("lz4", "zlib"):
            for shuffle in (True, False):
                raw = arr.tobytes()
                chunk = blosc_compress(
                    raw, typesize=arr.dtype.itemsize,
                    codec=codec, shuffle=shuffle,
                )
                assert blosc_decompress(chunk) == raw, (
                    arr.dtype, codec, shuffle
                )
    # shuffle + lz4 on smooth data must actually compress
    smooth = np.arange(100_000, dtype="<f8").tobytes()
    chunk = blosc_compress(smooth, typesize=8, codec="lz4", shuffle=True)
    assert len(chunk) < len(smooth) // 4


def test_blosc_multi_block_leftover():
    # force several blocks including a ragged leftover block
    data = np.arange(40_000, dtype="<i4").tobytes()  # 160_000 bytes
    chunk = blosc_compress(
        data, typesize=4, codec="lz4", shuffle=True, blocksize=65_536
    )
    assert blosc_decompress(chunk) == data
    data2 = data[: 160_000 - 4 * 7]  # leftover not at a block boundary
    chunk2 = blosc_compress(
        data2, typesize=4, codec="lz4", shuffle=True, blocksize=65_536
    )
    assert blosc_decompress(chunk2) == data2


def test_blosc_empty():
    assert blosc_decompress(blosc_compress(b"", typesize=1)) == b""


# --------------------------------------------------------------------------
# Zarr integration: compressed stores scan equal to their raw twins
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "comp", ["lz4", "blosc-lz4", "blosc-lz4-noshuffle", "blosc-zlib"]
)
def test_v2_compressed_equals_raw_twin(tmp_path, comp):
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((37, 23)).astype("<f8")
    raw_p, c_p = str(tmp_path / "raw"), str(tmp_path / "c")
    zarr.write_array(raw_p, arr, (10, 10), compressor=None)
    zarr.write_array(c_p, arr, (10, 10), compressor=comp)
    np.testing.assert_array_equal(zarr.read_array(raw_p), arr)
    np.testing.assert_array_equal(zarr.read_array(c_p), arr)
    # the compressed store's .zarray advertises the real codec
    meta = json.load(open(os.path.join(c_p, ".zarray")))
    assert meta["compressor"]["id"] == ("lz4" if comp == "lz4" else "blosc")


def test_v2_blosc_sparse_fill_chunks(tmp_path):
    arr = np.full((8, 8), -9.0)
    arr[0, 0] = 1.5
    p = str(tmp_path / "sparse")
    zarr.write_array(
        p, arr, (4, 4), compressor="blosc-lz4", fill_value=-9.0,
        skip_fill_chunks=True,
    )
    files = [f for f in os.listdir(p) if not f.startswith(".")]
    assert len(files) == 1  # three all-fill chunks omitted
    np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_v3_blosc_codec_chain(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1000, (20, 12)).astype("<i4")
    p = str(tmp_path / "v3b")
    zarr.write_array_v3(p, arr, (8, 8), compressor="blosc")
    meta = zarr.read_array_meta(p)
    assert meta["compressor"]["id"] == "blosc"
    np.testing.assert_array_equal(zarr.read_array(p), arr)


def test_v3_codec_chain_shape_validation(tmp_path):
    # ADVICE r10: spec-invalid chains must be rejected by SHAPE, not
    # surface later as a misleading size-mismatch 'corrupt' error
    def meta_with(codecs):
        return {
            "zarr_format": 3, "node_type": "array", "shape": [4],
            "data_type": "float64",
            "chunk_grid": {
                "name": "regular", "configuration": {"chunk_shape": [4]},
            },
            "chunk_key_encoding": {"name": "default"},
            "fill_value": 0, "codecs": codecs,
        }

    p = str(tmp_path / "bad")
    os.makedirs(p, exist_ok=True)

    def write(codecs):
        json.dump(meta_with(codecs), open(os.path.join(p, "zarr.json"), "w"))

    bt = {"name": "bytes", "configuration": {"endian": "little"}}
    gz = {"name": "gzip", "configuration": {"level": 1}}
    write([gz, bt])
    with pytest.raises(ValueError, match="before 'bytes'"):
        zarr.read_array_meta(p)
    write([bt, bt])
    with pytest.raises(ValueError, match="duplicate 'bytes'"):
        zarr.read_array_meta(p)
    write([bt, gz, gz])
    with pytest.raises(ValueError, match="second compressor"):
        zarr.read_array_meta(p)
    write([bt, {"name": "blosc", "configuration": {"cname": "zstd"}}])
    with pytest.raises(ValueError, match="zstd"):
        zarr.read_array_meta(p)
    write([bt, {"name": "blosc",
                "configuration": {"cname": "lz4", "shuffle": "bitshuffle"}}])
    with pytest.raises(ValueError, match="bit-shuffle"):
        zarr.read_array_meta(p)


def test_v2_blosc_bitshuffle_and_zstd_cname_raise(tmp_path):
    p = str(tmp_path / "bad2")
    os.makedirs(p)
    meta = {
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
        "compressor": {"id": "blosc", "cname": "zstd"},
        "fill_value": 0, "order": "C", "filters": None,
    }
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="zstd"):
        zarr.read_array_meta(p)
    meta["compressor"] = {"id": "blosc", "cname": "lz4", "shuffle": 2}
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="bit-shuffle"):
        zarr.read_array_meta(p)


def test_spark_source_scans_blosc_store(spark, tmp_path):
    from snowav_spark import sources

    sources.register(spark)
    rng = np.random.default_rng(9)
    arr = rng.standard_normal((31, 17)).astype("<f8")
    raw_p, c_p = str(tmp_path / "raw"), str(tmp_path / "blosc")
    zarr.write_array(raw_p, arr, (8, 8), compressor=None)
    zarr.write_array(c_p, arr, (8, 8), compressor="blosc-lz4")
    # drop "variable" — it is the store directory NAME (raw vs blosc)
    a = (
        spark.read.format("snowav_zarr").load(raw_p)
        .orderBy("y", "x").drop("variable").toPandas()
    )
    b = (
        spark.read.format("snowav_zarr").load(c_p)
        .orderBy("y", "x").drop("variable").toPandas()
    )
    assert a.equals(b)
    assert len(a) == 31 * 17
