"""Pure-NumPy Blosc1 *chunk* container codec — no ``blosc`` dependency.

Blosc is the default Zarr v2 compressor in the wild
(``numcodecs.Blosc(cname="lz4", shuffle=SHUFFLE)`` — Pangeo, NASA
PO.DAAC, LDEO stores).  This implements the frozen Blosc1 chunk layout
from the public c-blosc ``README_CHUNK_FORMAT.rst`` / ``blosc.c``
(v1.x), from the format description — not from c-blosc's code:

    0..15  header:
           0  version            (chunk format version, 1 or 2)
           1  versionlz          (codec format version)
           2  flags              bit0 byte-shuffle, bit1 pure-memcpy,
                                 bit2 bit-shuffle, bits5-7 codec id
                                 (0 blosclz, 1 lz4/lz4hc, 2 snappy,
                                  3 zlib, 4 zstd)
           3  typesize           (one byte; blosc caps it at 255)
        4..7  nbytes   uint32-LE (uncompressed size)
       8..11  blocksize uint32-LE
      12..15  cbytes   uint32-LE (total chunk size incl. header)

    memcpy chunks: header + nbytes raw bytes, done.

    compressed chunks: ``bstarts`` — one uint32-LE absolute offset per
    block (nblocks = ceil(nbytes / blocksize)) — then the blocks.  Each
    block is 1..typesize *streams*; a block is split into ``typesize``
    streams when the codec is blosclz/lz4, typesize <= 16, the block
    holds >= 128 elements, and it is not the leftover block.  Every
    stream is ``uint32-LE compressed-size`` + payload; a stream whose
    stored size equals its uncompressed size is raw (stored verbatim).
    After the streams are decoded and concatenated the block is still
    in SHUFFLED layout when flags bit0 is set — byte-unshuffle is
    applied per block (the vectorizable ``len // typesize * typesize``
    prefix transposes; the remainder bytes pass through unchanged).

Codecs supported inside a chunk: lz4/lz4hc (sources/lz4.py — lz4hc
emits plain lz4 blocks) and zlib (stdlib).  blosclz / snappy / zstd and
bit-shuffle raise by name — never mis-decode.

Scale note: like the LZ4 block codec, this runs inside one Spark input
partition per Zarr chunk; everything is slice/ndarray work except the
per-stream loop, which is bounded by ``nblocks * typesize``.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

from .lz4 import LZ4BlockError, lz4_compress, lz4_decompress

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4
_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_CODEC_IDS = {v: k for k, v in _CODECS.items()}
# c-blosc split rule constants (blosc.c): MAX_SPLITS / MIN_BUFFERSIZE
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128


class BloscError(ValueError):
    """Malformed or unsupported Blosc chunk."""


def _split_block(codec: str, typesize: int, blocksize: int) -> bool:
    """c-blosc's split decision — decoders must mirror it exactly or
    they read the wrong number of stream headers."""
    return (
        codec in ("blosclz", "lz4")
        and 1 <= typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
    )


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Inverse byte-shuffle of one block: the first
    ``len // typesize * typesize`` bytes are a (typesize, nelem)
    byte-plane matrix — transpose it; trailing remainder bytes are
    stored unshuffled."""
    if typesize <= 1 or len(buf) < typesize:
        return buf
    nelem = len(buf) // typesize
    vec = nelem * typesize
    planes = np.frombuffer(buf[:vec], dtype=np.uint8)
    body = planes.reshape(typesize, nelem).T.tobytes()
    return body + buf[vec:]


def _shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(buf) < typesize:
        return buf
    nelem = len(buf) // typesize
    vec = nelem * typesize
    arr = np.frombuffer(buf[:vec], dtype=np.uint8)
    body = arr.reshape(nelem, typesize).T.tobytes()
    return body + buf[vec:]


def blosc_decompress(chunk: bytes) -> bytes:
    """Decode one Blosc1 chunk to its original bytes.  Raises
    :class:`BloscError` naming the feature on unsupported codecs
    (blosclz/snappy/zstd) and bit-shuffle."""
    if len(chunk) < 16:
        raise BloscError("blosc chunk shorter than its 16-byte header")
    version, _versionlz, flags, typesize = chunk[0], chunk[1], chunk[2], chunk[3]
    nbytes, blocksize, cbytes = struct.unpack("<III", chunk[4:16])
    if version not in (1, 2):
        raise BloscError(f"unsupported blosc chunk version {version}")
    if cbytes != len(chunk):
        raise BloscError(
            f"blosc header says {cbytes} bytes, chunk has {len(chunk)}"
        )
    if flags & _FLAG_BITSHUFFLE:
        raise BloscError("blosc bit-shuffle is not supported (byte-shuffle is)")
    if flags & _FLAG_MEMCPY:
        body = chunk[16:16 + nbytes]
        if len(body) != nbytes:
            raise BloscError("memcpy blosc chunk truncated")
        return body
    if nbytes == 0:
        return b""
    codec = _CODECS.get((flags & 0xE0) >> 5)
    if codec not in ("lz4", "zlib"):
        raise BloscError(
            f"unsupported blosc inner codec {codec!r} — lz4/zlib only"
        )
    if blocksize <= 0:
        raise BloscError("blosc blocksize is zero on a compressed chunk")
    nblocks = -(-nbytes // blocksize)
    bstarts_end = 16 + 4 * nblocks
    if len(chunk) < bstarts_end:
        raise BloscError("blosc chunk truncated inside bstarts")
    bstarts = struct.unpack(f"<{nblocks}I", chunk[16:bstarts_end])
    out = bytearray(nbytes)
    shuffled = bool(flags & _FLAG_SHUFFLE) and typesize > 1
    for bi, start in enumerate(bstarts):
        bsize = min(blocksize, nbytes - bi * blocksize)
        leftover = bsize != blocksize
        nsplits = (
            typesize
            if _split_block(codec, typesize, blocksize) and not leftover
            else 1
        )
        neblock = bsize // nsplits
        pos = start
        block = bytearray()
        for _ in range(nsplits):
            if pos + 4 > len(chunk):
                raise BloscError("blosc stream header past end of chunk")
            (csize,) = struct.unpack("<I", chunk[pos:pos + 4])
            pos += 4
            if pos + csize > len(chunk):
                raise BloscError("blosc stream payload past end of chunk")
            payload = chunk[pos:pos + csize]
            pos += csize
            if csize == neblock:
                block += payload  # stored raw
            elif codec == "lz4":
                try:
                    block += lz4_decompress(payload, neblock)
                except LZ4BlockError as e:
                    raise BloscError(f"blosc lz4 stream: {e}") from e
            else:
                block += _zlib.decompress(payload)
        if len(block) != bsize:
            raise BloscError(
                f"blosc block {bi} decoded to {len(block)} bytes, "
                f"expected {bsize}"
            )
        if shuffled:
            block = bytearray(_unshuffle(bytes(block), typesize))
        off = bi * blocksize
        out[off:off + bsize] = block
    return bytes(out)


def blosc_compress(
    data: bytes,
    typesize: int = 1,
    codec: str = "lz4",
    shuffle: bool = True,
    blocksize: int = 0,
) -> bytes:
    """Encode bytes as one Blosc1 chunk (fixture writer and the zarr
    fixture ``compressor="blosc-lz4"`` path).  ``blocksize=0`` picks
    64 KiB (or the whole buffer when smaller)."""
    if codec not in ("lz4", "zlib"):
        raise BloscError(f"blosc encoder supports lz4/zlib, not {codec!r}")
    if not 1 <= typesize <= 255:
        raise BloscError(f"blosc typesize must be 1..255, got {typesize}")
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(max(nbytes, 1), 64 * 1024)
    # keep blocks aligned to typesize so shuffle planes stay whole
    if typesize > 1 and blocksize % typesize:
        blocksize += typesize - (blocksize % typesize)
    flags = _CODEC_IDS[codec] << 5
    do_shuffle = shuffle and typesize > 1
    if do_shuffle:
        flags |= _FLAG_SHUFFLE
    header = struct.pack(
        "<BBBB", 2, 1, flags, typesize
    ) + struct.pack("<II", nbytes, blocksize)
    if nbytes == 0:
        chunk = header + struct.pack("<I", 16)
        return chunk
    nblocks = -(-nbytes // blocksize)
    streams: list[bytes] = []
    bstart_vals: list[int] = []
    pos = 16 + 4 * nblocks
    for bi in range(nblocks):
        off = bi * blocksize
        bsize = min(blocksize, nbytes - off)
        leftover = bsize != blocksize
        block = data[off:off + bsize]
        if do_shuffle:
            block = _shuffle(block, typesize)
        nsplits = (
            typesize
            if _split_block(codec, typesize, blocksize) and not leftover
            else 1
        )
        neblock = bsize // nsplits
        bstart_vals.append(pos)
        for si in range(nsplits):
            stream = block[si * neblock:(si + 1) * neblock]
            comp = (
                lz4_compress(stream)
                if codec == "lz4"
                else _zlib.compress(stream, 5)
            )
            if len(comp) >= neblock:
                comp = stream  # store raw; csize == neblock marks it
            streams.append(struct.pack("<I", len(comp)) + comp)
            pos += 4 + len(comp)
    body = struct.pack(f"<{nblocks}I", *bstart_vals) + b"".join(streams)
    cbytes = 16 + len(body)
    if cbytes >= nbytes + 16:
        # compression did not pay — memcpy chunk, like c-blosc
        header = struct.pack(
            "<BBBB", 2, 1, _FLAG_MEMCPY, typesize
        ) + struct.pack("<II", nbytes, blocksize)
        return header + struct.pack("<I", 16 + nbytes) + data
    return header + struct.pack("<I", cbytes) + body
