"""Pure-NumPy Zarr v2 array store reader (+ a minimal writer for
fixtures) — no ``zarr``/``numcodecs`` dependency.

Zarr is the cloud-native sibling of the NetCDF/HDF5 containers this
package already parses (SURVEY §2.1 scan family; the reference's domain
data — gridded snow model output — ships as Zarr in modern pipelines,
e.g. NASA/Pangeo archives).  The v2 on-disk layout is deliberately
simple and fully documented (zarr-specs v2): a directory per array
holding a ``.zarray`` JSON descriptor plus one flat file per chunk named
by its grid coordinates (``"2.0.1"``), and a directory per group holding
``.zgroup`` with arrays as subdirectories.  That flatness is exactly
what makes it the RIGHT format for a distributed engine: every chunk is
an independently fetchable object, so the Spark source
(sources/zarr_source.py) maps one chunk → one input partition with no
byte-range or B-tree walking at all — unlike HDF5, where reaching a
chunk means driver-side superblock/B-tree traversal first.

Supported here (the subset stdlib+NumPy can do exactly):

- any NumPy numeric dtype string (``<f8``, ``>i4``, ``|u1`` …), C or F
  chunk order;
- ``compressor: null`` (raw), the ``zlib``/``gzip`` codecs (stdlib
  ``zlib``), the ``lz4`` codec (numcodecs framing, pure-Python block
  decoder in sources/lz4.py), and ``blosc`` with inner codec
  lz4/lz4hc/zlib and byte-shuffle (sources/blosc.py) — the Pangeo/NASA
  default ``Blosc(cname="lz4", shuffle=SHUFFLE)`` scans natively.
  ``zstd``/``snappy``/``blosclz`` and bit-shuffle raise a clear error
  naming the codec instead of mis-decoding;
- ``fill_value`` semantics including the load-bearing one: a chunk file
  that does NOT exist IS a chunk of fill values (sparse arrays write
  nothing for empty regions — a reader that treated absence as an error
  or as zeros would corrupt sparse data);
- edge-chunk trimming: stored chunks are always full chunk-shaped, the
  array boundary cuts the padding off at read;
- ``dimension_separator`` "." (default) and "/" (nested directories);
- ``filters`` must be null/empty — codec *filter chains* are out of
  scope and raise rather than silently skipping a transform;
- v3 ``sharding_indexed``: the production object-store layout (many
  inner chunks per shard file + a binary index footer).  The
  descriptor normalizes so the GRID IS THE INNER-CHUNK GRID —
  ``meta["chunks"]`` is the inner chunk shape and every downstream
  consumer (the Spark source, read_array) addresses inner chunks;
  only the byte-fetch step knows shards exist.  The per-shard index
  (uint64 ``(offset, nbytes)`` pairs, 2^64-1 = missing, optional
  crc32c checksum, at the file's start or end) is parsed ONCE per
  shard; the Spark planner does it at planning time so each executor
  task is a single byte-range read.
"""

from __future__ import annotations

import json
import os
import zlib as _zlib

import numpy as np

from .blosc import BloscError, blosc_compress, blosc_decompress
from .lz4 import numcodecs_lz4_decode, numcodecs_lz4_encode

_UNSUPPORTED = (
    "zstd", "snappy", "blosclz", "bz2", "lzma", "shuffle", "delta",
    "crc32c",
)
_V2_COMPRESSORS = ("zlib", "gzip", "lz4", "blosc")


def _meta_path(path: str) -> str:
    return os.path.join(path, ".zarray")


def _v3_meta_path(path: str) -> str:
    return os.path.join(path, "zarr.json")


def _v3_node_type(path: str) -> str | None:
    p = _v3_meta_path(path)
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as f:
            return json.load(f).get("node_type")
    except (OSError, ValueError):
        return None


def is_zarr_array(path: str) -> bool:
    return (
        os.path.isfile(_meta_path(path))
        or _v3_node_type(path) == "array"
    )


def is_zarr_group(path: str) -> bool:
    return (
        os.path.isfile(os.path.join(path, ".zgroup"))
        or _v3_node_type(path) == "group"
    )


_V3_DTYPES = {
    "bool": "|b1",
    "int8": "|i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "|u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float16": "f2", "float32": "f4", "float64": "f8",
}


def _parse_v3_codec_chain(codecs: list, path: str) -> tuple[str, dict | None]:
    """(endian, compressor) from a plain v3 codec chain: exactly one
    ``bytes`` array→bytes codec FIRST, optionally followed by exactly
    one ``gzip``/``zlib``/``blosc`` bytes→bytes compressor; everything
    else — ``zstd``/``crc32c``/``transpose``/nested sharding — raises
    by name.  Chain SHAPE is validated too (ADVICE r10): a spec-invalid
    order like [gzip, bytes], a duplicate bytes/compressor entry, or a
    second compressor is rejected here with the offending layout —
    accepting it would decode as if it were bytes→compressor and
    surface only as a misleading downstream size-mismatch 'corrupt'
    error."""
    endian = "little"
    compressor = None
    seen_bytes = False
    for pos, c in enumerate(codecs):
        name = c.get("name")
        conf = c.get("configuration") or {}
        if name == "bytes":
            if seen_bytes:
                raise ValueError(
                    f"duplicate 'bytes' codec at {path} — the chain "
                    "must hold exactly one"
                )
            if pos != 0:
                raise ValueError(
                    f"'bytes' codec at position {pos} of {path} — it "
                    "is the array→bytes step and must come first; "
                    f"chain is {[x.get('name') for x in codecs]}"
                )
            endian = conf.get("endian", "little")
            seen_bytes = True
        elif name in ("gzip", "zlib", "blosc"):
            if not seen_bytes:
                raise ValueError(
                    f"compressor {name!r} before 'bytes' at {path} — "
                    "bytes→bytes codecs follow the array→bytes step; "
                    f"chain is {[x.get('name') for x in codecs]}"
                )
            if compressor is not None:
                raise ValueError(
                    f"second compressor {name!r} at {path} — at most "
                    "one bytes→bytes compressor is supported"
                )
            if name == "blosc":
                cname = conf.get("cname", "lz4")
                if cname not in ("lz4", "lz4hc", "zlib"):
                    raise ValueError(
                        f"unsupported blosc cname {cname!r} at {path} "
                        "— lz4/lz4hc/zlib only"
                    )
                if conf.get("shuffle") == "bitshuffle":
                    raise ValueError(
                        f"blosc bit-shuffle at {path} is not supported "
                        "(byte-shuffle is)"
                    )
                compressor = {"id": "blosc", "cname": cname}
            else:
                compressor = {"id": name}
        elif name == "sharding_indexed":
            raise ValueError(
                f"nested sharding_indexed at {path} — one shard level "
                "is supported, shards-of-shards are not"
            )
        else:
            raise ValueError(
                f"unsupported v3 codec {name!r} at {path} — this "
                "pure-stdlib reader handles bytes/gzip/zlib/blosc only"
            )
    if not seen_bytes:
        raise ValueError(f"v3 codec chain lacks 'bytes' at {path}")
    return endian, compressor


def _parse_v3_index_codecs(codecs: list, path: str) -> tuple[str, bool]:
    """(endian, crc32c?) of a shard-index codec chain (``bytes`` +
    optional ``crc32c`` is the spec'd shape; anything else raises —
    a mis-decoded index would address garbage byte ranges)."""
    endian = "little"
    crc = False
    seen_bytes = False
    for c in codecs:
        name = c.get("name")
        if name == "bytes":
            endian = (c.get("configuration") or {}).get("endian", "little")
            seen_bytes = True
        elif name == "crc32c":
            crc = True
        else:
            raise ValueError(
                f"unsupported shard index codec {name!r} at {path} "
                "(bytes + optional crc32c only)"
            )
    if not seen_bytes:
        raise ValueError(f"shard index codec chain lacks 'bytes' at {path}")
    return endian, crc


def _read_v3_meta(path: str) -> dict:
    """Normalize a v3 ``zarr.json`` array descriptor into the SAME dict
    shape the v2 reader consumes (shape/chunks/dtype/compressor/
    fill_value/order + a ``_key`` chunk-name encoding tag), so every
    downstream consumer — read_chunk, the Spark source, ingest — is
    version-blind.  Supported codec chains: one ``bytes`` (endian)
    array→bytes codec optionally followed by ``gzip``/``zlib``
    bytes→bytes, or ``sharding_indexed`` wrapping such a chain — in
    the sharded case ``chunks`` becomes the INNER chunk shape (the
    unit of the read grid) and ``_shard`` records the shard geometry
    and index codec facts; ``blosc``/``zstd``/``transpose`` raise by
    name."""
    with open(_v3_meta_path(path)) as f:
        m = json.load(f)
    if m.get("zarr_format") != 3 or m.get("node_type") != "array":
        raise ValueError(f"not a zarr v3 array descriptor at {path}")
    grid = m.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ValueError(
            f"unsupported v3 chunk_grid {grid.get('name')!r} at {path} "
            "(only 'regular')"
        )
    base = _V3_DTYPES.get(m.get("data_type"))
    if base is None:
        raise ValueError(
            f"unsupported v3 data_type {m.get('data_type')!r} at {path}"
        )
    outer_chunks = list(grid.get("configuration", {})["chunk_shape"])
    codecs = m.get("codecs") or [
        {"name": "bytes", "configuration": {"endian": "little"}}
    ]
    shard = None
    if codecs and codecs[0].get("name") == "sharding_indexed":
        if len(codecs) > 1:
            raise ValueError(
                f"codecs after sharding_indexed at {path} — the shard "
                "codec must be the whole array→bytes chain"
            )
        conf = codecs[0].get("configuration") or {}
        inner = list(conf["chunk_shape"])
        if len(inner) != len(outer_chunks) or any(
            ic <= 0 or oc % ic != 0
            for ic, oc in zip(inner, outer_chunks)
        ):
            raise ValueError(
                f"shard chunk_shape {outer_chunks} is not a positive "
                f"multiple of inner chunk_shape {inner} at {path}"
            )
        endian, compressor = _parse_v3_codec_chain(
            conf.get("codecs")
            or [{"name": "bytes", "configuration": {"endian": "little"}}],
            path,
        )
        idx_endian, idx_crc = _parse_v3_index_codecs(
            conf.get("index_codecs")
            or [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"},
            ],
            path,
        )
        loc = conf.get("index_location", "end")
        if loc not in ("start", "end"):
            raise ValueError(
                f"unsupported index_location {loc!r} at {path}"
            )
        shard = {
            "shape": outer_chunks,
            "cps": [oc // ic for oc, ic in zip(outer_chunks, inner)],
            "index_location": loc,
            "index_endian": idx_endian,
            "index_crc32c": idx_crc,
        }
        chunk_shape = inner
    else:
        endian, compressor = _parse_v3_codec_chain(codecs, path)
        chunk_shape = outer_chunks
    if base.startswith("|"):
        dtype = base
    else:
        dtype = ("<" if endian == "little" else ">") + base
    key = m.get("chunk_key_encoding") or {"name": "default"}
    key_name = key.get("name", "default")
    key_sep = (key.get("configuration") or {}).get(
        "separator", "/" if key_name == "default" else "."
    )
    if key_name not in ("default", "v2"):
        raise ValueError(
            f"unsupported v3 chunk_key_encoding {key_name!r} at {path}"
        )
    return {
        "zarr_format": 3,
        "shape": m["shape"],
        "chunks": chunk_shape,
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": m.get("fill_value"),
        "order": "C",
        "filters": None,
        "_key": (key_name, key_sep),
        "_attrs": m.get("attributes") or {},
        "_shard": shard,
    }


def read_array_meta(path: str) -> dict:
    """The parsed array descriptor (v2 ``.zarray`` or v3 ``zarr.json``,
    normalized to one dict shape), validated to the supported subset.
    Raises with the codec name on unsupported compressors and on
    filter chains — never silently mis-decodes."""
    if not os.path.isfile(_meta_path(path)):
        if _v3_node_type(path) == "array":
            return _read_v3_meta(path)
        raise ValueError(
            f"{path} is not a zarr v2/v3 array (no .zarray and no "
            "array-typed zarr.json)"
        )
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    return _validate_v2_meta(meta, path)


def _validate_v2_meta(meta: dict, path: str) -> dict:
    """Validate a v2 array descriptor dict (from ``.zarray`` or a
    consolidated ``.zmetadata`` entry) to the supported subset —
    shared so consolidated entries face exactly the per-file gates."""
    if meta.get("zarr_format") != 2:
        raise ValueError(
            f"unsupported zarr_format {meta.get('zarr_format')!r} "
            f"(only v2/v3) at {path}"
        )
    comp = meta.get("compressor")
    if comp is not None:
        cid = comp.get("id")
        if cid not in _V2_COMPRESSORS:
            raise ValueError(
                f"unsupported zarr compressor {cid!r} at {path} — this "
                "pure-stdlib reader handles null/zlib/gzip/lz4/blosc "
                "(blosc inner codec lz4/lz4hc/zlib) only"
            )
        if cid == "blosc":
            # numcodecs.Blosc meta: cname + shuffle (0 none, 1 byte,
            # 2 bit).  The chunk header flags are authoritative at
            # decode; validating here fails fast with the codec NAME
            # instead of a per-chunk decode error.
            cname = comp.get("cname", "lz4")
            if cname not in ("lz4", "lz4hc", "zlib"):
                raise ValueError(
                    f"unsupported blosc cname {cname!r} at {path} — "
                    "lz4/lz4hc/zlib only (no blosclz/snappy/zstd)"
                )
            if comp.get("shuffle", 1) == 2:
                raise ValueError(
                    f"blosc bit-shuffle at {path} is not supported "
                    "(byte-shuffle is)"
                )
    if meta.get("filters"):
        raise ValueError(
            f"zarr filter chains are not supported ({meta['filters']!r} "
            f"at {path})"
        )
    if meta.get("order", "C") not in ("C", "F"):
        raise ValueError(f"unsupported chunk order {meta.get('order')!r}")
    np.dtype(meta["dtype"])  # raises on non-numpy dtype strings
    return meta


def _chunk_grid(meta: dict) -> list[tuple[int, ...]]:
    """Every chunk coordinate of the array's chunk grid, C-ordered."""
    from itertools import product

    counts = [
        -(-s // c) for s, c in zip(meta["shape"], meta["chunks"])
    ]
    return list(product(*[range(n) for n in counts]))


def chunk_file(path: str, meta: dict, coord: tuple[int, ...]) -> str:
    key = meta.get("_key")
    if key is not None:  # v3: 'default' prefixes the key with "c"
        name, sep = key
        parts = [str(i) for i in coord]
        joined = sep.join(["c", *parts] if name == "default" else parts)
        return os.path.join(path, joined)
    sep = meta.get("dimension_separator", ".")
    return os.path.join(path, sep.join(str(i) for i in coord))


def parse_chunk_name(name: str, meta: dict) -> tuple[int, ...] | None:
    """Inverse of :func:`chunk_file` for FLAT (single-file-name) chunk
    keys: the grid coordinate encoded in ``name``, or None when the
    name is not a chunk key of this array's encoding.  Nested ("/")
    encodings have no flat name to parse — callers that list
    directories flatly (the streaming source) must refuse those."""
    key = meta.get("_key")
    if key is not None:
        kname, sep = key
        parts = name.split(sep)
        if kname == "default":
            if not parts or parts[0] != "c":
                return None
            parts = parts[1:]
    else:
        parts = name.split(meta.get("dimension_separator", "."))
    if len(parts) != len(meta["shape"]):
        return None
    try:
        return tuple(int(i) for i in parts)
    except ValueError:
        return None


#: shard index sentinel: both uint64s of an entry equal 2**64-1 when
#: the inner chunk was never written (a fill chunk), per the v3 spec.
SHARD_MISSING = 2**64 - 1

_CRC32C_TABLE: list[int] | None = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the checksum
    the v3 ``crc32c`` index codec appends.  stdlib zlib.crc32 is the
    IEEE polynomial, so this is hand-rolled (table-driven; the index
    is KBs, not the payload)."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def split_shard_coord(
    meta: dict, coord: tuple[int, ...]
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Global inner-chunk coord → (shard grid coord, coord within the
    shard's inner grid)."""
    cps = meta["_shard"]["cps"]
    return (
        tuple(i // n for i, n in zip(coord, cps)),
        tuple(i % n for i, n in zip(coord, cps)),
    )


def shard_index_nbytes(meta: dict) -> int:
    sh = meta["_shard"]
    n = 1
    for c in sh["cps"]:
        n *= c
    return 16 * n + (4 if sh["index_crc32c"] else 0)


def read_shard_index(shard_fp: str, meta: dict) -> np.ndarray:
    """The shard's ``(offset, nbytes)`` table as a uint64 ndarray of
    shape ``(*cps, 2)``, read from the file's head or tail per
    ``index_location`` and checksum-verified when the chain declares
    crc32c — a corrupt index would address garbage byte ranges, so it
    raises rather than decodes."""
    sh = meta["_shard"]
    nbytes = shard_index_nbytes(meta)
    size = os.path.getsize(shard_fp)
    if size < nbytes:
        raise ValueError(
            f"shard {shard_fp}: {size} bytes < index size {nbytes} — "
            "truncated or wrong geometry"
        )
    with open(shard_fp, "rb") as f:
        if sh["index_location"] == "end":
            f.seek(size - nbytes)
        raw = f.read(nbytes)
    if sh["index_crc32c"]:
        body, crc = raw[:-4], raw[-4:]
        if _crc32c(body) != int.from_bytes(crc, "little"):
            raise ValueError(
                f"shard index crc32c mismatch at {shard_fp} — refusing "
                "to address byte ranges from a corrupt index"
            )
        raw = body
    dt = "<u8" if sh["index_endian"] == "little" else ">u8"
    return np.frombuffer(raw, dtype=dt).reshape(*sh["cps"], 2)


# Driver-side index memo for read_array()'s per-inner-chunk loop —
# keyed by (path, mtime_ns, size) so a rewritten shard invalidates.
# The distributed path never uses this: the Spark planner parses each
# index exactly once and ships resolved byte ranges in the partitions.
_SHARD_INDEX_CACHE: dict[tuple, np.ndarray] = {}


def _cached_shard_index(shard_fp: str, meta: dict) -> np.ndarray:
    st = os.stat(shard_fp)
    key = (shard_fp, st.st_mtime_ns, st.st_size)
    idx = _SHARD_INDEX_CACHE.get(key)
    if idx is None:
        if len(_SHARD_INDEX_CACHE) > 4096:
            _SHARD_INDEX_CACHE.clear()
        idx = read_shard_index(shard_fp, meta)
        _SHARD_INDEX_CACHE[key] = idx
    return idx


def fill_chunk(meta: dict) -> np.ndarray:
    """A full chunk of ``fill_value`` (what a missing chunk file or a
    missing shard-index entry means BY SPEC)."""
    dt = np.dtype(meta["dtype"])
    out = np.empty(tuple(meta["chunks"]), dtype=dt)
    fill = meta.get("fill_value")
    if isinstance(fill, str):
        # spec encodes non-finite float fills as JSON strings
        # ("NaN", "Infinity", "-Infinity")
        fill = float(fill)
    if fill is None:
        out[...] = np.nan if dt.kind == "f" else 0
    else:
        out[...] = fill
    return out


def _decode_chunk_bytes(raw: bytes, meta: dict, where: str) -> np.ndarray:
    dt = np.dtype(meta["dtype"])
    chunks = tuple(meta["chunks"])
    comp = meta.get("compressor")
    if comp is not None:
        cid = comp.get("id")
        try:
            if cid == "blosc":
                raw = blosc_decompress(raw)
            elif cid == "lz4":
                raw = numcodecs_lz4_decode(raw)
            else:
                # zlib codec emits a zlib stream; gzip codec a gzip
                # stream — wbits=47 auto-detects both framings
                raw = _zlib.decompress(raw, 47)
        except (BloscError, ValueError) as e:
            raise ValueError(f"chunk at {where}: {e}") from e
    arr = np.frombuffer(raw, dtype=dt)
    if arr.size != int(np.prod(chunks)):
        raise ValueError(
            f"chunk at {where}: {arr.size} values, expected "
            f"{int(np.prod(chunks))} — corrupt or wrong dtype"
        )
    return arr.reshape(chunks, order=meta.get("order", "C"))


def read_inner_chunk(
    byterange: tuple[str, int, int] | None, meta: dict
) -> np.ndarray:
    """Decode one inner chunk of a SHARDED array from a resolved
    ``(shard_file, offset, nbytes)`` byte range — the executor-task
    half of the planner-parses-the-index split; ``None`` means the
    index marked the chunk missing (or the whole shard is absent) and
    yields a fill chunk."""
    if byterange is None:
        return fill_chunk(meta)
    shard_fp, off, ln = byterange
    with open(shard_fp, "rb") as f:
        f.seek(off)
        raw = f.read(ln)
    if len(raw) != ln:
        raise ValueError(
            f"shard {shard_fp}: short read at {off}+{ln} — index and "
            "file disagree"
        )
    return _decode_chunk_bytes(raw, meta, f"{shard_fp}@{off}")


def read_chunk(path: str, meta: dict, coord: tuple[int, ...]) -> np.ndarray:
    """One chunk as a full chunk-shaped ndarray (edge padding included —
    callers slice; :func:`read_array` does).  A missing chunk file is a
    fill-value chunk BY SPEC, not an error.  For sharded arrays
    ``coord`` addresses the global INNER grid; the shard hop (index
    lookup + byte-range read) happens here, with the index memoized
    per shard file."""
    if meta.get("_shard") is not None:
        scoord, inner = split_shard_coord(meta, coord)
        fp = chunk_file(path, meta, scoord)
        if not os.path.exists(fp):
            return fill_chunk(meta)
        off, ln = (int(v) for v in _cached_shard_index(fp, meta)[inner])
        if off == SHARD_MISSING or ln == SHARD_MISSING:
            return fill_chunk(meta)
        return read_inner_chunk((fp, off, ln), meta)
    fp = chunk_file(path, meta, coord)
    if not os.path.exists(fp):
        return fill_chunk(meta)
    with open(fp, "rb") as f:
        raw = f.read()
    return _decode_chunk_bytes(raw, meta, f"{path} chunk {coord}")


def read_array(path: str) -> np.ndarray:
    """The whole array, assembled chunk by chunk (driver-side
    convenience for tests / small sidecar arrays; the distributed path
    is the chunk-partition DataSource)."""
    meta = read_array_meta(path)
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    out = np.empty(shape, dtype=np.dtype(meta["dtype"]))
    for coord in _chunk_grid(meta):
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(coord, chunks, shape)
        )
        trim = tuple(slice(0, s.stop - s.start) for s in sl)
        out[sl] = read_chunk(path, meta, coord)[trim]
    return out


def read_attrs(path: str) -> dict:
    """User attributes (units/_FillValue …): v2 ``.zattrs`` sidecar, or
    the ``attributes`` object inlined in a v3 ``zarr.json``."""
    p = os.path.join(path, ".zattrs")
    if os.path.isfile(p):
        with open(p) as f:
            return json.load(f)
    if _v3_node_type(path) == "array":
        return _read_v3_meta(path)["_attrs"]
    return {}


def group_arrays(path: str) -> list[str]:
    """Member array names of a group directory, sorted.  Prefers the
    consolidated ``.zmetadata`` when present (one read instead of a
    directory listing — the object-store access pattern)."""
    cons = read_consolidated(path)
    if cons is not None:
        return sorted(cons)
    if not is_zarr_group(path):
        raise ValueError(f"{path} is not a zarr group (no .zgroup)")
    return sorted(
        n
        for n in os.listdir(path)
        if is_zarr_array(os.path.join(path, n))
    )


def read_consolidated(path: str) -> dict | None:
    """Parse a zarr v2 consolidated-metadata file
    (``.zmetadata``, ``zarr_consolidated_format: 1`` — what
    ``zarr.consolidate_metadata`` writes and every Pangeo/NASA catalog
    entry ships) into ``{array_name: validated_meta}`` for the group's
    DIRECT member arrays.  Returns None when the file is absent.

    Why it matters at scale: without it, planning a scan of a group
    with V variables costs 1 listing + V metadata GETs against the
    object store; with it, planning is ONE small read.  Every
    consolidated entry passes the exact per-file validation gates
    (_validate_v2_meta), so an unsupported codec still fails by name at
    planning, never mid-scan."""
    p = os.path.join(path, ".zmetadata")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        doc = json.load(f)
    if doc.get("zarr_consolidated_format") != 1:
        raise ValueError(
            f"unsupported zarr_consolidated_format "
            f"{doc.get('zarr_consolidated_format')!r} at {p} (only 1)"
        )
    out: dict[str, dict] = {}
    for key, meta in (doc.get("metadata") or {}).items():
        if not key.endswith("/.zarray"):
            continue
        name = key[: -len("/.zarray")]
        if "/" in name:
            continue  # nested sub-group arrays: not a DIRECT member
        out[name] = _validate_v2_meta(dict(meta), f"{p}:{key}")
    return out


def consolidate_metadata(path: str) -> int:
    """Write ``.zmetadata`` for a v2 group (fixture-side equivalent of
    ``zarr.consolidate_metadata``): every member's ``.zarray`` and
    ``.zattrs`` plus the group's ``.zgroup``, under
    ``zarr_consolidated_format: 1``.  Returns the number of arrays
    consolidated."""
    if not os.path.isfile(os.path.join(path, ".zgroup")):
        raise ValueError(f"{path} is not a zarr v2 group (no .zgroup)")
    metadata: dict[str, dict] = {".zgroup": {"zarr_format": 2}}
    n = 0
    for name in sorted(os.listdir(path)):
        adir = os.path.join(path, name)
        if not os.path.isfile(_meta_path(adir)):
            continue
        with open(_meta_path(adir)) as f:
            metadata[f"{name}/.zarray"] = json.load(f)
        zattrs = os.path.join(adir, ".zattrs")
        if os.path.isfile(zattrs):
            with open(zattrs) as f:
                metadata[f"{name}/.zattrs"] = json.load(f)
        n += 1
    with open(os.path.join(path, ".zmetadata"), "w") as f:
        json.dump(
            {"zarr_consolidated_format": 1, "metadata": metadata}, f
        )
    return n


def write_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = "zlib",
    fill_value=None,
    order: str = "C",
    dimension_separator: str = ".",
    attrs: dict | None = None,
    skip_fill_chunks: bool = False,
) -> None:
    """Write a v2 array directory (fixture writer — the reader's tests
    must not round-trip through the reader's own assumptions, so this
    follows the spec text independently).  ``skip_fill_chunks`` omits
    chunk files that are entirely ``fill_value``, producing the sparse
    layout the missing-chunk read path exists for.

    ``compressor``: None, "zlib", "lz4" (numcodecs LZ4 framing),
    "blosc-lz4" (byte-shuffle, the Pangeo default shape),
    "blosc-lz4-noshuffle", or "blosc-zlib"."""
    os.makedirs(path, exist_ok=True)
    chunks = tuple(chunks or arr.shape)
    if compressor == "zlib":
        comp_meta = {"id": "zlib", "level": 1}
    elif compressor == "lz4":
        comp_meta = {"id": "lz4", "acceleration": 1}
    elif compressor in ("blosc-lz4", "blosc-lz4-noshuffle", "blosc-zlib"):
        comp_meta = {
            "id": "blosc",
            "cname": "zlib" if compressor == "blosc-zlib" else "lz4",
            "clevel": 5,
            "shuffle": 0 if compressor == "blosc-lz4-noshuffle" else 1,
            "blocksize": 0,
        }
    elif compressor is None:
        comp_meta = None
    else:
        raise ValueError(f"unknown fixture compressor {compressor!r}")
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": comp_meta,
        # spec: non-finite float fills are JSON strings
        "fill_value": (
            ("NaN" if np.isnan(fill_value) else
             "Infinity" if fill_value == np.inf else "-Infinity")
            if isinstance(fill_value, float) and not np.isfinite(fill_value)
            else fill_value
        ),
        "order": order,
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    if attrs:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)
    from itertools import product

    counts = [-(-s // c) for s, c in zip(arr.shape, chunks)]
    for coord in product(*[range(n) for n in counts]):
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(coord, chunks, arr.shape)
        )
        block = arr[sl]
        full = np.empty(chunks, dtype=arr.dtype)
        full[...] = fill_value if fill_value is not None else 0
        full[tuple(slice(0, b) for b in block.shape)] = block
        if skip_fill_chunks and fill_value is not None:
            if isinstance(fill_value, float) and np.isnan(fill_value):
                empty = bool(np.all(np.isnan(full)))
            else:
                empty = bool(np.all(full == fill_value))
            if empty:
                continue
        raw = full.tobytes(order=order)
        if compressor == "zlib":
            raw = _zlib.compress(raw, 1)
        elif compressor == "lz4":
            raw = numcodecs_lz4_encode(raw)
        elif compressor is not None and compressor.startswith("blosc-"):
            raw = blosc_compress(
                raw,
                typesize=arr.dtype.itemsize,
                codec="zlib" if compressor == "blosc-zlib" else "lz4",
                shuffle=compressor != "blosc-lz4-noshuffle",
            )
        fp = chunk_file(path, meta, coord)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(raw)


_V3_NAMES = {v.lstrip("|<>"): k for k, v in _V3_DTYPES.items()}


def write_array_v3(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = "gzip",
    fill_value=None,
    separator: str = "/",
    attrs: dict | None = None,
    skip_fill_chunks: bool = False,
) -> None:
    """v3 fixture writer (independent of the reader, like
    :func:`write_array`): ``zarr.json`` descriptor + 'default'
    chunk-key encoding ("c" prefix), bytes codec in the array's
    endianness, optional gzip."""
    import gzip as _gzip
    from itertools import product

    os.makedirs(path, exist_ok=True)
    chunks = tuple(chunks or arr.shape)
    base = arr.dtype.str.lstrip("|<>")
    if base not in _V3_NAMES:
        raise ValueError(f"no v3 data_type for numpy {arr.dtype.str!r}")
    endian = "big" if arr.dtype.str.startswith(">") else "little"
    codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compressor == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": 1}})
    elif compressor == "blosc":
        codecs.append({
            "name": "blosc",
            "configuration": {
                "cname": "lz4",
                "clevel": 5,
                "shuffle": "shuffle",
                "typesize": arr.dtype.itemsize,
                "blocksize": 0,
            },
        })
    elif compressor is not None:
        raise ValueError(f"unknown v3 fixture compressor {compressor!r}")
    if isinstance(fill_value, float) and not np.isfinite(fill_value):
        fv = (
            "NaN" if np.isnan(fill_value)
            else "Infinity" if fill_value > 0 else "-Infinity"
        )
    else:
        fv = fill_value
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": _V3_NAMES[base],
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(chunks)},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": separator},
        },
        "fill_value": fv if fv is not None else 0,
        "codecs": codecs,
        "attributes": attrs or {},
    }
    with open(_v3_meta_path(path), "w") as f:
        json.dump(meta, f)
    counts = [-(-s // c) for s, c in zip(arr.shape, chunks)]
    for coord in product(*[range(n) for n in counts]):
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(coord, chunks, arr.shape)
        )
        block = arr[sl]
        full = np.empty(chunks, dtype=arr.dtype)
        full[...] = fill_value if fill_value is not None else 0
        full[tuple(slice(0, b) for b in block.shape)] = block
        if skip_fill_chunks and fill_value is not None:
            if isinstance(fill_value, float) and np.isnan(fill_value):
                if bool(np.all(np.isnan(full))):
                    continue
            elif bool(np.all(full == fill_value)):
                continue
        raw = full.tobytes(order="C")
        if compressor == "gzip":
            raw = _gzip.compress(raw, 1)
        elif compressor == "blosc":
            raw = blosc_compress(
                raw, typesize=arr.dtype.itemsize, codec="lz4", shuffle=True
            )
        name = separator.join(["c", *[str(i) for i in coord]])
        fp = os.path.join(path, name)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(raw)


def write_array_v3_sharded(
    path: str,
    arr: np.ndarray,
    shard_shape: tuple[int, ...],
    inner_chunks: tuple[int, ...],
    compressor: str | None = "gzip",
    fill_value=None,
    separator: str = "/",
    attrs: dict | None = None,
    skip_fill_chunks: bool = False,
    index_location: str = "end",
    index_crc32c: bool = True,
) -> None:
    """v3 ``sharding_indexed`` fixture writer (independent of the
    reader, like the other writers — follows the spec text: inner
    chunks concatenated per shard, a uint64 LE ``(offset, nbytes)``
    index with 2^64-1 missing markers at the file's start or end,
    optional crc32c over the index bytes).  ``skip_fill_chunks``
    leaves all-fill inner chunks as missing markers and omits shard
    files that would hold no chunks at all — the sparse layout."""
    import gzip as _gzip
    from itertools import product

    if any(ss % ic != 0 for ss, ic in zip(shard_shape, inner_chunks)):
        raise ValueError(
            f"shard shape {shard_shape} is not a positive multiple of "
            f"inner chunks {inner_chunks}"
        )
    os.makedirs(path, exist_ok=True)
    base = arr.dtype.str.lstrip("|<>")
    if base not in _V3_NAMES:
        raise ValueError(f"no v3 data_type for numpy {arr.dtype.str!r}")
    endian = "big" if arr.dtype.str.startswith(">") else "little"
    inner_codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compressor == "gzip":
        inner_codecs.append({"name": "gzip", "configuration": {"level": 1}})
    index_codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}}
    ]
    if index_crc32c:
        index_codecs.append({"name": "crc32c"})
    if isinstance(fill_value, float) and not np.isfinite(fill_value):
        fv = (
            "NaN" if np.isnan(fill_value)
            else "Infinity" if fill_value > 0 else "-Infinity"
        )
    else:
        fv = fill_value
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": _V3_NAMES[base],
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(shard_shape)},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": separator},
        },
        "fill_value": fv if fv is not None else 0,
        "codecs": [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(inner_chunks),
                    "codecs": inner_codecs,
                    "index_codecs": index_codecs,
                    "index_location": index_location,
                },
            }
        ],
        "attributes": attrs or {},
    }
    with open(_v3_meta_path(path), "w") as f:
        json.dump(meta, f)
    cps = [ss // ic for ss, ic in zip(shard_shape, inner_chunks)]
    n_inner = int(np.prod(cps))
    index_nbytes = 16 * n_inner + (4 if index_crc32c else 0)
    shard_counts = [-(-s // c) for s, c in zip(arr.shape, shard_shape)]
    for scoord in product(*[range(n) for n in shard_counts]):
        entries = np.full((n_inner, 2), SHARD_MISSING, dtype="<u8")
        blobs: list[bytes] = []
        cursor = index_nbytes if index_location == "start" else 0
        for flat, icoord in enumerate(
            product(*[range(n) for n in cps])
        ):
            starts = [
                sc * ss + ic * c
                for sc, ss, ic, c in zip(
                    scoord, shard_shape, icoord, inner_chunks
                )
            ]
            if any(st >= s for st, s in zip(starts, arr.shape)):
                continue  # wholly outside the array: stays missing
            full = np.empty(tuple(inner_chunks), dtype=arr.dtype)
            full[...] = fill_value if fill_value is not None else 0
            sl = tuple(
                slice(st, min(st + c, s))
                for st, c, s in zip(starts, inner_chunks, arr.shape)
            )
            block = arr[sl]
            full[tuple(slice(0, b) for b in block.shape)] = block
            if skip_fill_chunks and fill_value is not None:
                if isinstance(fill_value, float) and np.isnan(fill_value):
                    if bool(np.all(np.isnan(full))):
                        continue
                elif bool(np.all(full == fill_value)):
                    continue
            raw = full.tobytes(order="C")
            if compressor == "gzip":
                raw = _gzip.compress(raw, 1)
            entries[flat] = (cursor, len(raw))
            blobs.append(raw)
            cursor += len(raw)
        if not blobs and skip_fill_chunks:
            continue  # omit the all-fill shard file entirely
        idx = entries.tobytes()
        if index_crc32c:
            idx += _crc32c(idx).to_bytes(4, "little")
        name = separator.join(["c", *[str(i) for i in scoord]])
        fp = os.path.join(path, name)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            if index_location == "start":
                f.write(idx)
                for b in blobs:
                    f.write(b)
            else:
                for b in blobs:
                    f.write(b)
                f.write(idx)


def write_group_v3(path: str, arrays: dict, **kw) -> None:
    """v3 group fixture: ``zarr.json`` node_type=group + member arrays."""
    os.makedirs(path, exist_ok=True)
    with open(_v3_meta_path(path), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group"}, f)
    for name, arr in arrays.items():
        write_array_v3(os.path.join(path, name), arr, **kw)


def write_group(path: str, arrays: dict, **kw) -> None:
    """Write a group: ``.zgroup`` + one member array per dict entry."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    for name, arr in arrays.items():
        write_array(os.path.join(path, name), arr, **kw)
