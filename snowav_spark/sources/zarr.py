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
- ``compressor: null`` (raw) and the ``zlib``/``gzip`` codecs (stdlib
  ``zlib``) — ``blosc``/``lz4``/``zstd`` raise a clear error naming the
  codec instead of mis-decoding;
- ``fill_value`` semantics including the load-bearing one: a chunk file
  that does NOT exist IS a chunk of fill values (sparse arrays write
  nothing for empty regions — a reader that treated absence as an error
  or as zeros would corrupt sparse data);
- edge-chunk trimming: stored chunks are always full chunk-shaped, the
  array boundary cuts the padding off at read;
- ``dimension_separator`` "." (default) and "/" (nested directories);
- ``filters`` must be null/empty — codec *filter chains* are out of
  scope and raise rather than silently skipping a transform.
"""

from __future__ import annotations

import json
import os
import zlib as _zlib

import numpy as np

_UNSUPPORTED = (
    "blosc", "lz4", "zstd", "bz2", "lzma", "shuffle", "delta", "crc32c",
)


def _meta_path(path: str) -> str:
    return os.path.join(path, ".zarray")


def is_zarr_array(path: str) -> bool:
    return os.path.isfile(_meta_path(path))


def is_zarr_group(path: str) -> bool:
    return os.path.isfile(os.path.join(path, ".zgroup"))


def read_array_meta(path: str) -> dict:
    """The parsed ``.zarray`` descriptor, validated to the supported
    subset.  Raises with the codec name on unsupported compressors and
    on filter chains — never silently mis-decodes."""
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise ValueError(
            f"unsupported zarr_format {meta.get('zarr_format')!r} "
            f"(only v2) at {path}"
        )
    comp = meta.get("compressor")
    if comp is not None:
        cid = comp.get("id")
        if cid in _UNSUPPORTED or cid not in ("zlib", "gzip"):
            raise ValueError(
                f"unsupported zarr compressor {cid!r} at {path} — this "
                "pure-stdlib reader handles null/zlib/gzip only"
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
    sep = meta.get("dimension_separator", ".")
    return os.path.join(path, sep.join(str(i) for i in coord))


def read_chunk(path: str, meta: dict, coord: tuple[int, ...]) -> np.ndarray:
    """One chunk as a full chunk-shaped ndarray (edge padding included —
    callers slice; :func:`read_array` does).  A missing chunk file is a
    fill-value chunk BY SPEC, not an error."""
    dt = np.dtype(meta["dtype"])
    chunks = tuple(meta["chunks"])
    fp = chunk_file(path, meta, coord)
    if not os.path.exists(fp):
        fill = meta.get("fill_value")
        if isinstance(fill, str):
            # spec encodes non-finite float fills as JSON strings
            # ("NaN", "Infinity", "-Infinity")
            fill = float(fill)
        out = np.empty(chunks, dtype=dt)
        if fill is None:
            out[...] = np.nan if dt.kind == "f" else 0
        else:
            out[...] = fill
        return out
    with open(fp, "rb") as f:
        raw = f.read()
    if meta.get("compressor") is not None:
        # zlib codec emits a zlib stream; gzip codec a gzip stream —
        # wbits=47 auto-detects both container framings
        raw = _zlib.decompress(raw, 47)
    arr = np.frombuffer(raw, dtype=dt)
    if arr.size != int(np.prod(chunks)):
        raise ValueError(
            f"chunk {coord} at {path}: {arr.size} values, expected "
            f"{int(np.prod(chunks))} — corrupt or wrong dtype"
        )
    return arr.reshape(chunks, order=meta.get("order", "C"))


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
    """.zattrs if present (user attributes, e.g. units/_FillValue)."""
    p = os.path.join(path, ".zattrs")
    if not os.path.isfile(p):
        return {}
    with open(p) as f:
        return json.load(f)


def group_arrays(path: str) -> list[str]:
    """Member array names of a group directory, sorted."""
    if not is_zarr_group(path):
        raise ValueError(f"{path} is not a zarr group (no .zgroup)")
    return sorted(
        n
        for n in os.listdir(path)
        if is_zarr_array(os.path.join(path, n))
    )


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
    layout the missing-chunk read path exists for."""
    os.makedirs(path, exist_ok=True)
    chunks = tuple(chunks or arr.shape)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": (
            {"id": "zlib", "level": 1} if compressor == "zlib" else None
        ),
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
        fp = chunk_file(path, meta, coord)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(raw)


def write_group(path: str, arrays: dict, **kw) -> None:
    """Write a group: ``.zgroup`` + one member array per dict entry."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    for name, arr in arrays.items():
        write_array(os.path.join(path, name), arr, **kw)
