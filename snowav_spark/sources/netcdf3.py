"""Minimal pure-NumPy NetCDF-3 ("classic"/CDF) reader + writer.

The reference's model outputs (``snow.nc`` / ``em.nc``,
ref:snowav/framework/outputs.py) are NetCDF files; this container has no
netCDF4/xarray, so the distributed ingest path (ingest.read_netcdf_outputs)
was import-gated.  The classic file format is a small, public, stable spec
(CDF-1/CDF-2 magic ``CDF\\x01``/``CDF\\x02``): a big-endian header listing
dims/attrs/vars followed by flat array data at recorded offsets.  ~150
lines of struct parsing un-gates the whole e2e path with zero new
dependencies — executors only need numpy.

Supported: CDF-1 and CDF-2, fixed and record (unlimited-dim) variables,
all six external types, global + per-variable attributes.  Not supported
(raises): CDF-5, HDF5-backed NetCDF-4 files.

Writer emits CDF-1 with fixed dims only — enough to build test fixtures
and golden files without the C library.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_ABSENT = b"\x00\x00\x00\x00\x00\x00\x00\x00"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (numpy dtype (big-endian), external size in bytes)
_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
}
_TYPE_OF_DTYPE = {
    "int8": 1,
    "int16": 3,
    "int32": 4,
    "float32": 5,
    "float64": 6,
}


@dataclass
class Var:
    name: str
    dims: list[str]
    shape: tuple[int, ...]
    nc_type: int
    attrs: dict
    vsize: int
    begin: int
    is_record: bool


@dataclass
class Dataset:
    dims: dict  # name → size (record dim reported at its true length)
    attrs: dict
    variables: dict  # name → Var
    numrecs: int = 0
    _buf: bytes = field(default=b"", repr=False)
    _recsize: int = 0

    def values(self, name: str) -> np.ndarray:
        """Materialize one variable as a native-endian ndarray."""
        v = self.variables[name]
        dt, width = _TYPES[v.nc_type]
        if not v.is_record:
            n = int(np.prod(v.shape, dtype=np.int64)) if v.shape else 1
            arr = np.frombuffer(self._buf, dt, n, v.begin)
            return arr.reshape(v.shape).astype(dt.newbyteorder("="))
        # Record variable: one slab per record, strided by recsize.
        slab = v.shape[1:] if v.shape else ()
        per = int(np.prod(slab, dtype=np.int64)) if slab else 1
        out = np.empty((self.numrecs, *slab), dt.newbyteorder("="))
        for r in range(self.numrecs):
            out[r] = np.frombuffer(
                self._buf, dt, per, v.begin + r * self._recsize
            ).reshape(slab)
        return out


class _Parser:
    def __init__(self, buf: bytes, offset_width: int):
        self.buf = buf
        self.pos = 4
        self.offset_width = offset_width

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def offset(self) -> int:
        if self.offset_width == 4:
            return self.i4()
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # padded to 4-byte boundary
        return s

    def att_values(self, nc_type: int, nelems: int):
        dt, width = _TYPES[nc_type]
        raw = self.buf[self.pos : self.pos + nelems * width]
        self.pos += (nelems * width + 3) // 4 * 4
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        vals = np.frombuffer(raw, dt, nelems).astype(dt.newbyteorder("="))
        return vals[0] if nelems == 1 else vals

    def tagged_list(self, expected_tag: int) -> int:
        tag_bytes = self.buf[self.pos : self.pos + 8]
        if tag_bytes == _ABSENT:
            self.pos += 8
            return 0
        tag, count = struct.unpack_from(">ii", self.buf, self.pos)
        self.pos += 8
        if tag != expected_tag:
            raise ValueError(f"bad tag {tag}, expected {expected_tag}")
        return count

    def attrs(self) -> dict:
        out = {}
        for _ in range(self.tagged_list(_NC_ATTRIBUTE)):
            nm = self.name()
            nc_type = self.i4()
            nelems = self.i4()
            out[nm] = self.att_values(nc_type, nelems)
        return out


def read(path_or_bytes) -> Dataset:
    """Parse a classic NetCDF file fully into a Dataset (header eagerly,
    variable data lazily via Dataset.values)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    if buf[:3] != b"CDF":
        raise ValueError(
            "not a classic NetCDF file (NetCDF-4/HDF5 is unsupported here)"
        )
    version = buf[3]
    if version not in (1, 2):
        raise ValueError(f"unsupported CDF version {version}")
    p = _Parser(buf, 4 if version == 1 else 8)
    numrecs = p.i4()  # -1 == STREAMING; resolved below if needed

    dim_names: list[str] = []
    dim_sizes: list[int] = []
    for _ in range(p.tagged_list(_NC_DIMENSION)):
        dim_names.append(p.name())
        dim_sizes.append(p.i4())
    gatts = p.attrs()

    variables: dict[str, Var] = {}
    recsize = 0
    for _ in range(p.tagged_list(_NC_VARIABLE)):
        nm = p.name()
        ndims = p.i4()
        dimids = [p.i4() for _ in range(ndims)]
        vatts = p.attrs()
        nc_type = p.i4()
        vsize = p.i4()
        begin = p.offset()
        dims = [dim_names[i] for i in dimids]
        is_record = bool(dimids) and dim_sizes[dimids[0]] == 0
        shape = tuple(
            (0 if is_record and j == 0 else dim_sizes[i])
            for j, i in enumerate(dimids)
        )
        if is_record:
            recsize += vsize
        variables[nm] = Var(nm, dims, shape, nc_type, vatts, vsize, begin, is_record)

    rec_vars = [v for v in variables.values() if v.is_record]
    if len(rec_vars) == 1:
        # Spec: a single record variable packs with no per-record padding.
        dt, width = _TYPES[rec_vars[0].nc_type]
        per = int(np.prod(rec_vars[0].shape[1:], dtype=np.int64) or 1)
        recsize = per * width
    if numrecs < 0 and rec_vars:  # STREAMING: infer from file length
        first = min(v.begin for v in rec_vars)
        numrecs = (len(buf) - first) // recsize if recsize else 0

    dims = dict(zip(dim_names, dim_sizes))
    for nm, sz in list(dims.items()):
        if sz == 0:
            dims[nm] = numrecs
    for v in rec_vars:
        v.shape = (numrecs, *v.shape[1:])
    return Dataset(dims, gatts, variables, max(numrecs, 0), buf, recsize)


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _write_name(out: list[bytes], s: str) -> None:
    raw = s.encode("utf-8")
    out.append(struct.pack(">i", len(raw)))
    out.append(_pad(raw))


def _write_attrs(out: list[bytes], attrs: dict) -> None:
    if not attrs:
        out.append(_ABSENT)
        return
    out.append(struct.pack(">ii", _NC_ATTRIBUTE, len(attrs)))
    for k, v in attrs.items():
        _write_name(out, k)
        if isinstance(v, str):
            raw = v.encode("utf-8")
            out.append(struct.pack(">ii", 2, len(raw)))
            out.append(_pad(raw))
        else:
            arr = np.atleast_1d(np.asarray(v))
            nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
            dt, _ = _TYPES[nc_type]
            out.append(struct.pack(">ii", nc_type, arr.size))
            out.append(_pad(arr.astype(dt).tobytes()))


def write(path: str, dims: dict, variables: dict, attrs: dict | None = None):
    """Write a CDF-1 file.  ``variables`` maps name → (dim_names, ndarray,
    attrs); all dims fixed (no unlimited dim — test fixtures don't need
    record interleaving)."""
    dim_names = list(dims)
    header: list[bytes] = [b"CDF\x01", struct.pack(">i", 0)]
    header.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
    for nm in dim_names:
        _write_name(header, nm)
        header.append(struct.pack(">i", dims[nm]))
    _write_attrs(header, attrs or {})

    # Two passes: sizes first (begin offsets depend on header length).
    entries = []
    for nm, (vdims, arr, vattrs) in variables.items():
        arr = np.asarray(arr)
        nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
        dt, width = _TYPES[nc_type]
        data = _pad(arr.astype(dt).tobytes())
        entries.append((nm, vdims, nc_type, data, vattrs))

    def var_section(begins: list[int]) -> list[bytes]:
        out = [struct.pack(">ii", _NC_VARIABLE, len(entries))]
        for (nm, vdims, nc_type, data, vattrs), begin in zip(entries, begins):
            _write_name(out, nm)
            out.append(struct.pack(">i", len(vdims)))
            for d in vdims:
                out.append(struct.pack(">i", dim_names.index(d)))
            _write_attrs(out, vattrs)
            out.append(struct.pack(">iii", nc_type, len(data), begin))
        return out

    probe = b"".join(header + var_section([0] * len(entries)))
    begins, pos = [], len(probe)
    for _, _, _, data, _ in entries:
        begins.append(pos)
        pos += len(data)
    with open(path, "wb") as f:
        f.write(b"".join(header + var_section(begins)))
        for _, _, _, data, _ in entries:
            f.write(data)
