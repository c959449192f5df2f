"""Minimal pure-NumPy classic NetCDF (CDF-1/2/5) reader + writer.

The reference's model outputs (``snow.nc`` / ``em.nc``,
ref:snowav/framework/outputs.py) are NetCDF files; this container has no
netCDF4/xarray, so the distributed ingest path (ingest.read_netcdf_outputs)
was import-gated.  The classic file format is a small, public, stable spec:
a big-endian header listing dims/attrs/vars followed by flat array data at
recorded offsets.  ~200 lines of struct parsing un-gates the whole e2e
path with zero new dependencies — executors only need numpy.

Supported: CDF-1 (magic ``CDF\\x01``), CDF-2 (64-bit offset,
``CDF\\x02``), and CDF-5 (64-bit data, ``CDF\\x05`` — every NON_NEG
header integer widens to 8 bytes and five unsigned/64-bit external types
join the original six, per the public PnetCDF CDF-5 specification);
fixed and record (unlimited-dim) variables, global + per-variable
attributes.  HDF5-backed NetCDF-4 files live in the sibling
sources/hdf5.py; sources.open_dataset dispatches on magic bytes.

Files are read via ``mmap`` — only the header and the pages a
``Dataset.values`` call touches are ever faulted in, so a multi-GiB
model-output file costs header-sized I/O to inspect and per-variable I/O
to load, which is what the partition-parallel ingest path needs.

Writer emits CDF-1, CDF-2, or CDF-5 with fixed dims only — enough to
build test fixtures and golden files without the C library.
``header_pad`` reserves space between header and data (the classic
``nc__enddef`` h_minfree concept), which also lets tests synthesize
real >4 GiB begin offsets as sparse files.
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass, field

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (numpy dtype (big-endian), external size in bytes).
# Types 1–6 are CDF-1/2; 7–11 are the CDF-5 additions.
_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
    7: (np.dtype(">u1"), 1),  # NC_UBYTE   (CDF-5)
    8: (np.dtype(">u2"), 2),  # NC_USHORT  (CDF-5)
    9: (np.dtype(">u4"), 4),  # NC_UINT    (CDF-5)
    10: (np.dtype(">i8"), 8),  # NC_INT64  (CDF-5)
    11: (np.dtype(">u8"), 8),  # NC_UINT64 (CDF-5)
}
_TYPE_OF_DTYPE = {
    "int8": 1,
    "int16": 3,
    "int32": 4,
    "float32": 5,
    "float64": 6,
    "uint8": 7,
    "uint16": 8,
    "uint32": 9,
    "int64": 10,
    "uint64": 11,
}
_CDF5_ONLY_TYPES = {7, 8, 9, 10, 11}


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
    _buf: object = field(default=b"", repr=False)  # bytes or read-only mmap
    _recsize: int = 0

    def values(self, name: str, first: slice | None = None) -> np.ndarray:
        """Materialize one variable as a native-endian ndarray.  ``first``
        reads only that slice of the leading axis (unit stride), faulting
        in just the overlapping mmap pages — so streaming a (time, y, x)
        variable per-timestep costs one grid of memory, not the cube."""
        v = self.variables[name]
        dt, width = _TYPES[v.nc_type]
        lo, hi = 0, v.shape[0] if v.shape else 1
        if first is not None:
            if not v.shape:
                raise ValueError("cannot slab-read a scalar variable")
            lo, hi, step = first.indices(v.shape[0])
            if step != 1:
                raise ValueError("only unit-stride slabs supported")
        slab = v.shape[1:] if v.shape else ()
        per = int(np.prod(slab, dtype=np.int64)) if slab else 1
        if not v.is_record:
            n = max(hi - lo, 0) * per if v.shape else 1
            arr = np.frombuffer(self._buf, dt, n, v.begin + lo * per * width)
            shape = (max(hi - lo, 0), *slab) if v.shape else v.shape
            return arr.reshape(shape).astype(dt.newbyteorder("="))
        # Record variable: one slab per record, strided by recsize.
        out = np.empty((max(hi - lo, 0), *slab), dt.newbyteorder("="))
        for r in range(lo, hi):
            out[r - lo] = np.frombuffer(
                self._buf, dt, per, v.begin + r * self._recsize
            ).reshape(slab)
        return out


class _Parser:
    """Version-aware header parser.  CDF-5 widens every NON_NEG integer
    (counts, name lengths, dim sizes, dimids, vsize) from 4 to 8 bytes;
    ``begin`` offsets are 8 bytes from CDF-2 on.  4-byte alignment padding
    of names and attribute values is unchanged in every version."""

    def __init__(self, buf, version: int):
        self.buf = buf
        self.pos = 4
        self.offset_width = 4 if version == 1 else 8
        self.nonneg_width = 8 if version == 5 else 4

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def nonneg(self) -> int:
        if self.nonneg_width == 4:
            return self.i4()
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def offset(self) -> int:
        if self.offset_width == 4:
            return self.i4()
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.nonneg()
        s = bytes(self.buf[self.pos : self.pos + n]).decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # padded to 4-byte boundary
        return s

    def att_values(self, nc_type: int, nelems: int):
        dt, width = _TYPES[nc_type]
        raw = bytes(self.buf[self.pos : self.pos + nelems * width])
        self.pos += (nelems * width + 3) // 4 * 4
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        vals = np.frombuffer(raw, dt, nelems).astype(dt.newbyteorder("="))
        return vals[0] if nelems == 1 else vals

    def tagged_list(self, expected_tag: int) -> int:
        tag = self.i4()
        count = self.nonneg()
        if tag == 0 and count == 0:  # ABSENT
            return 0
        if tag != expected_tag:
            raise ValueError(f"bad tag {tag}, expected {expected_tag}")
        return count

    def attrs(self) -> dict:
        out = {}
        for _ in range(self.tagged_list(_NC_ATTRIBUTE)):
            nm = self.name()
            nc_type = self.i4()
            nelems = self.nonneg()
            out[nm] = self.att_values(nc_type, nelems)
        return out


def read(path_or_bytes) -> Dataset:
    """Parse a classic NetCDF file into a Dataset (header eagerly,
    variable data lazily via Dataset.values).  File paths are mmap'd
    read-only, so opening a huge file costs only the header pages."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            try:
                buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except (ValueError, OSError):  # zero-length file
                buf = f.read()
    if buf[:3] != b"CDF":
        raise ValueError(
            "not a classic NetCDF file (for HDF5-backed NetCDF-4 use "
            "sources.hdf5.read or the sniffing sources.open_dataset)"
        )
    version = buf[3]
    if version not in (1, 2, 5):
        raise ValueError(f"unsupported CDF version {version}")
    p = _Parser(buf, version)
    numrecs = p.nonneg()  # -1 == STREAMING; resolved below if needed

    dim_names: list[str] = []
    dim_sizes: list[int] = []
    for _ in range(p.tagged_list(_NC_DIMENSION)):
        dim_names.append(p.name())
        dim_sizes.append(p.nonneg())
    gatts = p.attrs()

    variables: dict[str, Var] = {}
    recsize = 0
    for _ in range(p.tagged_list(_NC_VARIABLE)):
        nm = p.name()
        ndims = p.nonneg()
        dimids = [p.nonneg() for _ in range(ndims)]
        vatts = p.attrs()
        nc_type = p.i4()
        vsize = p.nonneg()
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


class _Writer:
    """Version-aware header emitter (the exact inverse of _Parser's
    width rules)."""

    def __init__(self, version: int):
        self.version = version
        self.nn_fmt = ">q" if version == 5 else ">i"
        self.off_fmt = ">i" if version == 1 else ">q"
        self.out: list[bytes] = []

    def nonneg(self, v: int) -> None:
        self.out.append(struct.pack(self.nn_fmt, v))

    def i4(self, v: int) -> None:
        self.out.append(struct.pack(">i", v))

    def begin(self, v: int) -> None:
        if self.version == 1 and v > 0x7FFFFFFF:
            raise ValueError("offset exceeds CDF-1 4-byte begin; use version 2 or 5")
        self.out.append(struct.pack(self.off_fmt, v))

    def name(self, s: str) -> None:
        raw = s.encode("utf-8")
        self.nonneg(len(raw))
        self.out.append(_pad(raw))

    def tag(self, tag: int, count: int) -> None:
        # ABSENT == ZERO tag + ZERO count, which this emits naturally.
        self.i4(tag if count else 0)
        self.nonneg(count)

    def attrs(self, attrs: dict) -> None:
        self.tag(_NC_ATTRIBUTE, len(attrs))
        for k, v in attrs.items():
            self.name(k)
            if isinstance(v, str):
                raw = v.encode("utf-8")
                self.i4(2)
                self.nonneg(len(raw))
                self.out.append(_pad(raw))
            else:
                arr = np.atleast_1d(np.asarray(v))
                nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
                if nc_type in _CDF5_ONLY_TYPES and self.version != 5:
                    raise ValueError(
                        f"dtype {arr.dtype} needs CDF-5 (attr {k!r})"
                    )
                dt, _ = _TYPES[nc_type]
                self.i4(nc_type)
                self.nonneg(arr.size)
                self.out.append(_pad(arr.astype(dt).tobytes()))


def write(
    path: str,
    dims: dict,
    variables: dict,
    attrs: dict | None = None,
    version: int = 1,
    header_pad: int = 0,
):
    """Write a CDF-1/2/5 file.  ``variables`` maps name → (dim_names,
    ndarray, attrs); all dims fixed (no unlimited dim — test fixtures
    don't need record interleaving).  ``header_pad`` reserves bytes
    between header and data (sparse on POSIX filesystems), the classic
    h_minfree reserve — also how tests synthesize >4 GiB begin offsets
    without writing 4 GiB."""
    if version not in (1, 2, 5):
        raise ValueError(f"unsupported CDF version {version}")
    dim_names = list(dims)

    # Two passes: sizes first (begin offsets depend on header length).
    entries = []
    for nm, (vdims, arr, vattrs) in variables.items():
        arr = np.asarray(arr)
        nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
        if nc_type in _CDF5_ONLY_TYPES and version != 5:
            raise ValueError(f"dtype {arr.dtype} needs CDF-5 (variable {nm!r})")
        data = _pad(arr.astype(_TYPES[nc_type][0]).tobytes())
        if version != 5 and len(data) > 0x7FFFFFFF:
            raise ValueError(f"variable {nm!r} vsize needs CDF-5")
        entries.append((nm, vdims, nc_type, data, vattrs))

    def build(begins: list[int]) -> bytes:
        w = _Writer(version)
        w.out.append(b"CDF" + bytes([version]))
        w.nonneg(0)  # numrecs
        w.tag(_NC_DIMENSION, len(dims))
        for nm in dim_names:
            w.name(nm)
            w.nonneg(dims[nm])
        w.attrs(attrs or {})
        w.tag(_NC_VARIABLE, len(entries))
        for (nm, vdims, nc_type, data, vattrs), begin in zip(entries, begins):
            w.name(nm)
            w.nonneg(len(vdims))
            for d in vdims:
                w.nonneg(dim_names.index(d))
            w.attrs(vattrs)
            w.i4(nc_type)
            w.nonneg(len(data))
            w.begin(begin)
        return b"".join(w.out)

    probe = build([0] * len(entries))
    begins, pos = [], len(probe) + header_pad
    for _, _, _, data, _ in entries:
        begins.append(pos)
        pos += len(data)
    with open(path, "wb") as f:
        f.write(build(begins))
        for (_, _, _, data, _), begin in zip(entries, begins):
            f.seek(begin)
            f.write(data)
