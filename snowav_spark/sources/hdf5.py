"""Minimal pure-NumPy HDF5 reader + writer for the NetCDF-4 subset.

The reference's modern model outputs (``snow.nc`` / ``em.nc``,
ref:snowav/framework/outputs.py) are NetCDF-4 files — HDF5 containers with
a small, well-documented convention layered on top (dimension-scale
datasets + ``DIMENSION_LIST`` attributes).  This container has no
netCDF4/h5py, so until now those files raised in sources/netcdf3.py.  The
HDF5 file format spec is public and stable; the subset the netCDF-4 C
library actually emits is small enough to parse directly:

Reader supports
  - superblock v0/v1 (symbol-table root) and v2/v3 (root object header),
  - object headers v1 and v2 (``OHDR``), continuation blocks for both,
  - groups via symbol tables (B-tree v1 + local heap + ``SNOD``) *and*
    via compact link messages (netCDF-4 enables link creation-order
    tracking, which makes its groups "new-style"),
  - dataspace v1/v2 (incl. scalar + unlimited maxdims), datatypes:
    fixed-point, IEEE float, fixed string, object reference,
    variable-length (sequences and vlen strings via the global heap),
  - data layouts: compact, contiguous, chunked v3 (B-tree v1 chunk
    index) with deflate (zlib), shuffle, fletcher32, registered LZ4
    (32004, sources/lz4.py framing per hdf5_plugins), and registered
    blosc (32001, sources/blosc.py) filters — zstd (32015) and other
    unregistered ids raise by id,
  - the netCDF-4 convention: dimension scales (``CLASS`` /
    ``_Netcdf4Dimid``), ``DIMENSION_LIST`` refs resolved to dim names,
    hidden bookkeeping attrs stripped, nested groups flattened with
    ``/``-joined names,
  - DENSE storage for attributes AND links (fractal heap + name B-tree
    v2) — what real model output hits past HDF5's compact thresholds
    (a variable with units/long_name/_FillValue/valid_range/… crosses
    it easily); single-direct-block and one-level-indirect heaps,
    creation-order-tracked/indexed flag variants; huge/tiny heap
    objects and deeper trees raise loudly with their bounds stated.

Writer (fixture-grade, like netcdf3.write) emits superblock v0 +
old-style root group + v1 object headers, contiguous or chunked
(+deflate/shuffle) data, dimension-scale datasets and ``DIMENSION_LIST``
attributes — and past 8 attributes per object, DENSE attribute storage
(fractal heap + hash-sorted name B-tree v2 with real Jenkins-lookup3
checksums, the netCDF4-c threshold behavior) — a netCDF-4-shaped file
the reader (and any HDF5 library) can load, so round-trip tests need no
native dependency.

Like netcdf3.py, files are read via ``mmap``: header/B-tree pages fault
in on open, variable data only when ``Dataset.values`` touches it —
what the partition-parallel ingest path (ingest.read_netcdf_outputs)
needs when each executor opens one multi-GiB file.
"""

from __future__ import annotations

import mmap
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# -- message type ids -------------------------------------------------------
_M_NIL = 0x0000
_M_DATASPACE = 0x0001
_M_LINK_INFO = 0x0002
_M_DATATYPE = 0x0003
_M_FILL_OLD = 0x0004
_M_FILL = 0x0005
_M_LINK = 0x0006
_M_LAYOUT = 0x0008
_M_GROUP_INFO = 0x000A
_M_FILTERS = 0x000B
_M_ATTRIBUTE = 0x000C
_M_CONTINUATION = 0x0010
_M_SYMBOL_TABLE = 0x0011
_M_ATTR_INFO = 0x0015

def _lookup3(data: bytes, init: int = 0) -> int:
    """Jenkins lookup3 (hashlittle) — HDF5's metadata checksum AND the
    B-tree v2 name-index hash (H5_checksum_lookup3).  Pure-python port of
    the public-domain reference; pinned by known test vectors in
    tests/test_hdf5.py."""
    M = 0xFFFFFFFF

    def rot(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & M

    a = b = c = (0xDEADBEEF + len(data) + init) & M
    i, ln = 0, len(data)
    while ln > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & M
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M  # noqa: E702
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M  # noqa: E702
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M  # noqa: E702
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M  # noqa: E702
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M  # noqa: E702
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M  # noqa: E702
        i += 12
        ln -= 12
    tail = data[i:]
    if tail:  # final mix only when bytes remain (hashlittle semantics)
        pad = tail + b"\x00" * (12 - len(tail))
        a = (a + int.from_bytes(pad[0:4], "little")) & M
        b = (b + int.from_bytes(pad[4:8], "little")) & M
        c = (c + int.from_bytes(pad[8:12], "little")) & M
        c ^= b; c = (c - rot(b, 14)) & M  # noqa: E702
        a ^= c; a = (a - rot(c, 11)) & M  # noqa: E702
        b ^= a; b = (b - rot(a, 25)) & M  # noqa: E702
        c ^= b; c = (c - rot(b, 16)) & M  # noqa: E702
        a ^= c; a = (a - rot(c, 4)) & M  # noqa: E702
        b ^= a; b = (b - rot(a, 14)) & M  # noqa: E702
        c ^= b; c = (c - rot(b, 24)) & M  # noqa: E702
    return c


_NC_HIDDEN_ATTRS = {
    "CLASS",
    "NAME",
    "REFERENCE_LIST",
    "DIMENSION_LIST",
    "_Netcdf4Dimid",
    "_Netcdf4Coordinates",
    "_NCProperties",
}


# ---------------------------------------------------------------------------
# datatype model
# ---------------------------------------------------------------------------


@dataclass
class _DType:
    cls: int
    size: int
    signed: bool = True
    little: bool = True
    base: object = None  # vlen base datatype
    vlen_string: bool = False

    def numpy(self) -> np.dtype:
        order = "<" if self.little else ">"
        if self.cls == 0:
            return np.dtype(f"{order}{'i' if self.signed else 'u'}{self.size}")
        if self.cls == 1:
            return np.dtype(f"{order}f{self.size}")
        if self.cls == 3:
            return np.dtype(f"S{self.size}")
        if self.cls == 7:
            return np.dtype("<u8")  # object reference = file address
        raise ValueError(f"no numpy dtype for HDF5 class {self.cls}")


def _parse_datatype(buf, pos: int) -> tuple[_DType, int]:
    b0 = buf[pos]
    cls, _version = b0 & 0x0F, b0 >> 4
    bits = bytes(buf[pos + 1 : pos + 4])
    (size,) = struct.unpack_from("<I", buf, pos + 4)
    pos += 8
    if cls == 0:  # fixed-point: properties = bit offset(2) + precision(2)
        dt = _DType(cls, size, signed=bool(bits[0] & 0x08), little=not bits[0] & 1)
        pos += 4
    elif cls == 1:  # float: 12 bytes of properties
        dt = _DType(cls, size, little=not bits[0] & 1)
        pos += 12
    elif cls == 3:  # fixed string: no properties
        dt = _DType(cls, size)
    elif cls == 7:  # reference: no properties
        dt = _DType(cls, size)
    elif cls == 9:  # vlen: base datatype follows
        base, pos = _parse_datatype(buf, pos)
        dt = _DType(cls, size, base=base, vlen_string=(bits[0] & 0x0F) == 1)
    else:  # compound/enum/…: skip precise parsing, caller keeps raw bytes
        dt = _DType(cls, size)
    return dt, pos


def _parse_dataspace(buf, pos: int) -> tuple[tuple, tuple]:
    version = buf[pos]
    rank = buf[pos + 1]
    flags = buf[pos + 2]
    pos += 8 if version == 1 else 4
    dims = struct.unpack_from(f"<{rank}Q", buf, pos)
    pos += 8 * rank
    maxdims = dims
    if flags & 1:
        maxdims = struct.unpack_from(f"<{rank}Q", buf, pos)
    return dims, maxdims


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


@dataclass
class _Obj:
    """One HDF5 object (group or dataset) by parsed header messages."""

    addr: int
    links: dict = field(default_factory=dict)  # name -> child OH address
    shape: tuple = ()
    maxshape: tuple = ()
    dtype: _DType = None
    layout: tuple = None  # ("contiguous", addr, size) | ("chunked", btree, chunk_dims) | ("compact", bytes)
    filters: list = field(default_factory=list)  # [(id, client_values)]
    attrs: dict = field(default_factory=dict)
    is_dataset: bool = False


class H5File:
    """Read-only structural parser.  ``objects`` maps header address →
    _Obj; ``root`` is the root group's address; walk() flattens the
    group tree into path → _Obj."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            self.buf = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                self.buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        if self.buf[:8] != MAGIC:
            raise ValueError("not an HDF5 file")
        self.objects: dict[int, _Obj] = {}
        self.root = self._superblock()
        self._load_object(self.root)

    # -- file structure -----------------------------------------------------

    def _superblock(self) -> int:
        version = self.buf[8]
        if version in (0, 1):
            if self.buf[13] != 8 or self.buf[14] != 8:
                raise ValueError("only 8-byte offsets/lengths supported")
            # root symbol table entry sits after the fixed fields
            pos = 24 + 4 * 8 + (4 if version == 1 else 0)
            (oh_addr,) = struct.unpack_from("<Q", self.buf, pos + 8)
            return oh_addr
        if version in (2, 3):
            if self.buf[9] != 8 or self.buf[10] != 8:
                raise ValueError("only 8-byte offsets/lengths supported")
            (oh_addr,) = struct.unpack_from("<Q", self.buf, 36)
            return oh_addr
        raise ValueError(f"unsupported superblock version {version}")

    def _load_object(self, addr: int) -> _Obj:
        if addr in self.objects:
            return self.objects[addr]
        obj = _Obj(addr)
        self.objects[addr] = obj
        for mtype, mbuf in self._messages(addr):
            self._apply(obj, mtype, mbuf)
        for child in obj.links.values():
            self._load_object(child)
        return obj

    def _messages(self, addr: int):
        """Yield (type, body bytes) for every header message, following
        continuations, for v1 and v2 object headers."""
        buf = self.buf
        if bytes(buf[addr : addr + 4]) == b"OHDR":
            yield from self._messages_v2(addr)
            return
        if buf[addr] != 1:
            raise ValueError(f"unsupported object header version {buf[addr]}")
        (_nmsgs,) = struct.unpack_from("<H", buf, addr + 2)
        (hsize,) = struct.unpack_from("<I", buf, addr + 8)
        blocks = [(addr + 16, hsize)]
        while blocks:
            pos, size = blocks.pop(0)
            end = pos + size
            while pos + 8 <= end:
                mtype, msize = struct.unpack_from("<HH", buf, pos)
                flags = buf[pos + 4]
                body = pos + 8
                if mtype == _M_CONTINUATION:
                    off, length = struct.unpack_from("<QQ", buf, body)
                    blocks.append((off, length))
                elif mtype != _M_NIL:
                    if flags & 0x02:  # body is a shared-message pointer
                        raise ValueError(
                            f"shared header message (type {mtype:#x}) unsupported"
                        )
                    yield mtype, bytes(buf[body : body + msize])
                pos = body + msize

    def _messages_v2(self, addr: int):
        buf = self.buf
        flags = buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16  # four timestamps
        if flags & 0x10:
            pos += 4  # max-compact / min-dense attribute counts
        csize_width = 1 << (flags & 0x03)
        size0 = int.from_bytes(bytes(buf[pos : pos + csize_width]), "little")
        pos += csize_width
        blocks = [(pos, size0)]
        creation_tracked = bool(flags & 0x04)
        while blocks:
            p, size = blocks.pop(0)
            end = p + size  # excludes trailing checksum
            while p + 4 <= end:
                mtype = buf[p]
                (msize,) = struct.unpack_from("<H", buf, p + 1)
                mflags = buf[p + 3]
                p += 4
                if creation_tracked:
                    p += 2
                body = p
                if mtype == _M_CONTINUATION:
                    off, length = struct.unpack_from("<QQ", buf, body)
                    # OCHK signature (4) leads, checksum (4) trails
                    blocks.append((off + 4, length - 8))
                elif mtype != _M_NIL:
                    if mflags & 0x02:  # body is a shared-message pointer
                        raise ValueError(
                            f"shared header message (type {mtype:#x}) unsupported"
                        )
                    yield mtype, bytes(buf[body : body + msize])
                p = body + msize

    # -- message dispatch ----------------------------------------------------

    def _apply(self, obj: _Obj, mtype: int, m: bytes) -> None:
        if mtype == _M_DATASPACE:
            obj.shape, obj.maxshape = _parse_dataspace(m, 0)
            obj.is_dataset = True
        elif mtype == _M_DATATYPE:
            obj.dtype, _ = _parse_datatype(m, 0)
            obj.is_dataset = True
        elif mtype == _M_LAYOUT:
            obj.layout = self._parse_layout(m)
        elif mtype == _M_FILTERS:
            obj.filters = self._parse_filters(m)
        elif mtype == _M_ATTRIBUTE:
            name, value = self._parse_attribute(m)
            obj.attrs[name] = value
        elif mtype == _M_SYMBOL_TABLE:
            btree, heap = struct.unpack_from("<QQ", m, 0)
            obj.links.update(self._symbol_table(btree, heap))
        elif mtype == _M_LINK:
            name, target = self._parse_link(m)
            if target is not None:
                obj.links[name] = target
        elif mtype == _M_LINK_INFO:
            flags = m[1]
            pos = 2 + (8 if flags & 1 else 0)
            fheap, name_bt = struct.unpack_from("<QQ", m, pos)
            if fheap != _UNDEF:
                # dense link storage (new-style groups past the compact
                # threshold): link messages live in a fractal heap,
                # indexed by a name B-tree v2 whose type-5 records put
                # the 7-byte heap id AFTER the 4-byte name hash
                for body in self._dense_messages(
                    fheap, name_bt, id_slice=(4, 11)
                ):
                    name, target = self._parse_link(body)
                    if target is not None:
                        obj.links[name] = target
        elif mtype == _M_ATTR_INFO:
            flags = m[1]
            pos = 2 + (2 if flags & 1 else 0)
            fheap, name_bt = struct.unpack_from("<QQ", m, pos)
            if fheap != _UNDEF:
                # dense storage: attribute messages live in a fractal
                # heap, indexed by a name B-tree v2 (real netCDF-4 files
                # cross the compact→dense threshold easily — units,
                # long_name, _FillValue, valid_range, grid_mapping, …)
                for body in self._dense_messages(fheap, name_bt):
                    name, value = self._parse_attribute(body)
                    obj.attrs[name] = value
        # fill values, group info, mod times: no-ops for reading data

    def _parse_layout(self, m: bytes):
        version = m[0]
        if version != 3:
            raise ValueError(f"unsupported data layout version {version}")
        lclass = m[1]
        if lclass == 0:  # compact
            (size,) = struct.unpack_from("<H", m, 2)
            return ("compact", bytes(m[4 : 4 + size]))
        if lclass == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", m, 2)
            return ("contiguous", addr, size)
        if lclass == 2:  # chunked
            rank = m[2]  # = dataset rank + 1 (element-size dim)
            (btree,) = struct.unpack_from("<Q", m, 3)
            cdims = struct.unpack_from(f"<{rank}I", m, 11)
            return ("chunked", btree, cdims)
        raise ValueError(f"unsupported layout class {lclass}")

    @staticmethod
    def _parse_filters(m: bytes) -> list:
        version = m[0]
        n = m[1]
        pos = 8 if version == 1 else 2
        out = []
        for _ in range(n):
            (fid,) = struct.unpack_from("<H", m, pos)
            pos += 2
            namelen = 0
            if version == 1 or fid >= 256:
                # v2 omits the name-length field entirely for ids < 256
                (namelen,) = struct.unpack_from("<H", m, pos)
                pos += 2
            pos += 2  # flags
            (ncv,) = struct.unpack_from("<H", m, pos)
            pos += 2
            if namelen:
                pos += (namelen + 7) // 8 * 8 if version == 1 else namelen
            cvs = struct.unpack_from(f"<{ncv}I", m, pos)
            pos += 4 * ncv
            if version == 1 and ncv % 2:
                pos += 4
            out.append((fid, cvs))
        return out

    def _parse_link(self, m: bytes):
        flags = m[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = m[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        lw = 1 << (flags & 0x03)
        namelen = int.from_bytes(m[pos : pos + lw], "little")
        pos += lw
        name = m[pos : pos + namelen].decode("utf-8")
        pos += namelen
        if ltype == 0:  # hard link
            (addr,) = struct.unpack_from("<Q", m, pos)
            return name, addr
        return name, None  # soft/external links: skip

    def _parse_attribute(self, m: bytes):
        version = m[0]
        if version == 1:
            namesz, dtsz, dssz = struct.unpack_from("<HHH", m, 2)
            pos = 8
            name = m[pos : pos + namesz].split(b"\x00")[0].decode("utf-8")
            pos += (namesz + 7) // 8 * 8
            dt_raw = m[pos : pos + dtsz]
            pos += (dtsz + 7) // 8 * 8
            ds_raw = m[pos : pos + dssz]
            pos += (dssz + 7) // 8 * 8
        elif version in (2, 3):
            flags = m[1]
            namesz, dtsz, dssz = struct.unpack_from("<HHH", m, 2)
            pos = 9 if version == 3 else 8
            name = m[pos : pos + namesz].split(b"\x00")[0].decode("utf-8")
            pos += namesz
            if flags & 0x03:  # shared datatype/dataspace: keep raw
                return name, bytes(m[pos:])
            dt_raw = m[pos : pos + dtsz]
            pos += dtsz
            ds_raw = m[pos : pos + dssz]
            pos += dssz
        else:
            raise ValueError(f"unsupported attribute version {version}")
        try:
            dt, _ = _parse_datatype(dt_raw, 0)
            dims, _ = _parse_dataspace(ds_raw, 0)
        except Exception:
            return name, bytes(m[pos:])
        n = int(np.prod(dims, dtype=np.int64)) if dims else 1
        data = m[pos : pos + n * dt.size]
        return name, self._decode_values(dt, n, data, scalar=not dims)

    def _decode_values(self, dt: _DType, n: int, data: bytes, scalar: bool):
        """Attribute / vlen payload bytes → python values."""
        if dt.cls == 3:  # fixed string(s): n elements of dt.size bytes
            vals = [
                data[i * dt.size : (i + 1) * dt.size]
                .split(b"\x00")[0]
                .decode("utf-8", "replace")
                for i in range(n)
            ]
            return vals[0] if n == 1 else vals
        if dt.cls == 9:  # vlen: elements are (len, gheap addr, index)
            out = []
            for i in range(n):
                ln, gaddr, gidx = struct.unpack_from("<IQI", data, 16 * i)
                raw = self._gheap_object(gaddr, gidx)
                if dt.vlen_string:
                    out.append(raw[:ln].decode("utf-8", "replace"))
                elif dt.base is not None and dt.base.cls in (0, 1, 7):
                    out.append(
                        np.frombuffer(raw, dt.base.numpy(), ln).astype(
                            dt.base.numpy().newbyteorder("=")
                        )
                    )
                else:
                    out.append(raw)
            if dt.vlen_string and scalar and len(out) == 1:
                return out[0]
            return out
        if dt.cls in (0, 1, 7):
            vals = np.frombuffer(data, dt.numpy(), n).astype(
                dt.numpy().newbyteorder("=")
            )
            return vals[0] if scalar and n == 1 else vals
        return data  # compound/enum/…: raw bytes

    def _gheap_object(self, addr: int, index: int) -> bytes:
        buf = self.buf
        if bytes(buf[addr : addr + 4]) != b"GCOL":
            raise ValueError("bad global heap collection signature")
        (csize,) = struct.unpack_from("<Q", buf, addr + 8)
        pos, end = addr + 16, addr + csize
        while pos + 16 <= end:
            (idx,) = struct.unpack_from("<H", buf, pos)
            (osize,) = struct.unpack_from("<Q", buf, pos + 8)
            if idx == index:
                return bytes(buf[pos + 16 : pos + 16 + osize])
            if idx == 0:
                break
            pos += 16 + (osize + 7) // 8 * 8
        raise KeyError(f"global heap object {index} not found at {addr:#x}")

    # -- dense (fractal-heap) attribute storage --------------------------------

    def _fractal_heap(self, addr: int) -> dict:
        """Parse a fractal heap header (FRHP) into the fields object
        lookup needs.  Read-only: sizes are DERIVED from the header
        (offset width from the max-heap-size bits, length width from the
        max-managed-object field), never assumed."""
        buf = self.buf
        if bytes(buf[addr : addr + 4]) != b"FRHP":
            raise ValueError("bad fractal heap signature")
        if buf[addr + 4] != 0:
            raise ValueError(f"unsupported fractal heap version {buf[addr+4]}")
        (id_len,) = struct.unpack_from("<H", buf, addr + 5)
        (filter_len,) = struct.unpack_from("<H", buf, addr + 7)
        if filter_len:
            raise ValueError("filtered fractal heap blocks unsupported")
        flags = buf[addr + 9]
        (max_managed,) = struct.unpack_from("<I", buf, addr + 10)
        pos = addr + 14 + 12 * 8  # skip huge/tiny/free-space statistics
        width, start_size, max_direct = struct.unpack_from("<HQQ", buf, pos)
        (max_heap_bits,) = struct.unpack_from("<H", buf, pos + 18)
        root_addr, nrows = struct.unpack_from("<QH", buf, pos + 22)
        offset_size = (max_heap_bits + 7) // 8
        length_size = max((max_managed.bit_length() + 7) // 8, 1)
        if 1 + offset_size + length_size > id_len:
            raise ValueError(
                f"fractal heap id length {id_len} shorter than derived"
                f" offset/length widths {offset_size}/{length_size}"
            )
        return {
            "flags": flags,
            "width": width,
            "start": start_size,
            "max_direct": max_direct,
            "offset_size": offset_size,
            "length_size": length_size,
            "root": root_addr,
            "nrows": nrows,
        }

    def _heap_object(self, heap: dict, heap_id: bytes) -> bytes:
        """Fetch one MANAGED object by heap id.  Heap offsets address the
        heap's linear space, which includes each direct block's header —
        so file position is child_addr + (offset − block_start) with no
        header arithmetic.  Single-direct-block roots and one level of
        indirect root (direct children) cover every attribute heap the
        netCDF-4 library produces; deeper nesting raises loudly."""
        buf = self.buf
        idflags = heap_id[0]
        if (idflags >> 6) & 0x03:
            raise ValueError("unsupported fractal heap id version")
        if (idflags >> 4) & 0x03:
            raise ValueError(
                "huge/tiny fractal heap objects unsupported (attribute"
                " messages are always managed)"
            )
        osz, lsz = heap["offset_size"], heap["length_size"]
        offset = int.from_bytes(heap_id[1 : 1 + osz], "little")
        length = int.from_bytes(heap_id[1 + osz : 1 + osz + lsz], "little")
        if heap["nrows"] == 0:
            # root IS a single direct block at heap offset 0
            pos = heap["root"] + offset
            return bytes(buf[pos : pos + length])
        # root indirect block: walk the doubling table to the direct child
        W, S = heap["width"], heap["start"]
        max_direct_rows = (
            int(heap["max_direct"]).bit_length() - int(S).bit_length() + 2
        )
        row, base = 0, 0
        while True:
            bs = S if row < 2 else S << (row - 1)
            if offset < base + W * bs:
                break
            base += W * bs
            row += 1
        if row >= max_direct_rows:
            raise ValueError(
                "nested indirect fractal heap blocks unsupported"
            )
        col = (offset - base) // bs
        block_start = base + col * bs
        if bytes(buf[heap["root"] : heap["root"] + 4]) != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        entries = heap["root"] + 4 + 1 + 8 + heap["offset_size"]
        (child,) = struct.unpack_from("<Q", buf, entries + 8 * (row * W + col))
        if child == _UNDEF:
            raise ValueError("fractal heap object in unallocated block")
        pos = child + (offset - block_start)
        return bytes(buf[pos : pos + length])

    def _btree_v2_records(self, addr: int):
        """Yield raw records from a version-2 B-tree.  Depth-0 (single
        leaf) covers the attribute counts real model output carries
        (~120 records at the library's default node size); deeper trees
        raise with the bound stated."""
        buf = self.buf
        if bytes(buf[addr : addr + 4]) != b"BTHD":
            raise ValueError("bad v2 B-tree header signature")
        (rec_size,) = struct.unpack_from("<H", buf, addr + 10)
        (depth,) = struct.unpack_from("<H", buf, addr + 12)
        root, nrec = struct.unpack_from("<QH", buf, addr + 16)
        if depth != 0:
            raise ValueError(
                "v2 B-tree depth > 0 unsupported (single leaf holds ~120"
                " attributes at the default node size)"
            )
        if bytes(buf[root : root + 4]) != b"BTLF":
            raise ValueError("bad v2 B-tree leaf signature")
        pos = root + 6
        for _ in range(nrec):
            yield bytes(buf[pos : pos + rec_size])
            pos += rec_size

    def _dense_messages(
        self,
        fheap_addr: int,
        btree_addr: int,
        id_slice: tuple[int, int] = (0, 8),
    ):
        """Iterate dense-storage message bodies: each name-index record
        points at a message stored as a managed fractal-heap object.
        ``id_slice`` is the heap id's position within the record —
        attributes (type 8: heap id(8) + flags(1) + creation order(4) +
        hash(4)) lead with it; links (type 5: hash(4) + heap id(7))
        trail it."""
        heap = self._fractal_heap(fheap_addr)
        lo, hi = id_slice
        for rec in self._btree_v2_records(btree_addr):
            yield self._heap_object(heap, rec[lo:hi])

    # -- groups ---------------------------------------------------------------

    def _symbol_table(self, btree_addr: int, heap_addr: int) -> dict:
        buf = self.buf
        if bytes(buf[heap_addr : heap_addr + 4]) != b"HEAP":
            raise ValueError("bad local heap signature")
        (heap_data,) = struct.unpack_from("<Q", buf, heap_addr + 24)
        links: dict[str, int] = {}

        def walk_node(addr: int) -> None:
            if bytes(buf[addr : addr + 4]) == b"SNOD":
                (count,) = struct.unpack_from("<H", buf, addr + 6)
                for i in range(count):
                    e = addr + 8 + 40 * i
                    name_off, oh_addr = struct.unpack_from("<QQ", buf, e)
                    p = heap_data + name_off
                    nul = buf.find(b"\x00", p)
                    links[bytes(buf[p:nul]).decode("utf-8")] = oh_addr
                return
            if bytes(buf[addr : addr + 4]) != b"TREE":
                raise ValueError("bad group B-tree signature")
            (entries,) = struct.unpack_from("<H", buf, addr + 6)
            pos = addr + 24
            for i in range(entries):
                (child,) = struct.unpack_from("<Q", buf, pos + 8)  # skip key
                walk_node(child)
                pos += 16

        walk_node(btree_addr)
        return links

    def walk(self) -> dict[str, _Obj]:
        """Flatten the group tree into '/'-joined paths → _Obj."""
        out: dict[str, _Obj] = {}

        def rec(addr: int, prefix: str, seen: frozenset) -> None:
            obj = self.objects[addr]
            for name, child_addr in sorted(obj.links.items()):
                if child_addr in seen:
                    continue  # hard-link cycle
                child = self.objects[child_addr]
                path = f"{prefix}{name}"
                out[path] = child
                if not child.is_dataset:
                    rec(child_addr, path + "/", seen | {child_addr})

        rec(self.root, "", frozenset({self.root}))
        return out

    # -- dataset data ----------------------------------------------------------

    def read_dataset(self, obj: _Obj, first: slice | None = None) -> np.ndarray:
        """Materialize a dataset, optionally only rows ``first`` of the
        leading axis.  Slab reads touch only the pages (contiguous) or
        chunks (chunked — pruned by the chunk's leading offset) that
        overlap, so streaming a (time, y, x) variable one timestep at a
        time costs one grid of executor memory, not the whole cube."""
        dt = obj.dtype.numpy()
        shape = tuple(int(s) for s in obj.shape)
        if obj.layout is None:
            raise ValueError("dataset has no data layout message")
        lo, hi = 0, shape[0] if shape else 1
        if first is not None:
            if not shape:
                raise ValueError("cannot slab-read a scalar dataset")
            lo, hi, step = first.indices(shape[0])
            if step != 1:
                raise ValueError("only unit-stride slabs supported")
            shape = (max(hi - lo, 0), *shape[1:])
        kind = obj.layout[0]
        if kind == "compact":
            n = int(np.prod(obj.shape, dtype=np.int64)) if obj.shape else 1
            arr = np.frombuffer(obj.layout[1], dt, n)
            arr = arr.reshape(tuple(int(s) for s in obj.shape))
            return arr[lo:hi].astype(dt.newbyteorder("=")) if first is not None else arr.astype(dt.newbyteorder("="))
        if kind == "contiguous":
            _, addr, size = obj.layout
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            if addr == _UNDEF:  # never written: all fill (zeros)
                return np.zeros(shape, dt.newbyteorder("="))
            row = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            arr = np.frombuffer(self.buf, dt, n, addr + lo * row * dt.itemsize)
            return arr.reshape(shape).astype(dt.newbyteorder("="))
        # chunked
        _, btree, cdims = obj.layout
        chunk_shape = tuple(int(c) for c in cdims[:-1])
        out = np.zeros(shape, dt.newbyteorder("="))
        for offsets, size, mask, addr in self._chunks(btree, len(cdims)):
            if offsets[0] + chunk_shape[0] <= lo or offsets[0] >= hi:
                continue  # chunk entirely outside the requested slab
            raw = bytes(self.buf[addr : addr + size])
            raw = self._defilter(raw, obj.filters, mask, dt.itemsize)
            chunk = np.frombuffer(raw, dt, int(np.prod(chunk_shape, dtype=np.int64)))
            chunk = chunk.reshape(chunk_shape)
            sel_out, sel_in = [], []
            for ax, (o, c, s) in enumerate(zip(offsets[:-1], chunk_shape, obj.shape)):
                base = lo if ax == 0 else 0
                top = hi if ax == 0 else int(s)
                a, b = max(int(o), base), min(int(o) + c, top)
                sel_out.append(slice(a - base, b - base))
                sel_in.append(slice(a - int(o), b - int(o)))
            out[tuple(sel_out)] = chunk[tuple(sel_in)]
        return out

    def _chunks(self, btree_addr: int, nkey_dims: int):
        buf = self.buf
        key_fmt = f"<II{nkey_dims}Q"
        key_size = 8 + 8 * nkey_dims

        def walk(addr: int):
            if bytes(buf[addr : addr + 4]) != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            level = buf[addr + 5]
            (entries,) = struct.unpack_from("<H", buf, addr + 6)
            pos = addr + 24
            for _ in range(entries):
                fields = struct.unpack_from(key_fmt, buf, pos)
                (child,) = struct.unpack_from("<Q", buf, pos + key_size)
                if level > 0:
                    yield from walk(child)
                else:
                    size, mask = fields[0], fields[1]
                    yield fields[2:], size, mask, child
                pos += key_size + 8

        yield from walk(btree_addr)

    @staticmethod
    def _defilter(raw: bytes, filters: list, mask: int, itemsize: int) -> bytes:
        # pipeline order = write order; invert in reverse
        for i in range(len(filters) - 1, -1, -1):
            fid, cvs = filters[i]
            if mask & (1 << i):
                continue
            if fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle
                es = cvs[0] if cvs else itemsize
                n = len(raw) // es
                raw = (
                    np.frombuffer(raw, np.uint8, n * es)
                    .reshape(es, n)
                    .T.tobytes()
                )
            elif fid == 3:  # fletcher32: checksum trails the data
                raw = raw[:-4]
            elif fid == 32004:  # registered LZ4 filter (hdf5_plugins)
                raw = _hdf5_lz4_decode(raw)
            elif fid == 32001:  # registered blosc filter: the chunk
                # payload IS one Blosc1 chunk (H5Zblosc stores the
                # blosc buffer directly; cd_values only echo params)
                from .blosc import blosc_decompress

                raw = blosc_decompress(raw)
            else:
                raise ValueError(f"unsupported HDF5 filter id {fid}")
        return raw


def _hdf5_lz4_decode(raw: bytes) -> bytes:
    """Inverse of the registered HDF5 LZ4 filter (id 32004,
    hdf5_plugins framing — all fields BIG-endian): uint64 original
    size, uint32 block size, then per block a uint32 compressed size
    followed by an LZ4 block (stored raw when the compressed size
    equals the block's uncompressed size)."""
    from .lz4 import lz4_decompress

    if len(raw) < 12:
        raise ValueError("HDF5 lz4 filter payload shorter than header")
    (orig,) = struct.unpack_from(">Q", raw, 0)
    (bsize,) = struct.unpack_from(">I", raw, 8)
    if bsize <= 0:
        bsize = orig or 1
    out = bytearray()
    pos = 12
    remaining = orig
    while remaining > 0:
        (csize,) = struct.unpack_from(">I", raw, pos)
        pos += 4
        ub = min(bsize, remaining)
        payload = raw[pos:pos + csize]
        if len(payload) != csize:
            raise ValueError("HDF5 lz4 filter payload truncated")
        pos += csize
        out += payload if csize == ub else lz4_decompress(payload, ub)
        remaining -= ub
    if len(out) != orig:
        raise ValueError(
            f"HDF5 lz4 filter decoded {len(out)} bytes, expected {orig}"
        )
    return bytes(out)


def _hdf5_lz4_encode(raw: bytes, bsize: int = 1 << 20) -> bytes:
    """Forward HDF5 LZ4 filter framing (fixture writer)."""
    from .lz4 import lz4_compress

    n = len(raw)
    bsize = min(bsize, max(n, 1))
    out = bytearray(struct.pack(">QI", n, bsize))
    for off in range(0, n, bsize):
        block = raw[off:off + bsize]
        comp = lz4_compress(block)
        if len(comp) >= len(block):
            comp = block  # stored raw; csize == uncompressed marks it
        out += struct.pack(">I", len(comp)) + comp
    if n == 0:
        out += struct.pack(">I", 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# netCDF-4 semantic layer
# ---------------------------------------------------------------------------

_NC_DIM_SCALE_HINT = "This is a netCDF dimension but not a netCDF variable"


@dataclass
class NC4Var:
    name: str
    dims: list
    shape: tuple
    attrs: dict


@dataclass
class NC4Dataset:
    """Duck-type of sources.netcdf3.Dataset: dims / attrs / variables /
    values(name) — so ingest.read_netcdf_outputs treats both alike."""

    dims: dict
    attrs: dict
    variables: dict
    _h5: H5File = field(repr=False, default=None)
    _objs: dict = field(repr=False, default_factory=dict)

    def values(self, name: str, first: slice | None = None) -> np.ndarray:
        return self._h5.read_dataset(self._objs[name], first=first)


def read(path_or_bytes) -> NC4Dataset:
    """Open an HDF5-backed NetCDF-4 file.  Dimension scales become dims;
    every other dataset becomes a variable with dims resolved through its
    DIMENSION_LIST refs (phony dims synthesized for plain-HDF5 files);
    bookkeeping attrs are stripped from the public attr dicts."""
    h5 = H5File(path_or_bytes)
    tree = h5.walk()
    root = h5.objects[h5.root]

    # pass 1: dimension scales, addressable by object-header address
    dim_by_addr: dict[int, tuple[str, int]] = {}
    for path, obj in tree.items():
        if obj.is_dataset and str(obj.attrs.get("CLASS", "")) == "DIMENSION_SCALE":
            size = int(obj.shape[0]) if obj.shape else 0
            dim_by_addr[obj.addr] = (path, size)
    dims = {name: size for name, size in dim_by_addr.values()}

    # pass 2: variables (dim scales that are pure bookkeeping are hidden)
    variables: dict[str, NC4Var] = {}
    objs: dict[str, _Obj] = {}
    phony = 0
    for path, obj in sorted(tree.items()):
        if not obj.is_dataset:
            continue
        if obj.addr in dim_by_addr and str(obj.attrs.get("NAME", "")).startswith(
            _NC_DIM_SCALE_HINT
        ):
            continue  # hidden dim-scale bookkeeping dataset
        dim_list = obj.attrs.get("DIMENSION_LIST")
        var_dims: list[str] = []
        if isinstance(dim_list, list) and len(dim_list) == len(obj.shape):
            for i, refs in enumerate(dim_list):
                addr = int(np.asarray(refs).ravel()[0]) if len(np.asarray(refs).ravel()) else -1
                if addr in dim_by_addr:
                    var_dims.append(dim_by_addr[addr][0])
                else:
                    var_dims.append(f"phony_dim_{phony}")
                    dims[f"phony_dim_{phony}"] = int(obj.shape[i])
                    phony += 1
        elif obj.addr in dim_by_addr:  # coordinate variable: its own scale
            var_dims = [dim_by_addr[obj.addr][0]]
        else:
            for i, s in enumerate(obj.shape):
                match = next(
                    (n for n, sz in dims.items() if sz == int(s)), None
                )
                if match is None:
                    match = f"phony_dim_{phony}"
                    dims[match] = int(s)
                    phony += 1
                var_dims.append(match)
        public = {
            k: v for k, v in obj.attrs.items() if k not in _NC_HIDDEN_ATTRS
        }
        variables[path] = NC4Var(
            path, var_dims, tuple(int(s) for s in obj.shape), public
        )
        objs[path] = obj

    gattrs = {k: v for k, v in root.attrs.items() if k not in _NC_HIDDEN_ATTRS}
    return NC4Dataset(dims, gattrs, variables, h5, objs)


# ---------------------------------------------------------------------------
# writer (fixture-grade: superblock v0, v1 object headers, old-style root)
# ---------------------------------------------------------------------------


# netCDF4-c's default compact-attribute limit: past 8 attribute messages
# an object's attributes move to dense (fractal-heap) storage
_DENSE_ATTR_THRESHOLD = 8
# dense objects above this would be "huge" (stored via their own btree)
_DENSE_MAX_MANAGED = 4096


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dt_bytes(arr: np.ndarray) -> bytes:
    """v1 datatype message bytes for a little-endian numpy array dtype."""
    k, size = arr.dtype.kind, arr.dtype.itemsize
    if k in ("i", "u"):
        bits = bytes([0x08 if k == "i" else 0x00, 0, 0])
        return bytes([0x10]) + bits + struct.pack("<I", size) + struct.pack(
            "<HH", 0, size * 8
        )
    if k == "f":
        sign = size * 8 - 1
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        elif size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:
            raise ValueError(f"unsupported float size {size}")
        return bytes([0x11, 0x20, sign, 0]) + struct.pack("<I", size) + props
    if k == "S":
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", size)
    raise ValueError(f"unsupported dtype {arr.dtype}")


_DT_REF = bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)
_DT_VLEN_REF = (
    bytes([0x19, 0, 0, 0]) + struct.pack("<I", 16) + _DT_REF
)  # vlen sequence of object references (DIMENSION_LIST's type)


def _ds_bytes(shape: tuple) -> bytes:
    out = struct.pack("<BBB5x", 1, len(shape), 0)
    for s in shape:
        out += struct.pack("<Q", s)
    return out


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _attr_msg(name: str, dt_raw: bytes, shape: tuple, data: bytes) -> bytes:
    nm = name.encode("utf-8") + b"\x00"
    ds_raw = _ds_bytes(shape)
    body = struct.pack("<BxHHH", 1, len(nm), len(dt_raw), len(ds_raw))
    body += _pad8(nm) + _pad8(dt_raw) + _pad8(ds_raw) + data
    return _msg(_M_ATTRIBUTE, body)


def _attr_parts(value) -> tuple[bytes, tuple, bytes]:
    """(datatype bytes, shape, payload bytes) for a python attr value —
    shared by the compact (v1 header message) and dense (v3 fractal-heap
    object) attribute encoders."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        dt = bytes([0x13, 0, 0, 0]) + struct.pack("<I", max(len(raw), 1))
        return dt, (), raw or b"\x00"
    if (
        isinstance(value, (list, tuple))
        and value
        and all(isinstance(v, str) for v in value)
    ):
        # fixed-string array: every element padded to the longest
        raws = [v.encode("utf-8") for v in value]
        width = max(max(len(r) for r in raws), 1)
        dt = bytes([0x13, 0, 0, 0]) + struct.pack("<I", width)
        data = b"".join(r.ljust(width, b"\x00") for r in raws)
        return dt, (len(raws),), data
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    shape = () if np.isscalar(value) or np.asarray(value).ndim == 0 else arr.shape
    return _dt_bytes(arr), shape, arr.tobytes()


def _attr_value_msg(name: str, value) -> bytes:
    return _attr_msg(name, *_attr_parts(value))


def _attr_body_v3(name: str, dt_raw: bytes, shape: tuple, data: bytes) -> bytes:
    """Version-3 attribute message body — the form dense storage keeps as
    fractal-heap objects (unpadded name/datatype/dataspace, a charset
    byte after the sizes)."""
    nm = name.encode("utf-8") + b"\x00"
    ds_raw = _ds_bytes(shape)
    body = struct.pack(
        "<BBHHHB", 3, 0, len(nm), len(dt_raw), len(ds_raw), 0
    )
    return body + nm + dt_raw + ds_raw + data


class _Alloc:
    """Bump allocator: reserve sized blocks first, render bytes second —
    OH messages embed addresses, so every size must be known up front."""

    def __init__(self):
        self.pos = 0
        self.blocks: list[tuple[int, int]] = []

    def reserve(self, size: int) -> int:
        addr = self.pos
        self.blocks.append((addr, size))
        self.pos += size
        return addr


def _object_header(messages: list[bytes]) -> bytes:
    block = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(block)) + block


def write(
    path: str,
    dims: dict,
    variables: dict,
    attrs: dict | None = None,
    chunks: dict | None = None,
    deflate: int | None = None,
    shuffle: bool = False,
    codec: str | None = None,
):
    """Write a netCDF-4-shaped HDF5 file.  ``variables`` maps name →
    (dim_names, ndarray, attrs), mirroring netcdf3.write.  A variable
    named like a dim and shaped [dim] becomes that dim's coordinate
    scale; other dims get hidden bookkeeping scale datasets.  ``chunks``
    maps variable name → chunk shape; deflate/shuffle apply to chunked
    variables only (HDF5 filters require chunked layout).
    ``codec``: "lz4" (registered filter 32004) or "blosc" (32001,
    blosc1 chunk with lz4 + byte-shuffle) as an alternative to
    deflate."""
    attrs = attrs or {}
    chunks = dict(chunks or {})
    if (deflate is not None or shuffle or codec) and not chunks:
        raise ValueError("deflate/shuffle need chunked variables (pass chunks=)")
    if codec not in (None, "lz4", "blosc"):
        raise ValueError(f"unknown codec {codec!r} (lz4/blosc)")
    if codec and deflate is not None:
        raise ValueError("codec and deflate are mutually exclusive")

    # normalize arrays to little-endian native layouts
    norm: dict[str, tuple[list, np.ndarray, dict]] = {}
    for nm, (vdims, arr, vattrs) in variables.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        if tuple(arr.shape) != tuple(dims[d] for d in vdims):
            raise ValueError(f"shape mismatch for variable {nm!r}")
        norm[nm] = (list(vdims), arr, dict(vattrs or {}))

    # object creation order: dim scales first (coordinate vars count)
    dim_names = list(dims)
    coord_vars = {d for d in dim_names if d in norm and norm[d][0] == [d]}
    for nm in norm:
        if nm in dims and nm not in coord_vars:
            raise ValueError(
                f"variable {nm!r} shares a dimension's name but is not its"
                " 1-D coordinate — the group would hold two objects named"
                f" {nm!r}"
            )
    hidden_scales = [d for d in dim_names if d not in coord_vars]
    objects = (
        [("scale", d) for d in dim_names]
        + [("var", nm) for nm in norm if nm not in coord_vars]
    )

    alloc = _Alloc()
    sb_addr = alloc.reserve(56 + 40)  # superblock + root symtab entry

    # --- root group machinery: local heap, B-tree, SNOD -----------------
    names = sorted(nm for _, nm in objects)
    heap_payload = bytearray(b"\x00" * 8)  # offset 0 = "" (b-tree low key)
    name_off: dict[str, int] = {}
    for nm in names:
        name_off[nm] = len(heap_payload)
        raw = nm.encode("utf-8") + b"\x00"
        heap_payload += raw + b"\x00" * (-len(raw) % 8)
    heap_hdr_addr = alloc.reserve(32)
    heap_data_addr = alloc.reserve(len(heap_payload))
    btree_addr = alloc.reserve(24 + 24)  # key0(8) + child(8) + key1(8)
    snod_addr = alloc.reserve(8 + 40 * len(names))
    root_msgs = [
        _msg(_M_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_hdr_addr))
    ] + [_attr_value_msg(k, v) for k, v in attrs.items()]
    root_oh_addr = alloc.reserve(len(_object_header(root_msgs)))

    # --- per-object headers: build message lists (addresses patched later)
    def data_plan(nm: str, arr: np.ndarray):
        """Return (layout kind, chunk_shape, [(sel, filtered bytes)])."""
        if nm in chunks:
            cs = tuple(int(c) for c in chunks[nm])
            if len(cs) != arr.ndim:
                raise ValueError(f"chunk rank mismatch for {nm!r}")
            pieces = []
            grid = [range(0, max(s, 1), c) for s, c in zip(arr.shape, cs)]
            idx = [()]
            for g in grid:
                idx = [t + (o,) for t in idx for o in g]
            for offs in idx:
                sel = tuple(slice(o, o + c) for o, c in zip(offs, cs))
                block = np.zeros(cs, arr.dtype)
                part = arr[sel]
                block[tuple(slice(0, s) for s in part.shape)] = part
                raw = block.tobytes()
                if shuffle:
                    es = arr.dtype.itemsize
                    n = len(raw) // es
                    raw = (
                        np.frombuffer(raw, np.uint8)
                        .reshape(n, es)
                        .T.tobytes()
                    )
                if deflate is not None:
                    raw = zlib.compress(raw, deflate)
                elif codec == "lz4":
                    raw = _hdf5_lz4_encode(raw)
                elif codec == "blosc":
                    from .blosc import blosc_compress

                    raw = blosc_compress(
                        raw, typesize=arr.dtype.itemsize,
                        codec="lz4", shuffle=True,
                    )
                pieces.append((offs, raw))
            return "chunked", cs, pieces
        return "contiguous", None, [((0,) * max(arr.ndim, 1), arr.tobytes())]

    plans: dict[str, tuple] = {}
    oh_addr: dict[str, int] = {}
    oh_msgs: dict[str, list] = {}
    gheap_slots: list[tuple[str, int, str]] = []  # (var, axis, dim name)
    dense_attrs: dict[str, list] = {}  # name -> attr_items past threshold

    for kind, nm in objects:
        if kind == "scale" and nm in coord_vars:
            vdims, arr, vattrs = norm[nm]
        elif kind == "scale":
            arr = np.zeros(dims[nm], np.float32)
            vdims, vattrs = [nm], {}
        else:
            vdims, arr, vattrs = norm[nm]
        plans[nm] = data_plan(nm, arr) + (arr,)

        msgs = [
            _msg(_M_DATASPACE, _ds_bytes(arr.shape)),
            _msg(_M_DATATYPE, _dt_bytes(arr)),
        ]
        lk, cs, pieces, _ = plans[nm]
        if lk == "chunked":
            filters = b""
            nf = (
                (1 if shuffle else 0)
                + (1 if deflate is not None else 0)
                + (1 if codec else 0)
            )
            if nf:
                fbody = struct.pack("<BB6x", 1, nf)
                if shuffle:
                    fbody += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack(
                        "<I4x", arr.dtype.itemsize
                    )
                if deflate is not None:
                    fbody += struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack(
                        "<I4x", deflate
                    )
                elif codec == "lz4":
                    # one cd_value: the filter's block size
                    fbody += struct.pack("<HHHH", 32004, 0, 1, 1)
                    fbody += struct.pack("<I4x", 1 << 20)
                elif codec == "blosc":
                    # H5Zblosc echoes 7 cd_values (versions, typesize,
                    # bufsize, clevel, shuffle, compcode) — readers
                    # take truth from the chunk header, as ours does
                    fbody += struct.pack("<HHHH", 32001, 0, 1, 7)
                    fbody += struct.pack(
                        "<7I4x", 2, 2, arr.dtype.itemsize,
                        int(np.prod(cs)) * arr.dtype.itemsize, 5, 1, 1,
                    )
                filters = _msg(_M_FILTERS, fbody)
            body = struct.pack("<BBB", 3, 2, arr.ndim + 1)
            body += struct.pack("<Q", 0)  # btree addr: patched
            body += b"".join(struct.pack("<I", c) for c in cs)
            body += struct.pack("<I", arr.dtype.itemsize)
            if filters:
                msgs.append(filters)
            msgs.append(_msg(_M_LAYOUT, body))
        else:
            msgs.append(
                _msg(_M_LAYOUT, struct.pack("<BBQQ", 3, 1, 0, arr.nbytes))
            )
        attr_items: list[tuple[str, bytes, tuple, bytes]] = []
        if kind == "scale":
            attr_items.append(("CLASS", *_attr_parts("DIMENSION_SCALE")))
            label = (
                nm
                if nm in coord_vars
                else f"{_NC_DIM_SCALE_HINT}.{dims[nm]:10d}"
            )
            attr_items.append(("NAME", *_attr_parts(label)))
            attr_items.append(
                ("_Netcdf4Dimid", *_attr_parts(np.int32(dim_names.index(nm))))
            )
        else:
            # DIMENSION_LIST: vlen-of-ref per axis, data lives in gheap
            for ax, d in enumerate(vdims):
                gheap_slots.append((nm, ax, d))
            attr_items.append(
                (
                    "DIMENSION_LIST",
                    _DT_VLEN_REF,
                    (len(vdims),),
                    b"\x00" * (16 * len(vdims)),  # patched at render
                )
            )
        for k, v in vattrs.items():
            attr_items.append((k, *_attr_parts(v)))
        if len(attr_items) > _DENSE_ATTR_THRESHOLD:
            # dense storage, exactly what the netCDF-4 library does past
            # its compact limit: attribute messages move to a fractal
            # heap + name B-tree v2; the header carries one ATTR_INFO
            # message (heap/btree addresses patched at render)
            dense_attrs[nm] = attr_items
            msgs.append(
                _msg(_M_ATTR_INFO, struct.pack("<BBQQ", 0, 0, 0, 0))
            )
        else:
            msgs += [_attr_msg(*item) for item in attr_items]
        oh_msgs[nm] = msgs
        oh_addr[nm] = alloc.reserve(len(_object_header(msgs)))

    # --- dense attribute storage blocks ----------------------------------
    dense_plan: dict[str, dict] = {}
    for nm, items in dense_attrs.items():
        bodies = [_attr_body_v3(*item) for item in items]
        if max(len(b) for b in bodies) > _DENSE_MAX_MANAGED:
            raise ValueError(
                f"attribute message over {_DENSE_MAX_MANAGED} bytes on"
                f" {nm!r} — would be a huge fractal-heap object"
            )
        total = sum(len(b) for b in bodies)
        block = 512  # heap space includes the 18-byte direct-block header
        while block < 18 + total:
            block *= 2
        node = max(2048, 10 + 17 * len(bodies))
        dense_plan[nm] = {
            "frhp": alloc.reserve(146),
            "fhdb": alloc.reserve(block),
            "bthd": alloc.reserve(38),
            "btlf": alloc.reserve(node),
            "block": block,
            "node": node,
        }

    # --- global heap for DIMENSION_LIST refs ----------------------------
    gheap_addr = None
    gheap_index: dict[tuple[str, int], int] = {}
    if gheap_slots:
        per = 16 + 8  # object header + one padded 8-byte ref
        csize = 16 + per * len(gheap_slots) + 16  # + free-space object
        gheap_addr = alloc.reserve(csize)
        for i, (nm, ax, _) in enumerate(gheap_slots):
            gheap_index[(nm, ax)] = i + 1

    # --- data blocks (and chunk B-trees) --------------------------------
    data_addr: dict[str, int] = {}
    chunk_btree: dict[str, int] = {}
    chunk_addrs: dict[str, list] = {}
    for kind, nm in objects:
        lk, cs, pieces, arr = plans[nm]
        if lk == "contiguous":
            data_addr[nm] = alloc.reserve(max(arr.nbytes, 1))
        else:
            key_size = 8 + 8 * (arr.ndim + 1)
            chunk_btree[nm] = alloc.reserve(
                24 + len(pieces) * (key_size + 8) + key_size
            )
            chunk_addrs[nm] = [alloc.reserve(max(len(raw), 1)) for _, raw in pieces]

    eof = alloc.pos

    # --- render ----------------------------------------------------------
    out = bytearray(eof)

    sb = MAGIC + struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 100, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    sb += struct.pack("<QQI4x", 0, root_oh_addr, 1)  # root symtab entry
    sb += struct.pack("<QQ", btree_addr, heap_hdr_addr)  # cached btree/heap
    out[sb_addr : sb_addr + len(sb)] = sb

    heap = b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_payload), 1, heap_data_addr)
    out[heap_hdr_addr : heap_hdr_addr + 32] = heap
    out[heap_data_addr : heap_data_addr + len(heap_payload)] = heap_payload

    bt = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
    bt += struct.pack("<QQQ", 0, snod_addr, name_off[names[-1]] if names else 0)
    out[btree_addr : btree_addr + len(bt)] = bt

    snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
    for nm in names:
        snod += struct.pack("<QQI4x16x", name_off[nm], oh_addr[nm], 0)
    out[snod_addr : snod_addr + len(snod)] = snod

    root_hdr = _object_header(root_msgs)
    out[root_oh_addr : root_oh_addr + len(root_hdr)] = root_hdr

    if gheap_addr is not None:
        g = b"GCOL" + struct.pack("<B3xQ", 1, 16 + (16 + 8) * len(gheap_slots) + 16)
        for i, (nm, ax, d) in enumerate(gheap_slots):
            g += struct.pack("<HH4xQ", i + 1, 1, 8) + struct.pack("<Q", oh_addr[d])
        g += struct.pack("<HH4xQ", 0, 0, 16)  # free-space terminator
        out[gheap_addr : gheap_addr + len(g)] = g

    for kind, nm in objects:
        lk, cs, pieces, arr = plans[nm]
        # patch layout address + DIMENSION_LIST payloads inside messages
        msgs = oh_msgs[nm]
        patched = []
        for m in msgs:
            mtype, msize = struct.unpack_from("<HH", m, 0)
            body = bytearray(m[8:])
            if mtype == _M_LAYOUT:
                if lk == "contiguous":
                    struct.pack_into("<Q", body, 2, data_addr[nm])
                else:
                    struct.pack_into("<Q", body, 3, chunk_btree[nm])
            elif mtype == _M_ATTRIBUTE and kind == "var":
                namesz, dtsz, dssz = struct.unpack_from("<HHH", body, 2)
                nm_end = 8 + (namesz + 7) // 8 * 8
                aname = bytes(body[8 : 8 + namesz]).split(b"\x00")[0]
                if aname == b"DIMENSION_LIST":
                    dpos = nm_end + (dtsz + 7) // 8 * 8 + (dssz + 7) // 8 * 8
                    vdims = norm[nm][0]
                    for ax in range(len(vdims)):
                        struct.pack_into(
                            "<IQI",
                            body,
                            dpos + 16 * ax,
                            1,
                            gheap_addr,
                            gheap_index[(nm, ax)],
                        )
            elif mtype == _M_ATTR_INFO:
                struct.pack_into(
                    "<QQ", body, 2,
                    dense_plan[nm]["frhp"], dense_plan[nm]["bthd"],
                )
            patched.append(m[:8] + bytes(body))
        hdr = _object_header(patched)
        out[oh_addr[nm] : oh_addr[nm] + len(hdr)] = hdr

        if lk == "contiguous":
            out[data_addr[nm] : data_addr[nm] + arr.nbytes] = arr.tobytes()
        else:
            key_size = 8 + 8 * (arr.ndim + 1)
            bt = b"TREE" + struct.pack(
                "<BBHQQ", 1, 0, len(pieces), _UNDEF, _UNDEF
            )
            for (offs, raw), caddr in zip(pieces, chunk_addrs[nm]):
                bt += struct.pack("<II", len(raw), 0)
                bt += b"".join(struct.pack("<Q", o) for o in offs)
                bt += struct.pack("<QQ", 0, caddr)
            # final (upper-bound) key
            bt += struct.pack("<II", 0, 0)
            bt += b"".join(struct.pack("<Q", s) for s in arr.shape)
            bt += struct.pack("<Q", 0)
            out[chunk_btree[nm] : chunk_btree[nm] + len(bt)] = bt
            for (offs, raw), caddr in zip(pieces, chunk_addrs[nm]):
                out[caddr : caddr + len(raw)] = raw

    # --- dense attribute blocks: fractal heap + name B-tree v2 ----------
    for nm, items in dense_attrs.items():
        d = dense_plan[nm]
        bodies: list[bytes] = []
        for aname, dt_raw, shape, data in items:
            if aname == "DIMENSION_LIST":
                vdims = norm[nm][0]
                data = b"".join(
                    struct.pack("<IQI", 1, gheap_addr, gheap_index[(nm, ax)])
                    for ax in range(len(vdims))
                )
            bodies.append(_attr_body_v3(aname, dt_raw, shape, data))
        # managed heap ids: offsets address the heap's LINEAR space, which
        # includes the direct block's own 18-byte header
        off, ids = 18, []
        for b in bodies:
            ids.append(
                bytes([0])
                + off.to_bytes(5, "little")
                + len(b).to_bytes(2, "little")
            )
            off += len(b)
        fhdb = (
            b"FHDB"
            + bytes([0])
            + struct.pack("<Q", d["frhp"])
            + (0).to_bytes(5, "little")  # block offset (40-bit heap space)
            + b"".join(bodies)
        )
        out[d["fhdb"] : d["fhdb"] + len(fhdb)] = fhdb
        # FRHP header: id len 8 = 1 flag + 5 offset (40-bit space) +
        # 2 length (max managed 4096); flags 0 → unchecksummed direct
        # blocks (spec-legal; the trailing-checksum blocks below get real
        # lookup3 checksums)
        hdr = b"FRHP" + bytes([0]) + struct.pack(
            "<HHBI", 8, 0, 0, _DENSE_MAX_MANAGED
        )
        hdr += struct.pack(
            "<QQQQQQQQQQQQ",
            0, _UNDEF,              # next huge id, huge-object btree
            d["block"] - off,       # free space in managed blocks
            _UNDEF,                 # free-space manager
            d["block"], d["block"],  # managed space, allocated space
            off,                    # direct-block iterator offset
            len(bodies),            # managed object count
            0, 0, 0, 0,             # huge/tiny sizes+counts
        )
        hdr += struct.pack(
            "<HQQHHQH",
            4,                       # table width
            d["block"],              # starting block size
            max(_DENSE_MAX_MANAGED, d["block"]),  # max direct block size
            40,                      # max heap size (bits)
            1,                       # starting rows in root indirect
            d["fhdb"],               # root block address
            0,                       # current rows: 0 = root IS direct
        )
        hdr += struct.pack("<I", _lookup3(bytes(hdr)))
        assert len(hdr) == 146
        out[d["frhp"] : d["frhp"] + 146] = hdr
        bt = b"BTHD" + bytes([0, 8]) + struct.pack(
            "<IHHBB", d["node"], 17, 0, 100, 40
        )
        bt += struct.pack("<QHQ", d["btlf"], len(bodies), len(bodies))
        bt += struct.pack("<I", _lookup3(bytes(bt)))
        assert len(bt) == 38
        out[d["bthd"] : d["bthd"] + 38] = bt
        # leaf records sorted by name hash (the tree's key); record =
        # heap id(8) + message flags(1) + creation order(4) + hash(4)
        recs = sorted(
            (
                _lookup3(item[0].encode("utf-8")),
                i,
                ids[i] + bytes([0]) + struct.pack("<I", i),
            )
            for i, item in enumerate(items)
        )
        leaf = b"BTLF" + bytes([0, 8]) + b"".join(
            r + struct.pack("<I", h) for h, _, r in recs
        )
        leaf += struct.pack("<I", _lookup3(bytes(leaf)))
        out[d["btlf"] : d["btlf"] + len(leaf)] = leaf

    with open(path, "wb") as f:
        f.write(out)
