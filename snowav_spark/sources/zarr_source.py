"""Spark 4 Python Data Source for Zarr v2 stores → tall rows
(``snowav_zarr``).

The distributed half of sources/zarr.py: **partitions are chunks**.
Zarr's layout — one flat file per chunk, coordinates in the filename,
all shape/dtype/codec facts in one driver-readable JSON — means the
planner needs exactly one tiny metadata read, and every executor task
then opens exactly one chunk file: no byte-range math, no B-tree walks,
no driver-side array loads (contrast ingest.read_netcdf_outputs, where
HDF5 chunk addressing forces per-file driver parsing).  That is the
shape that scales to a 100 TB store: millions of chunk tasks, each
O(chunk) memory, retried independently.

``load(path)`` accepts either a single array directory (variable name =
directory basename) or a group directory (every member array becomes
rows under its own ``variable``).  Arrays of 1–3 dimensions map onto
the tall (variable, t, y, x, value) schema the raster/netcdf sources
already emit — a 2-D array uses (y, x) with t=0, a 1-D array uses x —
so downstream zonal/banded operators work unchanged regardless of
which container format the model run produced.  ``fill_value`` cells
and non-finite values surface as NaN (the masked_to_nan convention);
rows are NOT dropped, matching the other grid sources (out-of-basin
cells stay addressable).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ZARR_SCHEMA = StructType(
    [
        StructField("variable", StringType(), False),
        StructField("t", IntegerType(), False),
        StructField("y", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("value", DoubleType(), True),
    ]
)


@dataclass
class _ChunkPartition(InputPartition):
    array_dir: str
    variable: str
    coord: tuple  # (inner-)chunk grid coordinate
    # the full .zarray dict rides along so executors never re-read
    # metadata (it is a few hundred bytes; the chunk is the payload)
    meta: dict
    # sharded stores only: the planner-resolved (shard_file, offset,
    # nbytes) byte range of this inner chunk — the shard index is
    # parsed ONCE PER SHARD at planning, so an executor task is a
    # single pread, never an index fetch.  None on a sharded store
    # means the index marked the chunk missing (fill); unsharded
    # partitions ignore the field.
    byterange: tuple | None = None


def _array_partitions(
    array_dir: str, variable: str, meta: dict | None = None
) -> list:
    """``meta`` may be supplied from a consolidated ``.zmetadata``
    read, saving the per-array metadata fetch at planning."""
    import os as _os

    from snowav_spark.sources import zarr

    if meta is None:
        meta = zarr.read_array_meta(array_dir)
    ndim = len(meta["shape"])
    if not 1 <= ndim <= 3:
        raise ValueError(
            f"snowav_zarr maps 1-3 dim arrays onto (t, y, x); "
            f"{array_dir} has {ndim} dims"
        )
    if meta.get("_shard") is None:
        return [
            _ChunkPartition(array_dir, variable, coord, meta)
            for coord in zarr._chunk_grid(meta)
        ]
    # Sharded store: group the global inner grid by shard so each
    # shard's index footer is read exactly once here at planning —
    # partitions carry resolved byte ranges (partition = inner chunk,
    # fetch = one range read within the shard object).
    by_shard: dict[tuple, list[tuple]] = {}
    for coord in zarr._chunk_grid(meta):
        scoord, _ = zarr.split_shard_coord(meta, coord)
        by_shard.setdefault(scoord, []).append(coord)
    parts = []
    for scoord, coords in sorted(by_shard.items()):
        fp = zarr.chunk_file(array_dir, meta, scoord)
        idx = (
            zarr.read_shard_index(fp, meta)
            if _os.path.exists(fp)
            else None
        )
        for coord in coords:
            rng = None
            if idx is not None:
                _, inner = zarr.split_shard_coord(meta, coord)
                off, ln = (int(v) for v in idx[inner])
                if off != zarr.SHARD_MISSING and ln != zarr.SHARD_MISSING:
                    rng = (fp, off, ln)
            parts.append(
                _ChunkPartition(array_dir, variable, coord, meta, rng)
            )
    return parts


class ZarrReader(DataSourceReader):
    """Batch reader: one (inner-)chunk = one input partition.

    Coordinate predicate PUSHDOWN (round 10): filters on the integer
    dim columns ``t``/``y``/``x`` and on ``variable`` prune the chunk
    grid at PLANNING time — a ``WHERE t >= 100`` over a 10-year daily
    archive plans only the intersecting chunk partitions instead of
    scanning every chunk and filtering rows.  This is the chunk-grid
    equivalent of parquet partition pruning, and it is what makes a
    time-sliced query on a 100 TB store proportional to the slice, not
    the archive.  The pushdown is INEXACT (a chunk spans a coordinate
    range), so every accepted filter is also returned to Spark for
    row-level re-evaluation — same contract as parquet row-group
    skipping."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snowav_zarr requires a load(path) directory")
        # per-dim [lo, hi] closed bounds accumulated by pushFilters
        # (None = unbounded); variable membership set (None = all)
        self._bounds: dict = {"t": [None, None], "y": [None, None],
                              "x": [None, None]}
        self._vars: set | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        def tighten(col, lo=None, hi=None):
            b = self._bounds[col]
            if lo is not None:
                b[0] = lo if b[0] is None else max(b[0], lo)
            if hi is not None:
                b[1] = hi if b[1] is None else min(b[1], hi)

        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            val = getattr(f, "value", None)
            if col in ("t", "y", "x") and isinstance(val, int):
                if isinstance(f, EqualTo):
                    tighten(col, lo=val, hi=val)
                elif isinstance(f, GreaterThan):
                    tighten(col, lo=val + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    tighten(col, lo=val)
                elif isinstance(f, LessThan):
                    tighten(col, hi=val - 1)
                elif isinstance(f, LessThanOrEqual):
                    tighten(col, hi=val)
            elif (
                col == "variable"
                and isinstance(f, EqualTo)
                and isinstance(val, str)
            ):
                v = {val}
                self._vars = v if self._vars is None else self._vars & v
            elif (
                col == "variable"
                and isinstance(f, In)
                and all(isinstance(x, str) for x in val)
            ):
                v = set(val)
                self._vars = v if self._vars is None else self._vars & v
            # chunk granularity is coarser than rows: EVERY filter —
            # pushed or not — goes back to Spark for row-level
            # re-evaluation (inexact pushdown)
            yield f

    def _keep(self, meta: dict, coord: tuple) -> bool:
        """Does this chunk's coordinate box intersect the pushed
        bounds?  Dims map onto (t, y, x) RIGHT-ALIGNED, exactly as
        _chunk_block pads: a 2-d array is (y, x), 1-d is (x,)."""
        dims = ("t", "y", "x")[3 - len(meta["shape"]):]
        for d, i, c, s in zip(
            dims, coord, meta["chunks"], meta["shape"]
        ):
            lo, hi = self._bounds[d]
            c0 = i * c
            c1 = min(c0 + c, s) - 1  # last live index in this chunk
            if (lo is not None and c1 < lo) or (
                hi is not None and c0 > hi
            ):
                return False
        return True

    def _prune(self, parts: list) -> list:
        kept = [
            p for p in parts if self._keep(p.meta, tuple(p.coord))
        ]
        return kept

    def partitions(self):
        from snowav_spark.sources import zarr

        if zarr.is_zarr_array(self.path):
            name = os.path.basename(os.path.normpath(self.path))
            if self._vars is not None and name not in self._vars:
                return [_ChunkPartition("", name, (), {"_empty": True})]
            parts = self._prune(_array_partitions(self.path, name))
        elif zarr.is_zarr_group(self.path):
            # consolidated .zmetadata (when present): member names AND
            # every array descriptor from ONE read — planning a
            # V-variable group costs one GET, not 1 listing + V GETs
            cons = zarr.read_consolidated(self.path)
            names = (
                sorted(cons) if cons is not None
                else zarr.group_arrays(self.path)
            )
            if not names:
                raise ValueError(f"zarr group {self.path} has no arrays")
            parts = []
            for name in names:
                if self._vars is not None and name not in self._vars:
                    continue
                parts.extend(
                    self._prune(
                        _array_partitions(
                            os.path.join(self.path, name),
                            name,
                            meta=cons[name] if cons else None,
                        )
                    )
                )
        else:
            raise ValueError(
                f"{self.path} is neither a zarr array (.zarray) nor a "
                "group (.zgroup)"
            )
        if not parts:
            # Spark requires >= 1 partition; emit one empty marker
            parts = [_ChunkPartition("", "", (), {"_empty": True})]
        return parts

    def read(self, partition: _ChunkPartition):
        if partition.meta.get("_empty"):
            return  # pruned-to-nothing marker partition: zero rows
        yield from _chunk_batches(
            partition.array_dir,
            partition.variable,
            tuple(partition.coord),
            partition.meta,
            byterange=partition.byterange,
        )


def _chunk_block(
    array_dir: str,
    variable: str,
    coord: tuple,
    meta: dict,
    byterange: tuple | None = None,
):
    """Decode one chunk: edge trim, fill/non-finite → NaN (the
    masked_to_nan rule), padded to 3-D, plus its global (t, y, x)
    offsets — the shared kernel under both emission forms.  On a
    sharded store the planner already resolved the byte range, so this
    is one pread within the shard file (fill chunk when None)."""
    import numpy as np

    from snowav_spark.sources import zarr

    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    if meta.get("_shard") is not None:
        block = zarr.read_inner_chunk(byterange, meta)
    else:
        block = zarr.read_chunk(array_dir, meta, coord)
    lens = tuple(
        min((i + 1) * c, s) - i * c
        for i, c, s in zip(coord, chunks, shape)
    )
    block = np.asarray(
        block[tuple(slice(0, n) for n in lens)], dtype=np.float64
    ).copy()
    fill = meta.get("fill_value")
    if isinstance(fill, str):
        fill = float(fill)
    if fill is not None and np.isfinite(fill):
        block[block == fill] = np.nan
    block[~np.isfinite(block)] = np.nan
    offs = [i * c for i, c in zip(coord, chunks)]
    while len(offs) < 3:
        offs.insert(0, 0)
        block = block[np.newaxis, ...]
    return block, tuple(offs)


def _chunk_batches(
    array_dir: str,
    variable: str,
    coord: tuple,
    meta: dict,
    byterange: tuple | None = None,
):
    """One Arrow RecordBatch per chunk — rows never materialize as
    Python objects (the netcdf_source discipline: columnar all the way
    from the NumPy block to the JVM; measured ~8× over per-cell
    tuple yields on the scale probe)."""
    import numpy as np
    import pyarrow as pa

    block, (t0, y0, x0) = _chunk_block(
        array_dir, variable, coord, meta, byterange=byterange
    )
    nt, ny, nx = block.shape
    ts, ys, xs = np.indices((nt, ny, nx))
    vals = block.ravel()
    n = vals.size
    # the constant variable column is dictionary-encoded (one string +
    # an int32 index vector) — a [variable] * n Python list would
    # allocate n transient objects per chunk on the hot scan path
    var_col = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([variable])
    ).cast(pa.string())
    yield pa.record_batch(
        [
            var_col,
            pa.array((ts.ravel() + t0).astype("int32"), pa.int32()),
            pa.array((ys.ravel() + y0).astype("int32"), pa.int32()),
            pa.array((xs.ravel() + x0).astype("int32"), pa.int32()),
            pa.array(vals, pa.float64(), mask=np.isnan(vals)),
        ],
        names=["variable", "t", "y", "x", "value"],
    )


def _chunk_rows(
    array_dir: str,
    variable: str,
    coord: tuple,
    meta: dict,
    byterange: tuple | None = None,
):
    """Tuple-row emission of one chunk — the STREAMING path only: the
    simple stream-reader protocol reads on the driver and pickles plain
    rows through its offset replay, so Arrow batches don't apply.

    Fill/non-finite cells emit SQL NULL (None), matching the batch
    path's masked Arrow array and the netcdf stream convention — the
    same store must aggregate identically read batch vs stream (a NaN
    here would poison avg/sum that NULL correctly skips)."""
    block, (t0, y0, x0) = _chunk_block(
        array_dir, variable, coord, meta, byterange=byterange
    )
    for ti in range(block.shape[0]):
        for yi in range(block.shape[1]):
            row = block[ti, yi]
            for xi in range(block.shape[2]):
                v = float(row[xi])
                yield (
                    variable,
                    t0 + ti,
                    y0 + yi,
                    x0 + xi,
                    None if v != v else v,
                )


class ZarrStreamReader(SimpleDataSourceStreamReader):
    """Streaming ingest of a GROWING Zarr store (EP2 for cloud-native
    output): the model appends timesteps by writing new chunk files and
    bumping ``.zarray`` shape — each micro-batch reads exactly the
    chunk files that appeared since the last offset.

    Offset = per-array SET of seen chunk filenames (the raster source's
    scheme: exact under any arrival order, bounded by the store's chunk
    count; a high-water mark would be unsound because chunk names sort
    lexically, not by time).  Metadata is re-read every batch so
    coordinates land against the CURRENT shape.  Assumes chunk-aligned
    appends (the standard growth pattern — an append that REWRITES a
    partial edge chunk keeps its filename and would be skipped; rechunk
    or use the batch source for non-aligned growth).

    Sharded stores (``sharding_indexed``) stream at SHARD granularity:
    a new shard file is one offset entry whose index footer is parsed
    once and whose inner chunks all emit in that micro-batch.  The
    alignment assumption scales up accordingly — appends must be
    SHARD-aligned (a rewritten partial edge shard keeps its filename
    and would be skipped)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snowav_zarr requires a load(path) directory")

    def _arrays(self) -> list:
        from snowav_spark.sources import zarr

        if zarr.is_zarr_array(self.path):
            name = os.path.basename(os.path.normpath(self.path))
            pairs = [(name, self.path)]
        else:
            pairs = [
                (n, os.path.join(self.path, n))
                for n in zarr.group_arrays(self.path)
            ]
        for _, adir in pairs:
            meta = zarr.read_array_meta(adir)
            sep = (
                meta["_key"][1]
                if meta.get("_key") is not None
                else meta.get("dimension_separator", ".")
            )
            if sep == "/":
                raise ValueError(
                    "snowav_zarr streaming supports '.'-separated chunk "
                    f"names only (flat listing = the offset set); {adir} "
                    "uses nested '/' directories — use the batch source"
                )
        return pairs

    @staticmethod
    def _chunk_names(array_dir: str) -> set:
        return {
            n
            for n in os.listdir(array_dir)
            if not n.startswith((".", "_"))
            and os.path.isfile(os.path.join(array_dir, n))
        }

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def _rows_for(self, per_array: dict) -> list:
        from itertools import product

        from snowav_spark.sources import zarr

        rows: list = []
        for var, adir in self._arrays():
            names = per_array.get(var)
            if not names:
                continue
            meta = zarr.read_array_meta(adir)
            shard = meta.get("_shard")
            for name in sorted(names):
                coord = zarr.parse_chunk_name(name, meta)
                if coord is None:
                    continue
                if shard is None:
                    rows.extend(_chunk_rows(adir, var, coord, meta))
                    continue
                # sharded: the file IS a shard — parse its index once,
                # emit every inner chunk inside the global grid.  A
                # shard recorded in a prior offset may have VANISHED
                # since (compaction, eviction): degrade to fill rows
                # for its in-grid inner chunks, matching read_chunk's
                # missing-file semantics on the unsharded path, instead
                # of killing the stream with FileNotFoundError
                # (ADVICE r10).
                fp = os.path.join(adir, name)
                idx = (
                    zarr.read_shard_index(fp, meta)
                    if os.path.exists(fp)
                    else None
                )
                counts = [
                    -(-s // c)
                    for s, c in zip(meta["shape"], meta["chunks"])
                ]
                for icoord in product(
                    *[range(n) for n in shard["cps"]]
                ):
                    inner = tuple(
                        sc * n + i
                        for sc, n, i in zip(coord, shard["cps"], icoord)
                    )
                    if any(gi >= n for gi, n in zip(inner, counts)):
                        continue  # padding outside the array
                    if idx is None:
                        rng = None  # vanished shard: fill-value rows
                    else:
                        off, ln = (int(v) for v in idx[icoord])
                        rng = (
                            None
                            if off == zarr.SHARD_MISSING
                            or ln == zarr.SHARD_MISSING
                            else (fp, off, ln)
                        )
                    rows.extend(
                        _chunk_rows(
                            adir, var, inner, meta, byterange=rng
                        )
                    )
        return rows

    @staticmethod
    def _covered(name: str, meta: dict) -> bool:
        """True iff ``name`` parses as a chunk key (any metadata files
        are skipped) whose coordinate lies inside the CURRENT chunk
        grid — the SHARD grid on sharded stores, where file names
        address shards.  Writers append chunk files BEFORE bumping the
        shape (the natural order); a trigger firing in between must
        leave the not-yet-covered chunk UNSEEN — folding it into the
        offset while the stale shape yields zero rows would lose the
        chunk forever."""
        from snowav_spark.sources import zarr

        coord = zarr.parse_chunk_name(name, meta)
        if coord is None:
            return False
        unit = (
            meta["_shard"]["shape"]
            if meta.get("_shard") is not None
            else meta["chunks"]
        )
        counts = [-(-s // c) for s, c in zip(meta["shape"], unit)]
        return all(i < n for i, n in zip(coord, counts))

    def read(self, start: dict):
        from snowav_spark.sources import zarr

        seen = {k: set(v) for k, v in start.get("seen", {}).items()}
        new: dict = {}
        for var, adir in self._arrays():
            meta = zarr.read_array_meta(adir)
            fresh = {
                n
                for n in self._chunk_names(adir) - seen.get(var, set())
                if self._covered(n, meta)
            }
            if fresh:
                new[var] = fresh
        if not new:
            return iter([]), dict(start)
        end = {
            "seen": {
                var: sorted(seen.get(var, set()) | new.get(var, set()))
                for var in set(seen) | set(new)
            }
        }
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        s = {k: set(v) for k, v in start.get("seen", {}).items()}
        e = {k: set(v) for k, v in end.get("seen", {}).items()}
        delta = {k: e[k] - s.get(k, set()) for k in e}
        return iter(self._rows_for(delta))

    def commit(self, end: dict) -> None:
        pass


class ZarrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snowav_zarr"

    def schema(self) -> StructType:
        return ZARR_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return ZarrReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return ZarrStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(ZarrDataSource)
