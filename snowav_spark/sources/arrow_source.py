"""Spark 4 Python Data Source for Arrow IPC files (``snowav_arrow``) —
the interchange format training-data pipelines hand around (HuggingFace
datasets' on-disk form, Feather v2, `pa.ipc` streams).

Spark has no built-in Arrow IPC reader; the usual workaround is a
driver-side pandas round-trip that collapses at corpus scale.  This
source keeps it distributed AND zero-copy-ish: **partitions are files**
(one executor task opens one file) and ``read`` yields the file's
RecordBatches AS-IS — the Python data-source protocol ships Arrow
batches straight to the JVM, so rows never materialize as Python
objects and the batch layout the writer chose is preserved.

Schema comes from the FIRST file (alphabetically) at planning time —
one driver-side metadata read; every other file must carry an
identical schema (checked per task, loud mismatch error naming the
file — a silent cast would corrupt the corpus).  Both IPC framings are
sniffed per file: the random-access FILE format (magic ``ARROW1``,
Feather v2) and the STREAM format (continuation bytes), so a directory
of mixed framings reads fine.

Nested/dictionary columns pass through as their Spark equivalents via
``from_arrow_schema`` — whatever Arrow type Spark's own Arrow bridge
supports, this source supports.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_EXTS = (".arrow", ".feather", ".ipc")


def _ipc_files(dirpath: str) -> list[str]:
    if os.path.isfile(dirpath):
        return [dirpath]
    return sorted(
        os.path.join(dirpath, n)
        for n in os.listdir(dirpath)
        if n.lower().endswith(_EXTS) and not n.startswith((".", "_"))
    )


def _open_ipc(path: str):
    """A RecordBatch reader for either IPC framing, sniffed by magic."""
    import pyarrow as pa

    with open(path, "rb") as f:
        head = f.read(6)
    if head == b"ARROW1":  # random-access file format (Feather v2)
        return pa.ipc.open_file(pa.memory_map(path))
    return pa.ipc.open_stream(pa.memory_map(path))


def _batches(reader):
    import pyarrow as pa

    if isinstance(reader, pa.ipc.RecordBatchFileReader):
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:
        yield from reader


@dataclass
class _FilePartition(InputPartition):
    path: str


class ArrowIPCReader(DataSourceReader):
    def __init__(self, options: dict, schema_bytes: bytes | None = None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "snowav_arrow requires a load(path) file or directory"
            )
        # Capture the planning-time schema ONCE, serialized, so every
        # executor task validates against the schema the plan was built
        # with — re-deriving it per task would re-list the directory
        # and, if files appeared/vanished mid-job, silently validate
        # against a different baseline than the plan's.  When the
        # DataSource already derived it in schema(), reuse those bytes
        # (one planning read, one snapshot) instead of a second
        # listing+open; the Arrow form is kept — round-tripping through
        # the planned Spark StructType would lose dictionary encodings
        # and mis-flag matching files.
        self._schema_bytes = schema_bytes or (
            _schema_of(self.path).serialize().to_pybytes()
        )

    def partitions(self):
        files = _ipc_files(self.path)
        if not files:
            raise ValueError(f"no {_EXTS} files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        import pyarrow as pa

        reader = _open_ipc(partition.path)
        expected = pa.ipc.read_schema(pa.py_buffer(self._schema_bytes))
        if not reader.schema.equals(expected):
            raise ValueError(
                f"snowav_arrow: {partition.path} schema differs from the "
                f"directory's planning schema — got {reader.schema}, "
                f"expected {expected} (a silent cast would corrupt rows)"
            )
        yield from _batches(reader)


def _schema_of(path: str):
    files = _ipc_files(path)
    if not files:
        raise ValueError(f"no {_EXTS} files under {path}")
    return _open_ipc(files[0]).schema


class ArrowIPCDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snowav_arrow"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        arrow_schema = _schema_of(self.options.get("path"))
        self._schema_bytes = arrow_schema.serialize().to_pybytes()
        return from_arrow_schema(arrow_schema)

    def reader(self, schema: StructType) -> DataSourceReader:
        return ArrowIPCReader(
            self.options, getattr(self, "_schema_bytes", None)
        )


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(ArrowIPCDataSource)
