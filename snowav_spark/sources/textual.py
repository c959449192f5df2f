"""Line-oriented corpus sources: JSONL and CSV with corrupt-record
quarantine (EXT — no reference analog; the reference reads NetCDF only,
ref:snowav/framework/outputs.py).

Raw LLM training corpora overwhelmingly arrive as JSON-Lines (one document
object per line) or CSV drops, not parquet.  These readers make that
ingest path first-class while keeping the engine's scale rules:

- **Explicit schema, never inference.**  Schema inference is a full extra
  pass over the data (at 100 TB: a second 100 TB scan before the first
  byte of real work) and can silently widen types between drops.  Callers
  pass a StructType (or use DOCUMENTS_SCHEMA); the reader appends the
  corrupt-record column itself.
- **PERMISSIVE + quarantine, never fail-or-drop.**  A single malformed
  line in a billion-line corpus must neither abort the job (FAILFAST)
  nor vanish silently (DROPMALFORMED).  Malformed lines surface in
  ``_corrupt_record`` and ``split_quarantine`` routes them to a bad-rows
  DataFrame for auditing — the same delete-nothing posture as the
  dedup operators (flag, don't destroy).
- **Line-splittable parallelism.**  Uncompressed (or zstd/bzip2) JSONL
  and CSV split by line offset, so `spark.sql.files.maxPartitionBytes`
  governs task granularity exactly as for parquet.  gzip is NOT
  splittable — one whole .json.gz file becomes one task; shard source
  files well below partition size or recompress before ingest.
- Parsing happens JVM-side (Jackson / Univocity) inside the scan — no
  Python in the loop; column pruning still reaches the parser
  (unreferenced JSON fields are never materialized).
- **text-source + from_json, not the json file source.**  The file
  sources ban any query whose referenced columns are only the internal
  corrupt-record column ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
  _COLUMN] — e.g. ``bad.count()``), with "cache the whole scan" as the
  documented workaround — unacceptable at corpus scale.  Reading raw
  lines and parsing via ``from_json``/``from_csv`` (same Jackson/
  Univocity code, same PERMISSIVE semantics) has no such restriction,
  and the raw line rides along for free as the quarantine payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# The engine's canonical documents shape (FIXTURES.md): explicit so JSONL
# drops parse straight into the same operators the parquet fixtures feed.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType, corrupt_col: str) -> T.StructType:
    if corrupt_col in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )


def _parse_lines(
    lines: DataFrame,
    parser,  # F.from_json | F.from_csv
    schema: T.StructType,
    corrupt_col: str,
) -> DataFrame:
    # Blank / whitespace-only lines are record SEPARATORS in line-oriented
    # formats (trailing newlines, blank-line-delimited drops), not
    # records: skip them entirely.  Left in, from_json('') returns a NULL
    # struct with the corrupt column unset, and each blank line would
    # surface as a phantom all-NULL document on the CLEAN side of the
    # quarantine split (found in review).
    lines = lines.filter(F.trim(F.col("value")) != "")
    full = _with_corrupt(schema, corrupt_col)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col}
    if parser is F.from_csv:
        # from_csv takes a DDL string, not a StructType
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in full.fields
        )
        parsed = lines.select(parser(F.col("value"), ddl, opts).alias("_d"), "value")
    else:
        parsed = lines.select(parser(F.col("value"), full, opts).alias("_d"), "value")
    # Belt-and-braces for any other input the parser maps to a NULL
    # struct without setting the corrupt column (e.g. the bare JSON
    # literal `null`): a non-blank line that produced no struct is
    # corrupt by definition — carry the raw line.
    corrupt = F.coalesce(
        F.col(f"_d.{corrupt_col}"),
        F.when(F.col("_d").isNull(), F.col("value")),
    )
    return parsed.select(
        *[F.col(f"_d.{f.name}").alias(f.name) for f in schema.fields],
        corrupt.alias(corrupt_col),
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read a JSON-Lines corpus.  Rows that fail to parse (or whose fields
    fail the schema's types) come back with data columns NULL and the raw
    line preserved in ``corrupt_col``; well-formed rows have it NULL."""
    return _parse_lines(spark.read.text(path), F.from_json, schema, corrupt_col)


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read a CSV corpus drop with the same quarantine contract as
    ``read_jsonl``.

    ``header=True`` drops lines equal to the schema's comma-joined field
    names (the form Spark's own CSV writer emits) — a per-line filter,
    because the text source has no per-file header notion.  multiLine
    records are unsupported by design: they make files non-splittable;
    corpora with embedded newlines should arrive as JSONL (escaping keeps
    one record per line)."""
    lines = spark.read.text(path)
    if header:
        header_line = ",".join(f.name for f in schema.fields)
        lines = lines.filter(F.trim(F.col("value")) != header_line)
    return _parse_lines(lines, F.from_csv, schema, corrupt_col)


def split_quarantine(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_marker_col, quarantined_rows).

    The quarantine side keeps whatever fields DID parse plus the raw
    line in the marker column — audit, then archive.  The split is two
    filters over one lazy scan; both sides stay fully queryable
    (including bare ``bad.count()``) because the readers parse via
    from_json/from_csv rather than the file sources' restricted internal
    corrupt-record column.
    """
    bad = df.filter(F.col(corrupt_col).isNotNull())
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    return good, bad


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write a corpus as JSONL shards (one object per line, one file per
    partition).  Prefer ``compression='zstd'`` (splittable on re-read,
    unlike gzip).  Shard count = partition count: repartition upstream to
    the shard size the consumer wants."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
