"""The results store: partitioned parquet sink with the reference's
idempotent re-run and incremental-append semantics.

Reference parity: the reference writes long-format rows into SQLite/MySQL
via SQLAlchemy (ref:snowav/database/database.py::insert) and implements
re-runs by DELETEing rows for (run_name, date range) before inserting
(ref:database.py::delete); its daily AWSM coupling appends only dates not
yet present (existing-records check).  SURVEY.md §2.1/§3 EP2.

Spark-first mapping:

- store = parquet partitioned by ``(run_id, date)`` — partition pruning
  makes every date-ranged read touch only the requested days, which is the
  100 TB access pattern;
- delete-then-insert → **dynamic partition overwrite** (only partitions
  present in the written frame are replaced; engine default conf);
- existing-records check → **anti-join against the store's partition
  values** (reading just partition columns costs metadata, not data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RESULTS_COLS = ("run_id", "date", "basin_id", "variable", "band", "value")


class ResultsStore:
    """Partitioned long-format results store (the reference's Results
    table re-expressed as a parquet lake)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Idempotent write: with the engine's dynamic partitionOverwrite
        conf, 'overwrite' replaces only the (run_id, date) partitions
        present in ``df`` — the reference's delete-then-insert in one
        atomic-per-partition action."""
        (
            df.write.mode(mode)
            .partitionBy("run_id", "date")
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def existing_dates(self, run_id: str) -> DataFrame:
        """Distinct dates already present for a run — partition-column-only
        scan (no data files read beyond footers)."""
        return (
            self.read()
            .filter(F.col("run_id") == run_id)
            .select("date")
            .distinct()
        )

    def append_missing(self, df: DataFrame, run_id: str) -> None:
        """EP2 incremental semantics: append only rows whose date is not
        yet in the store for this run (anti-join), then write those
        partitions.  Re-running the same day twice is a no-op."""
        try:
            existing = self.existing_dates(run_id)
        except Exception:
            # first write — nothing to skip
            self.write(df)
            return
        fresh = df.join(existing, "date", "left_anti")
        if fresh.limit(1).count() == 0:
            return
        self.write(fresh)

    def merge_upsert(self, updates: DataFrame, keys: tuple[str, ...]) -> None:
        """MERGE INTO semantics on the parquet store: rows matching
        ``keys`` are replaced by the update, everything else in the
        touched partitions survives.  The scale shape: partition pruning
        first — only (run_id, date) partitions PRESENT IN THE UPDATE are
        ever read (a semi-join of the store against the update's distinct
        partition values, which the scan prunes on), then an anti-join on
        the business keys drops the superseded rows, union with the
        updates, and dynamic partition overwrite writes back just those
        partitions.  Partitions the update doesn't touch are never read
        or written — the cost is proportional to the update's partition
        footprint, not the store size."""
        try:
            store = self.read()
        except Exception:
            self.write(updates)
            return
        parts = updates.select("run_id", "date").distinct()
        touched = store.join(F.broadcast(parts), ["run_id", "date"], "semi")
        survivors = touched.join(
            updates.select(*keys).distinct(), list(keys), "left_anti"
        )
        self.write(survivors.unionByName(updates))

    def collect_frame(
        self,
        run_id: str,
        variable: str,
        basins: list[str],
        start,
        end,
    ):
        """The reference's ``collect()`` read path: filter the store by
        (run, variable, date range) — all pruned at the scan — and pivot
        bands × basins into a driver-sized pandas report frame."""
        df = (
            self.read()
            .filter(
                (F.col("run_id") == run_id)
                & (F.col("variable") == variable)
                & (F.col("date") >= F.lit(start))
                & (F.col("date") < F.lit(end))
            )
        )
        wide = (
            df.groupBy("band")
            .pivot("basin_id", basins)
            .agg(F.round(F.sum("value"), 6))
            .orderBy("band")
        )
        return wide.toPandas()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: co-locates future joins/aggregations on
    ``bucket_col`` so they run exchange-free (SURVEY §4 / prompt:
    'bucketing for co-located joins').

    At 100 TB, two fact tables bucketed identically on their join key
    sort-merge join with ZERO shuffle — the single biggest join win
    available by layout alone.  Bucket count should match target
    parallelism (buckets are the unit of join task assignment).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Format-agnostic columnar write (parquet or ORC — both ship with
    Spark and both carry column stats + predicate pushdown).  ORC matters
    for interop with Hive-era lakes; everything downstream (partition
    pruning, filter pushdown, column pruning) works identically, which
    test_columnar_sources asserts on the ORC plan."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    return spark.read.format(fmt).load(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-files compaction — the table-maintenance job every streaming
    or incremental-append lake needs at 100 TB: micro-batch appends leave
    thousands of KB-sized files per partition, and scan cost becomes
    task-scheduling overhead instead of IO.

    Rewrites the dataset with files re-sized to ``target_rows_per_file``
    (repartitioned BY the partition columns so each output task writes
    into exactly one partition — no shuffle-per-file explosion, no
    cross-partition file mixing), staging into a sibling directory and
    swapping atomically-enough for a single-writer lake (write staged →
    move old → move staged → delete old).  Returns the number of files
    after compaction.

    On a real cluster this is the nightly OPTIMIZE job; the rewrite cost
    is one scan + one write of the live partitions, independent of how
    fragmented the input was.
    """
    df = read_columnar(spark, path, fmt)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    if partition_by:
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n_files)

    import os
    import shutil

    staged = path.rstrip("/") + "._compact_staged"
    old = path.rstrip("/") + "._compact_old"
    write_columnar(out, staged, fmt, partition_by)
    shutil.move(path, old)
    shutil.move(staged, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(f".{fmt}")
    )


def write_csv_report(df: DataFrame, path: str) -> None:
    """CSV export analog of ref:snowav/plotting/write_properties.py —
    coalesced to one file because report tables are driver-sized by
    construction (never use for big frames)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def morton_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 16
) -> Column:
    """Z-order (Morton) key over ``cols``: each column is min/max-scaled
    into ``bits_per_col`` bits from one tiny stats aggregate computed on
    ``df`` itself, then the bit strings are interleaved round-robin — a
    pure codegen expression tree (shift/and/or), no UDF.

    Interleaving makes the 1-D sort order locality-preserving in EVERY
    keyed dimension at once: rows close in any column land in few files,
    so parquet min/max footer stats prune multi-dimensional predicates —
    lexicographic sort only ever prunes its leading column.
    ``bits_per_col · len(cols)`` must stay < 63 (the key is one long).
    """
    total = bits_per_col * len(cols)
    if total >= 63:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits = {total} >= 63"
        )
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("double").alias(f"_min_{c}"),
                F.max(c).cast("double").alias(f"_max_{c}"),
            )
        ]
    ).collect()[0]
    top = (1 << bits_per_col) - 1
    z = F.lit(0).cast("long")
    scaled = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        # All-NULL column: min/max come back None — degrade to a
        # constant dimension (zero bits of spread) instead of crashing.
        if lo is None:
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor(
                    # NULL cell → curve origin for that dimension (NULLs
                    # cluster together, which is also what their footer
                    # stats want); without the coalesce a single NULL
                    # poisons the whole interleaved key to NULL.
                    (F.coalesce(F.col(c).cast("double"), F.lit(lo)) - F.lit(lo))
                    / F.lit(span)
                    * top
                ),
            ).cast("long")
        )
    for i in range(bits_per_col):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits_per_col: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``
    — the data-layout optimization for tables filtered on SEVERAL
    dimensions (user AND day, basin AND band): range-partition on the
    Morton key (sampled split points, no single-reducer sort), sort
    within partitions, one file per partition.  Readers then skip whole
    files from footer min/max stats for predicates on ANY of ``cols``.
    The key is layout-only — it is dropped from the written schema, so
    the files are plan-compatible with an unclustered write."""
    keyed = df.withColumn("_zkey", morton_key(df, cols, bits_per_col))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
