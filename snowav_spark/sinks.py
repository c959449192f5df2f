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

from pyspark.sql import DataFrame, SparkSession
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


def write_csv_report(df: DataFrame, path: str) -> None:
    """CSV export analog of ref:snowav/plotting/write_properties.py —
    coalesced to one file because report tables are driver-sized by
    construction (never use for big frames)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
