"""Table loaders for the driver fixtures (and, by the same path, any
partitioned parquet lake).

Reference parity: ref:snowav/framework/outputs.py reads NetCDF model output
eagerly into RAM; ref:snowav/utils/utilities.py::masks reads the static topo
dims.  Here every load is a lazy ``spark.read.parquet`` — column pruning and
predicate pushdown reach the scan via Catalyst, and nothing materializes
until an action.

Schema fixes applied on read (FIXTURES.md "ingestion caveats"):

- ``events.ts`` is INT64 TIMESTAMP(NANOS) in the file.  Spark 4 throws
  [PARQUET_TYPE_ILLEGAL] unless ``spark.sql.legacy.parquet.nanosAsLong=true``
  is set, in which case it surfaces as a long.  We rebuild a true timestamp
  with ``timestamp_micros(ts div 1000)`` — integer division, exact, and
  byte-identical to what DuckDB sees at microsecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowav_spark.session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Per-session DataFrame cache: repeated loads of the same table otherwise
# re-list the directory and re-read parquet footers on every call — fixed
# overhead that dominates sub-100 ms queries (top-k, digest dedup).  The
# cached object is a lazy plan, not data — BUT its file listing is frozen
# at first load, so this is only for immutable inputs (the read-only
# fixture dirs).  Mutable stores (ResultsStore) bypass this loader; call
# clear_cache() after rewriting a directory you loaded through here.
# plan cache: value carries a weakref to the owning session so a hit is
# honored only when the ENTRY'S session is the caller's live session —
# id() alone can be recycled by CPython onto a NEW session after the old
# one is collected, resurrecting plans bound to a dead SparkContext
_CACHE: dict[tuple[int, str, str], tuple[object, DataFrame]] = {}


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows (centroid tables, codebook sidecars, id lists —
    KB-sized by construction) as a ONE-partition DataFrame.

    ``createDataFrame(list, schema)`` parallelizes the rows into
    ``defaultParallelism`` pickled RDD slices (32 on the bench box) even
    for a 1-row table.  Every consumer then pays one Python-worker
    round-trip PER SLICE: a ``coalesce(1)`` write fuses all slices into
    a single task that visits the Python runner 32 times SERIALLY
    (measured 3.5–4.5 s for a 64-row sidecar vs 0.25 s on one slice),
    and a broadcast build computes all 32 slices as separate tasks
    (measured 1.2 s vs 0.28 s).  Parallelizing on ONE slice is the
    right layout at any scale — these tables are driver-sized by
    contract — and makes the downstream ``coalesce(1)`` free."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


# Planned-partition memo for spread_scan's gate: value is plan METADATA
# (a partition count), never data, keyed like _CACHE on object identity
# with a liveness weakref.  The gate's df.rdd.getNumPartitions() is a
# driver-side RDD conversion (plan → RDD, no job) that the three hot
# spread_scan call sites re-paid per query (VERDICT r11); the inputs are
# the per-session load_table-cached DataFrames, whose file listing is
# frozen at first load, so the planned count is a constant per object.
_PLANNED_PARTS: dict[int, tuple[object, int]] = {}


def _planned_partitions(df: DataFrame) -> int:
    import weakref as _weakref

    key = id(df)
    hit = _PLANNED_PARTS.get(key)
    if hit is not None:
        ref, n = hit
        if ref() is df:
            return n
        del _PLANNED_PARTS[key]
    n = df.rdd.getNumPartitions()
    _PLANNED_PARTS[key] = (_weakref.ref(df), n)
    return n


def spread_engaged(df: DataFrame) -> bool:
    """True exactly when :func:`spread_scan` would add its round-robin
    exchange — the gate's own predicate, exposed so plan audits assert
    the exchange precisely when it exists instead of re-deriving the
    condition from different inputs (ADVICE r11)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return _planned_partitions(df) * 4 < par


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan whose planned parallelism is far
    below the session's cores — the guide §2.5 'unsplittable input' fix.

    The bench fixtures are single-file, single-row-group parquet, so a
    scan yields rows in ONE task no matter how many splits Spark plans;
    a shuffle-free query with heavy per-row compute (regex chains,
    per-doc array building) then runs single-core.  Spreading costs one
    small exchange of the input rows and parallelizes the projection
    (measured: q_pii_redact 0.31 s → 0.13 s at sf0.1 on 32 cores).

    ADAPTIVE, not constant: the no-op gate (planned partitions ≥ ¼ of
    defaultParallelism) means production layouts — many files, splittable
    row groups — pass through untouched, and lower driver core counts
    spread proportionally.  Only safe where values are per-row or
    order-independent (row-local projections, integer aggregation);
    float-accumulating paths keep their scan order (bit-identity
    contract, see ops/cluster.py)."""
    if not spread_engaged(df):
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — works on any
    Spark-supported filesystem and, unlike a speculative
    ``spark.read.parquet`` try/except, never logs a JVM
    FileNotFoundException stack trace on the miss path (sidecar probes
    run on EVERY index search)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def read_pruned_partitions(
    spark: SparkSession, path: str, col: str, values
) -> DataFrame:
    """Read ONLY the named partition directories of a ``partitionBy(col)``
    parquet layout, as explicit paths under ``basePath``.

    ``spark.read.parquet(root)`` lists the WHOLE directory tree at
    planning before partition pruning ever applies, so index-serving
    reads pay O(#partitions) listing even though they scan O(#probed)
    — measured on the inverted text index as the search-growth term
    (1.29 → 1.46 per corpus doubling as buckets ∝ N; SCALE.md round
    11).  Explicit paths bound listing at O(#probed directories): one
    driver-side existence probe per requested value (absent values are
    simply skipped — a term/cell that never occurred has no directory,
    which is exactly the empty-postings semantics the root-read filter
    produced).  ``basePath`` keeps the partition column (and any deeper
    partition levels, e.g. the streaming ``_batch``) in the schema, so
    downstream filters and the probe-set ``isin`` guard behave
    identically to the root read.

    Falls back to the root read when NO requested directory exists (the
    result is empty after the caller's ``isin`` filter either way; the
    root must exist or the index itself is absent)."""
    root = path.rstrip("/")
    dirs = [f"{root}/{col}={v}" for v in sorted(set(values))]
    existing = [d for d in dirs if hadoop_path_exists(spark, d)]
    reader = spark.read.option("basePath", root)
    if not existing:
        return reader.parquet(root)
    return reader.parquet(*existing)


def clear_cache() -> None:
    """Drop cached table plans (needed only if a previously-loaded
    directory's files were replaced)."""
    _CACHE.clear()
    from snowav_spark import contract

    contract._PLAN_CACHE.clear()


def _nanos_ts_cols(path: str) -> set[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` these surface in
    Spark as plain ``bigint`` — indistinguishable from a real int64 column
    without consulting the file metadata, so we read the (tiny) footer
    schema via pyarrow.  Handles both a single file and a directory of
    part files (first footer wins — one table has one schema)."""
    import os

    import pyarrow.parquet as pq

    try:
        p = path
        if os.path.isdir(p):
            # recurse: a PARTITIONED table nests part files under
            # key=value dirs — a top-level-only listing would silently
            # return the empty set and leave ns columns as bigint,
            # exactly the silent failure the warning below exists for
            part = None
            for root, dirs, files in os.walk(p):
                dirs.sort()
                hits = sorted(f for f in files if f.endswith(".parquet"))
                if hits:
                    part = os.path.join(root, hits[0])
                    break
            if part is None:
                return set()
            p = part
        schema = pq.read_schema(p)
        import pyarrow as pa

        return {
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception as e:
        # Never fail the load over a footer probe — but never go silent
        # either: without this probe a ns-encoded fixture surfaces as raw
        # bigint and the failure lands far downstream (date_trunc on
        # bigint, 1000x-off epochs) with no hint of the root cause.
        import logging

        logging.getLogger(__name__).warning(
            "nanos-timestamp footer probe failed for %s (%s: %s); "
            "INT64-nanos columns, if any, will surface as bigint",
            path,
            type(e).__name__,
            e,
        )
        return set()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying per-table schema fixes."""
    import weakref as _weakref

    key = (id(spark), sf_dir.rstrip("/"), name)
    hit = _CACHE.get(key)
    if hit is not None:
        ref, cached = hit
        if ref() is spark:  # same LIVE session object, not a reused id
            return cached
        del _CACHE[key]  # stale entry from a collected session
    ensure_engine_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    # The fixtures' physical timestamp encodings have changed across driver
    # regenerations (events.ts: INT64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS);
    # an isAdjustedToUTC flip would surface as LTZ).  Normalize every form
    # to TIMESTAMP_NTZ so downstream plans see ONE stable type that matches
    # DuckDB's naive-timestamp view of the same files at µs precision.
    # ANY column may flip to nanos in a regeneration (round 1 shipped
    # events.ts as ns; fuzz variant ts_ns proved o_orderdate/l_shipdate
    # would break too), so detect from the footer, not a name allowlist.
    bigint_cols = {c for c, t in df.dtypes if t == "bigint"}
    for col in sorted(_nanos_ts_cols(path) & bigint_cols):
        # ns → µs MUST be integer division (`div`): `/` goes through
        # double, whose ulp at ~1.7e18 ns is 256, truncating ~1.6% of
        # µs values one low vs DuckDB's exact conversion.
        df = df.withColumn(
            col,
            F.timestamp_micros(F.expr(f"{col} div 1000")).cast("timestamp_ntz"),
        )
    for col, dtype in df.dtypes:
        if dtype == "timestamp":
            # Session tz is pinned to UTC, so LTZ→NTZ preserves wall time.
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    _CACHE[key] = (_weakref.ref(spark), df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several fixture tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register fixture tables as temp views so ``spark.sql`` can be used
    interchangeably with the DataFrame API (the engine treats SQL text and
    DataFrame code as the same logical plan)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


# Derived V2-source sessions for footer_stats, weak-keyed by the parent
# session object: entries vanish when the parent is collected, so a
# recycled object address can never resurrect a session bound to a dead
# SparkContext, and stopped parents don't pin their derived session.
import weakref

_V2_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, SparkSession]" = (
    weakref.WeakKeyDictionary()
)


def footer_stats(
    spark: SparkSession, sf_dir: str, name: str, cols: list[str]
) -> DataFrame:
    """count/min/max over a table WITHOUT reading data pages: a
    footer-statistics-only scan (parquet aggregate pushdown — the plan
    shows ``PushedAggregation: [COUNT(*), MIN(..), ..]``).

    At 100 TB this answers row-count/range probes from file metadata in
    seconds instead of a full scan.  Spark only pushes aggregates through
    the V2 parquet source, while the engine's default read path is V1
    (V1 is where dynamic-partition-overwrite and the streaming file sink
    live), so the read is scoped to a derived session — same
    SparkContext, separate SQLConf — with V2 enabled; nothing else in the
    engine changes behavior.
    """
    ns = _V2_SESSIONS.get(spark)
    if ns is None:
        # One derived session per parent, reused — newSession() state is
        # registered for the lifetime of the SparkContext, so creating one
        # per call would leak.  Runtime conf changes on the PARENT (e.g. a
        # shuffle-partition permutation probe) do not propagate here; the
        # footer aggregate is partitioning-independent, so that is sound.
        # The ONLY conf that differs from engine defaults is the V2 source
        # list (aggregatePushdown is already in ENGINE_CONF).
        ns = spark.newSession()
        ensure_engine_conf(ns)
        ns.conf.set("spark.sql.sources.useV1SourceList", "")
        _V2_SESSIONS[spark] = ns
    df = ns.read.parquet(f"{sf_dir}/{name}.parquet")
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.agg(*aggs)
