"""Streaming observability: harvest StreamingQueryProgress into a
queryable metrics table (SURVEY §2.7 operational surface; the reference
logs per-step wall times to its run log — ref:snowav/framework/
framework.py timing prints — this is the structured, at-scale form).

Spark already measures everything per micro-batch (input rows, rates,
batch duration, per-operator state rows/memory); the gap is retention:
``query.recentProgress`` is a bounded in-memory ring on the driver that
vanishes with the session.  ``append_progress`` lands those rows in a
parquet table so dashboards and regression checks run as ordinary
engine queries (``sql`` CLI included) — e.g. "state rows per batch for
the dedup stream over the last week" is a filter + line chart, and an
unbounded-state bug shows up as a monotone ramp long before an OOM.

Why harvest-after-run instead of a StreamingQueryListener: the listener
API is push-based and session-global — right for a long-lived service,
wrong for the availableNow batch-like invocations this engine favors
(EP2 drops), where the natural unit is "harvest what this trigger just
did" with the progress list complete and quiescent.  The row schema is
stable (missing fields → NULL), keyed (query_id, run_id, batch_id) so
re-harvesting after a later trigger upserts instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "ts string, num_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, batch_duration_ms long, "
    "state_rows long, state_memory_bytes long, sources string, sink string"
)


def harvest_progress(query) -> list[dict]:
    """``query.recentProgress`` flattened to stable plain dicts (one per
    micro-batch).  State metrics sum across stateful operators; absent
    fields come back None, never KeyError — progress JSON shape varies
    with trigger type and Spark version."""
    import json

    out = []
    for p in query.recentProgress:
        # PySpark 3 hands back plain dicts; PySpark 4 wraps progress in
        # StreamingQueryProgress objects — normalize via their json form
        if not isinstance(p, dict):
            p = json.loads(p.json)
        state = p.get("stateOperators") or []
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        out.append(
            {
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "name": p.get("name"),
                "batch_id": p.get("batchId"),
                "ts": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_sec": p.get("inputRowsPerSecond"),
                "processed_rows_per_sec": p.get("processedRowsPerSecond"),
                "batch_duration_ms": dur,
                "state_rows": (
                    sum(s.get("numRowsTotal") or 0 for s in state)
                    if state
                    else None
                ),
                "state_memory_bytes": (
                    sum(s.get("memoryUsedBytes") or 0 for s in state)
                    if state
                    else None
                ),
                # absent descriptions stay NULL — str(None) would plant
                # the literal string "None" in the table and break
                # IS NULL dashboards
                "sources": (
                    ";".join(
                        str(s["description"])
                        for s in (p.get("sources") or [])
                        if s.get("description") is not None
                    )
                    or None
                ),
                "sink": (p.get("sink") or {}).get("description"),
            }
        )
    return out


def progress_frame(spark: SparkSession, query) -> DataFrame:
    """The harvested progress as a DataFrame with the stable schema
    (empty frame, same schema, when no batch has run)."""
    rows = harvest_progress(query)
    cols = [c.split(" ")[0] for c in PROGRESS_SCHEMA.split(", ")]
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], PROGRESS_SCHEMA
    )


def append_progress(spark: SparkSession, query, path: str) -> int:
    """Upsert this query's progress rows into the parquet metrics table
    at ``path``, keyed (query_id, run_id, batch_id) — re-harvesting
    after a later trigger (or a replayed batch of the same run) updates
    rather than duplicates, so the table stays one row per micro-batch.
    The merged frame is localCheckpoint-ed before the overwrite (a lazy
    plan reading the path it is about to delete would corrupt itself);
    metrics tables are micro-batch-count sized, so the rewrite is
    trivial at any corpus scale.  Returns the number of NEW batches."""
    from snowav_spark.io import hadoop_path_exists

    fresh = progress_frame(spark, query)
    keys = ["query_id", "run_id", "batch_id"]
    if hadoop_path_exists(spark, path):
        old = spark.read.parquet(path)
        survivors = old.join(fresh.select(*keys), keys, "left_anti")
        n_new = fresh.join(old.select(*keys), keys, "left_anti").count()
        merged = survivors.unionByName(fresh).localCheckpoint(eager=True)
    else:
        n_new = fresh.count()
        merged = fresh
    merged.write.mode("overwrite").parquet(path)
    return int(n_new)


def progress_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-query rollup over the metrics table: batches, rows, rate
    percentiles, max state footprint — the at-a-glance health view."""
    df = spark.read.parquet(path)
    return df.groupBy("query_id", "name").agg(
        F.count("*").cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("total_rows"),
        F.round(F.avg("batch_duration_ms"), 1).alias("avg_batch_ms"),
        F.max("batch_duration_ms").cast("long").alias("max_batch_ms"),
        F.max("state_rows").cast("long").alias("max_state_rows"),
        F.max("state_memory_bytes")
        .cast("long")
        .alias("max_state_bytes"),
    )
