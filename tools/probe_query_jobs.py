"""Per-query Spark job census (VERDICT r11 item 4: q_semdedup /
q_dedup_embed_lsh scale ~1 with cores because they are many small jobs —
attribute the fixed job overhead before cutting it).

Runs each named contract query once warm (after one unmeasured warm-up of
the whole set) with the event log enabled, then parses the event log for
SparkListenerJobStart/JobEnd inside each query's wall window: job count,
per-job seconds, and the gap time (wall − Σ job) that is driver-side
planning/collect overhead.

Usage: python tools/probe_query_jobs.py SF_DIR QUERY [QUERY ...]
Prints one JSON line per query.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    evdir = tempfile.mkdtemp(prefix="probe_evlog_")
    from snowav_spark.session import get_spark

    spark = get_spark(
        "probe-query-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            # Spark 4 defaults to a rolling event-log DIRECTORY of zstd
            # parts; force the single plain-text file this parser reads
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    windows: dict[str, tuple[float, float]] = {}
    for name in names:  # warm-up pass: codegen + table plan caches
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    for name in names:
        spark.sparkContext.setJobDescription(f"probe {name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        windows[name] = (t0, time.time())
    spark.stop()

    jobs: list[tuple[float, float]] = []
    starts: dict[int, float] = {}
    for path in glob.glob(f"{evdir}/*"):
        if os.path.isdir(path):
            continue
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    starts[ev["Job ID"]] = ev["Submission Time"] / 1000.0
                elif ev.get("Event") == "SparkListenerJobEnd":
                    s = starts.get(ev["Job ID"])
                    if s is not None:
                        jobs.append((s, ev["Completion Time"] / 1000.0))
    for name, (t0, t1) in windows.items():
        inside = sorted(
            (round(e - s, 4) for s, e in jobs if t0 <= s <= t1),
            reverse=True,
        )
        print(json.dumps({
            "query": name,
            "wall_sec": round(t1 - t0, 4),
            "n_jobs": len(inside),
            "job_sec_total": round(sum(inside), 4),
            "gap_sec": round((t1 - t0) - sum(inside), 4),
            "jobs_desc": inside[:20],
        }))


if __name__ == "__main__":
    main()
