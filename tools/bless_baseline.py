"""Bless a per-key bench baseline (VERDICT r9 item 3).

Reads the most recent BENCH_HISTORY.jsonl runs at the CURRENT key set
(same n_queries, same key names), requires at least MIN_RUNS of them,
and writes BASELINE_KEYS.json: per-key MEDIAN seconds across those runs.
That file becomes the regression bar for every key that has no explicit
BASELINE.md row — bench.py re-times (and then reports as "drift") any
key breaching 2x of its blessed median.

Usage:
    python tools/bless_baseline.py            # bless from last >=3 runs
    python tools/bless_baseline.py --runs 5   # use up to 5 newest runs

Re-bless deliberately (after a real plan improvement or a new key),
never automatically — a silent re-bless would ratchet the bar to
whatever the code currently does and hide regressions.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_RUNS = 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5,
                    help="max newest history runs to use (default 5)")
    args = ap.parse_args()

    hist_path = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    with open(hist_path) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    if not runs:
        print("no BENCH_HISTORY.jsonl runs", file=sys.stderr)
        return 1

    # Only runs at the CURRENT key set are comparable — a run missing
    # (or preceding) a key would silently skew that key's median.
    current_keys = set(runs[-1]["queries"])
    usable = [r for r in runs if set(r["queries"]) == current_keys]
    # ... and at the newest run's CORE COUNT: medians mixing a 32-core
    # and an 8-core run would be bars for neither configuration.  Runs
    # predating the recorded-cpus field are excluded once any run in
    # the window records one (can't verify they match).
    newest_cpus = usable[-1].get("cpus") if usable else None
    if newest_cpus is not None:
        usable = [r for r in usable if r.get("cpus") == newest_cpus]
    usable = usable[-args.runs:]
    if len(usable) < MIN_RUNS:
        print(
            f"only {len(usable)} history runs at the current "
            f"{len(current_keys)}-key set; need >= {MIN_RUNS}. "
            "Run `python bench.py` again and re-bless.",
            file=sys.stderr,
        )
        return 1

    keys = {
        k: round(statistics.median(r["queries"][k] for r in usable), 4)
        for k in sorted(current_keys)
    }
    out = {
        "blessed_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "n_runs": len(usable),
        "git_heads": [r.get("git_head", "") for r in usable],
        "run_utcs": [r.get("utc", "") for r in usable],
        "sf": usable[-1].get("sf"),
        # Core count the medians were measured at: bench.py skips these
        # bars when its own $SPARK_GRAFT_CPUS differs — a lower-core
        # scaling run would breach 32-core bars on every parallel-heavy
        # key and re-time them all.  Stamped from the NEWEST run only
        # (ADVICE r11): when that run predates the cpus field, no
        # uniformity was enforced above, and scanning backwards for any
        # older run's value would mislabel a mixed-core median as
        # measured at that core count — null is the honest value there.
        "cpus": newest_cpus,
        "rule": "bench.py flags any key whose best-of-3 exceeds "
                "max(2 * median_seconds, 0.05s); BASELINE.md rows "
                "take precedence where they exist",
        "keys": keys,
    }
    out_path = os.path.join(REPO, "BASELINE_KEYS.json")
    # Per-core-count sections (r12, VERDICT r11 item 7): keep every
    # previously blessed core count's bars under "by_cpus" and add /
    # replace this blessing's — the driver's lower-core scaling run then
    # gets its own honest drift bars instead of skipping the gate.  The
    # top level stays the newest blessing (back-compat with readers that
    # predate the section).
    by_cpus: dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            by_cpus = dict(prev.get("by_cpus") or {})
            if not by_cpus and prev.get("cpus") is not None:
                by_cpus[str(int(prev["cpus"]))] = {
                    k: prev[k]
                    for k in (
                        "blessed_utc", "n_runs", "git_heads",
                        "run_utcs", "keys",
                    )
                    if k in prev
                }
        except Exception:
            by_cpus = {}
    if newest_cpus is not None:
        by_cpus[str(int(newest_cpus))] = {
            k: out[k]
            for k in (
                "blessed_utc", "n_runs", "git_heads", "run_utcs", "keys"
            )
        }
        out["by_cpus"] = by_cpus
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"blessed {len(keys)} keys from {len(usable)} runs "
        f"({', '.join(out['git_heads'])}) at cpus={newest_cpus} "
        f"-> {out_path} (by_cpus: {sorted(by_cpus)})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
