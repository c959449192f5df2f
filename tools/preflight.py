"""One-command health check before a round ends: entry smoke, full oracle
check at sf0.01, plan audits, bench at sf0.1.  Prints a PASS/FAIL summary
and exits non-zero on any failure.

Usage: python tools/preflight.py [--skip-bench]
"""

from __future__ import annotations

import json
import subprocess
import sys

STEPS = [
    ("oracle-check sf0.01", [sys.executable, "tools/check.py"]),
    ("plan-audit", [sys.executable, "tools/audit_plans.py"]),
]


def check_doc_totals() -> bool:
    """COVERAGE.md's stated key totals must match the live registry —
    VERDICT r5 caught them drifting (170 vs the actual 179); assert here
    so they can never drift silently again."""
    import re

    sys.path.insert(0, "/root/repo")
    from snowav_spark import contract

    total = len(contract._GRADE_ORDER)
    oracle = len(contract.ORACLE)
    rows_only = total - oracle
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"(\d+)/\1 — (\d+) oracle \+ (\d+) rows-only", text)
    stated = tuple(int(g) for g in m.groups()) if m else None
    ok = stated == (total, oracle, rows_only)
    if not ok:
        print(
            f"  COVERAGE.md states {stated}, registry has "
            f"({total}, {oracle}, {rows_only})"
        )
    return ok


# The 12 BASELINE.md headline shapes (Spark 4.1.2 local[*] @ sf0.1) — the
# driver's explicit perf bar is 2× these.  Gate them here so a regression
# fails preflight the round it happens, not at judging.
BASELINE_SEC = {
    "q_zonal_mean": 1.50,
    "q_end_last": 1.53,
    "q_sum_range": 0.31,
    "q_cumsum": 0.31,
    "q_pivot": 0.24,
    "q_join_dim": 0.57,
    "q_difference": 0.15,
    "q_topk": 0.08,
    "q_text_stats": 0.18,
    "q_dedup_exact": 0.16,
    "q_sim_topk": 0.11,
}


def check_bench_vs_baseline() -> bool:
    try:
        detail = json.load(open("/root/repo/BENCH_DETAIL.json"))
    except (OSError, json.JSONDecodeError):
        print("  BENCH_DETAIL.json missing/unreadable")
        return False
    qs = detail.get("queries", detail)
    bad = []
    for k, base in BASELINE_SEC.items():
        got = qs.get(k)
        if got is None:
            bad.append(f"{k}: not in bench output")
        elif got > 2 * base:
            bad.append(f"{k}: {got:.3f}s > 2x baseline {base:.2f}s")
    for b in bad:
        print("  " + b)
    return not bad


def check_blessed_drift() -> bool:
    """BASELINE_KEYS.json gate (VERDICT r9 item 3): bench.py re-times
    any key breaching max(2x blessed median, 0.05s) in isolation and
    records survivors in BENCH_DETAIL.json["drift"] — a non-empty drift
    map is a real per-key regression (already rescued from suite-
    position jitter), so it fails preflight the round it happens."""
    try:
        detail = json.load(open("/root/repo/BENCH_DETAIL.json"))
    except (OSError, json.JSONDecodeError):
        print("  BENCH_DETAIL.json missing/unreadable")
        return False
    drift = detail.get("drift")
    if drift is None:
        print("  BENCH_DETAIL.json has no drift map (stale bench.py?)")
        return False
    for k, v in drift.items():
        print(f"  blessed-drift {k}: {v['sec']}s > bar {v['bar']}s")
    return not drift


def report_bench_drift() -> None:
    """Drift-aware per-key comparison (VERDICT r6 item 5): uniform host
    contention inflates EVERY key by a similar factor (r6 saw +25–40%
    across untouched keys), which makes raw BENCH deltas unreadable.
    Compare the fresh per-key times against the MOST RECENT PRIOR
    BENCH_HISTORY.jsonl line at the same scale factor (BENCH_DETAIL.json
    alone is unsafe: a stray sf0.001 dev run can be the committed state,
    and cross-sf ratios are garbage — bitten in round 9), normalize by
    the suite's median ratio, and shortlist only keys whose ratio
    exceeds 1.5× that median — the real per-key regressions.
    Informational (host drift is not a build failure); the 2× baseline
    gate above stays the hard floor."""
    try:
        fresh_all = json.load(open("/root/repo/BENCH_DETAIL.json"))
        fresh = fresh_all.get("queries", {})
        sf = fresh_all.get("sf")
        prior = [
            json.loads(line)
            for line in open("/root/repo/BENCH_HISTORY.jsonl")
        ]
        # identify the fresh run by content, not position: if bench
        # died between writing detail and appending history, the last
        # history line is a GENUINE prior and must not be dropped
        prev_runs = [
            p
            for p in prior
            if p.get("sf") == sf and p.get("queries") != fresh
        ]
        if not prev_runs:
            print(f"  bench-drift: no prior history line at sf {sf}")
            return
        prev = prev_runs[-1].get("queries", {})
    except (OSError, json.JSONDecodeError):
        print("  bench-drift: no history/fresh detail to compare")
        return
    ratios = {
        k: fresh[k] / prev[k]
        for k in fresh
        if k in prev and prev[k] > 0.005  # sub-5ms keys are all noise
    }
    if len(ratios) < 10:
        print("  bench-drift: too few comparable keys")
        return
    med = sorted(ratios.values())[len(ratios) // 2]
    flagged = sorted(
        (
            (k, r)
            for k, r in ratios.items()
            if r > 1.5 * med and fresh[k] > 0.05  # ignore tiny absolute keys
        ),
        key=lambda kv: -kv[1],
    )
    print(
        f"  bench-drift: suite median ratio {med:.2f}x vs committed"
        + ("" if flagged else "; no per-key regressions beyond 1.5x median")
    )
    for k, r in flagged[:10]:
        print(
            f"  bench-drift REGRESSION {k}: {prev[k]:.3f}s -> {fresh[k]:.3f}s"
            f" ({r:.2f}x, {r / med:.2f}x over median)"
        )


def main() -> int:
    results = {"doc-totals": check_doc_totals()}
    print(f"{'PASS' if results['doc-totals'] else 'FAIL'} doc-totals")
    for name, cmd in STEPS:
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
        ok = proc.returncode == 0
        results[name] = ok
        tail = (proc.stdout or proc.stderr).strip().splitlines()[-1:]
        print(f"{'PASS' if ok else 'FAIL'} {name}: {tail[0] if tail else ''}")
    if "--skip-bench" not in sys.argv:
        proc = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, cwd="/root/repo"
        )
        ok = proc.returncode == 0
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            d = json.loads(line)
            n = d.get("n_queries", len(d["queries"]))
            print(f"PASS bench: {d['value']}s / {n} queries @ sf {d['sf']}")
        except (json.JSONDecodeError, KeyError):
            ok = False
            print(f"FAIL bench: no JSON line ({line[:120]})")
        results["bench"] = ok
        results["bench-vs-baseline"] = check_bench_vs_baseline()
        print(
            f"{'PASS' if results['bench-vs-baseline'] else 'FAIL'} "
            f"bench-vs-baseline (2x gate)"
        )
        results["blessed-drift"] = check_blessed_drift()
        print(
            f"{'PASS' if results['blessed-drift'] else 'FAIL'} "
            f"blessed-drift (BASELINE_KEYS.json 2x gate)"
        )
        report_bench_drift()
    bad = [k for k, v in results.items() if not v]
    print("PREFLIGHT:", "ALL PASS" if not bad else f"FAILED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
