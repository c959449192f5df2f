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


def main() -> int:
    results = {}
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
    bad = [k for k, v in results.items() if not v]
    print("PREFLIGHT:", "ALL PASS" if not bad else f"FAILED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
