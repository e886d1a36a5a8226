"""Unattended scaling campaign: alternate pure-CPU ceiling snapshots with
N/4N scaling pairs.

The host shows bursty hypervisor steal (legs have recorded up to ~1,500
cpu-s), so single pairs are unreliable; the working protocol (BENCH.md) is
to run MANY pairs, record per-leg steal, snapshot the pure-CPU ceiling
between pairs, and claim efficiency only from the cleanest pair against the
same-day ceiling. This wrapper mechanizes the loop:

    python tools/pair_campaign.py --pairs 6 --n-files 8000000

Each iteration appends one ceiling record to ceiling_snapshots.jsonl
(tools/cpu_ceiling.py output + wall timestamp) and then runs one pair via
scaling_bench.py (which appends per-leg rows to scaling_runs.jsonl).
Curate afterwards with tools/pair_report.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snapshot_ceiling() -> dict | None:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cpu_ceiling.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    rec = {"t": round(time.time(), 1), "ceiling": json.loads(lines[-1]) if lines else None}
    with open(os.path.join(REPO, "ceiling_snapshots.jsonl"), "a", encoding="utf-8") as f:
        f.write(json.dumps(rec) + "\n")
    return rec["ceiling"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--n-files", type=int, default=8000000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--mode", default="local-cluster")
    ap.add_argument(
        "--min-ceiling",
        type=float,
        default=0.0,
        help="skip (sleep 120s instead of running) a pair when the snapshot "
        "ceiling is below this — avoids burning ~15 min on a storm window",
    )
    args = ap.parse_args()
    for i in range(args.pairs):
        ceil = snapshot_ceiling()
        eff = (ceil or {}).get("ceiling_efficiency", 0.0)
        print(f"[campaign] pair {i}: ceiling={eff}", flush=True)
        if eff < args.min_ceiling:
            print(f"[campaign] storm window (<{args.min_ceiling}) — sleeping", flush=True)
            time.sleep(120)
            continue
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scaling_bench.py"),
                "--levels",
                args.levels,
                "--reps",
                "1",
                "--n-files",
                str(args.n_files),
                "--mode",
                args.mode,
            ],
            cwd=REPO,
        )
    snapshot_ceiling()


if __name__ == "__main__":
    main()
