"""Same-day hardware scaling ceiling (BENCH.md protocol).

Pure-CPU multiprocessing sha256 (no Spark, no JVM) at the two bench
parallelism levels: whatever efficiency THIS measures is the host's
attainable ceiling for any 4->16-worker workload today — Spark numbers are
reported both raw and normalized against it. Records /proc/stat steal per
level. Prints one JSON line.

Usage: python tools/cpu_ceiling.py [seconds_per_level]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _burn(args):
    seconds, seed = args
    h = hashlib.sha256(str(seed).encode()).digest()
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        for _ in range(1000):
            h = hashlib.sha256(h).digest()
        n += 1000
    return n


def _steal() -> int:
    with open("/proc/stat", encoding="utf-8") as f:
        return int(f.readline().split()[8])


def level(workers: int, seconds: float) -> dict:
    s0 = _steal()
    t0 = time.time()
    with mp.Pool(workers) as pool:
        counts = pool.map(_burn, [(seconds, i) for i in range(workers)])
    wall = time.time() - t0
    return {
        "workers": workers,
        "mh_per_sec": round(sum(counts) / wall / 1e6, 3),
        "steal_sec": round((_steal() - s0) / 100.0, 1),
    }


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    lo, hi = level(4, seconds), level(16, seconds)
    out = {
        "lo": lo,
        "hi": hi,
        "ceiling_efficiency": round(
            (hi["mh_per_sec"] / lo["mh_per_sec"]) / (16 / 4), 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
