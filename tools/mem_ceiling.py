"""Same-day MEMORY-BANDWIDTH scaling ceiling (companion to cpu_ceiling.py).

cpu_ceiling.py's sha256 burn is compute-bound: it measures how much CPU the
hypervisor actually delivers, but says nothing about the one hardware
resource 4 and 16 workers on a single box must SHARE — the memory
controller. Spark's weak-scaling phases here (dictionary-build distincts,
round-1 derive shuffle, wide exchanges generally) stream tens of GB through
memory; on a real cluster the second node brings its own memory channels,
but in this sandbox 4x the cores get ~1x the bandwidth.

This probe measures that directly: each worker repeatedly memcpy's a
64 MiB numpy buffer (2x64 MiB src+dst per worker: past any shared LLC at
both levels, so it's DRAM traffic), and we report
aggregate GB/s at both bench levels plus the scaling efficiency. Whatever
this prints is the attainable 4->16 ceiling for a SHUFFLE-bound Spark phase
on this host today — the honest normalizer for phases like dict_build and
round-1 derive, alongside cpu_ceiling.py's number for compute-bound ones.

Usage: python tools/mem_ceiling.py [seconds_per_level]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

BUF_MB = 64


def _stream(args):
    seconds, seed = args
    import numpy as np

    n = BUF_MB * 1024 * 1024
    src = np.random.default_rng(seed).integers(0, 255, n, dtype=np.uint8)
    dst = np.empty_like(src)
    copied = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        src, dst = dst, src
        copied += n
    return copied


def _steal() -> int:
    with open("/proc/stat", encoding="utf-8") as f:
        return int(f.readline().split()[8])


def level(workers: int, seconds: float) -> dict:
    s0 = _steal()
    t0 = time.time()
    with mp.Pool(workers) as pool:
        counts = pool.map(_stream, [(seconds, i) for i in range(workers)])
    wall = time.time() - t0
    return {
        "workers": workers,
        # a memcpy reads AND writes every byte: 2 bytes of DRAM traffic
        # per byte copied
        "gb_per_sec": round(2 * sum(counts) / wall / 1e9, 2),
        "steal_sec": round((_steal() - s0) / 100.0, 1),
    }


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    lo = level(4, seconds)
    hi = level(16, seconds)
    out = {
        "kind": "mem_bandwidth",
        "lo": lo,
        "hi": hi,
        "ceiling_efficiency": round(
            hi["gb_per_sec"] / lo["gb_per_sec"] / 4.0, 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
