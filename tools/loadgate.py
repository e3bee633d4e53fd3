#!/usr/bin/env python
"""Load gate for benchmark legs: block until the machine is quiet.

The shared VM's ambient load inflates same-code bench legs up to ~2.2x
(BASELINE.md envelope), so every recorded leg waits for N consecutive
windows of >= IDLE_PCT machine-idle (/proc/stat deltas) before starting.

Usage:  python tools/loadgate.py [--windows 3] [--seconds 5] [--idle 85]
Exits 0 when quiet; exits 2 after --timeout (default 1800 s) without a
quiet span (callers should record the leg as un-gated).
"""

from __future__ import annotations

import argparse
import sys
import time


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return idle, sum(vals)


def idle_pct(seconds: float) -> float:
    i0, t0 = _cpu_times()
    time.sleep(seconds)
    i1, t1 = _cpu_times()
    return 100.0 * (i1 - i0) / max(1, t1 - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--idle", type=float, default=85.0)
    ap.add_argument("--timeout", type=float, default=1800.0)
    a = ap.parse_args()
    deadline = time.time() + a.timeout
    streak = 0
    while time.time() < deadline:
        p = idle_pct(a.seconds)
        streak = streak + 1 if p >= a.idle else 0
        print(f"idle {p:.1f}% streak {streak}/{a.windows}", flush=True)
        if streak >= a.windows:
            return 0
    print("loadgate: timeout without a quiet span", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
