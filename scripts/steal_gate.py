#!/usr/bin/env python3
"""Wait for a quiet host window before launching a measurement run.

Samples /proc/stat steal share over `--window` seconds repeatedly until it
stays below `--max-steal` percent, or gives up after `--timeout` seconds
(exit 1). The bench itself still records its own whole-run steal_pct; this
gate just avoids launching into an obviously contaminated window.

Usage: steal_gate.py [--max-steal 0.3] [--window 10] [--timeout 1800]
"""
import argparse
import sys
import time


def sample(window: float) -> float:
    def read():
        parts = open("/proc/stat").readline().split()[1:9]
        v = list(map(int, parts))
        return v[7], sum(v)
    s0, t0 = read()
    time.sleep(window)
    s1, t1 = read()
    return (s1 - s0) / max(1, (t1 - t0)) * 100.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steal", type=float, default=0.3)
    ap.add_argument("--window", type=float, default=10.0)
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()
    deadline = time.time() + args.timeout
    while time.time() < deadline:
        pct = sample(args.window)
        print(f"[steal_gate] steal={pct:.2f}%", flush=True)
        if pct <= args.max_steal:
            return 0
    print("[steal_gate] timeout — no quiet window", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
