#!/usr/bin/env python
"""Probe the accelerator with a tiny dispatch before launching long runs.

The axon TPU tunnel can wedge (all dispatches hang) after a device
process is killed or under sustained load; this prints the round-trip
time of a trivial op so scripts can gate on device health:

    python scripts/probe_device.py && python bench.py

Exit codes: 0 healthy, 1 slow (completed but above --slow-threshold),
2 timed out (run via the `timeout` wrapper in --budget).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    # >= 10 min: a probe KILLED by its own timeout is itself a killed
    # device process and re-wedges the tunnel (CLAUDE.md); the budget
    # must be long enough that a slow-but-alive probe finishes
    ap.add_argument("--budget", type=float, default=600.0,
                    help="seconds before the probe counts as wedged "
                         "(keep >= 600: killing a slow probe re-wedges "
                         "the tunnel)")
    ap.add_argument("--slow-threshold", type=float, default=15.0,
                    help="seconds above which the device counts as "
                         "degraded (exit 1)")
    args = ap.parse_args()

    # the dispatch runs in a child so a wedged tunnel cannot hang us
    code = ("import jax, jax.numpy as jnp, numpy as np, time\n"
            "t0 = time.time()\n"
            "v = int(np.asarray(jnp.arange(64).sum()))\n"
            "assert v == 2016, v\n"
            "print(f'{time.time() - t0:.1f}')\n")
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=args.budget)
    except subprocess.TimeoutExpired:
        print(f"WEDGED: no response in {args.budget:.0f}s",
              file=sys.stderr)
        return 2
    if r.returncode != 0:
        print(r.stderr.strip()[-500:], file=sys.stderr)
        return 2
    dt = time.perf_counter() - t0
    dispatch = float(r.stdout.strip().splitlines()[-1])
    healthy = dispatch <= args.slow_threshold
    print(f"device {'healthy' if healthy else 'DEGRADED'}: "
          f"dispatch {dispatch:.1f}s (process total {dt:.1f}s)")
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
