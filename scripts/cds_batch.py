#!/usr/bin/env python
"""Tile-grid launcher for large all-pairs runs.

Equivalent of the reference's LSF job-array sharding
(colormipsearch-tools/src/main/scripts/submitCDSBatch.sh + cdsparams.sh):
the (masks x targets) matrix is tiled into rectangles of
MASKS_PER_JOB x TARGETS_PER_JOB; each job index maps to one tile and runs
`colorDepthSearch --masks-index ... --targets-index ...`.

Modes:
  --print     emit the command lines (feed to a scheduler of your choice)
  --run       run tiles sequentially in this process
  --job N     run only tile N (use from a job array: one index per task)

A TPU pod slice runs one process per host with JOB = host index
(jax.distributed handles intra-process device parallelism; tiles map
across hosts).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys


def tile_count(total, per_job):
    return (total + per_job - 1) // per_job


def build_tiles(n_masks, n_targets, masks_per_job, targets_per_job):
    tiles = []
    for mi in range(tile_count(n_masks, masks_per_job)):
        for ti in range(tile_count(n_targets, targets_per_job)):
            tiles.append((mi * masks_per_job,
                          min(masks_per_job, n_masks - mi * masks_per_job),
                          ti * targets_per_job,
                          min(targets_per_job,
                              n_targets - ti * targets_per_job)))
    return tiles


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--masks", required=True,
                   help="masks neuron JSON file")
    p.add_argument("--targets", required=True)
    p.add_argument("--total-masks", type=int, required=True)
    p.add_argument("--total-targets", type=int, required=True)
    p.add_argument("--masks-per-job", type=int, default=5000)
    p.add_argument("--targets-per-job", type=int, default=40000)
    p.add_argument("--first-job", type=int, default=1)
    p.add_argument("--last-job", type=int, default=-1)
    p.add_argument("--job", type=int, default=None,
                   help="run only this 1-based tile index")
    p.add_argument("--print", dest="print_only", action="store_true")
    p.add_argument("--run", action="store_true")
    p.add_argument("-od", "--outputDir", required=True)
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="extra args passed to colorDepthSearch (prefix "
                        "with --)")
    args = p.parse_args(argv)

    tiles = build_tiles(args.total_masks, args.total_targets,
                        args.masks_per_job, args.targets_per_job)
    last = args.last_job if args.last_job > 0 else len(tiles)
    selected = range(args.first_job, last + 1)
    if args.job is not None:
        selected = [args.job]
    # tile indices are 1-based (like the reference's LSF job arrays);
    # reject out-of-range instead of letting 0 wrap to the last tile
    bad = [j for j in selected if not 1 <= j <= len(tiles)]
    if bad:
        p.error(f"tile index out of range 1..{len(tiles)}: {bad[:3]}")

    extra = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    cmds = []
    for j in selected:
        m_off, m_len, t_off, t_len = tiles[j - 1]
        cmd = [sys.executable, "-m", "colormipsearch_tpu.cli.main",
               "colorDepthSearch",
               "-m", args.masks, "-i", args.targets,
               "--masks-index", str(m_off), "--masks-length", str(m_len),
               "--targets-index", str(t_off), "--targets-length",
               str(t_len), "-od", args.outputDir] + extra
        cmds.append(cmd)

    if args.print_only or not args.run:
        for c in cmds:
            print(" ".join(c))
        print(json.dumps({"total_tiles": len(tiles)}), file=sys.stderr)
        return 0
    for c in cmds:
        print("+", " ".join(c), file=sys.stderr)
        r = subprocess.run(c)
        if r.returncode != 0:
            return r.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
