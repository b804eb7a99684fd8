#!/usr/bin/env python
"""Name the full-union kernel's binding resource (VERDICT r5 #3).

The r4 artifact left a contradiction: the full-union kernel sustains
~126 GB/s of gather while its sibling x-union form sustains ~198 GB/s
in the same window, and DESIGN's roofline claims 147 GB/s (measured at
T=1024) vs 303 GB/s (row-gather model at T=4096).  This script runs
KERNEL SURGERY on the production full-union dispatch — ablated
variants that isolate each resource — plus a clean row-gather
microbench at the production T, and (best-effort) a jax.profiler
device trace.

Variants (identical [B, ...] arg shapes, T = CDS_SURGERY_T targets):
  full        the production kernel (baseline)
  gather_sum  gathers exactly the kernel's rows, ONE add-reduce, no
              range tests -> the gather+reduce floor
  tests_only  the kernel's range tests on a broadcast row (no HBM
              gather traffic) -> the VPU test ceiling
  lanes_1     full kernel with a single lane -> per-lane marginal cost
  rowgather   plain jnp.take row gather at T (16 KB rows), GB/s

Writes bench_runs/kernel_surgery_<ts>.json and prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

T = int(os.environ.get("CDS_SURGERY_T", 4096))
BATCH = int(os.environ.get("CDS_SURGERY_BATCH", 8))
REPS = int(os.environ.get("CDS_SURGERY_REPS", 24))

FIX = ("/root/reference/colormipsearch-api/src/test/resources/"
       "colormipsearch/api/cdsearch")
MASK_TIF = f"{FIX}/1752016801-LPLC2-RT_18U.tif"
TARGET_TIF = (f"{FIX}/GMR_31G04_AE_01-20190813_66_F3-40x-Brain-"
              "JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")


def main() -> int:
    import importlib.util

    import jax
    import jax.numpy as jnp

    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask
    from colormipsearch_tpu.ops import pixel_match

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    region = label_regions_mask(w, h)

    print(f"# building T={T} key planes on device", file=sys.stderr,
          flush=True)
    t_keys = bench.build_device_planes(target_rgb, T, kind="keys")

    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    # expanded-table args (the engine's dispatch form)
    if fplan.qidx is not None:
        stacked = pixel_match.stack_union_qkey_args([fplan] * BATCH,
                                                    h * w)
        u_pos_s, mu_pos_s, qidx_s, kl_s, u2 = stacked
        tabs = pixel_match.interval_table_arrays(1.0 / 100.0)
        lane_lo, lane_span = pixel_match.expand_union_tables(
            jax.device_put(qidx_s), jax.device_put(kl_s),
            jax.device_put(tabs[0]), jax.device_put(tabs[1]))
        u_pos = jax.device_put(u_pos_s)
        mu_pos = jax.device_put(mu_pos_s)
    else:
        u_pos = jax.device_put(np.stack([fplan.u_pos] * BATCH))
        mu_pos = jax.device_put(np.stack([fplan.mu_pos] * BATCH))
        lane_lo = jax.device_put(np.stack([fplan.lane_lo] * BATCH))
        lane_span = jax.device_put(np.stack([fplan.lane_span] * BATCH))
        u2 = fplan.u2 if fplan.u2 >= 0 else None

    lane_lo_h = np.asarray(lane_lo)
    u_count = lane_lo_h.shape[-1]
    n_lanes = lane_lo_h.shape[1]
    n_slots = lane_lo_h.shape[2]
    u_rows = int(u_pos.shape[-1]) + int(mu_pos.shape[-1])
    pairs = REPS * BATCH * T

    def timed(fn, label, *args, **kw):
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        rate = pairs / dt
        print(f"# {label}: {rate / 1e6:.2f}M pairs/s ({dt:.2f}s)",
              file=sys.stderr, flush=True)
        return rate

    # --- full production kernel
    full_rate = timed(
        functools.partial(pixel_match.score_query_batch_union_keys,
                          u2=u2),
        "full", t_keys, u_pos, mu_pos, lane_lo, lane_span)

    # --- gather_sum: the kernel's exact gathered rows, one add-reduce
    @functools.partial(jax.jit, static_argnames=("uu2",))
    def gather_sum(t_keys, u_pos, mu_pos, uu2):
        def one(args):
            up, mp = args
            acc = jnp.take(t_keys, up[0], axis=0).sum(
                axis=0, dtype=jnp.int32)
            acc = acc + jnp.take(t_keys, mp[0], axis=0).sum(
                axis=0, dtype=jnp.int32)
            if uu2 and uu2 > 0:
                acc = acc + jnp.take(t_keys, up[0, :uu2], axis=0).sum(
                    axis=0, dtype=jnp.int32)
                acc = acc + jnp.take(t_keys, mp[0, :uu2], axis=0).sum(
                    axis=0, dtype=jnp.int32)
            return acc
        return jax.lax.map(one, (u_pos, mu_pos))

    gather_rate = timed(functools.partial(gather_sum, uu2=u2),
                        "gather_sum", t_keys, u_pos, mu_pos)

    # --- tests_only: same range-test count on a broadcast row (no
    # gather traffic — XLA streams one [T] row through all tests)
    @functools.partial(jax.jit, static_argnames=("uu2",))
    def tests_only(row, lane_lo, lane_span, uu2):
        # row: [T] int32.  Broadcast to the kernel's [U, T] test shape.
        outs = []
        for _orient in range(2):
            g = jnp.broadcast_to(row[None, :].astype(jnp.uint32),
                                 (u_count, row.shape[0]))
            g2 = g[:uu2] if uu2 and uu2 > 0 else None
            for j in range(n_lanes):
                lo, sp = lane_lo[0, j], lane_span[0, j]
                m = (g - lo[0][:, None]) <= sp[0][:, None]
                cnt = m.sum(axis=0, dtype=jnp.int32)
                if g2 is not None:
                    m2 = (g2 - lo[1][:uu2, None]) <= sp[1][:uu2, None]
                    cnt = cnt + m2.sum(axis=0, dtype=jnp.int32)
                outs.append(cnt)
        return jnp.stack(outs)

    row = t_keys[0]

    def tests_batch(row, lane_lo, lane_span):
        return jax.lax.map(
            lambda i: tests_only(row, lane_lo, lane_span, uu2=u2),
            jnp.arange(BATCH))

    tests_rate = timed(jax.jit(tests_batch), "tests_only", row,
                      lane_lo, lane_span)

    # --- lanes_1: one lane only (marginal per-lane cost)
    lane_lo_1 = lane_lo[:, :1]
    lane_span_1 = lane_span[:, :1]
    lanes1_rate = timed(
        functools.partial(pixel_match.score_query_batch_union_keys,
                          u2=u2),
        "lanes_1", t_keys, u_pos, mu_pos, lane_lo_1, lane_span_1)

    # --- rowgather: plain row gather GB/s at this T (16 KB rows when
    # T=4096) — the roofline number DESIGN extrapolated but never
    # measured at production width
    n_px = t_keys.shape[0] - 1
    ridx = jax.device_put(
        np.random.default_rng(0).integers(0, n_px, 65536)
        .astype(np.int32))

    @jax.jit
    def rowgather(t_keys, idx):
        return jnp.take(t_keys, idx, axis=0).sum(axis=0,
                                                 dtype=jnp.int32)

    out = rowgather(t_keys, ridx)
    np.asarray(out)
    t0 = time.perf_counter()
    rg_reps = 8
    for _ in range(rg_reps):
        out = rowgather(t_keys, ridx)
    np.asarray(out)
    dt = time.perf_counter() - t0
    rowgather_gbs = rg_reps * ridx.size * T * 4 / dt / 1e9
    print(f"# rowgather: {rowgather_gbs:.1f} GB/s", file=sys.stderr,
          flush=True)

    # --- best-effort device trace of one production dispatch
    trace_dir = os.path.join(REPO, "bench_runs",
                             f"trace_{time.strftime('%Y%m%dT%H%M%S')}")
    trace_ok = False
    try:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            out = pixel_match.score_query_batch_union_keys(
                t_keys, u_pos, mu_pos, lane_lo, lane_span, u2=u2)
            np.asarray(out[0])
        trace_ok = any(os.scandir(trace_dir))
    except Exception as e:  # noqa: BLE001 - trace is best-effort
        print(f"# profiler trace failed: {e!r}", file=sys.stderr)

    # derived occupancy: measured gather bytes/s of the full kernel,
    # and the tests' share of its time assuming the ablations compose
    row_bytes = 4 * T
    # gathered rows per pair-batch in the full kernel (incl. slot-2
    # prefix re-gather)
    rows_per_disp = BATCH * (u_rows + 2 * (u2 or 0))
    full_gather_gbs = (REPS * rows_per_disp * row_bytes
                       / (pairs / full_rate) / 1e9)
    gather_only_gbs = (REPS * rows_per_disp * row_bytes
                       / (pairs / gather_rate) / 1e9)
    result = {
        "T": T, "batch": BATCH, "reps": REPS,
        "union_rows_per_orientpair": u_rows, "u2": u2,
        "n_lanes": n_lanes, "n_slots": n_slots, "u_count": u_count,
        "rates_pairs_per_s": {
            "full": round(full_rate, 1),
            "gather_sum": round(gather_rate, 1),
            "tests_only": round(tests_rate, 1),
            "lanes_1": round(lanes1_rate, 1),
        },
        "gather_gb_per_s": {
            "full_kernel_effective": round(full_gather_gbs, 1),
            "gather_sum_ablation": round(gather_only_gbs, 1),
            "plain_rowgather_at_T": round(rowgather_gbs, 1),
        },
        "time_shares_if_composable": {
            "gather": round(full_rate / gather_rate, 3),
            "tests": round(full_rate / tests_rate, 3),
        },
        "profiler_trace": trace_dir if trace_ok else None,
    }
    path = os.path.join(REPO, "bench_runs",
                        f"kernel_surgery_{time.strftime('%Y%m%dT%H%M%S')}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    result["saved"] = path
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
