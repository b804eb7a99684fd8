"""Per-batch warm cost: where the production dispatch gap lives.

The isolated dispatch A/B (emit_select_bench.py) runs 0.34-0.50 s per
dispatch, but the measured production run spends ~2.8 s per dispatch in
the cds.dispatch stage — the difference is the per-mask-batch warm work
that shares the device and the tunnel with scoring: the host
stack/pad of 256 fresh union plans, the positional wire upload, and the
on-device lane-table expansion (expand_union_tables_from_pos).  This
script times each component for a fresh 256-mask batch of DISTINCT
rolled masks at production shapes.

Run on the TPU rig:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/warm_cost_bench.py
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

B = int(os.environ.get("WARM_BENCH_B", "256"))
REPS = int(os.environ.get("WARM_BENCH_REPS", "3"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_workload
    from colormipsearch_tpu.oracle.pixel import shift_offsets
    from colormipsearch_tpu.ops import pixel_match

    mask_rgb, _target_rgb, _s, region = build_workload()
    h, w = mask_rgb.shape[:2]
    rng = np.random.default_rng(0)

    def build_one(i):
        img = mask_rgb if i == 0 else np.roll(
            mask_rgb, (int(rng.integers(0, h)), int(rng.integers(0, w))),
            axis=(0, 1))
        return pixel_match.build_full_union_key_plan(
            img, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
            excluded_region=region)

    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        plans = list(pool.map(build_one, range(B)))
    build_s = time.perf_counter() - t0

    tabs = pixel_match.interval_table_arrays(1.0 / 100.0)
    tab_dev = tuple(jnp.asarray(a) for a in tabs)
    offs = tuple((int(dx), int(dy)) for dx, dy in shift_offsets(2))

    out = {"B": B, "reps": REPS,
           "plan_build_s_8threads": round(build_s, 2)}
    stack_s = wire_s = expand_s = wire_mb = 0.0
    for rep in range(REPS + 1):  # rep 0 = compile warm, discarded
        t0 = time.perf_counter()
        pa = pixel_match.stack_union_pos_args(plans, h * w)
        assert pa is not None
        u_pos, mu_pos, q_pos, key_list, u2 = pa
        t1 = time.perf_counter()
        # fresh copies defeat any host-buffer caching: production
        # batches are always new arrays
        arrs = [np.ascontiguousarray(a)
                for a in (u_pos, mu_pos, q_pos, key_list)]
        devs = [jnp.asarray(a) for a in arrs]
        # block_until_ready is a no-op on the tunneled backend
        # (CLAUDE.md) — a dependent element pull is the only honest
        # completion barrier
        for d in devs:
            np.asarray(d.ravel()[:1])
        t2 = time.perf_counter()
        lane_lo, lane_span = pixel_match.expand_union_tables_from_pos(
            devs[0], devs[2], devs[3], *tab_dev, offsets=offs, w=w, h=h)
        np.asarray(lane_lo.ravel()[:1])
        np.asarray(lane_span.ravel()[:1])
        t3 = time.perf_counter()
        if rep == 0:
            out["expand_compile_s"] = round(t3 - t2, 1)
            continue
        stack_s += t1 - t0
        wire_s += t2 - t1
        expand_s += t3 - t2
        wire_mb = sum(a.nbytes for a in arrs) / 1e6
        del lane_lo, lane_span, devs
    # A/B: the factored-qkey wire form (u16 per-lane index matrix built
    # on the host, device expansion = two plain table gathers, no
    # [B, h*w] scatter) vs the positional form timed above
    qk_stack_s = qk_wire_s = qk_expand_s = qk_wire_mb = 0.0
    for rep in range(REPS + 1):
        t0 = time.perf_counter()
        qk = pixel_match.stack_union_qkey_args(plans, h * w)
        assert qk is not None
        u_pos, mu_pos, qidx, key_list, _u2 = qk
        t1 = time.perf_counter()
        arrs = [np.ascontiguousarray(a)
                for a in (u_pos, mu_pos, qidx, key_list)]
        devs = [jnp.asarray(a) for a in arrs]
        for d in devs:
            np.asarray(d.ravel()[:1])
        t2 = time.perf_counter()
        lane_lo, lane_span = pixel_match.expand_union_tables(
            devs[2], devs[3], *tab_dev)
        np.asarray(lane_lo.ravel()[:1])
        np.asarray(lane_span.ravel()[:1])
        t3 = time.perf_counter()
        if rep == 0:
            out["qkey_expand_compile_s"] = round(t3 - t2, 1)
            continue
        qk_stack_s += t1 - t0
        qk_wire_s += t2 - t1
        qk_expand_s += t3 - t2
        qk_wire_mb = sum(a.nbytes for a in arrs) / 1e6
        del lane_lo, lane_span, devs
    out |= {
        "qkey_host_stack_s": round(qk_stack_s / REPS, 3),
        "qkey_wire_upload_s": round(qk_wire_s / REPS, 3),
        "qkey_wire_mb": round(qk_wire_mb, 1),
        "qkey_device_expand_s": round(qk_expand_s / REPS, 3),
        "qkey_warm_total_s_per_batch": round(
            (qk_stack_s + qk_wire_s + qk_expand_s) / REPS, 3),
        "host_stack_s": round(stack_s / REPS, 3),
        "wire_upload_s": round(wire_s / REPS, 3),
        "wire_mb": round(wire_mb, 1),
        "wire_mb_per_s": round(wire_mb / (wire_s / REPS), 1),
        "device_expand_s": round(expand_s / REPS, 3),
        "warm_total_s_per_batch": round(
            (stack_s + wire_s + expand_s) / REPS, 3),
        "note": "per 256-mask batch; in production this overlaps the "
                "~0.7 s of scoring per batch (2 shards x 0.34 s), so "
                "warm total minus that is the pipeline's serial "
                "residual per batch",
    }
    stamp = time.strftime("%Y%m%dT%H%M%S")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_runs",
        f"warm_cost_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
