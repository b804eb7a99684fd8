#!/usr/bin/env python
"""Chunked full-union kernel experiment (round 5).

Surgery showed the full-union kernel is RANGE-TEST-bound (tests alone
= 82% of kernel time) with only partial gather/test overlap — a fully
overlapped schedule would cap at the tests-only rate (+22%).  This
experiment splits each orientation's union into K contiguous chunks
and runs gather→tests per chunk, giving XLA a software pipeline
(gather of chunk i+1 can overlap tests of chunk i).  Exact by
construction: same tests, same sums, chunk 0 aligned to the slot-2
prefix (u2 divides the chunk size or vice versa).

Prints one JSON line with baseline vs chunked rates for K in
CDS_CHUNK_KS (default 2,4).
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
KS = [int(k) for k in os.environ.get("CDS_CHUNK_KS", "2,4").split(",")]

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
    t_keys = bench.build_device_planes(target_rgb, T, kind="keys")

    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    stacked = pixel_match.stack_union_qkey_args([fplan] * BATCH, h * w)
    u_pos_s, mu_pos_s, qidx_s, kl_s, u2 = stacked
    tabs = pixel_match.interval_table_arrays(1.0 / 100.0)
    lane_lo, lane_span = pixel_match.expand_union_tables(
        jax.device_put(qidx_s), jax.device_put(kl_s),
        jax.device_put(tabs[0]), jax.device_put(tabs[1]))
    u_pos = jax.device_put(u_pos_s)
    mu_pos = jax.device_put(mu_pos_s)
    pairs = REPS * BATCH * T

    def timed(fn, label, *args):
        out = fn(*args)
        ref = np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        rate = pairs / dt
        print(f"# {label}: {rate / 1e6:.2f}M pairs/s",
              file=sys.stderr, flush=True)
        return rate, ref

    base_fn = functools.partial(
        pixel_match.score_query_batch_union_keys, u2=u2)
    base_rate, base_out = timed(base_fn, "baseline", t_keys, u_pos,
                                mu_pos, lane_lo, lane_span)

    def make_chunked(k_chunks: int):
        @functools.partial(jax.jit, static_argnames=())
        def run(t_keys, u_pos, mu_pos, lane_lo, lane_span):
            n_lanes = lane_lo.shape[1]          # [B, L, S, U]
            u_count = lane_lo.shape[3]
            t_width = t_keys.shape[1]
            n_straight = u_pos.shape[1] * n_lanes
            bounds = [round(i * u_count / k_chunks)
                      for i in range(k_chunks + 1)]

            def one(args):
                up, mp, lo_b, sp_b = args
                outs = []
                for pos in ([up, mp] if mp.shape[0] else [up]):
                    for i in range(pos.shape[0]):
                        cnts = [jnp.zeros((t_width,), jnp.int32)
                                for _ in range(n_lanes)]
                        for c0, c1 in zip(bounds[:-1], bounds[1:]):
                            g = jnp.take(t_keys, pos[i, c0:c1],
                                         axis=0).astype(jnp.uint32)
                            # slot-2 live only below u2; chunks at or
                            # past it skip the second test entirely
                            lo2 = min(max(u2 - c0, 0), c1 - c0)
                            g2 = g[:lo2] if lo2 > 0 else None
                            for j in range(n_lanes):
                                lo, sp = lo_b[j], sp_b[j]
                                m = ((g - lo[0][c0:c1, None])
                                     <= sp[0][c0:c1, None])
                                cnt = m.sum(axis=0, dtype=jnp.int32)
                                if g2 is not None:
                                    m2 = ((g2 - lo[1][c0:c0 + lo2, None])
                                          <= sp[1][c0:c0 + lo2, None])
                                    cnt = cnt + m2.sum(axis=0,
                                                       dtype=jnp.int32)
                                cnts[j] = cnts[j] + cnt
                        outs.extend(cnts)
                scores = jnp.stack(outs)
                return pixel_match.reduce_variants_device(
                    scores, jnp.zeros_like(scores), n_straight)

            return jax.lax.map(one, (u_pos, mu_pos, lane_lo, lane_span))

        return run

    results = {"T": T, "batch": BATCH, "reps": REPS, "u2": u2,
               "baseline_pairs_per_s": round(base_rate, 1),
               "chunked": {}}
    for k in KS:
        fn = make_chunked(k)
        rate, out = timed(fn, f"chunked_k{k}", t_keys, u_pos, mu_pos,
                          lane_lo, lane_span)
        assert np.array_equal(out, base_out), f"k={k} scores differ"
        results["chunked"][str(k)] = round(rate, 1)
    path = os.path.join(REPO, "bench_runs",
                        f"chunked_union_{time.strftime('%Y%m%dT%H%M%S')}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    results["saved"] = path
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
