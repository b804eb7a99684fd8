"""A/B: dense [B, T] result pull vs device top-k emit selection.

Isolates the dispatch-stage change of CDS_EMIT_TOPK (engine/cds
_score_batch): same full-union kernel, same device planes, same stacked
plan args at the production dispatch shape (B mask batch x T targets);
arm A materializes the dense best+mirrored rows (what the engine's
threshold emit previously pulled per dispatch), arm B the [B, k]
top-k selection (scores, idx, mirrored).  Reports per-dispatch wall and
pulled bytes for both arms plus the projection onto the production
44,593 x 7,391 run's 352 dispatches.

Run on the TPU rig:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/emit_select_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

B = int(os.environ.get("SEL_BENCH_B", "256"))
T = int(os.environ.get("SEL_BENCH_T", "4096"))
K = int(os.environ.get("SEL_BENCH_K", "256"))
REPS = int(os.environ.get("SEL_BENCH_REPS", "8"))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_device_planes, build_workload
    from colormipsearch_tpu.ops import pixel_match

    mask_rgb, target_rgb, _sample, region = build_workload()
    h, w = target_rgb.shape[:2]
    t_keys = build_device_planes(target_rgb, T, kind="keys")
    print(f"# packed T={T} key planes ({t_keys.nbytes / 1e9:.1f} GB)",
          file=sys.stderr, flush=True)

    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    stacked = pixel_match.stack_union_qkey_args([fplan] * B, h * w)
    u_pos_s, mu_pos_s, qidx_s, kl_s, fu2 = stacked
    tabs = pixel_match.interval_table_arrays(1.0 / 100.0)
    f_lo, f_span = pixel_match.expand_union_tables(
        jax.device_put(qidx_s), jax.device_put(kl_s),
        jax.device_put(tabs[0]), jax.device_put(tabs[1]))
    f_pos = jax.device_put(u_pos_s)
    fm_pos = jax.device_put(mu_pos_s)

    def dense_once():
        best, mirr, _f = pixel_match.score_query_batch_union_keys(
            t_keys, f_pos, fm_pos, f_lo, f_span, u2=fu2)
        # the engine's dense threshold-emit pull: both [B, T] rows
        return np.asarray(best), np.asarray(mirr)

    def topk_once():
        sk, ik, mk, _b, _m = \
            pixel_match.score_query_batch_union_keys_topk(
                t_keys, f_pos, fm_pos, f_lo, f_span, u2=fu2, k=K)
        return np.asarray(sk), np.asarray(ik), np.asarray(mk)

    out = {"B": B, "T": T, "K": K, "reps": REPS}
    for name, fn in (("dense", dense_once), ("topk", topk_once)):
        t0 = time.perf_counter()
        pulled = fn()
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for _ in range(REPS):
            pulled = fn()
        dt = (time.perf_counter() - t0) / REPS
        out[f"{name}_s_per_dispatch"] = round(dt, 3)
        out[f"{name}_pairs_per_s"] = round(B * T / dt, 1)
        out[f"{name}_pulled_mb"] = round(
            sum(a.nbytes for a in pulled) / 1e6, 2)
        print(f"# {name}: {dt:.3f} s/dispatch "
              f"({out[f'{name}_pulled_mb']} MB pulled)",
              file=sys.stderr, flush=True)
    saved = out["dense_s_per_dispatch"] - out["topk_s_per_dispatch"]
    out["saved_s_per_dispatch"] = round(saved, 3)
    # the measured production run: 44,593 masks / 256-batch x 4 tiles
    # rounding + 2 target shards = 352 dispatches (production_run.py)
    out["production_352_dispatch_saving_s"] = round(saved * 352, 1)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_runs",
        f"emit_select_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
