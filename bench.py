"""Throughput benchmark: mask-target pair comparisons per second per chip.

Workload: the production CDS configuration (maskThreshold 20,
dataThreshold 20, pixColorFluctuation 1.0, xyShift 2, mirror — reference
cdsparams.sh:42-46 / DATA_NOTES.md:59-66) on real reference fixture
images: the LPLC2 EM mask (1897 query pixels) scored against a library of
CDM-sized targets synthesized from the GMR_31G04 LM fixture.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
the baseline is measured here: the vectorized float64 numpy oracle —
itself faster than the reference's scalar Java loops — timed on one core
and scaled by the reference's production per-node concurrency (39 threads
on a 20-core node, submitCDSJob.sh:13-18).  vs_baseline is TPU pairs/s
per chip over that estimated per-node baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FIX = ("/root/reference/colormipsearch-api/src/test/resources/"
       "colormipsearch/api/cdsearch")
MASK_TIF = f"{FIX}/1752016801-LPLC2-RT_18U.tif"
TARGET_TIF = (f"{FIX}/GMR_31G04_AE_01-20190813_66_F3-40x-Brain-"
              "JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

# T=4096 x batch 8 measured best on TPU v5e (see BENCH notes /
# scripts/perf_sweep.py); override via env for small-host smoke runs
N_TARGETS = int(_os.environ.get("CDS_BENCH_TARGETS", 4096))
N_MASK_REPEATS = int(_os.environ.get("CDS_BENCH_REPEATS", 24))
MASK_BATCH = int(_os.environ.get("CDS_BENCH_MASK_BATCH", 8))
SHAPE_TARGETS = int(_os.environ.get("CDS_BENCH_SHAPE_TARGETS", 4096))
SHAPE_REPEATS = int(_os.environ.get("CDS_BENCH_SHAPE_REPEATS", 50))
BASELINE_ORACLE_TARGETS = 24
REFERENCE_NODE_THREADS = 39  # submitCDSJob.sh:13-18 (2*20 cores - 1)
HBM_PEAK_GB_S = 819  # TPU v5e HBM bandwidth (public spec)


def build_workload():
    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    region = label_regions_mask(w, h)

    # target library: rolled/flipped variants of the real CDM (keeps the
    # realistic foreground density ~6%, avoids trivially-identical
    # pixels).  A small host sample feeds the baseline scorer; the full
    # device library is synthesized on-device (build_device_targets) so
    # the benchmark does not pay the tunnel for hundreds of uploads.
    rng = np.random.default_rng(0)
    host_sample = np.empty((BASELINE_ORACLE_TARGETS, h, w, 3), np.uint8)
    for i in range(BASELINE_ORACLE_TARGETS):
        t = np.roll(target_rgb, (int(rng.integers(0, h)),
                                 int(rng.integers(0, w))), axis=(0, 1))
        if i % 2:
            t = t[:, ::-1]
        host_sample[i] = t
    return mask_rgb, target_rgb, host_sample, region


def build_device_planes(target_rgb: np.ndarray, n_targets: int,
                        kind: str = "packed"):
    """Pack n_targets rolled/flipped variants of one CDM, synthesized on
    the device (uploads a single image instead of the whole library).
    Chunks are written into a donated buffer so peak memory stays at one
    plane array even for multi-GB target widths.  kind="keys" builds the
    rank-key planes (ops/common.pack_target_planes_keys) instead."""
    import functools

    import jax
    import jax.numpy as jnp

    from colormipsearch_tpu.ops import common

    h, w = target_rgb.shape[:2]
    rng = np.random.default_rng(0)
    shifts = rng.integers(0, [h, w], (n_targets, 2)).astype(np.int32)
    shifts[0] = 0  # one unshifted target guarantees a nonzero top score
    flips = (np.arange(n_targets) % 2).astype(bool)
    flips[0] = False

    base = jnp.asarray(target_rgb)
    rank_lut = common.rank_lut_device() if kind == "keys" else None

    @jax.jit
    def make_planes(img, sh, fl):
        def one(s, f):
            r = jnp.roll(img, (s[0], s[1]), axis=(0, 1))
            return jnp.where(f, r[:, ::-1], r)

        stack = jax.vmap(one)(sh, fl)
        # threshold folded into the pack (engine production config)
        if kind == "keys":
            return common.pack_target_planes_keys(stack, 20, rank_lut)
        return common.pack_target_planes(stack, data_threshold=20)

    @functools.partial(jax.jit, donate_argnums=0)
    def write_chunk(planes, chunk, start):
        return jax.lax.dynamic_update_slice(planes, chunk, (0, start))

    chunk = 64
    rows = h * w + 1 if kind == "keys" else h * w  # keys: sentinel row
    dtype = jnp.int32 if kind == "keys" else jnp.uint32
    planes = jnp.zeros((rows, n_targets), dtype)
    for i in range(0, n_targets, chunk):
        p = make_planes(base, jnp.asarray(shifts[i:i + chunk]),
                        jnp.asarray(flips[i:i + chunk]))
        planes = write_chunk(planes, p, jnp.int32(i))
    return jax.block_until_ready(planes)


def bench_tpu(mask_rgb, target_rgb, region):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      _os.environ["JAX_COMPILATION_CACHE_DIR"])

    from colormipsearch_tpu.ops import pixel_match

    plan = pixel_match.build_query_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    t0 = time.perf_counter()
    planes = build_device_planes(target_rgb, N_TARGETS)
    print(f"# packed {N_TARGETS} device-synthesized targets "
          f"({planes.nbytes / 1e9:.1f} GB) in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    # the engine's production step: MASK_BATCH query plans per dispatch
    pos = jax.device_put(np.stack([plan.positions] * MASK_BATCH))
    q_cls = jax.device_put(np.stack([plan.q_cls] * MASK_BATCH))
    q_s = jax.device_put(np.stack([plan.q_s] * MASK_BATCH))
    q_p = jax.device_put(np.stack([plan.q_p] * MASK_BATCH))

    def run_once():
        return pixel_match.score_query_batch(
            planes, pos, q_cls, q_s, q_p,
            target_threshold=-1,  # folded into the pack above
            ztol_num=plan.ztol_num,
            ztol_den=plan.ztol_den, n_straight=plan.n_straight)

    t0 = time.perf_counter()
    np.asarray(run_once()[0])  # compile + full materialization
    print(f"# compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    # Timing covers dispatch AND completion: the device executes calls
    # in order, so materializing the LAST result on the host bounds the
    # whole batch (block_until_ready alone can be a no-op on tunneled
    # backends, which would inflate the rate).
    t0 = time.perf_counter()
    out = None
    for _ in range(N_MASK_REPEATS):
        out = run_once()
    final = np.asarray(out[0])
    dt = time.perf_counter() - t0
    pairs = N_MASK_REPEATS * MASK_BATCH * N_TARGETS
    # sanity: scoring is live (self-similar targets must score > 0)
    assert int(final.max()) > 0
    v, q = plan.positions.shape
    gather_gb_s = (N_MASK_REPEATS * MASK_BATCH * v * q * N_TARGETS * 4
                   / dt / 1e9)

    # the rank-key interval kernel on the same workload (extra metric —
    # the hardware A/B for DESIGN.md §2.4).  The packed planes are
    # released first: both sets at T=4096 would exceed the 16 GB HBM.
    packed_max = int(final.max())
    del planes, out, final
    keys_rate, union_rate, full_union_rate, fu_gather_gb_s = \
        bench_tpu_keys(target_rgb, plan, packed_max, mask_rgb, region)
    return (pairs / dt, gather_gb_s, keys_rate, union_rate,
            full_union_rate, fu_gather_gb_s, plan)


def bench_tpu_keys(target_rgb, plan, packed_max: int,
                   mask_rgb, region) -> tuple[float, float, float, float]:
    import jax

    from colormipsearch_tpu.ops import pixel_match

    t_keys = build_device_planes(target_rgb, N_TARGETS, kind="keys")
    h, w = target_rgb.shape[:2]
    kplan = pixel_match.key_plan_from_query_plan(plan, h * w, 1.0)
    kpos = jax.device_put(np.stack([kplan.positions] * MASK_BATCH))
    klo = jax.device_put(np.stack([kplan.lo] * MASK_BATCH))
    kspan = jax.device_put(np.stack([kplan.span] * MASK_BATCH))

    def run_once():
        return pixel_match.score_query_batch_keys(
            t_keys, kpos, klo, kspan, n_straight=plan.n_straight)

    np.asarray(run_once()[0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(N_MASK_REPEATS):
        out = run_once()
    final = np.asarray(out[0])
    dt = time.perf_counter() - t0
    # the exact kernel must reproduce the packed kernel's top score
    # (this workload has no ambiguity flags)
    assert int(final.max()) == packed_max, (int(final.max()), packed_max)
    keys_rate = N_MASK_REPEATS * MASK_BATCH * N_TARGETS / dt

    # x-union lane form of the same kernel on the same key planes (0.5x
    # the gathered rows for 1.5x the range tests — the standing A/B of
    # docs/DESIGN.md §6)
    uplan = pixel_match.build_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    u_pos = jax.device_put(np.stack([uplan.u_pos] * MASK_BATCH))
    mu_pos = jax.device_put(np.stack([uplan.mu_pos] * MASK_BATCH))
    lane_lo = jax.device_put(np.stack([uplan.lane_lo] * MASK_BATCH))
    lane_span = jax.device_put(np.stack([uplan.lane_span] * MASK_BATCH))

    def union_once():
        return pixel_match.score_query_batch_union_keys(
            t_keys, u_pos, mu_pos, lane_lo, lane_span)

    np.asarray(union_once()[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(N_MASK_REPEATS):
        out = union_once()
    final = np.asarray(out[0])
    dt = time.perf_counter() - t0
    assert int(final.max()) == packed_max, (int(final.max()), packed_max)
    union_rate = N_MASK_REPEATS * MASK_BATCH * N_TARGETS / dt

    # full (x+y) union form: one gathered row set per orientation
    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    f_pos = jax.device_put(np.stack([fplan.u_pos] * MASK_BATCH))
    fm_pos = jax.device_put(np.stack([fplan.mu_pos] * MASK_BATCH))
    f_lo = jax.device_put(np.stack([fplan.lane_lo] * MASK_BATCH))
    f_span = jax.device_put(np.stack([fplan.lane_span] * MASK_BATCH))

    def full_union_once():
        return pixel_match.score_query_batch_union_keys(
            t_keys, f_pos, fm_pos, f_lo, f_span)

    np.asarray(full_union_once()[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(N_MASK_REPEATS):
        out = full_union_once()
    final = np.asarray(out[0])
    dt = time.perf_counter() - t0
    assert int(final.max()) == packed_max, (int(final.max()), packed_max)
    full_union_rate = N_MASK_REPEATS * MASK_BATCH * N_TARGETS / dt
    fu_rows = fplan.u_pos.size + fplan.mu_pos.size
    fu_gather_gb_s = (N_MASK_REPEATS * MASK_BATCH * fu_rows * N_TARGETS
                      * 4 / dt / 1e9)
    return keys_rate, union_rate, full_union_rate, fu_gather_gb_s


def bench_shape_tpu(mask_rgb, target_rgb, region):
    """Shape (gradient-area-gap) pass rate: one mask vs SHAPE_TARGETS
    synthesized targets, both orientations (the production mirror
    config), through the engine's split support-row form: gap rows
    (query non-black, grad|slice words) and he rows (r=60 ring, one
    foreground byte) scored by dedicated kernels
    (ops/shape_score.pack_target_rows_split)."""
    import jax
    import jax.numpy as jnp

    from colormipsearch_tpu.ops import shape_score

    q_pack = shape_score.pack_query(mask_rgb, excluded_region=region)
    pos_gap, pos_he = shape_score.support_split(q_pack)
    n_gap = shape_score.support_bucket(pos_gap.size, minimum=1024)
    n_he = shape_score.he_words(pos_he.size)
    qg, qh = shape_score.sparse_query_split(q_pack, pos_gap, n_gap,
                                            pos_he, n_he)
    q_gap = jnp.asarray(np.stack([qg, qg]))
    q_he = jnp.asarray(np.stack([qh, qh]))

    # synthesize packed support rows on device: realistic field sparsity
    # without uploading SHAPE_TARGETS full images over the tunnel
    @jax.jit
    def make(key):
        k1, k2, k3 = jax.random.split(key, 3)
        gshape = (2, n_gap, SHAPE_TARGETS)
        grad = jax.random.randint(k1, gshape, 0, 1 << 16)
        sl = jax.random.randint(k2, gshape, 0, 257)
        word = (grad | (sl << 16)).astype(jnp.uint32)
        t_gap = jnp.where(
            (jnp.arange(n_gap) < pos_gap.size)[None, :, None],
            word, jnp.uint32(0))
        # bitpacked ring-row fg: AND of 4 uniform words gives ~6.25%
        # bit density, matching realistic CDM foreground
        hshape = (2, n_he, SHAPE_TARGETS)
        bits = jax.random.bits(k3, (4,) + hshape, jnp.uint32)
        t_he = jnp.where(
            (jnp.arange(n_he) * 32 < pos_he.size)[None, :, None],
            bits[0] & bits[1] & bits[2] & bits[3], jnp.uint32(0))
        return t_gap, t_he

    t_gap, t_he = jax.block_until_ready(make(jax.random.PRNGKey(0)))

    def run_once():
        # mirror config: both orientations, both row classes, 1 dispatch
        return shape_score.shape_score_pairs_split(t_gap, q_gap,
                                                   t_he, q_he)

    np.asarray(run_once()[0][0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(SHAPE_REPEATS):
        out = run_once()
    np.asarray(out[0][0])
    dt = time.perf_counter() - t0
    return SHAPE_REPEATS * SHAPE_TARGETS / dt


def bench_oracle_baseline(mask_rgb, targets, region):
    """Single-core positions-only scorer emulating the reference's access
    pattern (PixelMatchColorDepthSearchAlgorithm.calculateScore:235-263:
    only query positions are touched, no full-image precompute), but
    vectorized with numpy — i.e. an upper bound on the Java scalar loop's
    per-core speed.  Scaled by the production node concurrency."""
    from colormipsearch_tpu.oracle.pixel import (
        PixelMatchOracle,
        classify_rgb,
        pixel_gap,
        ratio_f64,
    )

    oracle = PixelMatchOracle(mask_rgb, 20, mirror=True, target_threshold=20,
                              z_tolerance=0.01, xy_shift=2,
                              excluded_region=region)
    variants = np.concatenate([oracle.variants, oracle.mirror_variants])

    def score_one(target):
        flat = target.reshape(-1, 3)
        best = 0
        for pos in variants:
            ok = pos >= 0
            tp = pos[ok]
            px = flat[tp]
            sel = px.astype(np.int32).max(axis=-1) > 20
            if not sel.any():
                continue
            cls, s, p = classify_rgb(px[sel])
            r = ratio_f64(cls, s, p)
            gaps = pixel_gap(oracle.q_cls[ok][sel], oracle.q_ratio[ok][sel],
                             cls, r)
            best = max(best, int(np.count_nonzero(gaps <= 0.01)))
        return best

    t0 = time.perf_counter()
    for i in range(BASELINE_ORACLE_TARGETS):
        score_one(targets[i])
    dt = time.perf_counter() - t0
    single_core = BASELINE_ORACLE_TARGETS / dt
    return single_core * REFERENCE_NODE_THREADS


def main() -> int:
    mask_rgb, target_rgb, host_sample, region = build_workload()
    (packed_rate, gather_gb_s, keys_rate, union_rate, full_union_rate,
     fu_gather_gb_s, plan) = bench_tpu(mask_rgb, target_rgb, region)
    shape_rate = bench_shape_tpu(mask_rgb, target_rgb, region)
    baseline_rate = bench_oracle_baseline(mask_rgb, host_sample, region)
    result = {
        "metric": "cds_pair_comparisons_per_sec_per_chip",
        # headline = the engine's production-default kernel: the full
        # (x+y) union form of the rank-key interval kernel (exact
        # predicate, no oracle fallback; docs/DESIGN.md §6)
        "value": round(full_union_rate, 1),
        "unit": "mask-target pairs/s (prod params: thr 20/20, xyShift 2, "
                f"mirror, {plan.query_size}-px query, T={N_TARGETS} "
                "shard; full-union rank-key kernel, the engine default)",
        "vs_baseline": round(full_union_rate / baseline_rate, 2),
        "extra": {
            "full_union_gather_gb_per_s": round(fu_gather_gb_s, 1),
            "packed_pairs_per_s": round(packed_rate, 1),
            "packed_unit": "packed-plane kernel (banded-f32 predicate + "
                           f"oracle fallback, {plan.n_variants} shift "
                           "variants; docs/DESIGN.md §2)",
            "packed_gather_gb_per_s": round(gather_gb_s, 1),
            "packed_pct_hbm_peak": round(100 * gather_gb_s
                                         / HBM_PEAK_GB_S, 1),
            "keys_pairs_per_s": round(keys_rate, 1),
            "keys_unit": "classic rank-key interval kernel "
                         "(docs/DESIGN.md §2.4) on the same workload",
            "union_keys_pairs_per_s": round(union_rate, 1),
            "union_keys_unit": "x-union lane form of the key kernel "
                               "(0.5x gather rows; docs/DESIGN.md §6)",
            "shape_pairs_per_s": round(shape_rate, 1),
            "shape_unit": "shape-rescored mask-target pairs/s (mirror "
                          f"config, T={SHAPE_TARGETS})",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
