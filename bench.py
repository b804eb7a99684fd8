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

import contextlib
import io
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

    # full (x+y) union form: one gathered row set per orientation, in
    # the engine-default qkey wire form (device-side table gather +
    # slot-2 segmentation) when available
    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    if fplan.qidx is not None:
        # the engine-default flow: factored wire form, lane tables
        # expanded ON DEVICE once per batch, fast tables kernel per
        # dispatch
        stacked = pixel_match.stack_union_qkey_args(
            [fplan] * MASK_BATCH, h * w)
        u_pos_s, mu_pos_s, qidx_s, kl_s, fu2 = stacked
        tabs = pixel_match.interval_table_arrays(1.0 / 100.0)
        f_lo, f_span = pixel_match.expand_union_tables(
            jax.device_put(qidx_s), jax.device_put(kl_s),
            jax.device_put(tabs[0]), jax.device_put(tabs[1]))
        f_pos = jax.device_put(u_pos_s)
        fm_pos = jax.device_put(mu_pos_s)

        def full_union_once():
            return pixel_match.score_query_batch_union_keys(
                t_keys, f_pos, fm_pos, f_lo, f_span, u2=fu2)
    else:
        f_pos = jax.device_put(np.stack([fplan.u_pos] * MASK_BATCH))
        fm_pos = jax.device_put(np.stack([fplan.mu_pos] * MASK_BATCH))
        f_lo = jax.device_put(np.stack([fplan.lane_lo] * MASK_BATCH))
        f_span = jax.device_put(np.stack([fplan.lane_span] * MASK_BATCH))

        def full_union_once():
            return pixel_match.score_query_batch_union_keys(
                t_keys, f_pos, fm_pos, f_lo, f_span,
                u2=(fplan.u2 if fplan.u2 >= 0 else None))

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


# ---------------------------------------------------------------------------
# end-to-end (decode-inclusive) benchmarks: production-shaped ON-DISK
# workloads driven through the REAL CLI paths — what the reference's
# grid envelope actually measures (cdsparams.sh job sizing;
# cmd/ColorDepthSearchCmd.java:195-340).  The kernel benches above
# synthesize targets device-side to keep the ~10 MB/s axon tunnel out
# of the measurement; these do NOT, so the CDS number also carries the
# host->device upload, which on a production host (PCIe, ~3 orders
# faster than the tunnel) is negligible — the split is reported so
# both regimes are readable.
# ---------------------------------------------------------------------------

E2E_CDS_MASKS = int(_os.environ.get("CDS_BENCH_E2E_MASKS", 16))
E2E_CDS_TARGETS = int(_os.environ.get("CDS_BENCH_E2E_TARGETS", 96))
E2E_SHAPE_TARGETS = int(_os.environ.get("CDS_BENCH_E2E_SHAPE_TARGETS", 2048))


def _synth_cdm_library(out_dir, src_rgb, n, *, seed, fmt="tif",
                       n_threads=1):
    """n rolled/flipped PackBits-TIFF variants of one real CDM
    (threaded for dress-scale counts)."""
    import concurrent.futures

    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = src_rgb.shape[:2]
    # i=0 stays unrolled so the real fixture pair (golden 87) is in
    # the library and at least one mask writes a result file
    rolls = [(0, 0)] + [(int(rng.integers(0, h)),
                         int(rng.integers(0, w)))
                        for _ in range(n - 1)]

    def write(i):
        t = src_rgb if i == 0 else np.roll(src_rgb, rolls[i],
                                           axis=(0, 1))
        if i % 2:
            t = t[:, ::-1]
        p = _os.path.join(out_dir, f"s{i:05d}_CDM.{fmt}")
        Image.fromarray(t).save(p, compression="packbits")
        return p

    if n_threads <= 1:
        return [write(i) for i in range(n)]
    with concurrent.futures.ThreadPoolExecutor(n_threads) as pool:
        return list(pool.map(write, range(n)))


def _run_cli(argv) -> None:
    from colormipsearch_tpu.cli.main import main as cli_main

    rc = cli_main([str(a) for a in argv])
    assert rc == 0, f"CLI failed ({rc}): {argv}"


def bench_e2e_cds(mask_rgb, target_rgb):
    """colorDepthSearch end to end: on-disk PackBits TIFFs -> data-input
    -> decode -> query plans -> device scoring -> streaming grouped JSON
    writes, timed as one CLI run.  Returns (pairs/s, split dict)."""
    import shutil
    import tempfile

    import jax

    from colormipsearch_tpu.io import native_decoder

    with tempfile.TemporaryDirectory() as tmp:
        masks_dir = _os.path.join(tmp, "masks")
        targets_dir = _os.path.join(tmp, "targets")
        _os.makedirs(masks_dir)
        _os.makedirs(targets_dir)
        t0 = time.perf_counter()
        _synth_cdm_library(masks_dir, mask_rgb, E2E_CDS_MASKS, seed=1)
        tpaths = _synth_cdm_library(targets_dir, target_rgb,
                                    E2E_CDS_TARGETS, seed=2)
        synth_s = time.perf_counter() - t0

        # split term 1: host decode rate (native batch decoder, the
        # engine's decode pool path)
        blobs = [open(p, "rb").read() for p in tpaths]
        h, w = target_rgb.shape[:2]
        t0 = time.perf_counter()
        _, ok = native_decoder.decode_img_batch(blobs, width=w, height=h,
                                                channels=3)
        decode_s = time.perf_counter() - t0
        assert ok.all()

        # split term 2: host->device upload of the target stack (the
        # engine uploads the uint8 stack once; key planes expand on
        # device).  Measured with a real transfer of the same bytes.
        stack = np.zeros((min(8, E2E_CDS_TARGETS), h, w, 3), np.uint8)
        dev = jax.device_put(stack)
        np.asarray(dev)  # warm
        t0 = time.perf_counter()
        np.asarray(jax.device_put(stack).sum())
        sample_s = time.perf_counter() - t0
        upload_s_est = sample_s * E2E_CDS_TARGETS / stack.shape[0]
        upload_gb_s = stack.nbytes / sample_s / 1e9

        # split term 3: query-plan build (once per mask on the host;
        # the first build also constructs the process-wide cached
        # key-interval table — reported separately)
        from colormipsearch_tpu.ops import pixel_match

        t0 = time.perf_counter()
        pixel_match.build_full_union_key_plan(
            mask_rgb, 20, mirror=True, xy_shift=2,
            pix_color_fluctuation=1.0)
        plan_cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(4):
            pixel_match.build_full_union_key_plan(
                mask_rgb, 20, mirror=True, xy_shift=2,
                pix_color_fluctuation=1.0)
        plan_s = (time.perf_counter() - t0) / 4

        for d, name in ((masks_dir, "m"), (targets_dir, "t")):
            _run_cli(["createColorDepthSearchDataInput", "-i", d,
                      "-l", f"e2e-{name}", "-od", tmp,
                      "--output-filename", f"{name}.json"])
        out = _os.path.join(tmp, "results")
        t0 = time.perf_counter()
        _run_cli(["colorDepthSearch",
                  "-m", _os.path.join(tmp, "m.json"),
                  "-i", _os.path.join(tmp, "t.json"),
                  "--maskThreshold", 20, "--dataThreshold", 20,
                  "--pixColorFluctuation", 1.0, "--xyShift", 2,
                  "--mirrorMask", "-od", out, "--perMaskSubdir", "pm"])
        wall = time.perf_counter() - t0
        import glob as _glob
        # zero-match masks write no file; the unrolled fixture pair
        # guarantees at least one real match (golden 87)
        n_files = len(_glob.glob(_os.path.join(out, "pm", "*.json")))
        assert n_files >= 1, "no result files written"
        pairs = E2E_CDS_MASKS * E2E_CDS_TARGETS
        split = {
            "masks": E2E_CDS_MASKS, "targets": E2E_CDS_TARGETS,
            "wall_s": round(wall, 2),
            "decode_targets_per_s": round(E2E_CDS_TARGETS / decode_s, 1),
            "plan_build_s_per_mask": round(plan_s, 3),
            "plan_table_init_s": round(plan_cold_s - plan_s, 3),
            "tunnel_upload_s_est": round(upload_s_est, 2),
            "tunnel_upload_gb_per_s": round(upload_gb_s, 4),
            "tunnel_upload_share": round(upload_s_est / wall, 2),
            "synth_s": round(synth_s, 1),
        }
        return pairs / wall, split


def bench_e2e_shape(mask_rgb, target_rgb):
    """gradientScores end to end: on-disk CDM+gradient+zgap triplets ->
    matches file -> decode/gather -> split shape kernel -> rewritten
    grouped JSON, as one CLI run.  Two passes: decode-inclusive (builds
    the packed-variant store behind) and store-hit (the decode-once
    production configuration).  Returns (hit_rate, build_rate)."""
    import tempfile

    from PIL import Image

    from colormipsearch_tpu.dataio.json_io import JSONMatchesWriter
    from colormipsearch_tpu.model import (
        CDMatch,
        ComputeFileType,
        FileData,
        Neuron,
    )
    from colormipsearch_tpu.oracle.shape import dilate_rgb, mask_rgb as mfn

    with tempfile.TemporaryDirectory() as tmp:
        lib = _os.path.join(tmp, "lib")
        _os.makedirs(lib)
        mask_path = _os.path.join(tmp, "mask.tif")
        Image.fromarray(mask_rgb).save(mask_path, compression="packbits")
        t0 = time.perf_counter()
        tpaths = _synth_cdm_library(lib, target_rgb, E2E_SHAPE_TARGETS,
                                    seed=3)
        rng = np.random.default_rng(0)
        h, w = target_rgb.shape[:2]
        grad = rng.integers(0, 400, (h, w)).astype(np.uint16)
        from colormipsearch_tpu.io.image import read_image

        grad_bytes = None
        zg_bytes = None
        for i, p in enumerate(tpaths):
            stem = p[:-4]
            # every target decodes its own grad/zgap files (the cost
            # being measured), but identical content is ENCODED once and
            # byte-copied — PNG encoding dense planes dominated synth
            if grad_bytes is None:
                Image.fromarray(grad).save(stem + "_grad.png")
                grad_bytes = open(stem + "_grad.png", "rb").read()
            else:
                open(stem + "_grad.png", "wb").write(grad_bytes)
            # one shared zgap dilation per 64 targets keeps synthesis
            # tractable; the decode cost being measured is unchanged
            if i % 64 == 0:
                zg = dilate_rgb(mfn(read_image(p).as_rgb(), 20), 20)
                buf = io.BytesIO()
                Image.fromarray(zg).save(buf, format="PNG")
                zg_bytes = buf.getvalue()
            open(stem + "_zgap.png", "wb").write(zg_bytes)
        synth_s = time.perf_counter() - t0

        mask_n = Neuron(mip_id="e2e-mask", published_name="e2e-mask")
        mask_n.set_compute_file(ComputeFileType.InputColorDepthImage,
                                FileData(mask_path))
        matches = []
        for i, p in enumerate(tpaths):
            t_n = Neuron(mip_id=f"s{i:05d}", published_name=f"s{i:05d}")
            t_n.set_compute_file(ComputeFileType.InputColorDepthImage,
                                 FileData(p))
            t_n.set_compute_file(ComputeFileType.GradientImage,
                                 FileData(p[:-4] + "_grad.png"))
            t_n.set_compute_file(ComputeFileType.ZGapImage,
                                 FileData(p[:-4] + "_zgap.png"))
            matches.append(CDMatch(mask_image=mask_n, matched_image=t_n,
                                   matching_pixels=100,
                                   matching_pixels_ratio=0.05))
        mdir = _os.path.join(tmp, "matches")
        writer = JSONMatchesWriter(per_masks_dir=mdir)
        writer.write(matches)
        writer.close()

        store = _os.path.join(tmp, "pack")
        rates = []
        for i in range(2):
            t0 = time.perf_counter()
            _run_cli(["gradientScores", "--matches", mdir,
                      "-od", _os.path.join(tmp, f"out{i}"),
                      "--maskThreshold", 20, "--mirrorMask",
                      "--packed-variants-store", store])
            rates.append(E2E_SHAPE_TARGETS / (time.perf_counter() - t0))
        print(f"# e2e shape: synth {synth_s:.1f}s, build "
              f"{rates[0]:.1f}/s, store-hit {rates[1]:.1f}/s",
              file=sys.stderr, flush=True)

        # split terms: the per-mask query pack (r=60/r=20 dilations),
        # the store's host-side tile gather rate, and the dispatch
        # plane upload (a tunnel artifact on this rig)
        import jax

        from colormipsearch_tpu.io.shape_pack import ShapePackStore
        from colormipsearch_tpu.ops import shape_score

        from colormipsearch_tpu.oracle.pixel import label_regions_mask

        region = label_regions_mask(w, h)  # the CLI run's default
        t0 = time.perf_counter()
        q_pack = shape_score.pack_query(mask_rgb, excluded_region=region)
        qpack_s = time.perf_counter() - t0
        pos_gap, pos_he = shape_score.support_split(q_pack)
        n_gap = shape_score.support_bucket(pos_gap.size, minimum=1024)
        n_he = shape_score.he_words(pos_he.size)
        st = ShapePackStore(store, h, w)
        gplan = shape_score.split_gather_plan(
            pos_gap, pos_he, w, mirror=True, excluded=region)
        rows = list(range(len(st)))
        t0 = time.perf_counter()
        t_gap, t_he = shape_score.select_target_tile_from_store(
            st, rows, pos_gap, n_gap, n_he, gplan, mirror=True)
        gather_s = time.perf_counter() - t0
        plane_mb = (t_gap.nbytes + t_he.nbytes) / 1e6
        buf = np.zeros(4 << 20, np.uint8)
        np.asarray(jax.device_put(buf).sum())  # warm
        t0 = time.perf_counter()
        np.asarray(jax.device_put(buf).sum())
        up_gb_s = buf.nbytes / (time.perf_counter() - t0) / 1e9
        split = {
            "targets": E2E_SHAPE_TARGETS,
            "query_pack_s_per_mask": round(qpack_s, 2),
            "store_gather_targets_per_s":
                round(len(rows) / gather_s, 1),
            "dispatch_plane_mb": round(plane_mb, 1),
            "tunnel_upload_s_est": round(plane_mb / 1e3 / up_gb_s, 2),
            "synth_s": round(synth_s, 1),
        }
        return rates[1], rates[0], split


# ---------------------------------------------------------------------------
# gradientScores production dress rehearsal (VERDICT r5 #1): the REAL
# gradientScores CLI over M masks x T packed-store targets — the
# production access pattern (CalculateGradientScoresCmd.java:124-222
# iterates mask partitions of 100-200 mask files, cdsparams.sh:56-66)
# — A/B: host tile pack (default) vs the device-resident store
# (CDS_SHAPE_STORE_DEVICE=1), reporting targets/s, per-mask wire
# bytes, and the stage split.
# ---------------------------------------------------------------------------

GRAD_DRESS_MASKS = int(_os.environ.get("CDS_BENCH_GRAD_DRESS_MASKS", 128))
GRAD_DRESS_TARGETS = int(_os.environ.get(
    "CDS_BENCH_GRAD_DRESS_TARGETS", 2048))
# host-pack pass mask budget: the host path uploads ~27 MB of dispatch
# planes PER MASK, and a first full-scale attempt showed that 3.4 GB of
# sustained tunnel transfers degrades the link monotonically (7 s ->
# 60 s per mask by mask 44) — so the host arm runs a SUBSET and reports
# the per-mask distribution + extrapolation; the device arm (whose
# point is precisely to eliminate that wire) runs every mask
GRAD_DRESS_HOST_MASKS = int(_os.environ.get(
    "CDS_BENCH_GRAD_DRESS_HOST_MASKS", 32))


def bench_e2e_gradscore_dress(mask_rgb, target_rgb):
    """dict with A/B walls, rates, per-mask wire bytes, stage splits."""
    import gc
    import tempfile

    import jax
    from PIL import Image

    from colormipsearch_tpu.dataio.json_io import JSONMatchesWriter
    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.model import (
        CDMatch,
        ComputeFileType,
        FileData,
        Neuron,
    )
    from colormipsearch_tpu.oracle.shape import dilate_rgb, mask_rgb as mfn
    from colormipsearch_tpu.utils.metrics import GLOBAL

    # earlier sections must not pin device memory next to the ~GB-scale
    # device-store fields
    gc.collect()
    for a in [a for a in jax.live_arrays() if a.nbytes > (64 << 20)]:
        a.delete()
    gc.collect()

    m_count, t_count = GRAD_DRESS_MASKS, GRAD_DRESS_TARGETS
    h, w = target_rgb.shape[:2]
    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as tmp:
        # --- target triplets (CDM + grad + zgap), byte-copied encodes
        lib = _os.path.join(tmp, "lib")
        _os.makedirs(lib)
        t0 = time.perf_counter()
        tpaths = _synth_cdm_library(lib, target_rgb, t_count, seed=21,
                                    n_threads=4)
        grad = rng.integers(0, 400, (h, w)).astype(np.uint16)
        grad_bytes = None
        zg_bytes = None
        for i, p in enumerate(tpaths):
            stem = p[:-4]
            if grad_bytes is None:
                Image.fromarray(grad).save(stem + "_grad.png")
                grad_bytes = open(stem + "_grad.png", "rb").read()
            else:
                open(stem + "_grad.png", "wb").write(grad_bytes)
            if i % 256 == 0:
                zg = dilate_rgb(mfn(read_image(p).as_rgb(), 20), 20)
                buf = io.BytesIO()
                Image.fromarray(zg).save(buf, format="PNG")
                zg_bytes = buf.getvalue()
            open(stem + "_zgap.png", "wb").write(zg_bytes)

        # --- M distinct masks (rolled variants of the real EM mask —
        # every mask has its own support set / gather plan)
        masks_dir = _os.path.join(tmp, "masks")
        _os.makedirs(masks_dir)
        mpaths = _synth_cdm_library(masks_dir, mask_rgb, m_count,
                                    seed=22, n_threads=4)
        synth_s = time.perf_counter() - t0

        # --- per-mask grouped matches files: every mask rescores the
        # full T-target store (the "top lines" of a production mask)
        t0 = time.perf_counter()
        t_neurons = []
        for i, p in enumerate(tpaths):
            t_n = Neuron(mip_id=f"t{i:05d}", published_name=f"t{i:05d}")
            t_n.set_compute_file(ComputeFileType.InputColorDepthImage,
                                 FileData(p))
            t_n.set_compute_file(ComputeFileType.GradientImage,
                                 FileData(p[:-4] + "_grad.png"))
            t_n.set_compute_file(ComputeFileType.ZGapImage,
                                 FileData(p[:-4] + "_zgap.png"))
            t_neurons.append(t_n)
        mdir = _os.path.join(tmp, "matches")
        writer = JSONMatchesWriter(per_masks_dir=mdir, pretty=False)
        for i, p in enumerate(mpaths):
            m_n = Neuron(mip_id=f"m{i:04d}", published_name=f"m{i:04d}")
            m_n.set_compute_file(ComputeFileType.InputColorDepthImage,
                                 FileData(p))
            writer.write([CDMatch(mask_image=m_n, matched_image=t_n,
                                  matching_pixels=100,
                                  matching_pixels_ratio=0.05)
                          for t_n in t_neurons])
        writer.close()
        matches_s = time.perf_counter() - t0

        store = _os.path.join(tmp, "pack")
        mask_files = sorted(_os.listdir(mdir))
        gs_keys = ("gs.queryPack.seconds", "gs.storeGather.seconds",
                   "gs.deviceTileBuild.seconds", "gs.dispatch.seconds",
                   "gs.wireBytes", "gs.storeUpload.seconds",
                   "gs.storeUploadBytes")

        partial: dict = {}
        partial_path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "bench_runs",
            "gradscore_dress_partial.json")

        def save_partial():
            # a wedge mid-run must not lose completed passes
            try:
                with open(partial_path, "w") as f:
                    json.dump(partial, f, indent=1)
            except OSError:
                pass

        def run_pass(name, files, out, device_store: bool):
            before = {k: GLOBAL.get(k) for k in gs_keys}
            # pin explicitly: the CLI auto-enables the device store
            # above a mask-count threshold, and the host arm must stay
            # the host arm
            _os.environ["CDS_SHAPE_STORE_DEVICE"] = \
                "1" if device_store else "0"
            try:
                t0 = time.perf_counter()
                _run_cli(["gradientScores", "--matches",
                          *[_os.path.join(mdir, f) for f in files],
                          "-od", out, "--maskThreshold", 20,
                          "--mirrorMask",
                          "--packed-variants-store", store])
                wall = time.perf_counter() - t0
            finally:
                _os.environ.pop("CDS_SHAPE_STORE_DEVICE", None)
            st = {k.split(".")[1]: round(GLOBAL.get(k) - before[k], 2)
                  for k in gs_keys}
            print(f"# gradscore dress {name}: {wall:.1f}s "
                  f"({len(files) * t_count / wall:.0f} targets/s)",
                  file=sys.stderr, flush=True)
            partial[name] = {"wall_s": round(wall, 1), "split": st,
                             "masks": len(files)}
            save_partial()
            return wall, st

        # store BUILD pass (decode-inclusive): one mask populates all
        # T rows — after this, every pass is store-hit, the production
        # decode-once state.  Device pass runs FIRST and over ALL
        # masks (its per-mask wire is ~KBs); the host arm is a subset
        # (see GRAD_DRESS_HOST_MASKS) extrapolated to the full count.
        build_wall, _build_st = run_pass("store-build", mask_files[:1],
                                         _os.path.join(tmp, "out_b"),
                                         False)
        ab_files = mask_files[1:]
        m_dev = len(ab_files)
        wall_dev, st_dev = run_pass("device-store", ab_files,
                                    _os.path.join(tmp, "out_d"),
                                    True)
        host_files = ab_files[:GRAD_DRESS_HOST_MASKS]
        m_host = len(host_files)
        wall_host, st_host = run_pass("host-pack", host_files,
                                      _os.path.join(tmp, "out_a"),
                                      False)

        # consistency: both passes produced identical scores on the
        # host arm's masks
        import glob as _glob
        a_files = sorted(_glob.glob(_os.path.join(tmp, "out_a", "*.json")))
        mismatched = 0
        for af in a_files[:8]:  # spot-check 8 masks
            df = _os.path.join(tmp, "out_d", _os.path.basename(af))
            da = json.load(open(af))
            dd = json.load(open(df))
            ka = [(r["image"]["mipId"], r.get("gradientAreaGap"),
                   r.get("highExpressionArea")) for r in da["results"]]
            kd = [(r["image"]["mipId"], r.get("gradientAreaGap"),
                   r.get("highExpressionArea")) for r in dd["results"]]
            mismatched += sorted(ka) != sorted(kd)
        assert mismatched == 0, "host vs device-store scores differ"

        host_wire_per_mask = st_host["wireBytes"] / max(m_host, 1)
        dev_fixed = st_dev["storeUploadBytes"]  # separate counter from
        dev_wire_per_mask = st_dev["wireBytes"] / max(m_dev, 1)  # wireBytes
        # masks needed for the one-time field upload to pay for itself
        # on wire bytes alone (host-side gather time is a separate win)
        breakeven = (dev_fixed / max(host_wire_per_mask
                                     - dev_wire_per_mask, 1)
                     if dev_fixed else 0)
        host_wall_extrap = wall_host * m_dev / max(m_host, 1)
        return {
            "masks": m_dev, "targets_per_mask": t_count,
            "store_build_wall_s": round(build_wall, 1),
            "host_pack": {
                "masks_run": m_host,
                "wall_s": round(wall_host, 1),
                "targets_per_s": round(m_host * t_count / wall_host, 1),
                "wall_extrapolated_to_all_masks_s":
                    round(host_wall_extrap, 1),
                "wire_mb_per_mask": round(host_wire_per_mask / 1e6, 2),
                "split": st_host,
            },
            "device_store": {
                "masks_run": m_dev,
                "wall_s": round(wall_dev, 1),
                "targets_per_s": round(m_dev * t_count / wall_dev, 1),
                "wire_kb_per_mask": round(dev_wire_per_mask / 1e3, 2),
                "store_upload_gb": round(dev_fixed / 1e9, 2),
                "split": st_dev,
            },
            "speedup_device_over_host":
                round(host_wall_extrap / wall_dev, 2),
            "wire_breakeven_masks": int(breakeven),
            "synth_s": round(synth_s + matches_s, 1),
            "note": "A/B on the same store-hit state; device arm runs "
                    "ALL masks, host arm a subset (its ~27 MB/mask "
                    "plane uploads degrade the tunnel monotonically — "
                    "measured 7->60 s/mask by mask 44 on the full-"
                    "width attempt), extrapolated per-mask-linearly; "
                    "storeUploadBytes is the device pass's one-time "
                    "fixed cost",
        }


# ---------------------------------------------------------------------------
# production dress rehearsal: the REAL colorDepthSearch CLI at amortized
# shape — T on-disk targets decoded + uploaded ONCE (sparse COO), reused
# across M on-disk masks (the production access pattern; cdsparams.sh
# runs 44,593 x 7,391).  Reports e2e pairs/s plus the in-run stage split
# (engine stage timers) and a projection to the full production run.
# ---------------------------------------------------------------------------

DRESS_MASKS = int(_os.environ.get("CDS_BENCH_DRESS_MASKS", 8192))
DRESS_TARGETS = int(_os.environ.get("CDS_BENCH_DRESS_TARGETS", 4096))


def bench_dress_rehearsal(mask_rgb, target_rgb):
    """(pairs_per_s, split dict) of the production-shaped CLI run."""
    import tempfile

    from colormipsearch_tpu.utils.metrics import GLOBAL

    import gc

    import jax

    # earlier sections must not pin device memory into the dress (a
    # leaked plane set next to the dress's own T=4096 planes OOMs HBM)
    gc.collect()
    live = [a for a in jax.live_arrays() if a.nbytes > (64 << 20)]
    if live:
        tot = sum(a.nbytes for a in live) / 1e9
        shapes = sorted(((a.nbytes, str(a.shape), str(a.dtype))
                         for a in live), reverse=True)[:6]
        print(f"# pre-dress leaked device arrays: {len(live)} "
              f"({tot:.2f} GB): {shapes}", file=sys.stderr, flush=True)
        for a in live:
            a.delete()
        del live
        gc.collect()

    m, t = DRESS_MASKS, DRESS_TARGETS
    with tempfile.TemporaryDirectory() as tmp:
        masks_dir = _os.path.join(tmp, "masks")
        targets_dir = _os.path.join(tmp, "targets")
        _os.makedirs(masks_dir)
        _os.makedirs(targets_dir)
        t0 = time.perf_counter()
        _synth_cdm_library(masks_dir, mask_rgb, m, seed=11, n_threads=4)
        _synth_cdm_library(targets_dir, target_rgb, t, seed=12, n_threads=4)
        synth_s = time.perf_counter() - t0
        for d, name in ((masks_dir, "m"), (targets_dir, "t")):
            _run_cli(["createColorDepthSearchDataInput", "-i", d,
                      "-l", f"dress-{name}", "-od", tmp,
                      "--output-filename", f"{name}.json"])
        # wide dispatches amortize per-batch round trips at this mask
        # count (engine reads the env at construction)
        _os.environ.setdefault("CDS_MASK_BATCH", "256")
        out = _os.path.join(tmp, "results")
        stages = ("cds.prepMasks.seconds", "cds.decodeTargets.seconds",
                  "cds.packUpload.seconds", "cds.scoreAllPairs.seconds",
                  "cds.planArgs.seconds", "cds.dispatch.seconds",
                  "cds.emit.seconds", "cds.packSelect.seconds",
                  "cds.packScatter.seconds")
        before = {s: GLOBAL.get(s) for s in stages}
        t0 = time.perf_counter()
        _run_cli(["colorDepthSearch",
                  "-m", _os.path.join(tmp, "m.json"),
                  "-i", _os.path.join(tmp, "t.json"),
                  "--maskThreshold", 20, "--dataThreshold", 20,
                  "--pixColorFluctuation", 1.0, "--xyShift", 2,
                  "--mirrorMask", "--pctPositivePixels", 1.0,
                  "-od", out, "--perMaskSubdir", "pm"])
        wall = time.perf_counter() - t0
        st = {s.split(".")[1]: round(GLOBAL.get(s) - before[s], 2)
              for s in stages}
        import glob as _glob
        assert _glob.glob(_os.path.join(out, "pm", "*.json")), \
            "no result files written (golden pair missing?)"
        pairs = m * t
        decode_upload = st["decodeTargets"] + st["packUpload"]
        # projection to the production 44,593 x 7,391 run on THIS rig.
        # Since the round-5 streaming prep, ALL three big components
        # overlap: mask prep streams into shard-0 scoring, and shard
        # i+1 decode+upload overlaps shard-i scoring — so the
        # projection is the max of the scaled components, not their
        # sum.  The device term scales by pairs at the in-run
        # dispatch+emit rate (dispatch = device step incl. result
        # materialization; emit = host JSON writes, serial with
        # dispatch in the scoring thread).
        dev_serial_s = max(st["dispatch"] + st["emit"], 1e-9)
        device_rate = pairs / dev_serial_s
        pm, pt = 44593, 7391
        comp_prep = st["prepMasks"] * pm / m
        comp_du = decode_upload * pt / t
        comp_score = pm * pt / device_rate
        proj = max(comp_prep, comp_du, comp_score)
        critical = max(0.0, decode_upload - st["prepMasks"])
        split = {
            "masks": m, "targets": t, "wall_s": round(wall, 1),
            **{k: v for k, v in st.items()},
            "decode_upload_share": round(decode_upload / wall, 3),
            "decode_upload_critical_share": round(critical / wall, 3),
            "device_score_pairs_per_s": round(device_rate, 1),
            "synth_s": round(synth_s, 1),
            "production_44593x7391_projection_s": round(proj, 1),
            "projection_components_s": {
                "prep": round(comp_prep, 1), "decode_upload":
                round(comp_du, 1), "score": round(comp_score, 1)},
            "note": "streamed stages: prepMasks overlaps shard-0 "
                    "scoring, decode/packUpload of shard i+1 overlap "
                    "scoring of shard i, so stage seconds can overlap "
                    "wall; projection = max of scaled components",
        }
        return pairs / wall, split


# ---------------------------------------------------------------------------
# mesh scaling sweep: pairs/s at 1..N devices with an efficiency column.
# Runs on the virtual CPU mesh here (each size needs its own process —
# XLA fixes the device count at backend init) and as-is on a pod slice
# later; the BASELINE.json north star is >=80% efficiency at N>=2 hosts
# measured at 1 chip / 1 host / N hosts.  Weak scaling: targets per
# device fixed, so perfect scaling = N x the 1-device rate.
# ---------------------------------------------------------------------------

# capped at the host core count: virtual CPU devices share cores, so
# n > cores measures host oversubscription, not the sharded step
# (VERDICT r3 weak #5) — a pod slice runs the sweep uncapped
MESH_SWEEP_SIZES = [
    n for n in (int(s) for s in _os.environ.get(
        "CDS_BENCH_MESH_SIZES", "1,2,4,8").split(","))
    if n <= (_os.cpu_count() or 8)]
MESH_TARGETS_PER_DEV = int(_os.environ.get("CDS_BENCH_MESH_TPD", 128))


def mesh_sweep_one(n_devices: int) -> float:
    """Child process: pairs/s of the sharded batched pixel-match step
    over an n-device mesh (weak scaling: MESH_TARGETS_PER_DEV targets
    per device).  Prints one JSON line."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_inputs
    from colormipsearch_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) >= n_devices, (
        len(jax.devices()), n_devices)
    mesh = pmesh.create_mesh(n_devices)
    t = MESH_TARGETS_PER_DEV * n_devices
    plan, planes, _q, _t = _synthetic_inputs(n_targets=t)
    planes = pmesh.shard_target_planes(mesh, planes)
    batch = 4
    step = pmesh.make_sharded_batch_step(
        mesh, target_threshold=20, ztol_num=1, ztol_den=100,
        n_straight=plan.n_straight)
    args = (planes,
            jnp.asarray(np.stack([plan.positions] * batch)),
            jnp.asarray(np.stack([plan.q_cls] * batch)),
            jnp.asarray(np.stack([plan.q_s] * batch)),
            jnp.asarray(np.stack([plan.q_p] * batch)))
    np.asarray(step(*args)[0])  # compile + warm
    reps = 8
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = step(*args)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    rate = reps * batch * t / dt
    print(json.dumps({"n": n_devices, "pairs_per_s": rate}))
    return rate


MESH_DEV_TOTAL = int(_os.environ.get("CDS_BENCH_MESH_DEV_TOTAL", "512"))


def mesh_sweep_device_one(n_devices: int) -> None:
    """Child process: device-step isolation (VERDICT r4 weak #4).

    STRONG scaling with a FIXED total workload (MESH_DEV_TOTAL targets
    sharded over n virtual devices): every input is device-resident
    before timing and the loop materializes only the [B] global-max —
    host feeding, decode, and result pulls are all out of the measured
    window.  On shared host cores total compute is constant vs n, so
    ideal wall is FLAT; the growth of step time with n isolates the
    partition + collective overhead, which is the only part of the
    curve that generalizes to a real pod slice (the existing weak-
    scaling sweep measures host oversubscription past the core count).
    Also times the collective tail alone (pmax; top-k merge) on a
    resident sharded score array."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _synthetic_inputs
    from colormipsearch_tpu.parallel import mesh as pmesh

    mesh = pmesh.create_mesh(n_devices)
    t = MESH_DEV_TOTAL
    plan, planes, _q, _t = _synthetic_inputs(n_targets=t)
    planes = pmesh.shard_target_planes(mesh, planes)
    batch = 4
    step = pmesh.make_sharded_batch_step(
        mesh, target_threshold=20, ztol_num=1, ztol_den=100,
        n_straight=plan.n_straight)
    args = (planes,
            jnp.asarray(np.stack([plan.positions] * batch)),
            jnp.asarray(np.stack([plan.q_cls] * batch)),
            jnp.asarray(np.stack([plan.q_s] * batch)),
            jnp.asarray(np.stack([plan.q_p] * batch)))
    np.asarray(step(*args)[3])  # compile + warm
    reps = 12
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(*args)
        np.asarray(out[3])  # [B] global max: forces the step, ~0 bytes
    step_s = (time.perf_counter() - t0) / reps

    # collective tails alone on a resident sharded [B, T] score array
    scores = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(
            0, 1 << 16, (batch, t), dtype=np.int32)),
        NamedSharding(mesh, P(None, pmesh.TARGET_AXIS)))

    def pmax_only(s):
        return jax.lax.pmax(s.max(axis=-1), pmesh.TARGET_AXIS)

    def topk_merge(s):
        k = 16
        ts, li = jax.lax.top_k(s, k)
        shard = jax.lax.axis_index(pmesh.TARGET_AXIS)
        gi = li + shard * s.shape[1]
        g = lambda x: jax.lax.all_gather(  # noqa: E731
            x, pmesh.TARGET_AXIS, axis=1, tiled=True)
        return g(ts), g(gi)

    spec = P(None, pmesh.TARGET_AXIS)
    cstep_pmax = jax.jit(pmesh.shard_map(
        pmax_only, mesh=mesh, in_specs=spec, out_specs=P(None),
        check_rep=False))
    cstep_topk = jax.jit(pmesh.shard_map(
        topk_merge, mesh=mesh, in_specs=spec, out_specs=(P(), P()),
        check_rep=False))
    np.asarray(cstep_pmax(scores))
    np.asarray(cstep_topk(scores)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(cstep_pmax(scores))
    pmax_s = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(cstep_topk(scores)[0])
    topk_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"n": n_devices, "step_s": step_s,
                      "pmax_s": pmax_s, "topk_merge_s": topk_s}))


def mesh_sweep_device() -> dict:
    """Parent: the strong-scaling device-step curve at each mesh size
    in its own CPU process; reports per-step seconds, the overhead
    ratio vs 1 device (ideal = 1.0 on shared cores), and the
    collective-tail costs."""
    import subprocess

    repo = _os.path.dirname(_os.path.abspath(__file__))
    rows: dict[int, dict] = {}
    sizes = [n for n in (1, 2, 4, 8)
             if n <= MESH_DEV_TOTAL]
    for n in sizes:
        env = dict(_os.environ)
        env["PYTHONPATH"] = repo  # NOT /root/.axon_site (CPU run)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        try:
            out = subprocess.run(
                [sys.executable, _os.path.join(repo, "bench.py"),
                 "--mesh-dev-one", str(n)],
                capture_output=True, text=True, timeout=600, env=env)
            rows[n] = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:  # keep the sweep best-effort per size
            print(f"# mesh dev sweep n={n} failed: {e}", file=sys.stderr)
    if not rows or 1 not in rows:
        return {}
    base = rows[1]["step_s"]
    return {
        "step_s_per_it": {str(n): round(r["step_s"], 4)
                          for n, r in rows.items()},
        "overhead_vs_1dev": {str(n): round(r["step_s"] / base, 3)
                             for n, r in rows.items()},
        "collective_pmax_ms": {str(n): round(r["pmax_s"] * 1e3, 2)
                               for n, r in rows.items()},
        "collective_topk_merge_ms": {
            str(n): round(r["topk_merge_s"] * 1e3, 2)
            for n, r in rows.items()},
        "unit": "STRONG scaling, fixed total "
                f"{MESH_DEV_TOTAL} targets sharded over n virtual CPU "
                "devices, all inputs device-resident, only the [B] "
                "global-max materialized (host feeding/decode/result "
                "pulls excluded).  Each virtual device gets its own "
                f"XLA executor thread on {_os.cpu_count()} cores: up "
                "to the core count the ratio tracks the sharded "
                "step's real parallel efficiency, past it "
                "oversubscription; the collective tails (pmax, top-k "
                "merge) are timed alone and are the directly pod-"
                "generalizable cost.  The host-inclusive weak-scaling "
                "sweep is reported separately",
    }


def mesh_sweep() -> dict:
    """Parent: run mesh_sweep_one at each size in its own CPU process
    (axon site dropped so the TPU tunnel is never dialed) and compute
    the efficiency column."""
    import subprocess

    repo = _os.path.dirname(_os.path.abspath(__file__))
    rates: dict[int, float] = {}
    for n in MESH_SWEEP_SIZES:
        env = dict(_os.environ)
        env["PYTHONPATH"] = repo  # NOT /root/.axon_site (CPU run)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        try:
            out = subprocess.run(
                [sys.executable, _os.path.join(repo, "bench.py"),
                 "--mesh-one", str(n)],
                capture_output=True, text=True, timeout=600, env=env)
            line = out.stdout.strip().splitlines()[-1]
            rates[n] = json.loads(line)["pairs_per_s"]
        except Exception as e:  # keep the sweep best-effort per size
            print(f"# mesh sweep n={n} failed: {e}", file=sys.stderr)
    if not rates or 1 not in rates:
        return {}
    base = rates[1]
    return {
        "pairs_per_s": {str(n): round(r, 1) for n, r in rates.items()},
        "efficiency": {str(n): round(r / (n * base), 3)
                       for n, r in rates.items()},
        "unit": "weak scaling on the virtual CPU mesh "
                f"({MESH_TARGETS_PER_DEV} targets/device; the stand-in "
                "curve for the pod-slice harness — CPU devices share "
                f"{_os.cpu_count()} cores, so efficiency at "
                "n > cores reflects host oversubscription, not the "
                "sharded step)",
    }


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


class _SectionTimeout(Exception):
    pass


@contextlib.contextmanager
def _watchdog(name: str, seconds: int):
    """SIGALRM watchdog for the optional bench sections: a wedged
    tunnel mid-section must not lose the WHOLE round artifact (the
    headline line prints regardless; the timed-out section reports its
    failure in extras)."""
    import signal

    def _raise(signum, frame):
        raise _SectionTimeout(name)

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> int:
    mask_rgb, target_rgb, host_sample, region = build_workload()
    (packed_rate, gather_gb_s, keys_rate, union_rate, full_union_rate,
     fu_gather_gb_s, plan) = bench_tpu(mask_rgb, target_rgb, region)
    shape_rate = bench_shape_tpu(mask_rgb, target_rgb, region)
    baseline_rate = bench_oracle_baseline(mask_rgb, host_sample, region)
    e2e = {}

    def make_full():
        return {
            "metric": "cds_pair_comparisons_per_sec_per_chip",
            # headline = the engine's production-default kernel: the
            # full (x+y) union form of the rank-key interval kernel
            # (exact predicate, no oracle fallback; docs/DESIGN.md §6)
            "value": round(full_union_rate, 1),
            "unit": "mask-target pairs/s (prod params: thr 20/20, "
                    f"xyShift 2, mirror, {plan.query_size}-px query, "
                    f"T={N_TARGETS} shard; full-union rank-key "
                    "kernel, the engine default)",
            "vs_baseline": round(full_union_rate / baseline_rate, 2),
            "extra": {
                "full_union_gather_gb_per_s": round(fu_gather_gb_s, 1),
                "packed_pairs_per_s": round(packed_rate, 1),
                "packed_unit": "packed-plane kernel (banded-f32 "
                               "predicate + oracle fallback, "
                               f"{plan.n_variants} shift variants; "
                               "docs/DESIGN.md §2)",
                "packed_gather_gb_per_s": round(gather_gb_s, 1),
                "packed_pct_hbm_peak": round(100 * gather_gb_s
                                             / HBM_PEAK_GB_S, 1),
                "keys_pairs_per_s": round(keys_rate, 1),
                "keys_unit": "classic rank-key interval kernel "
                             "(docs/DESIGN.md §2.4) on the same "
                             "workload",
                "union_keys_pairs_per_s": round(union_rate, 1),
                "union_keys_unit": "x-union lane form of the key "
                                   "kernel (0.5x gather rows; "
                                   "docs/DESIGN.md §6)",
                "shape_pairs_per_s": round(shape_rate, 1),
                "shape_unit": "shape-rescored mask-target pairs/s "
                              f"(mirror config, T={SHAPE_TARGETS})",
                **e2e,
            },
        }

    # hard deadline for the tunnel-touching tail (see _arm_emit_backstop)
    disarm = _arm_emit_backstop(make_full, int(_os.environ.get(
        "CDS_BENCH_HARD_DEADLINE", "6000")))
    if _os.environ.get("CDS_BENCH_MESH", "1") != "0":
        sweep = mesh_sweep()
        if sweep:
            e2e["mesh_sweep"] = sweep
        dev_sweep = mesh_sweep_device()
        if dev_sweep:
            e2e["mesh_sweep_device"] = dev_sweep
    e2e_done = False
    if _os.environ.get("CDS_BENCH_E2E", "1") != "0":
        try:
            with _watchdog("e2e", int(_os.environ.get(
                    "CDS_BENCH_E2E_TIMEOUT", "1800"))):
                e2e_cds_rate, e2e_cds_split = bench_e2e_cds(
                    mask_rgb, target_rgb)
                e2e_shape_hit, e2e_shape_build, e2e_shape_split = \
                    bench_e2e_shape(mask_rgb, target_rgb)
                e2e_done = True
        except _SectionTimeout:
            e2e["e2e_error"] = "e2e section timed out (wedged tunnel?)"
            print("# e2e section timed out", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 - keep the headline alive
            e2e["e2e_error"] = f"e2e section failed: {e!r}"[:300]
            print(f"# e2e section failed: {e!r}", file=sys.stderr,
                  flush=True)
    if _os.environ.get("CDS_BENCH_DRESS", "1") != "0":
        try:
            with _watchdog("dress", int(_os.environ.get(
                    "CDS_BENCH_DRESS_TIMEOUT", "2700"))):
                dress_rate, dress_split = bench_dress_rehearsal(
                    mask_rgb, target_rgb)
            e2e |= {
                "e2e_dress_pairs_per_s": round(dress_rate, 1),
                "e2e_dress_unit": "production-shaped colorDepthSearch "
                                  f"CLI ({DRESS_MASKS} on-disk masks x "
                                  f"{DRESS_TARGETS} on-disk targets, "
                                  "decode+upload amortized)",
                "e2e_dress_split": dress_split,
            }
        except _SectionTimeout:
            e2e["e2e_dress_error"] = \
                "dress section timed out (wedged tunnel?)"
            print("# dress section timed out", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001 - keep the headline alive
            e2e["e2e_dress_error"] = f"dress failed: {e!r}"[:300]
            print(f"# dress section failed: {e!r}", file=sys.stderr,
                  flush=True)
    if _os.environ.get("CDS_BENCH_GRAD_DRESS", "1") != "0":
        try:
            with _watchdog("gradscore_dress", int(_os.environ.get(
                    "CDS_BENCH_GRAD_DRESS_TIMEOUT", "2400"))):
                e2e["e2e_gradscore_dress"] = bench_e2e_gradscore_dress(
                    mask_rgb, target_rgb)
        except _SectionTimeout:
            e2e["e2e_gradscore_dress_error"] = \
                "gradscore dress timed out (wedged tunnel?)"
            print("# gradscore dress timed out", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001 - keep the headline alive
            e2e["e2e_gradscore_dress_error"] = \
                f"gradscore dress failed: {e!r}"[:300]
            print(f"# gradscore dress failed: {e!r}", file=sys.stderr,
                  flush=True)
    if e2e_done:
        e2e |= {
            "e2e_cds_pairs_per_s": round(e2e_cds_rate, 1),
            "e2e_cds_unit": "decode-inclusive colorDepthSearch CLI run "
                            "(on-disk PackBits TIFFs -> grouped JSON "
                            f"writes, {E2E_CDS_MASKS} masks x "
                            f"{E2E_CDS_TARGETS} targets); the wall "
                            "includes the axon tunnel's ~10 MB/s "
                            "host->device upload — see the split",
            "e2e_cds_split": e2e_cds_split,
            "e2e_shape_targets_per_s": round(e2e_shape_hit, 1),
            "e2e_shape_unit": "decode-once gradientScores CLI run "
                              f"({E2E_SHAPE_TARGETS} on-disk targets, "
                              "packed-variant store hit pass; "
                              "build pass = decode-inclusive)",
            "e2e_shape_build_targets_per_s": round(e2e_shape_build, 1),
            "e2e_shape_split": e2e_shape_split,
        }
    full = make_full()
    disarm()
    _emit_result(full)
    return 0


def _recent_bands(out_dir: str, current: dict, n_windows: int = 8) -> dict:
    """min/max bands over the most recent bench windows (including this
    one) for the headline kernel rate and the dress e2e rate — tunnel
    weather swings single points by ±10-40%, so cross-round comparisons
    need the band, not one draw (VERDICT r4 weak #3)."""
    import glob as _glob

    paths = sorted(_glob.glob(_os.path.join(out_dir, "bench_*.json")))
    series: dict[str, list] = {"kernel_pairs_per_s": [],
                               "e2e_dress_pairs_per_s": []}
    docs = []
    for p in paths[-(n_windows - 1):]:
        try:
            with open(p) as f:
                docs.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue
    docs.append(current)
    for d in docs:
        v = d.get("value")
        if isinstance(v, (int, float)) and v > 0:
            series["kernel_pairs_per_s"].append(float(v))
        dv = (d.get("extra") or {}).get("e2e_dress_pairs_per_s")
        if isinstance(dv, (int, float)) and dv > 0:
            series["e2e_dress_pairs_per_s"].append(float(dv))
    return {k: {"min": round(min(v), 1), "max": round(max(v), 1),
                "n_windows": len(v)}
            for k, v in series.items() if v}


def _emit_result(full) -> None:
    """Spill the full result (kernel variants, e2e splits, mesh sweep)
    to bench_runs/ and print a COMPACT headline line LAST: the round-3
    driver capture truncated the front of the one giant line and lost
    the headline value (VERDICT r3 weak #1)."""
    out_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "bench_runs")
    _os.makedirs(out_dir, exist_ok=True)
    full["band"] = _recent_bands(out_dir, full)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    full_path = _os.path.join(out_dir, f"bench_{stamp}.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "pairs/s/chip (full-union kernel, prod params, "
                f"T={N_TARGETS})",
        "vs_baseline": full["vs_baseline"],
        "extra": {k: full["extra"][k] for k in (
            "shape_pairs_per_s", "e2e_cds_pairs_per_s",
            "e2e_shape_targets_per_s", "e2e_dress_pairs_per_s")
            if k in full["extra"]},
        "band": full["band"],
        "full_result": full_path,
    }
    gd = full["extra"].get("e2e_gradscore_dress")
    if isinstance(gd, dict):
        compact["extra"]["e2e_gradscore_dress"] = {
            "host_targets_per_s": gd["host_pack"]["targets_per_s"],
            "device_targets_per_s": gd["device_store"]["targets_per_s"],
            "speedup": gd["speedup_device_over_host"]}
    print(json.dumps(compact), flush=True)


def _arm_emit_backstop(make_full, seconds: int):
    """Daemon-thread hard deadline for the whole e2e/dress tail: the
    SIGALRM watchdog cannot interrupt the main thread while it is
    blocked inside a jax/PJRT C call (a wedged tunnel blocks exactly
    there), so this thread emits whatever has been measured so far and
    exits the process — the round artifact survives any hang.  Call
    the returned function to disarm on normal completion."""
    import threading

    done = threading.Event()

    def guard():
        if not done.wait(seconds):
            print("# emit backstop fired (wedged tunnel?): emitting "
                  "partial result", file=sys.stderr, flush=True)
            full = make_full()
            full["extra"]["backstop"] = \
                f"e2e/dress tail hit the {seconds}s hard deadline"
            _emit_result(full)
            sys.stdout.flush()
            sys.stderr.flush()
            _os._exit(0)

    threading.Thread(target=guard, daemon=True).start()
    return done.set


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--mesh-one":
        mesh_sweep_one(int(sys.argv[2]))
        sys.exit(0)
    if len(sys.argv) >= 3 and sys.argv[1] == "--mesh-dev-one":
        mesh_sweep_device_one(int(sys.argv[2]))
        sys.exit(0)
    if len(sys.argv) >= 2 and sys.argv[1] == "--mesh-dev-sweep":
        print(json.dumps({"mesh_sweep_device": mesh_sweep_device()}))
        sys.exit(0)
    if len(sys.argv) >= 2 and sys.argv[1] == "--mesh-sweep":
        print(json.dumps({"mesh_sweep": mesh_sweep()}))
        sys.exit(0)
    sys.exit(main())
