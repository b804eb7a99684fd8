"""Pixel-match kernel throughput sweep on the real TPU.

Measures pairs/s and effective gather bandwidth for the production CDS
workload (fixture mask, 18 shift/mirror variants) across target-shard
widths T and mask-batch sizes B, plus a gather-only kernel to separate
gather/HBM cost from VPU predicate cost.  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sweep.py

Prints one JSON line per configuration; pass --out FILE to also append
them to a file.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FIX = ("/root/reference/colormipsearch-api/src/test/resources/"
       "colormipsearch/api/cdsearch")
MASK_TIF = f"{FIX}/1752016801-LPLC2-RT_18U.tif"
TARGET_TIF = (f"{FIX}/GMR_31G04_AE_01-20190813_66_F3-40x-Brain-"
              "JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def emit(rec: dict, out: str | None = None):
    """Print one JSON result line; append it to `out` when given (every
    mode honours --out, not just the default width sweep)."""
    line = json.dumps(rec)
    print(line, flush=True)
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")


def build_plan():
    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask
    from colormipsearch_tpu.ops import pixel_match

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    region = label_regions_mask(w, h)
    plan = pixel_match.build_query_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    return plan, target_rgb


@functools.partial(jax.jit, donate_argnums=0)
def _write_chunk(planes, chunk, start):
    return jax.lax.dynamic_update_slice(planes, chunk, (0, start))


def build_planes(target_rgb: np.ndarray, n_targets: int):
    """Pack n_targets device-synthesized rolled/flipped CDM variants into
    a [P, n_targets] plane array without a 2x concat peak (donated
    incremental writes)."""
    from colormipsearch_tpu.ops import common

    h, w = target_rgb.shape[:2]
    rng = np.random.default_rng(0)
    shifts = rng.integers(0, [h, w], (n_targets, 2)).astype(np.int32)
    shifts[0] = 0
    flips = (np.arange(n_targets) % 2).astype(bool)
    flips[0] = False
    base = jnp.asarray(target_rgb)

    @jax.jit
    def make_chunk(img, sh, fl):
        def one(s, f):
            r = jnp.roll(img, (s[0], s[1]), axis=(0, 1))
            return jnp.where(f, r[:, ::-1], r)

        return common.pack_target_planes(jax.vmap(one)(sh, fl))

    chunk = 64
    planes = jnp.zeros((h * w, n_targets), jnp.uint32)
    for i in range(0, n_targets, chunk):
        c = make_chunk(base, jnp.asarray(shifts[i:i + chunk]),
                       jnp.asarray(flips[i:i + chunk]))
        planes = _write_chunk(planes, c, jnp.int32(i))
    return jax.block_until_ready(planes)


def time_step(run_once, repeats):
    """Honest timing: dispatch `repeats` steps, materialize the last."""
    np.asarray(run_once()[0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = run_once()
    final = np.asarray(out[0])
    dt = time.perf_counter() - t0
    assert int(np.asarray(final).max()) >= 0
    return dt


def gather_only_step(planes, pos):
    """Gather the same rows as the full kernel, reduce with a sum —
    isolates gather/HBM cost from the predicate VPU cost."""

    @jax.jit
    def step(planes, pos):
        def one(pos_b):
            def per_variant(pos_v):
                g = jnp.take(planes, jnp.maximum(pos_v, 0), axis=0)
                return g.sum(axis=0, dtype=jnp.uint32)

            outs = [per_variant(pos_b[v]) for v in range(pos_b.shape[0])]
            return jnp.stack(outs).max(axis=0)

        return (jax.lax.map(one, pos),)

    return functools.partial(step, planes, pos)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default=None,
                    help="comma list of target shard widths (default "
                         "512,1024,2048,4096 for the sweep; the --split/"
                         "--keys A/Bs default to 2048 — the widest that "
                         "keeps both plane sets co-resident in 16 GB HBM)")
    ap.add_argument("--batches", default="8")
    ap.add_argument("--extra-batches", default="16,32",
                    help="mask batches tried at the widest width")
    ap.add_argument("--repeats-pairs", type=float, default=4e6,
                    help="aim for this many pairs per timing run")
    ap.add_argument("--gather-only", action="store_true")
    ap.add_argument("--strip-experiment", action="store_true")
    ap.add_argument("--split", action="store_true",
                    help="A/B the 3-byte split-plane kernel against the "
                         "packed-u32 kernel at the widest width")
    ap.add_argument("--keys", action="store_true",
                    help="A/B the rank-key interval kernel against the "
                         "packed-u32 kernel at the widest width")
    ap.add_argument("--union-keys", action="store_true",
                    help="A/B the x-union lane form of the key kernel "
                         "against the classic key kernel (keys planes "
                         "only — defaults to the production T=4096)")
    ap.add_argument("--split-keys", action="store_true",
                    help="A/B the full-union kernel on u32 vs split "
                         "(u16 rank + u8 cls) key planes")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.strip_experiment:
        # u32 planes + the >>16 temp + u16 copy must coexist in HBM
        strip_gather_experiment(t_width=1024)
        return 0
    if args.split:
        split_kernel_experiment(
            t_width=int(args.widths.split(",")[-1]) if args.widths
            else 2048,
            b=int(args.batches.split(",")[0]),
            repeats_pairs=args.repeats_pairs, out=args.out)
        return 0
    if args.keys:
        keys_kernel_experiment(
            t_width=int(args.widths.split(",")[-1]) if args.widths
            else 2048,
            b=int(args.batches.split(",")[0]),
            repeats_pairs=args.repeats_pairs, out=args.out)
        return 0
    if args.union_keys:
        union_keys_experiment(
            t_width=int(args.widths.split(",")[-1]) if args.widths
            else 4096,
            b=int(args.batches.split(",")[0]),
            repeats_pairs=args.repeats_pairs, out=args.out)
        return 0
    if args.split_keys:
        split_keys_experiment(
            t_width=int(args.widths.split(",")[-1]) if args.widths
            else 2048,
            b=int(args.batches.split(",")[0]),
            repeats_pairs=args.repeats_pairs, out=args.out)
        return 0

    plan, target_rgb = build_plan()
    v, q = plan.positions.shape
    log(f"plan: {plan.query_size} px, {v} variants, padded Q {q}")
    log(f"devices: {jax.devices()}")

    from colormipsearch_tpu.ops import pixel_match

    results = []

    def record(**kw):
        results.append(kw)
        line = json.dumps(kw)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")

    widths = [int(x) for x in
              (args.widths or "512,1024,2048,4096").split(",")]
    batches = [int(x) for x in args.batches.split(",")]
    extra_batches = [int(x) for x in args.extra_batches.split(",") if x]

    for t_width in widths:
        t0 = time.perf_counter()
        planes = build_planes(target_rgb, t_width)
        log(f"T={t_width}: packed planes "
            f"({planes.nbytes / 1e9:.1f} GB) in "
            f"{time.perf_counter() - t0:.1f}s")
        batch_list = batches + (extra_batches if t_width == widths[-1]
                                else [])
        for b in batch_list:
            pos = jax.device_put(np.stack([plan.positions] * b))
            q_cls = jax.device_put(np.stack([plan.q_cls] * b))
            q_s = jax.device_put(np.stack([plan.q_s] * b))
            q_p = jax.device_put(np.stack([plan.q_p] * b))

            def run_once():
                return pixel_match.score_query_batch(
                    planes, pos, q_cls, q_s, q_p,
                    target_threshold=20, ztol_num=plan.ztol_num,
                    ztol_den=plan.ztol_den, n_straight=plan.n_straight)

            pairs_per_step = b * t_width
            repeats = max(2, int(args.repeats_pairs / pairs_per_step))
            dt = time_step(run_once, repeats)
            rate = repeats * pairs_per_step / dt
            gbs = repeats * b * v * q * t_width * 4 / dt / 1e9
            record(kind="full", t_width=t_width, mask_batch=b,
                   pairs_per_s=round(rate), gather_gb_per_s=round(gbs, 1),
                   repeats=repeats, secs=round(dt, 2))

            if args.gather_only:
                dtg = time_step(gather_only_step(planes, pos), repeats)
                record(kind="gather_only", t_width=t_width, mask_batch=b,
                       pairs_per_s=round(repeats * pairs_per_step / dtg),
                       gather_gb_per_s=round(
                           repeats * b * v * q * t_width * 4 / dtg / 1e9, 1),
                       repeats=repeats, secs=round(dtg, 2))
        del planes

    best = max((r for r in results if r["kind"] == "full"),
               key=lambda r: r["pairs_per_s"])
    log(f"best: {best}")
    return 0




def split_kernel_experiment(t_width=2048, b=8, repeats_pairs=4e6,
                            out=None):
    """A/B: packed-u32 kernel vs the 3-byte split-plane kernel
    (u16 (p<<8)|s + u8 cls), both with the data threshold folded into
    the pack (the engine's production configuration).

    t_width 2048 keeps u32 (5.6 GB) + split (4.2 GB) planes co-resident
    in the 16 GB HBM; the threshold fold donates the source planes to
    avoid a 2x peak."""
    import functools

    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.ops import common as ops_common
    from colormipsearch_tpu.ops import pixel_match

    plan, target_rgb = build_plan()
    v, q = plan.positions.shape
    planes = build_planes(target_rgb, t_width)

    @functools.partial(jax.jit, donate_argnums=0)
    def fold(pl):
        return jnp.where((pl & 0xFF) > 20, pl, 0).astype(jnp.uint32)

    folded = jax.block_until_ready(fold(planes))
    del planes
    t_sp, t_c8 = ops_common.split_planes_from_packed(folded)
    t_sp, t_c8 = jax.block_until_ready((t_sp, t_c8))

    pos = jax.device_put(np.stack([plan.positions] * b))
    q_cls = jax.device_put(np.stack([plan.q_cls] * b))
    q_s = jax.device_put(np.stack([plan.q_s] * b))
    q_p = jax.device_put(np.stack([plan.q_p] * b))
    repeats = max(2, int(repeats_pairs / (b * t_width)))

    def packed_once():
        return pixel_match.score_query_batch(
            folded, pos, q_cls, q_s, q_p, target_threshold=-1,
            ztol_num=plan.ztol_num, ztol_den=plan.ztol_den,
            n_straight=plan.n_straight)

    def split_once():
        return pixel_match.score_query_batch_split(
            t_sp, t_c8, pos, q_cls, q_s, q_p,
            ztol_num=plan.ztol_num, ztol_den=plan.ztol_den,
            n_straight=plan.n_straight)

    for name, fn, bytes_px in (("packed_u32", packed_once, 4),
                               ("split_u16u8", split_once, 3)):
        dt = time_step(fn, repeats)
        emit({
            "kind": name, "t_width": t_width, "mask_batch": b,
            "pairs_per_s": round(repeats * b * t_width / dt),
            "gather_gb_per_s": round(
                repeats * b * v * q * t_width * bytes_px / dt / 1e9, 1),
            "repeats": repeats, "secs": round(dt, 2)}, out)


def keys_kernel_experiment(t_width=2048, b=8, repeats_pairs=4e6,
                           out=None):
    """A/B: packed-u32 banded kernel vs the rank-key interval kernel
    (same 4 B/pixel gather; ~3x fewer per-element VPU intermediates and
    an exact verdict — docs/DESIGN.md).

    t_width 2048 keeps both plane sets (5.6 GB each) co-resident; run a
    second pass with --widths 4096 after deleting one if HBM allows."""
    import functools

    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.ops import common as ops_common
    from colormipsearch_tpu.ops import pixel_match

    plan, target_rgb = build_plan()
    v, q = plan.positions.shape
    planes = build_planes(target_rgb, t_width)

    @functools.partial(jax.jit, donate_argnums=0)
    def fold(pl):
        return jnp.where((pl & 0xFF) > 20, pl, 0).astype(jnp.uint32)

    folded = jax.block_until_ready(fold(planes))
    del planes
    t_keys = jax.block_until_ready(ops_common.key_planes_from_packed(
        folded, ops_common.rank_lut_device()))

    kplan = pixel_match.key_plan_from_query_plan(
        plan, target_rgb.shape[0] * target_rgb.shape[1], 1.0)
    pos = jax.device_put(np.stack([plan.positions] * b))
    q_cls = jax.device_put(np.stack([plan.q_cls] * b))
    q_s = jax.device_put(np.stack([plan.q_s] * b))
    q_p = jax.device_put(np.stack([plan.q_p] * b))
    kpos = jax.device_put(np.stack([kplan.positions] * b))
    klo = jax.device_put(np.stack([kplan.lo] * b))
    kspan = jax.device_put(np.stack([kplan.span] * b))
    repeats = max(2, int(repeats_pairs / (b * t_width)))

    def packed_once():
        return pixel_match.score_query_batch(
            folded, pos, q_cls, q_s, q_p, target_threshold=-1,
            ztol_num=plan.ztol_num, ztol_den=plan.ztol_den,
            n_straight=plan.n_straight)

    def keys_once():
        return pixel_match.score_query_batch_keys(
            t_keys, kpos, klo, kspan, n_straight=plan.n_straight)

    # equality spot check before timing (scores must agree where the
    # packed path is un-flagged; the fixture workload has no flags)
    pb, pm, pf = (np.asarray(x) for x in packed_once())
    kb, km, kf = (np.asarray(x) for x in keys_once())
    agree = (pb == kb) | (pf > 0)
    log(f"keys-vs-packed equality: {agree.all()} "
        f"(flags on packed: {int(pf.sum())})")
    # a disagreement invalidates the A/B (and the exactness claim) —
    # refuse to emit timing lines that look like a valid comparison
    assert agree.all(), np.argwhere(~agree)[:5]

    for name, fn in (("packed_u32", packed_once),
                     ("rank_keys", keys_once)):
        dt = time_step(fn, repeats)
        emit({
            "kind": name, "t_width": t_width, "mask_batch": b,
            "pairs_per_s": round(repeats * b * t_width / dt),
            "gather_gb_per_s": round(
                repeats * b * v * q * t_width * 4 / dt / 1e9, 1),
            "repeats": repeats, "secs": round(dt, 2)}, out)


def build_key_planes(target_rgb: np.ndarray, n_targets: int):
    """Pack n_targets device-synthesized variants straight into rank-key
    planes [P+1, n_targets] (threshold 20 folded), without ever holding
    the packed-u32 planes — lets the A/B run at the production T=4096
    inside 16 GB HBM."""
    from colormipsearch_tpu.ops import common

    h, w = target_rgb.shape[:2]
    rng = np.random.default_rng(0)
    shifts = rng.integers(0, [h, w], (n_targets, 2)).astype(np.int32)
    shifts[0] = 0
    flips = (np.arange(n_targets) % 2).astype(bool)
    flips[0] = False
    base = jnp.asarray(target_rgb)
    lut = common.rank_lut_device()

    @jax.jit
    def make_chunk(img, sh, fl):
        def one(s, f):
            r = jnp.roll(img, (s[0], s[1]), axis=(0, 1))
            return jnp.where(f, r[:, ::-1], r)

        # drop the per-chunk sentinel row; the zeros-initialized final
        # row of the destination is the shared sentinel
        return common.pack_target_planes_keys(
            jax.vmap(one)(sh, fl), 20, lut)[:-1]

    chunk = 64
    planes = jnp.zeros((h * w + 1, n_targets), jnp.int32)
    for i in range(0, n_targets, chunk):
        c = make_chunk(base, jnp.asarray(shifts[i:i + chunk]),
                       jnp.asarray(flips[i:i + chunk]))
        planes = _write_chunk(planes, jnp.pad(c, ((0, 1), (0, 0))),
                              jnp.int32(i))
    return jax.block_until_ready(planes)


def union_keys_experiment(t_width=4096, b=8, repeats_pairs=4e6,
                          out=None):
    """A/B: classic rank-key kernel vs its x-union lane form (gather the
    x-dilated union once per dy-set, dx shifts as interval lanes — ~0.5x
    the gathered rows for 1.5x the range tests; see docs/DESIGN.md §6)."""
    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask
    from colormipsearch_tpu.ops import pixel_match

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    region = label_regions_mask(w, h)
    plan = pixel_match.build_query_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    kplan = pixel_match.key_plan_from_query_plan(plan, h * w, 1.0)
    uplan = pixel_match.build_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    v, q = kplan.positions.shape
    n_sets = uplan.n_sets * (2 if uplan.mirror else 1)
    u = uplan.u_pos.shape[1]
    f_sets = fplan.n_sets * (2 if fplan.mirror else 1)
    fu = fplan.u_pos.shape[1]
    log(f"classic: {v} variants x Q_pad {q}; x-union: {n_sets} row sets "
        f"x U_pad {u} (rows {n_sets * u / (v * q):.2f}x); full union: "
        f"{f_sets} x U_pad {fu} (rows {f_sets * fu / (v * q):.2f}x)")

    t0 = time.perf_counter()
    t_keys = build_key_planes(target_rgb, t_width)
    log(f"T={t_width}: key planes ({t_keys.nbytes / 1e9:.1f} GB) in "
        f"{time.perf_counter() - t0:.1f}s")

    kpos = jax.device_put(np.stack([kplan.positions] * b))
    klo = jax.device_put(np.stack([kplan.lo] * b))
    kspan = jax.device_put(np.stack([kplan.span] * b))
    u_pos = jax.device_put(np.stack([uplan.u_pos] * b))
    mu_pos = jax.device_put(np.stack([uplan.mu_pos] * b))
    lane_lo = jax.device_put(np.stack([uplan.lane_lo] * b))
    lane_span = jax.device_put(np.stack([uplan.lane_span] * b))
    f_pos = jax.device_put(np.stack([fplan.u_pos] * b))
    fm_pos = jax.device_put(np.stack([fplan.mu_pos] * b))
    f_lo = jax.device_put(np.stack([fplan.lane_lo] * b))
    f_span = jax.device_put(np.stack([fplan.lane_span] * b))
    repeats = max(2, int(repeats_pairs / (b * t_width)))

    def keys_once():
        return pixel_match.score_query_batch_keys(
            t_keys, kpos, klo, kspan, n_straight=plan.n_straight)

    def union_once():
        return pixel_match.score_query_batch_union_keys(
            t_keys, u_pos, mu_pos, lane_lo, lane_span)

    def full_union_once():
        return pixel_match.score_query_batch_union_keys(
            t_keys, f_pos, fm_pos, f_lo, f_span)

    # bucketed (tile-aligned) prefix, as the engine's batch stacking
    # produces — raw u2 is sublane-misaligned
    fu2 = fplan.u2
    if fu2 > 0:
        fu2 = min(fu, pixel_match._bucket(fu2, minimum=128))

    def full_union_seg_once():
        # slot-2 segmentation (the engine default): second range test
        # confined to the plan's u2 prefix
        return pixel_match.score_query_batch_union_keys(
            t_keys, f_pos, fm_pos, f_lo, f_span,
            u2=(fu2 if fu2 >= 0 else None))

    qk_stacked = pixel_match.stack_union_qkey_args([fplan] * b, h * w)
    full_union_qkeys_once = None
    if qk_stacked is not None:
        *qk_arrs, qk_u2 = qk_stacked
        qk_args = tuple(jax.device_put(a) for a in qk_arrs)
        qk_tabs = tuple(jax.device_put(a) for a in
                        pixel_match.interval_table_arrays(1.0 / 100.0))

        def full_union_qkeys_once():
            # engine-default wire form: device-side table gather
            return pixel_match.score_query_batch_union_qkeys(
                t_keys, *qk_args, *qk_tabs, u2=qk_u2)

    log(f"full-union slot-2 prefix u2={fplan.u2} (bucketed {fu2}) of "
        f"U_pad {fu} ({max(fu2, 0) / fu:.1%}); qkeys "
        f"{'yes' if qk_stacked is not None else 'no'}")
    kb, km, _ = (np.asarray(x) for x in keys_once())
    ub, um, _ = (np.asarray(x) for x in union_once())
    fb, fm, _ = (np.asarray(x) for x in full_union_once())
    sb, sm, _ = (np.asarray(x) for x in full_union_seg_once())
    log(f"x-union-vs-keys equality: {(kb == ub).all()} / "
        f"{(km == um).all()}; full-union: {(kb == fb).all()} / "
        f"{(km == fm).all()}; seg: {(kb == sb).all()} / "
        f"{(km == sm).all()}")
    assert (kb == ub).all() and (km == um).all(), \
        np.argwhere(kb != ub)[:5]
    assert (kb == fb).all() and (km == fm).all(), \
        np.argwhere(kb != fb)[:5]
    assert (kb == sb).all() and (km == sm).all(), \
        np.argwhere(kb != sb)[:5]

    if full_union_qkeys_once is not None:
        qb, qm, _ = (np.asarray(x) for x in full_union_qkeys_once())
        assert (kb == qb).all() and (km == qm).all(), \
            np.argwhere(kb != qb)[:5]
        log("qkeys equality: True / True")

    rows = {"rank_keys": v * q, "union_keys": n_sets * u,
            "full_union_keys": f_sets * fu,
            "full_union_seg": f_sets * fu,
            "full_union_qkeys": f_sets * fu}
    variants = [("rank_keys", keys_once),
                ("union_keys", union_once),
                ("full_union_keys", full_union_once),
                ("full_union_seg", full_union_seg_once)]
    if full_union_qkeys_once is not None:
        variants.append(("full_union_qkeys", full_union_qkeys_once))
    for name, fn in variants:
        dt = time_step(fn, repeats)
        emit({
            "kind": name, "t_width": t_width, "mask_batch": b,
            "pairs_per_s": round(repeats * b * t_width / dt),
            "gather_gb_per_s": round(
                repeats * b * rows[name] * t_width * 4 / dt / 1e9, 1),
            "repeats": repeats, "secs": round(dt, 2)}, out)


def split_keys_experiment(t_width=2048, b=8, repeats_pairs=4e6,
                          out=None):
    """A/B: full-union kernel on u32 key planes vs split (u16 rank +
    u8 cls) planes.  For the classic kernel this was a row-issue dead
    end; the full-union form is BANDWIDTH-bound at ~7.7M rows/s (far
    below the issue ceiling), so 0.75x bytes should trade favorably
    (DESIGN §6 round-4 entry)."""
    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask
    from colormipsearch_tpu.ops import pixel_match

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    region = label_regions_mask(w, h)
    fplan = pixel_match.build_full_union_key_plan(
        mask_rgb, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0,
        excluded_region=region)
    fu = fplan.u_pos.shape[1]
    fu2 = fplan.u2
    if fu2 > 0:
        fu2 = min(fu, pixel_match._bucket(fu2, minimum=128))

    t0 = time.perf_counter()
    t_keys = build_key_planes(target_rgb, t_width)
    r16, c8 = pixel_match.split_key_planes(t_keys)
    r16, c8 = jax.block_until_ready(r16), jax.block_until_ready(c8)
    log(f"T={t_width}: planes u32 {t_keys.nbytes / 1e9:.1f} GB + split "
        f"{(r16.nbytes + c8.nbytes) / 1e9:.1f} GB in "
        f"{time.perf_counter() - t0:.1f}s; u2={fu2}")

    f_pos = jax.device_put(np.stack([fplan.u_pos] * b))
    fm_pos = jax.device_put(np.stack([fplan.mu_pos] * b))
    f_lo = jax.device_put(np.stack([fplan.lane_lo] * b))
    f_span = jax.device_put(np.stack([fplan.lane_span] * b))
    repeats = max(2, int(repeats_pairs / (b * t_width)))

    def u32_once():
        return pixel_match.score_query_batch_union_keys(
            t_keys, f_pos, fm_pos, f_lo, f_span,
            u2=(fu2 if fu2 >= 0 else None))

    def split_once():
        return pixel_match.score_query_batch_union_keys_splitk(
            r16, c8, f_pos, fm_pos, f_lo, f_span,
            u2=(fu2 if fu2 >= 0 else None))

    ub, um, _ = (np.asarray(x) for x in u32_once())
    sb, sm, _ = (np.asarray(x) for x in split_once())
    assert (ub == sb).all() and (um == sm).all(), \
        np.argwhere(ub != sb)[:5]
    log("split-keys equality: True")
    rows = 2 * fu
    for name, fn, bpe in (("full_union_u32", u32_once, 4),
                          ("full_union_splitk", split_once, 3)):
        dt = time_step(fn, repeats)
        emit({
            "kind": name, "t_width": t_width, "mask_batch": b,
            "pairs_per_s": round(repeats * b * t_width / dt),
            "gather_gb_per_s": round(
                repeats * b * rows * t_width * bpe / dt / 1e9, 1),
            "repeats": repeats, "secs": round(dt, 2)}, out)


def strip_gather_experiment(t_width=2048, q=2048, repeats=300):
    """Gather microbenchmarks: plain uint32 row gathers vs uint16 rows
    (half the bytes — tells whether the gather is byte- or row-bound).

    A 5-row dynamic-slice strip variant (one descriptor covering the
    three x-shift variants) was also measured once at T=4096 and lowered
    catastrophically (30 GB/s vs 263 GB/s, with a pathological compile
    at other widths), so it is not part of the recurring experiment.
    """
    import jax
    import jax.numpy as jnp

    plan, target_rgb = build_plan()
    planes = build_planes(target_rgb, t_width)
    planes16 = (planes >> 16).astype(jnp.uint16)
    planes8 = (planes >> 24).astype(jnp.uint8)
    p_rows = planes.shape[0]
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        rng.integers(2, p_rows - 3, (q,)).astype(np.int32))
    w = 566

    # planes passed as ARGUMENTS: closing over a device array embeds it
    # as a lowered constant, which the remote-compile tunnel would
    # re-upload (GBs at ~10 MB/s)
    @jax.jit
    def rows9(pl, pos):
        acc = jnp.zeros((pl.shape[1],), jnp.uint32)
        for dy in (-2 * w, 0, 2 * w):
            for dx in (-2, 0, 2):
                g = jnp.take(pl, pos + (dy + dx), axis=0)
                acc = acc + g.sum(axis=0, dtype=jnp.uint32)
        return acc

    for name, pl, bytes_px in (("rows9_u32", planes, 4),
                               ("rows9_u16", planes16, 2),
                               ("rows9_u8", planes8, 1)):
        np.asarray(rows9(pl, pos))
        t0 = time.perf_counter()
        out = None
        for _ in range(repeats):
            out = rows9(pl, pos)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "kind": name,
            "rows_per_s": round(repeats * q * 9 / dt),
            "read_gb_per_s": round(
                repeats * q * 9 * t_width * bytes_px / dt / 1e9, 1),
            "secs": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
