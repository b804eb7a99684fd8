"""Exhaustive `-m slow` validation of the device predicates.

SURVEY §7 "Hard parts" calls for an exhaustive sweep of the device
pixel-match predicate against the reference float64 semantics
(cds/AbstractColorDepthSearchAlgorithm.calculatePixelGap:157-390): every
achievable hue-ratio pair (s/p with 0 <= s < p <= 255 — 32,640 ratios per
side, ~1.07e9 pairs per class pair) for every compatible class pair and
every production z-tolerance, proving the match / flag / non-match
trichotomy:

  * un-flagged elements must agree exactly with the float64 verdict,
  * flagged (ambiguity-band) elements are re-scored by the oracle in
    production, so they may disagree — but must be rare.

Plus the full 2^24 RGB -> z-slice table vs an independent line-by-line
transliteration of GradientAreaGapUtils.findSliceNumber(InLUT):108-198.

Run with: python -m pytest tests/ -m slow
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from colormipsearch_tpu.constants import (
    BG_GB,
    BR_BG,
    CLASS_BG,
    CLASS_BR,
    CLASS_GB,
    CLASS_GR,
    CLASS_RB,
    CLASS_RG,
    GB_GR,
    GR_RG,
    NO_MATCH_GAP,
    RG_RB,
    RAINBOW_LUT,
)
from colormipsearch_tpu.ops import pixel_match
from colormipsearch_tpu.ops.common import ztol_fraction

pytestmark = pytest.mark.slow


def all_ratio_pairs():
    """All (s, p) with 0 <= s < p <= 255: every achievable hue summary."""
    p, s = np.meshgrid(np.arange(1, 256), np.arange(0, 256), indexing="ij")
    keep = s < p
    return s[keep].astype(np.int32), p[keep].astype(np.int32)


S_ALL, P_ALL = all_ratio_pairs()
N_ALL = S_ALL.size  # 32640
R_ALL = S_ALL.astype(np.float64) / P_ALL.astype(np.float64)

# (query class, target class, f64 precondition, f64 gap) transliterated
# from calculatePixelGap's adjacent-class branches :260-388; the same-
# class branch (|r2 - r1|, requiring both ratios > 0) is shared by all
# six classes, so one representative suffices.
ADJACENT_CASES = [
    (CLASS_BR, CLASS_BG, lambda r1, r2: (r1 < 0.44) & (r2 < 0.54),
     lambda r1, r2: (r1 - BR_BG) + (r2 - BR_BG)),
    (CLASS_BG, CLASS_BR, lambda r1, r2: (r1 < 0.54) & (r2 < 0.44),
     lambda r1, r2: (r2 - BR_BG) + (r1 - BR_BG)),
    (CLASS_BG, CLASS_GB, lambda r1, r2: (r1 > 0.8) & (r2 > 0.8),
     lambda r1, r2: (BG_GB - r1) + (BG_GB - r2)),
    (CLASS_GB, CLASS_BG, lambda r1, r2: (r1 > 0.8) & (r2 > 0.8),
     lambda r1, r2: (BG_GB - r1) + (BG_GB - r2)),
    (CLASS_GB, CLASS_GR, lambda r1, r2: (r1 < 0.7) & (r2 < 0.7),
     lambda r1, r2: (r1 - GB_GR) + (r2 - GB_GR)),
    (CLASS_GR, CLASS_GB, lambda r1, r2: (r1 < 0.7) & (r2 < 0.7),
     lambda r1, r2: (r1 - GB_GR) + (r2 - GB_GR)),
    (CLASS_GR, CLASS_RG, lambda r1, r2: (r1 > 0.8) & (r2 > 0.8),
     lambda r1, r2: (GR_RG - r1) + (GR_RG - r2)),
    (CLASS_RG, CLASS_GR, lambda r1, r2: (r1 > 0.8) & (r2 > 0.8),
     lambda r1, r2: (GR_RG - r2) + (GR_RG - r1)),
    (CLASS_RG, CLASS_RB, lambda r1, r2: (r1 < 0.7) & (r2 < 0.7),
     lambda r1, r2: (r2 - RG_RB) + (r1 - RG_RB)),
    (CLASS_RB, CLASS_RG, lambda r1, r2: (r1 < 0.7) & (r2 < 0.7),
     lambda r1, r2: (r2 - RG_RB) + (r1 - RG_RB)),
]

PRODUCTION_ZTOLS = [1.0, 2.0]  # pixColorFluctuation (ztol = x / 100)


def _sweep_trichotomy(qc, tc, ztol_num, ztol_den, gap_f64_fn, ztol,
                      chunk=2048, extra_check=None):
    """Stream the full N_ALL x N_ALL ratio cross product through the REAL
    device predicate for one (query class, target class) pair and check
    the trichotomy chunk by chunk (the full matrix would be ~8.5 GB).

    gap_f64_fn(r1[:, None], r2[None, :]) -> float64 reference gap.
    extra_check(i, match, flag) may add per-chunk assertions."""

    @jax.jit
    def step(qs, qp, ts, tp):
        return pixel_match.element_predicate(
            jnp.full_like(qs, qc)[:, None], qs[:, None], qp[:, None],
            jnp.full((1, ts.size), tc, jnp.int32), ts[None, :], tp[None, :],
            jnp.full((1, ts.size), 255, jnp.int32),
            target_threshold=20, ztol_num=ztol_num, ztol_den=ztol_den)

    ts = jnp.asarray(S_ALL)
    tp = jnp.asarray(P_ALL)
    r2 = R_ALL[None, :]
    flags_total = 0
    for i in range(0, N_ALL, chunk):
        m, f = step(jnp.asarray(S_ALL[i:i + chunk]),
                    jnp.asarray(P_ALL[i:i + chunk]), ts, tp)
        match = np.asarray(m)
        flag = np.asarray(f)
        exact = gap_f64_fn(R_ALL[i:i + chunk, None], r2) <= ztol
        disagree = (match != exact) & ~flag
        assert not disagree.any(), (
            f"chunk {i}: {disagree.sum()} un-flagged disagreements, "
            f"first at {np.argwhere(disagree)[:5]}")
        if extra_check is not None:
            extra_check(i, match, flag)
        flags_total += int(flag.sum())
    # flags must be rare enough that oracle fallback stays cheap
    assert flags_total / (N_ALL * N_ALL) < 1e-3, flags_total


@pytest.mark.parametrize("fluct", PRODUCTION_ZTOLS)
def test_same_class_exhaustive(fluct):
    """Same-class branch: |r2 - r1| <= ztol with exact-integer device
    arithmetic, over all 32,640^2 achievable ratio pairs."""
    a, b = ztol_fraction(fluct)

    def gap_f64(r1, r2):
        # same class needs both ratios > 0 (:262)
        return np.where((r1 > 0) & (r2 > 0), np.abs(r2 - r1), NO_MATCH_GAP)

    def exact_ties_only(i, match, flag):
        # the integer same-class test is EXACT: ties flagged, nothing else
        s1 = S_ALL[i:i + match.shape[0], None].astype(np.int64)
        p1 = P_ALL[i:i + match.shape[0], None].astype(np.int64)
        lhs = np.abs(s1 * P_ALL[None, :] - S_ALL[None, :] * p1) * b
        rhs = a * (p1 * P_ALL[None, :])
        ties = (lhs == rhs) & (s1 >= 1) & (S_ALL[None, :] >= 1)
        assert (flag == ties).all()

    _sweep_trichotomy(CLASS_BR, CLASS_BR, a, b, gap_f64, fluct / 100,
                      extra_check=exact_ties_only)


@pytest.mark.parametrize("fluct", PRODUCTION_ZTOLS)
@pytest.mark.parametrize("case", range(len(ADJACENT_CASES)),
                         ids=lambda i: f"{ADJACENT_CASES[i][0]}-"
                                       f"{ADJACENT_CASES[i][1]}")
def test_adjacent_class_exhaustive(case, fluct):
    """Each adjacent-class branch over all achievable ratio pairs."""
    qc, tc, pre, gap_fn = ADJACENT_CASES[case]
    a, b = ztol_fraction(fluct)

    def gap_f64(r1, r2):
        return np.where(pre(r1, r2), gap_fn(r1, r2), NO_MATCH_GAP)

    _sweep_trichotomy(qc, tc, a, b, gap_f64, fluct / 100)


def test_incompatible_classes_never_match():
    """Non-adjacent class pairs produce no matches and no flags (a
    strided ratio subset per pair is plenty for an all-zeros check)."""
    adjacency = {(q, t) for q, t, *_ in ADJACENT_CASES}
    a, b = ztol_fraction(2.0)
    qs = jnp.asarray(S_ALL[::17])[:, None]
    qp = jnp.asarray(P_ALL[::17])[:, None]
    ts = jnp.asarray(S_ALL[::13])[None, :]
    tp = jnp.asarray(P_ALL[::13])[None, :]
    t_max = jnp.full(ts.shape, 255, jnp.int32)
    for qc in range(1, 7):
        for tc in range(1, 7):
            if qc == tc or (qc, tc) in adjacency:
                continue
            m, f = pixel_match.element_predicate(
                jnp.full(qs.shape, qc, jnp.int32), qs, qp,
                jnp.full(ts.shape, tc, jnp.int32), ts, tp, t_max,
                target_threshold=20, ztol_num=a, ztol_den=b)
            assert not bool(m.any()) and not bool(f.any()), (qc, tc)


def test_threshold_gating():
    """t_max <= dataThreshold suppresses every match (calculateScore
    :251: any channel strictly greater than the threshold passes)."""
    a, b = ztol_fraction(2.0)
    qs = jnp.asarray([128], jnp.int32)
    qp = jnp.asarray([255], jnp.int32)
    for t_max, expect in ((20, False), (21, True)):
        m, _ = pixel_match.element_predicate(
            jnp.asarray([CLASS_BR]), qs, qp,
            jnp.asarray([CLASS_BR]), qs, qp,
            jnp.asarray([t_max], jnp.int32),
            target_threshold=20, ztol_num=a, ztol_den=b)
        assert bool(m[0]) is expect


# ---------------------------------------------------------------------------
# z-slice LUT
# ---------------------------------------------------------------------------


def _java_slice_number(r, g, b):
    """Line-by-line transliteration of GradientAreaGapUtils
    calculateSliceGap's per-pixel half (:33-100) + findSliceNumber
    (:108-130) + findSliceNumberInLUT (:132-198), used ONLY as a test
    oracle."""
    if r >= g and r >= b:
        max1, c1 = r, "R"
        if g >= b:
            max2, c2 = g, "G"
        else:
            max2, c2 = b, "B"
    elif g >= r and g >= b:
        max1, c1 = g, "G"
        if r >= b:
            max2, c2 = r, "R"
        else:
            max2, c2 = b, "B"
    else:
        max1, c1 = b, "B"
        if r >= g:
            max2, c2 = r, "R"
        else:
            max2, c2 = g, "G"
    if max1 == 0:
        return 0
    ratio = max2 / max1
    ranges = {("R", "G"): (171, 212), ("R", "B"): (213, 255),
              ("G", "R"): (128, 170), ("G", "B"): (86, 127),
              ("B", "R"): (0, 29), ("B", "G"): (30, 85)}
    if (c1, c2) not in ranges:
        return 0
    lo, hi = ranges[(c1, c2)]
    slice_number = 0
    min_gap = 1000.0
    for icolor in range(lo, hi + 1):
        cr, cg, cb = (float(v) for v in RAINBOW_LUT[icolor])
        lut_ratio = 0.0
        if cb > cr and cb > cg:
            if cr > cg:
                lut_ratio = cr / cb
            elif cg > cr:
                lut_ratio = cg / cb
        elif cg > cr and cg > cb:
            if cr > cb:
                lut_ratio = cr / cg
            elif cb > cr:
                lut_ratio = cb / cg
        elif cr > cg and cr > cb:
            if cg > cb:
                lut_ratio = cg / cr
            elif cb > cg:
                lut_ratio = cb / cr
        if lut_ratio == ratio:
            return icolor + 1
        gap = abs(ratio - lut_ratio)
        if gap < min_gap:
            min_gap = gap
            slice_number = icolor + 1
    return slice_number


def test_slice_lut_full_table_vs_oracle():
    """The cached 2^24 table must equal a fresh oracle rebuild."""
    from colormipsearch_tpu.ops import slice_lut

    lut = slice_lut.get_slice_lut()
    fresh = slice_lut.build_slice_lut()
    assert lut.shape == fresh.shape == (1 << 24,)
    assert (lut == fresh).all()


def test_slice_numbers_vs_java_transliteration():
    """The vectorized oracle (the table builder) must equal the scalar
    Java transliteration on every distinct (dominant, secondary, ratio)
    color configuration.

    The slice number depends on RGB only through (dominant color,
    secondary color, max2/max1): sweeping the 6 orderings x all (s, p)
    ratio pairs with the third channel at representative values covers
    the full behavior space of the 2^24 table."""
    from colormipsearch_tpu.oracle import shape as shape_oracle

    rng = np.random.default_rng(0)
    # structured: dominant/secondary sweeps
    vals = []
    for p in range(1, 256, 4):
        for s in range(0, p + 1, 3):
            third = int(rng.integers(0, s + 1))
            vals.append((p, s, third))
    configs = []
    for p, s, t in vals:
        configs.extend([(p, s, t), (p, t, s), (s, p, t),
                        (t, p, s), (s, t, p), (t, s, p)])
    # plus uniformly random RGBs and grays/black corner cases
    rand = rng.integers(0, 256, (5000, 3)).tolist()
    corner = [(0, 0, 0), (255, 255, 255), (7, 7, 7), (255, 255, 0),
              (0, 255, 255), (128, 128, 64)]
    allc = np.asarray(configs + rand + corner, np.uint8)

    vec = shape_oracle.slice_numbers(allc.reshape(-1, 1, 3)).reshape(-1)
    for i, (r, g, b) in enumerate(allc):
        expected = _java_slice_number(int(r), int(g), int(b))
        assert vec[i] == expected, ((r, g, b), vec[i], expected)


# ---------------------------------------------------------------------------
# engine-vs-oracle parameter sweep
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kernel", ["packed", "keys", "union-x", "union-full"])
def test_engine_matches_oracle_across_param_combos(tmp_path, kernel):
    """Property test: the full device engine (plans, batching, mesh,
    flags + fallback — or the exact rank-key / union-key paths) equals
    the float64 oracle for every pair, across the CDS parameter grid
    (thresholds x xyShift x mirror x fluctuation x label regions)."""
    from PIL import Image

    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine
    from colormipsearch_tpu.model import ComputeFileType, FileData, LMNeuron
    from colormipsearch_tpu.oracle.pixel import (
        PixelMatchOracle,
        label_regions_mask,
    )

    rng = np.random.default_rng(17)
    h, w = 36, 52
    imgs = np.zeros((10, h, w, 3), np.uint8)
    for img in imgs:
        n = 500
        img[rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, (n, 3))
    masks_rgb, targets_rgb = imgs[:2], imgs[2:]

    def neuron(img, name):
        p = tmp_path / f"{name}.png"
        Image.fromarray(img).save(p)
        nr = LMNeuron(mip_id=name, published_name=name)
        nr.compute_files[ComputeFileType.InputColorDepthImage] = \
            FileData(str(p))
        return nr

    mask_neurons = [neuron(m, f"m{i}") for i, m in enumerate(masks_rgb)]
    target_neurons = [neuron(t, f"t{i}") for i, t in enumerate(targets_rgb)]

    combos = [
        dict(mask_threshold=20, data_threshold=20, xy_shift=2,
             mirror_mask=True, pix_color_fluctuation=1.0),
        dict(mask_threshold=20, data_threshold=20, xy_shift=0,
             mirror_mask=False, pix_color_fluctuation=2.0),
        dict(mask_threshold=50, data_threshold=30, xy_shift=2,
             mirror_mask=True, pix_color_fluctuation=2.0),
        dict(mask_threshold=0, data_threshold=0, xy_shift=4,
             mirror_mask=True, pix_color_fluctuation=1.0),
        dict(mask_threshold=20, data_threshold=20, xy_shift=2,
             mirror_mask=True, pix_color_fluctuation=0.0),
        dict(mask_threshold=20, data_threshold=20, xy_shift=2,
             mirror_mask=False, pix_color_fluctuation=2.0,
             with_name_label_region=False,
             with_color_scale_region=False),
    ]
    engine_kw = {
        "packed": dict(use_key_planes=False),
        "keys": dict(use_key_planes=True),
        "union-x": dict(use_union_keys="x"),
        "union-full": dict(use_union_keys="full"),
    }[kernel]
    for params_kw in combos:
        params = CDSParams(**params_kw)
        # auto-mesh on the 8-device CPU
        engine = CDSearchEngine(params, **engine_kw)
        got = {}
        for m in engine.find_all_matches(mask_neurons, target_neurons):
            got[(m.mask_image.mip_id, m.matched_image.mip_id)] = \
                (m.matching_pixels, m.mirrored)
        for mi, m_rgb in enumerate(masks_rgb):
            region = params.excluded_region(h, w)
            oracle = PixelMatchOracle(
                m_rgb, params.mask_threshold,
                mirror=params.mirror_mask,
                target_threshold=params.data_threshold,
                z_tolerance=params.pix_color_fluctuation / 100,
                xy_shift=params.xy_shift, excluded_region=region)
            for ti, t_rgb in enumerate(targets_rgb):
                res = oracle.score(t_rgb)
                key = (f"m{mi}", f"t{ti}")
                if res.matching_pixels > 0:
                    assert got.get(key) == (res.matching_pixels,
                                            res.mirrored), \
                        (params_kw, key, got.get(key), res)
                else:
                    assert key not in got, (params_kw, key)


# ---------------------------------------------------------------------------
# Rank-key interval predicate: COMPLETE membership proof
# ---------------------------------------------------------------------------
#
# The key path (ops/pixel_match.build_key_intervals) claims bit-exact
# equality with the float64 oracle — no ambiguity band.  This sweep is
# the proof: for EVERY achievable query summary (all 32,640 (s, p)
# pairs, per query class) and every production z-tolerance, interval
# membership over ALL distinct target ratios must equal the reference
# float64 verdict for the compatible target classes, and the interval
# slots must never touch an incompatible class's key range.
#
# Intervals are a function of (query class, float64 ratio) only —
# build_key_intervals bisects pixel_gap(q_cls, q_r, ...), and
# test_rank_table_sound (tests/test_ops_pixel_keys.py) proves the
# (s, p) -> rank -> ratio round-trip — so the sweep runs over the
# 19,820 DISTINCT query ratios, covering all 32,640 summaries.  Truth
# comes from the transliterated per-class-pair formulas at the top of
# this file (the same ground truth the packed-predicate sweeps use;
# pixel_gap itself is validated against the Java transliteration in
# tests/test_oracle_pixel.py) — build_key_intervals bisects pixel_gap,
# so any divergence between the two oracles would also fail here.


@pytest.mark.parametrize("fluct", PRODUCTION_ZTOLS)
@pytest.mark.parametrize("qc", range(1, 7))
def test_key_intervals_exhaustive(qc, fluct):
    from colormipsearch_tpu.ops import common

    z_tol = fluct / 100
    vals, _rank_tab = common.ratio_rank_table()
    n_ratios = vals.size
    adj = {t: (pre, gap) for q, t, pre, gap in ADJACENT_CASES if q == qc}
    compatible = sorted({qc} | set(adj))

    # one representative (s, p) per distinct achievable ratio
    _, first = np.unique(R_ALL, return_index=True)
    q_s = S_ALL[first].astype(np.int64)
    q_p = P_ALL[first].astype(np.int64)
    assert q_s.size == n_ratios
    q_cls = np.full(q_s.shape, qc, np.int64)
    q_r = q_s / q_p
    assert (q_r == vals).all()

    chunk = 2048
    for i in range(0, n_ratios, chunk):
        sl = slice(i, i + chunk)
        lo, span = pixel_match.build_key_intervals(
            q_cls[sl], q_s[sl], q_p[sl], z_tol)

        # non-empty slots may only target compatible classes, and an
        # interval must never span past its class's key band
        slot_cls = (lo >> common.KEY_RANK_BITS).astype(np.int64)
        nonempty = lo != np.uint32(1 << 31)
        end_rank = (lo.astype(np.int64)
                    & ((1 << common.KEY_RANK_BITS) - 1)) \
            + span.astype(np.int64)
        assert (end_rank[nonempty] < n_ratios).all()
        for k in range(3):
            used = set(np.unique(slot_cls[k][nonempty[k]]).tolist())
            assert used <= set(compatible), (qc, k, used)

        r1 = q_r[sl][:, None]
        r2 = vals[None, :]
        for tc in compatible:
            if tc == qc:
                gap = np.where((r1 > 0) & (r2 > 0), np.abs(r2 - r1),
                               NO_MATCH_GAP)
            else:
                pre, gfn = adj[tc]
                gap = np.where(pre(r1, r2), gfn(r1, r2), NO_MATCH_GAP)
            truth = gap <= z_tol
            keys = ((tc << common.KEY_RANK_BITS)
                    | np.arange(n_ratios)).astype(np.uint32)
            memb = np.zeros_like(truth)
            for k in range(3):
                memb |= (keys[None, :] - lo[k][:, None]) \
                    <= span[k][:, None]
            bad = memb != truth
            assert not bad.any(), (
                qc, tc, i, int(bad.sum()), np.argwhere(bad)[:3])
