"""Negative-query scoring parity tests.

Reference: cds/PixelMatchColorDepthSearchAlgorithm.java:29-101 (neg
position arrays + shifted/mirrored variants) and :195-217 (score
subtraction maxMatchingPixels - round(negMax * querySize / negQuerySize)).

The expected values are computed by an independent transliteration of the
reference's loop structure (zip of positive query positions as sources
with shifted negative positions as target lookups, truncated to the
shorter array; max over variants; Math.round == floor(x + 0.5)).
"""

import numpy as np
import pytest

from colormipsearch_tpu.oracle.pixel import (
    PixelMatchOracle,
    classify_rgb,
    pixel_gap,
    ratio_f64,
    shift_offsets,
)
from colormipsearch_tpu.ops import common, pixel_match


def _rand_cdm(rng, h, w, density=0.3):
    """Random CDM-like image: sparse bright rainbow-ish pixels."""
    img = np.zeros((h, w, 3), np.uint8)
    n = int(h * w * density)
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = rng.integers(0, 256, (n, 3))
    return img


def _reference_neg_score(query_rgb, q_thr, neg_rgb, neg_thr, target_rgb,
                         t_thr, ztol, xy_shift, mirror_neg):
    """Transliterated negative pass: returns negMax (int)."""
    h, w = query_rgb.shape[:2]
    q_pos = np.flatnonzero((query_rgb > q_thr).any(-1).reshape(-1))
    n_pos = np.flatnonzero((neg_rgb > neg_thr).any(-1).reshape(-1))
    if q_pos.size == 0 or n_pos.size == 0:
        return 0
    size = min(q_pos.size, n_pos.size)

    nc, ns, nppx = classify_rgb(neg_rgb.reshape(-1, 3))
    nr = ratio_f64(nc, ns, nppx)
    tc, ts, tp = classify_rgb(target_rgb.reshape(-1, 3))
    tr = ratio_f64(tc, ts, tp)
    t_fgmax = target_rgb.reshape(-1, 3).astype(np.int32).max(-1)

    src = q_pos[:size]
    variants = []
    x, y = n_pos % w, n_pos // w
    for dx, dy in shift_offsets(xy_shift):
        sx, sy = x + dx, y + dy
        ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        variants.append(np.where(ok, sy * w + sx, -1)[:size])
    if mirror_neg:
        for v in list(variants):
            vx = v % w
            variants.append(np.where(v < 0, -1, v + (w - 1) - 2 * vx))

    neg_max = 0
    for pos in variants:
        ok = pos >= 0
        tpos = pos[ok]
        sel = t_fgmax[tpos] > t_thr
        gaps = pixel_gap(nc[src[ok]][sel], nr[src[ok]][sel],
                         tc[tpos][sel], tr[tpos][sel])
        neg_max = max(neg_max, int(np.count_nonzero(gaps <= ztol)))
    return neg_max


@pytest.mark.parametrize("mirror_neg", [False, True])
def test_oracle_neg_subtraction_matches_transliteration(mirror_neg):
    rng = np.random.default_rng(7)
    h, w = 40, 64
    query = _rand_cdm(rng, h, w, 0.4)
    target = _rand_cdm(rng, h, w, 0.5)
    neg = _rand_cdm(rng, h, w, 0.2)

    base = PixelMatchOracle(query, 20, mirror=True, target_threshold=20,
                            z_tolerance=0.02, xy_shift=2)
    pos_res = base.score(target)

    oracle = PixelMatchOracle(query, 20, mirror=True, target_threshold=20,
                              z_tolerance=0.02, xy_shift=2,
                              neg_query_rgb=neg, neg_query_threshold=20,
                              mirror_neg_query=mirror_neg)
    res = oracle.score(target)

    neg_max = _reference_neg_score(query, 20, neg, 20, target, 20,
                                   0.02, 2, mirror_neg)
    neg_size = int(np.count_nonzero((neg > 20).any(-1)))
    expected = int(np.floor(
        float(pos_res.matching_pixels)
        - float(neg_max) * base.query_size / neg_size + 0.5))
    assert res.matching_pixels == expected
    assert res.mirrored == pos_res.mirrored
    assert res.matching_pixels_ratio == pytest.approx(
        pos_res.matching_pixels / base.query_size - neg_max / neg_size)
    # the negative pass must actually bite on this workload
    assert neg_max > 0 and res.matching_pixels < pos_res.matching_pixels


def test_neg_query_reduces_fixture_score(mask_rgb, target_rgb,
                                         golden_region):
    """Golden-87 fixture: a neg query equal to the target must subtract
    the full formula amount from the 87-pixel score."""
    neg = target_rgb
    base = PixelMatchOracle(mask_rgb, 20, mirror=True, target_threshold=20,
                            z_tolerance=0.01, xy_shift=2,
                            excluded_region=golden_region)
    assert base.score(target_rgb).matching_pixels == 87

    oracle = PixelMatchOracle(mask_rgb, 20, mirror=True, target_threshold=20,
                              z_tolerance=0.01, xy_shift=2,
                              excluded_region=golden_region,
                              neg_query_rgb=neg, neg_query_threshold=20,
                              mirror_neg_query=False)
    res = oracle.score(target_rgb)
    assert res.matching_pixels < 87


def test_device_neg_plan_matches_oracle():
    """score_query_batch over a build_neg_query_plan equals the oracle's
    per-variant negative pass for every target."""
    rng = np.random.default_rng(11)
    h, w, n_targets = 32, 48, 17
    query = _rand_cdm(rng, h, w, 0.4)
    neg = _rand_cdm(rng, h, w, 0.25)
    targets = np.stack([_rand_cdm(rng, h, w, 0.5) for _ in range(n_targets)])

    import jax.numpy as jnp

    planes = common.pack_target_planes(jnp.asarray(targets))
    plan = pixel_match.build_neg_query_plan(
        query, 20, neg, 20, mirror_neg_query=True, xy_shift=2,
        pix_color_fluctuation=2.0)
    scores, flags = pixel_match.score_query_against_planes(
        planes, jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
        jnp.asarray(plan.q_s), jnp.asarray(plan.q_p),
        target_threshold=20, ztol_num=plan.ztol_num,
        ztol_den=plan.ztol_den)
    neg_best = np.asarray(scores).max(axis=0)
    flags = np.asarray(flags)

    for t in range(n_targets):
        expected = _reference_neg_score(query, 20, neg, 20, targets[t],
                                        20, 0.02, 2, True)
        if flags[:, t].sum() == 0:
            assert int(neg_best[t]) == expected, t


def test_engine_neg_query_end_to_end(tmp_path):
    """CDSearchEngine with a negative query produces oracle-exact
    subtracted scores."""
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine
    from colormipsearch_tpu.model import ComputeFileType, EMNeuron, FileData
    from PIL import Image

    rng = np.random.default_rng(3)
    h, w = 32, 48
    query = _rand_cdm(rng, h, w, 0.5)
    neg = _rand_cdm(rng, h, w, 0.2)
    targets = [_rand_cdm(rng, h, w, 0.6) for _ in range(6)]

    def save(img, name):
        p = tmp_path / name
        Image.fromarray(img).save(p)
        return str(p)

    def neuron(img, name):
        n = EMNeuron(mip_id=name, published_name=name)
        n.compute_files[ComputeFileType.InputColorDepthImage] = \
            FileData(save(img, f"{name}.png"))
        return n

    masks = [neuron(query, "mask0")]
    target_neurons = [neuron(t, f"t{i}") for i, t in enumerate(targets)]

    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True)
    engine = CDSearchEngine(params, use_mesh=False, neg_query_rgb=neg,
                            neg_query_threshold=20, mirror_neg_query=True)
    matches = engine.find_all_matches(masks, target_neurons)

    oracle = PixelMatchOracle(query, 20, mirror=True, target_threshold=20,
                              z_tolerance=0.02, xy_shift=2,
                              neg_query_rgb=neg, neg_query_threshold=20,
                              mirror_neg_query=True)
    expected = {f"t{i}": oracle.score(t) for i, t in enumerate(targets)}
    expected = {k: v for k, v in expected.items() if v.matching_pixels > 0}
    got = {m.matched_image.mip_id: m for m in matches}
    assert set(got) == set(expected)
    for k, res in expected.items():
        assert got[k].matching_pixels == res.matching_pixels, k
        assert got[k].mirrored == res.mirrored, k
