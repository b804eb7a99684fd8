"""Device shape-score kernel vs the float64 oracle."""

import numpy as np
import pytest

from colormipsearch_tpu.oracle.shape import (
    ShapeMatchOracle,
    dilate_rgb,
    mask_rgb,
    slice_numbers,
)
from colormipsearch_tpu.ops import shape_score


def _mk_cdm(rng, h, w, n):
    img = np.zeros((h, w, 3), np.uint8)
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = rng.integers(0, 256, (n, 3))
    return img


def test_slice_lut_matches_oracle_random():
    from colormipsearch_tpu.ops.slice_lut import slice_numbers_lut

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    np.testing.assert_array_equal(slice_numbers_lut(rgb),
                                  slice_numbers(rgb))
    # black pixels map to slice 0
    assert slice_numbers_lut(np.zeros((2, 2, 3), np.uint8)).max() == 0


def test_slice_numbers_device_agrees_except_exact_ties():
    """The integer-argmin device scan may differ from the f64 oracle ONLY
    at exact rational ties between adjacent LUT distances."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    dev = np.asarray(shape_score.slice_numbers_device(jnp.asarray(rgb)))
    ref = slice_numbers(rgb)
    bad = dev != ref
    # mismatches allowed only where |dev - ref| == 1 (adjacent entries)
    assert np.abs(dev[bad] - ref[bad]).max(initial=0) <= 1
    assert bad.mean() < 0.005


@pytest.mark.parametrize("mirror", [False, True])
def test_shape_score_pairs_match_oracle(mirror):
    rng = np.random.default_rng(11)
    h, w = 48, 64
    query = _mk_cdm(rng, h, w, 400)
    targets = [_mk_cdm(rng, h, w, 500) for _ in range(4)] + [query]
    grads = [rng.integers(0, 300, (h, w)).astype(np.uint16)
             for _ in targets]
    # precomputed zgap variants (dilated masked targets, like production)
    zgaps = [dilate_rgb(mask_rgb(t, 20), 20) for t in targets]

    oracle = ShapeMatchOracle(query, 20, mirror=mirror, negative_radius=20)
    t_pack, t_pack_m = shape_score.pack_targets(
        np.stack(targets), np.stack(grads), np.stack(zgaps),
        mask_threshold=20)
    q_pack = shape_score.pack_query(query)
    gap, he, mirrored = shape_score.score_shape_batch(
        t_pack, t_pack_m, q_pack, mirror=mirror)

    for i, (t, g, z) in enumerate(zip(targets, grads, zgaps)):
        ref = oracle.score(t, g, z)
        assert gap[i] == ref.gradient_area_gap, i
        assert he[i] == ref.high_expression_area, i
        assert bool(mirrored[i]) == ref.mirrored, i


def test_shape_score_with_region_exclusion():
    rng = np.random.default_rng(5)
    h, w = 40, 50
    query = _mk_cdm(rng, h, w, 300)
    target = _mk_cdm(rng, h, w, 300)
    grad = rng.integers(0, 200, (h, w)).astype(np.uint16)
    zgap = dilate_rgb(mask_rgb(target, 20), 20)
    region = np.zeros((h, w), bool)
    region[:10, :15] = True

    oracle = ShapeMatchOracle(query, 20, mirror=True,
                              excluded_region=region)
    # region exclusion clears the query at pack time and the target
    # before packing (oracle clear_region on both sides)
    from colormipsearch_tpu.oracle.shape import clear_region
    t_clear = clear_region(target, region)
    t_pack, t_pack_m = shape_score.pack_targets(
        t_clear[None], grad[None], zgap[None], mask_threshold=20)
    q_pack = shape_score.pack_query(query, excluded_region=region)
    gap, he, mirrored = shape_score.score_shape_batch(
        t_pack, t_pack_m, q_pack, mirror=True)

    ref = oracle.score(target, grad, zgap)
    assert gap[0] == ref.gradient_area_gap
    assert he[0] == ref.high_expression_area
    assert bool(mirrored[0]) == ref.mirrored
