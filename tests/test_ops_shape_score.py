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


def _he_ring_reference(q):
    """The original max-filter construction of the high-expression ring
    (the provider factory's combine2 of maxFilter60/maxFilter20 —
    ColorDepthSearchAlgorithmProviderFactory.java:113-121)."""
    from colormipsearch_tpu.oracle.shape import rgb_signal

    d60 = dilate_rgb(q, 60)
    d20 = dilate_rgb(q, 20)
    ring = np.where((d20.astype(np.int32).sum(axis=-1) > 0)[..., None],
                    0, d60).astype(np.uint8)
    return rgb_signal(ring, 0).astype(bool)


def test_high_expression_ring_equals_maxfilter_construction():
    """The EDT fast path must be bit-identical to the dilate-then-signal
    reference, including the DIM-pixel cases (channel sum 1..4) where
    pure binary reachability is NOT sufficient."""
    rng = np.random.default_rng(7)
    h, w = 90, 130
    cases = []
    # (a) ordinary sparse CDM content
    cases.append(_mk_cdm(rng, h, w, 300))
    # (b) dim pixels only: sums 1..4 — he depends on per-channel maxes
    dim = np.zeros((h, w, 3), np.uint8)
    for _ in range(40):
        y, x = rng.integers(0, h), rng.integers(0, w)
        v = rng.integers(0, 5, 3)
        dim[y, x] = v
    cases.append(dim)
    # (c) mixed: isolated dim clusters far from bright content, incl. a
    # trio (4,0,0)/(0,4,0)/(0,0,4) whose per-channel maxes sum to 12
    mixed = _mk_cdm(rng, h, w, 60)
    mixed[5, 5] = (4, 0, 0)
    mixed[5, 7] = (0, 4, 0)
    mixed[7, 6] = (0, 0, 4)
    mixed[80, 120] = (1, 1, 1)  # lone sum-3 pixel: never he
    cases.append(mixed)
    # (d) empty and (e) single bright pixel
    cases.append(np.zeros((h, w, 3), np.uint8))
    single = np.zeros((h, w, 3), np.uint8)
    single[h // 2, w // 2] = (0, 200, 30)
    cases.append(single)
    for i, q in enumerate(cases):
        got = shape_score.high_expression_ring(q)
        want = _he_ring_reference(q)
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")


def test_binary_dilate_disk_equals_footprint_dilation():
    """EDT binary dilation == scipy binary_dilation with the ImageJ
    footprint, across quantized and plain radii."""
    from scipy import ndimage

    from colormipsearch_tpu.oracle.shape import (
        binary_dilate_disk,
        circular_footprint,
    )

    rng = np.random.default_rng(11)
    fg = rng.random((64, 80)) < 0.01
    for r in (1.5, 2, 2.5, 3, 7.5, 20, 60):
        want = ndimage.binary_dilation(fg, circular_footprint(r))
        got = binary_dilate_disk(fg, r)
        np.testing.assert_array_equal(got, want, err_msg=f"r={r}")
    assert not binary_dilate_disk(np.zeros((4, 5), bool), 20).any()


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


@pytest.mark.parametrize("mirror", [False, True])
def test_sparse_pack_equals_dense(mirror):
    """Support-row packing (pack_target_rows) must reproduce the dense
    pack's scores exactly — dropped rows provably contribute zero."""
    rng = np.random.default_rng(7)
    h, w = 48, 64
    query = _mk_cdm(rng, h, w, 350)
    targets = [_mk_cdm(rng, h, w, 500) for _ in range(3)] + [query]
    grads = [rng.integers(0, 300, (h, w)).astype(np.uint16)
             for _ in targets]
    zgaps = [dilate_rgb(mask_rgb(t, 20), 20) for t in targets]

    q_pack = shape_score.pack_query(query)
    t_pack, t_pack_m = shape_score.pack_targets(
        np.stack(targets), np.stack(grads), np.stack(zgaps),
        mask_threshold=20)
    dense = shape_score.score_shape_batch(
        t_pack, t_pack_m, q_pack, mirror=mirror)

    pos = shape_score.support_positions(q_pack)
    assert 0 < pos.size < h * w  # genuinely sparse on this workload
    n_pad = shape_score.support_bucket(pos.size, minimum=256)
    q_sp = shape_score.sparse_query(q_pack, pos, n_pad)
    t_rows = shape_score.pack_target_rows(
        np.stack(targets), np.stack(grads), np.stack(zgaps), pos, n_pad,
        mask_threshold=20, mirror=mirror)
    assert t_rows.shape == (2 if mirror else 1, n_pad, len(targets))
    sparse = shape_score.score_shape_batch_stacked(
        t_rows, q_sp, mirror=mirror)

    for d, s in zip(dense, sparse):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s))

    # split (gap-row / he-row) path: same scores again
    pos_gap, pos_he = shape_score.support_split(q_pack)
    assert np.intersect1d(pos_gap, pos_he).size == 0
    assert np.array_equal(np.sort(np.concatenate([pos_gap, pos_he])), pos)
    n_gap = shape_score.support_bucket(pos_gap.size, minimum=128)
    n_he = shape_score.he_words(pos_he.size, minimum=4)
    q_gap, q_he = shape_score.sparse_query_split(
        q_pack, pos_gap, n_gap, pos_he, n_he)
    n_or = 2 if mirror else 1
    t_gap, t_he = shape_score.pack_target_rows_split(
        np.stack(targets), np.stack(grads), np.stack(zgaps),
        pos_gap, n_gap, pos_he, n_he, mask_threshold=20, mirror=mirror)
    assert t_gap.shape == (n_or, n_gap, len(targets))
    assert t_he.shape == (n_or, n_he, len(targets))
    split = shape_score.score_shape_batch_split(
        t_gap, t_he, np.stack([q_gap] * n_or), np.stack([q_he] * n_or))
    for d, s in zip(dense, split):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s))


def test_sparse_pack_equals_dense_with_roi_mirror():
    """With an ROI the mirror orientation uses a different query pack;
    the support union must cover both orientations."""
    rng = np.random.default_rng(9)
    h, w = 40, 56
    query = _mk_cdm(rng, h, w, 300)
    target = _mk_cdm(rng, h, w, 400)
    grad = rng.integers(0, 250, (h, w)).astype(np.uint16)
    zgap = dilate_rgb(mask_rgb(target, 20), 20)
    roi_keep = np.zeros((h, w), bool)
    roi_keep[:, : w // 2] = True

    q_pack = shape_score.pack_query(query, roi_keep=roi_keep)
    q_pack_m = shape_score.pack_query(query, roi_keep=roi_keep[:, ::-1])
    t_pack, t_pack_m = shape_score.pack_targets(
        target[None], grad[None], zgap[None], mask_threshold=20)
    dense = shape_score.score_shape_batch(
        t_pack, t_pack_m, q_pack, mirror=True, q_pack_mirror=q_pack_m)

    pos = shape_score.support_positions(q_pack, q_pack_m)
    n_pad = shape_score.support_bucket(pos.size, minimum=256)
    q_sp = shape_score.sparse_query(q_pack, pos, n_pad)
    q_sp_m = shape_score.sparse_query(q_pack_m, pos, n_pad)
    t_rows = shape_score.pack_target_rows(
        target[None], grad[None], zgap[None], pos, n_pad,
        mask_threshold=20)
    sparse = shape_score.score_shape_batch_stacked(
        t_rows, q_sp, mirror=True, q_pack_mirror=q_sp_m)

    for d, s in zip(dense, sparse):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s))

    # split path with per-orientation ROI query packs
    pos_gap, pos_he = shape_score.support_split(q_pack, q_pack_m)
    n_gap = shape_score.support_bucket(pos_gap.size, minimum=128)
    n_he = shape_score.he_words(pos_he.size, minimum=4)
    qg0, qh0 = shape_score.sparse_query_split(
        q_pack, pos_gap, n_gap, pos_he, n_he)
    qg1, qh1 = shape_score.sparse_query_split(
        q_pack_m, pos_gap, n_gap, pos_he, n_he)
    t_gap, t_he = shape_score.pack_target_rows_split(
        target[None], grad[None], zgap[None],
        pos_gap, n_gap, pos_he, n_he, mask_threshold=20)
    split = shape_score.score_shape_batch_split(
        t_gap, t_he, np.stack([qg0, qg1]), np.stack([qh0, qh1]))
    for d, s in zip(dense, split):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s))


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

    # sparse path: UNCLEANED target + excluded= must match (the engine
    # no longer copies/clears each target image)
    pos = shape_score.support_positions(q_pack)
    n_pad = shape_score.support_bucket(pos.size, minimum=256)
    q_sp = shape_score.sparse_query(q_pack, pos, n_pad)
    t_rows = shape_score.pack_target_rows(
        target[None], grad[None], zgap[None], pos, n_pad,
        mask_threshold=20, excluded=region)
    gap_s, he_s, mirrored_s = shape_score.score_shape_batch_stacked(
        t_rows, q_sp, mirror=True)
    assert gap_s[0] == ref.gradient_area_gap
    assert he_s[0] == ref.high_expression_area
    assert bool(mirrored_s[0]) == ref.mirrored

    # split path with excluded-region masking of the he rows
    pos_gap, pos_he = shape_score.support_split(q_pack)
    n_gap = shape_score.support_bucket(pos_gap.size, minimum=128)
    n_he = shape_score.he_words(pos_he.size, minimum=4)
    q_gap, q_he = shape_score.sparse_query_split(
        q_pack, pos_gap, n_gap, pos_he, n_he)
    t_gap, t_he = shape_score.pack_target_rows_split(
        target[None], grad[None], zgap[None],
        pos_gap, n_gap, pos_he, n_he, mask_threshold=20, excluded=region)
    gap_p, he_p, mirrored_p = shape_score.score_shape_batch_split(
        t_gap, t_he, np.stack([q_gap, q_gap]), np.stack([q_he, q_he]))
    assert gap_p[0] == ref.gradient_area_gap
    assert he_p[0] == ref.high_expression_area
    assert bool(mirrored_p[0]) == ref.mirrored
