"""Device pixel-match kernel vs float64 oracle."""

import numpy as np
import pytest

from colormipsearch_tpu.oracle.pixel import PixelMatchOracle
from colormipsearch_tpu.ops import common, pixel_match


def _score_with_device(mask_rgb, targets, *, query_threshold, target_threshold,
                       mirror, xy_shift, fluctuation, region=None):
    import jax.numpy as jnp
    plan = pixel_match.build_query_plan(
        mask_rgb, query_threshold, mirror=mirror, xy_shift=xy_shift,
        pix_color_fluctuation=fluctuation, excluded_region=region)
    stack = np.stack(targets)
    planes = common.pack_target_planes(jnp.asarray(stack))
    scores, flags = pixel_match.score_query_against_planes(
        planes, jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
        jnp.asarray(plan.q_s), jnp.asarray(plan.q_p),
        target_threshold=target_threshold,
        ztol_num=plan.ztol_num, ztol_den=plan.ztol_den)
    scores = np.asarray(scores)
    flags = np.asarray(flags)
    best, mirrored = pixel_match.reduce_variant_scores(scores, plan)
    return best, mirrored, flags, plan


def test_device_matches_oracle_on_golden_fixture(mask_rgb, target_rgb,
                                                 golden_region):
    best, mirrored, flags, plan = _score_with_device(
        mask_rgb, [target_rgb, mask_rgb],
        query_threshold=20, target_threshold=20, mirror=True, xy_shift=2,
        fluctuation=1.0, region=golden_region)
    # the fixture pair contains a genuine near-threshold pixel in one shift
    # variant; the kernel must flag it (the engine then oracle-rescan the
    # pair), and the device count may differ from the oracle by at most the
    # number of flagged pixels
    per_pair_flags = flags.sum(axis=0)
    assert per_pair_flags[0] <= 2
    assert abs(best[0] - 87) <= per_pair_flags[0]
    assert best[1] == plan.query_size  # self match
    assert per_pair_flags[1] == 0 and not mirrored[1]
    assert plan.ztol_num == 1 and plan.ztol_den == 100


def test_device_matches_oracle_on_random_images():
    rng = np.random.default_rng(7)
    h, w = 40, 60
    # sparse colorful images resembling CDMs
    def mk():
        img = np.zeros((h, w, 3), np.uint8)
        n = rng.integers(50, 300)
        ys = rng.integers(0, h, n)
        xs = rng.integers(0, w, n)
        img[ys, xs] = rng.integers(0, 256, (n, 3))
        return img

    mask = mk()
    targets = [mk() for _ in range(5)] + [mask]
    for fluct, xy, mirror in ((1.0, 0, False), (2.0, 2, True), (10.0, 4, True)):
        oracle = PixelMatchOracle(
            mask, 20, mirror=mirror, target_threshold=30,
            z_tolerance=fluct / 100, xy_shift=xy)
        best, mirrored, flags, plan = _score_with_device(
            mask, targets, query_threshold=20, target_threshold=30,
            mirror=mirror, xy_shift=xy, fluctuation=fluct)
        for i, t in enumerate(targets):
            res = oracle.score(t)
            if flags[:, i].sum() == 0:
                assert best[i] == res.matching_pixels, (fluct, xy, mirror, i)
                assert mirrored[i] == res.mirrored


def test_device_flags_exact_boundary_pair():
    """A pixel pair whose gap is exactly the z tolerance must be flagged
    (Java's float64 rounding decides such pairs; e.g. ratios 1/4 vs 6/25
    give gap 0.01 exactly but Java computes 0.010000000000000009 > fl(0.01)).
    """
    mask = np.zeros((8, 8, 3), np.uint8)
    target = np.zeros((8, 8, 3), np.uint8)
    # class BR: blue dominant, red secondary: ratio = r/b
    mask[0, 0] = (1, 0, 4)      # ratio 0.25
    target[0, 0] = (6, 0, 25)   # ratio 0.24
    best, mirrored, flags, plan = _score_with_device(
        mask, [target], query_threshold=0, target_threshold=0,
        mirror=False, xy_shift=0, fluctuation=1.0)
    assert flags.sum() > 0
    # the oracle (Java semantics) says NO match for this pair
    oracle = PixelMatchOracle(mask, 0, mirror=False, target_threshold=0,
                              z_tolerance=0.01, xy_shift=0)
    assert oracle.score(target).matching_pixels == 0


def test_bucket_padding():
    # {1, 1.25, 1.5, 1.75} x 2^k ladder: avg padding waste ~10%, max 25%
    assert pixel_match._bucket(1) == 512
    assert pixel_match._bucket(512) == 512
    assert pixel_match._bucket(513) == 640
    assert pixel_match._bucket(700) == 768
    assert pixel_match._bucket(1897) == 2048  # the fixture mask
    assert pixel_match._bucket(2049) == 2560
    for q in range(1, 9000, 13):
        b = pixel_match._bucket(q)
        assert b >= q and (q <= 512 or b <= q * 1.25 + 1)


def test_threshold_folded_pack_equals_runtime_threshold():
    """pack(data_threshold=N) + kernel(thr=-1) == pack() + kernel(thr=N)."""
    import numpy as np
    import jax.numpy as jnp

    from colormipsearch_tpu.ops import common, pixel_match

    rng = np.random.default_rng(2)
    h, w, t = 24, 32, 9
    targets = np.zeros((t, h, w, 3), np.uint8)
    n = 200
    for img in targets:
        img[rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, (n, 3))
    query = np.zeros((h, w, 3), np.uint8)
    query[rng.integers(0, h, n), rng.integers(0, w, n)] = \
        rng.integers(0, 256, (n, 3))

    plan = pixel_match.build_query_plan(
        query, 20, mirror=True, xy_shift=2, pix_color_fluctuation=2.0)
    plain = common.pack_target_planes(jnp.asarray(targets))
    folded = common.pack_target_planes(jnp.asarray(targets),
                                       data_threshold=20)
    args = (jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
            jnp.asarray(plan.q_s), jnp.asarray(plan.q_p))
    s0, f0 = pixel_match.score_query_against_planes(
        plain, *args, target_threshold=20,
        ztol_num=plan.ztol_num, ztol_den=plan.ztol_den)
    s1, f1 = pixel_match.score_query_against_planes(
        folded, *args, target_threshold=-1,
        ztol_num=plan.ztol_num, ztol_den=plan.ztol_den)
    assert (np.asarray(s0) == np.asarray(s1)).all()
    assert (np.asarray(f0) == np.asarray(f1)).all()


def test_split_planes_bit_equal():
    """The 3-byte split-plane kernel (u16 (p<<8)|s + u8 cls) must produce
    bit-identical scores and flags to the packed-u32 threshold-folded
    path, for both the repacked and the direct-from-RGB packers."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w, t = 24, 32, 7
    targets = np.zeros((t, h, w, 3), np.uint8)
    for img in targets:
        n = 250
        img[rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, (n, 3))
    query = np.zeros((h, w, 3), np.uint8)
    query[rng.integers(0, h, 250), rng.integers(0, w, 250)] = \
        rng.integers(0, 256, (250, 3))

    plan = pixel_match.build_query_plan(
        query, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0)
    tj = jnp.asarray(targets)
    folded = common.pack_target_planes(tj, data_threshold=20)
    sp_a, c8_a = common.pack_target_planes_split(tj, data_threshold=20)
    sp_b, c8_b = common.split_planes_from_packed(folded)
    assert (np.asarray(sp_a) == np.asarray(sp_b)).all()
    assert (np.asarray(c8_a) == np.asarray(c8_b)).all()

    args = (jnp.asarray(plan.positions)[None], jnp.asarray(plan.q_cls)[None],
            jnp.asarray(plan.q_s)[None], jnp.asarray(plan.q_p)[None])
    best0, mir0, fl0 = pixel_match.score_query_batch(
        folded, *args, target_threshold=-1,
        ztol_num=plan.ztol_num, ztol_den=plan.ztol_den,
        n_straight=plan.n_straight)
    best1, mir1, fl1 = pixel_match.score_query_batch_split(
        sp_a, c8_a, *args,
        ztol_num=plan.ztol_num, ztol_den=plan.ztol_den,
        n_straight=plan.n_straight)
    assert (np.asarray(best0) == np.asarray(best1)).all()
    assert (np.asarray(mir0) == np.asarray(mir1)).all()
    assert (np.asarray(fl0) == np.asarray(fl1)).all()
    assert int(np.asarray(best0).max()) > 0
