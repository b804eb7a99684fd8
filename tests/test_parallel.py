"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from colormipsearch_tpu.ops import common, pixel_match
from colormipsearch_tpu.parallel import (
    create_mesh,
    make_sharded_search_step,
    shard_target_planes,
)
from colormipsearch_tpu.parallel.mesh import make_sharded_batch_step


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(5)
    h, w, t = 48, 64, 16
    targets = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        n = 300
        targets[i, rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, (n, 3))
    query = np.zeros((h, w, 3), np.uint8)
    query[rng.integers(0, h, 200), rng.integers(0, w, 200)] = \
        rng.integers(30, 256, (200, 3))
    plan = pixel_match.build_query_plan(
        query, 20, mirror=True, xy_shift=2, pix_color_fluctuation=1.0)
    planes = common.pack_target_planes(jnp.asarray(targets))
    return plan, planes


def _single_device(plan, planes):
    s, f = pixel_match.score_query_against_planes(
        planes, jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
        jnp.asarray(plan.q_s), jnp.asarray(plan.q_p),
        target_threshold=20, ztol_num=1, ztol_den=100)
    best, mirrored, flags = pixel_match.reduce_variants_device(
        jnp.asarray(s), jnp.asarray(f), plan.n_straight)
    return np.asarray(best), np.asarray(mirrored), np.asarray(flags)


def test_sharded_step_matches_single_device(workload):
    plan, planes = workload
    assert len(jax.devices()) == 8
    mesh = create_mesh(8)
    sharded = shard_target_planes(mesh, planes)
    step = make_sharded_search_step(
        mesh, target_threshold=20, ztol_num=1, ztol_den=100,
        n_straight=plan.n_straight, top_k=3)
    best, mirrored, flags, gmax, topk_s, topk_i = step(
        sharded, jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
        jnp.asarray(plan.q_s), jnp.asarray(plan.q_p))

    ref_best, ref_mirrored, ref_flags = _single_device(plan, planes)
    np.testing.assert_array_equal(np.asarray(best), ref_best)
    np.testing.assert_array_equal(np.asarray(mirrored), ref_mirrored)
    np.testing.assert_array_equal(np.asarray(flags), ref_flags)
    assert int(gmax) == int(ref_best.max())

    # the merged per-shard top-k contains the true global top-3
    topk_s = np.asarray(topk_s)
    topk_i = np.asarray(topk_i)
    true_top = np.sort(ref_best)[::-1][:3]
    merged = np.sort(topk_s)[::-1][:3]
    np.testing.assert_array_equal(merged, true_top)
    # indices map back to the right scores
    for s, i in zip(topk_s, topk_i):
        assert ref_best[i] == s


def test_sharded_batch_step(workload):
    plan, planes = workload
    mesh = create_mesh(8)
    sharded = shard_target_planes(mesh, planes)
    step = make_sharded_batch_step(
        mesh, target_threshold=20, ztol_num=1, ztol_den=100,
        n_straight=plan.n_straight)
    B = 3
    best, mirrored, flags, gmax = step(
        sharded,
        jnp.asarray(np.stack([plan.positions] * B)),
        jnp.asarray(np.stack([plan.q_cls] * B)),
        jnp.asarray(np.stack([plan.q_s] * B)),
        jnp.asarray(np.stack([plan.q_p] * B)))
    ref_best, _, _ = _single_device(plan, planes)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(best)[b], ref_best)
    np.testing.assert_array_equal(np.asarray(gmax),
                                  [ref_best.max()] * B)


def test_graft_entry_roundtrip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    best = np.asarray(out[0])
    assert best.shape[0] == 16
    g.dryrun_multichip(8)


def test_sharded_shape_step_equals_single_device():
    """Shape pass over the mesh == single-device kernel."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from colormipsearch_tpu.ops import shape_score
    from colormipsearch_tpu.parallel.mesh import (
        create_mesh,
        make_sharded_shape_step,
        shard_target_planes,
    )

    rng = np.random.default_rng(0)
    p, t = 4096, 16
    t_pack = jnp.asarray(
        rng.integers(0, 1 << 27, (p, t), dtype=np.int64).astype(np.uint32))
    q_pack = jnp.asarray(
        rng.integers(0, 1 << 12, p, dtype=np.int64).astype(np.int32))

    hi0, lo0, he0 = shape_score.shape_score_pairs(t_pack, q_pack)

    mesh = create_mesh()
    step = make_sharded_shape_step(mesh)
    hi1, lo1, he1 = step(shard_target_planes(mesh, t_pack), q_pack)
    assert (np.asarray(hi0) == np.asarray(hi1)).all()
    assert (np.asarray(lo0) == np.asarray(lo1)).all()
    assert (np.asarray(he0) == np.asarray(he1)).all()

    # stacked both-orientation step (the gradscore engine's mesh path):
    # two distinct planes so orientation mixups can't cancel out
    t_pack_m = jnp.asarray(
        rng.integers(0, 1 << 27, (p, t), dtype=np.int64).astype(np.uint32))
    q_pack_m = jnp.asarray(
        rng.integers(0, 1 << 12, p, dtype=np.int64).astype(np.int32))
    hi0m, lo0m, he0m = shape_score.shape_score_pairs(t_pack_m, q_pack_m)
    both = make_sharded_shape_step(mesh, both=True)
    t2 = jnp.stack([t_pack, t_pack_m])
    q2 = jnp.stack([q_pack, q_pack_m])
    hi2, lo2, he2 = both(shard_target_planes(mesh, t2), q2)
    assert (np.asarray(hi2) == np.stack(
        [np.asarray(hi0), np.asarray(hi0m)])).all()
    assert (np.asarray(lo2) == np.stack(
        [np.asarray(lo0), np.asarray(lo0m)])).all()
    assert (np.asarray(he2) == np.stack(
        [np.asarray(he0), np.asarray(he0m)])).all()

    # split (gap-row / he-row) sharded step == single-device split jit
    from colormipsearch_tpu.parallel.mesh import (
        make_sharded_shape_split_step,
    )

    t_gap = t2 & jnp.uint32((0x1FF << 16) | 0xFFFF)
    q_gap = q2 & jnp.int32(0x7FF)
    n_w = p // 32
    t_he = jnp.asarray(rng.integers(
        0, 1 << 32, (2, n_w, t), dtype=np.uint64).astype(np.uint32))
    q_he = jnp.asarray(rng.integers(
        0, 1 << 32, (2, n_w), dtype=np.uint64).astype(np.uint32))
    ref = shape_score.shape_score_pairs_split(t_gap, q_gap, t_he, q_he)
    splitstep = make_sharded_shape_split_step(mesh)
    got = splitstep(shard_target_planes(mesh, t_gap), q_gap,
                    shard_target_planes(mesh, t_he), q_he)
    for r, g in zip(ref, got):
        assert (np.asarray(r) == np.asarray(g)).all()
