"""Pallas shape kernel vs the XLA implementation (bit equality)."""

import numpy as np
import pytest

import jax.numpy as jnp

from colormipsearch_tpu.oracle.shape import dilate_rgb, mask_rgb
from colormipsearch_tpu.ops import shape_score
from colormipsearch_tpu.ops.shape_score_pallas import (
    pallas_available,
    shape_score_pairs_pallas,
)


@pytest.fixture(scope="module", autouse=True)
def require_pallas():
    if not pallas_available():
        pytest.skip("pallas unsupported on this backend")


def test_pallas_matches_xla():
    rng = np.random.default_rng(9)
    h, w, t = 40, 50, 5
    query = np.zeros((h, w, 3), np.uint8)
    query[rng.integers(0, h, 300), rng.integers(0, w, 300)] = \
        rng.integers(0, 256, (300, 3))
    targets = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        targets[i, rng.integers(0, h, 300), rng.integers(0, w, 300)] = \
            rng.integers(0, 256, (300, 3))
    grads = rng.integers(0, 300, (t, h, w)).astype(np.uint16)
    zgaps = np.stack([dilate_rgb(mask_rgb(targets[i], 20), 20)
                      for i in range(t)])

    t_pack, _ = shape_score.pack_targets(targets, grads, zgaps,
                                         mask_threshold=20)
    q_pack = shape_score.pack_query(query)

    hi_x, lo_x, he_x = shape_score.shape_score_pairs(
        t_pack, jnp.asarray(q_pack))
    hi_p, lo_p, he_p = shape_score_pairs_pallas(
        t_pack, jnp.asarray(q_pack))
    np.testing.assert_array_equal(np.asarray(hi_p), np.asarray(hi_x))
    np.testing.assert_array_equal(np.asarray(lo_p), np.asarray(lo_x))
    np.testing.assert_array_equal(np.asarray(he_p), np.asarray(he_x))
