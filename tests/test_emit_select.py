"""Device-side threshold-emit top-k selection (CDS_EMIT_TOPK).

With pctPositivePixels > 0 only pairs with score/querySize > pct/100
can emit (the reference's isMatch filter, ColorMIPSearch.java:42-44),
so union-key dispatches pull a [B, k] top-k selection instead of the
dense [B, T] rows, falling back to the dense pull whenever a mask's
k-th selected score could still emit.  These tests prove the selection
is lossless: dense (CDS_EMIT_TOPK=0) and selected runs must produce
identical match sets, including when the width is too small and the
fallback must fire.
"""

import numpy as np
import pytest

import jax


def _neurons(tmp_path, rng, count, h=40, w=64, n_fg=300, images=None):
    from PIL import Image
    from colormipsearch_tpu.model import ComputeFileType, LMNeuron

    out = []
    for i in range(count):
        if images is not None and images[i] is not None:
            img = images[i]
        else:
            img = np.zeros((h, w, 3), np.uint8)
            img[rng.integers(0, h, n_fg), rng.integers(0, w, n_fg)] = \
                rng.integers(0, 256, (n_fg, 3))
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(img).save(p)
        neuron = LMNeuron(mip_id=f"img_{i}", published_name=f"img_{i}")
        neuron.set_compute_file(ComputeFileType.InputColorDepthImage, str(p))
        out.append(neuron)
    return out


def _match_key(ms):
    return sorted((m.mask_image.mip_id, m.matched_image.mip_id,
                   m.matching_pixels, m.mirrored,
                   round(m.matching_pixels_ratio, 9)) for m in ms)


def _build_workload(tmp_path, n_mask_copies):
    """2 masks x 24 targets; the first n_mask_copies target slots of
    each mask's image are exact copies (ratio 1.0 matches), the rest
    random."""
    rng = np.random.default_rng(11)
    h, w = 40, 64
    mask_imgs = []
    for _ in range(2):
        img = np.zeros((h, w, 3), np.uint8)
        img[rng.integers(0, h, 300), rng.integers(0, w, 300)] = \
            rng.integers(0, 256, (300, 3))
        mask_imgs.append(img)
    target_imgs = []
    for mi in mask_imgs:
        target_imgs.extend([mi.copy()] * n_mask_copies)
    target_imgs.extend([None] * (24 - len(target_imgs)))
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 2, images=mask_imgs)
    targets = _neurons(tmp_path / "t", rng, 24, images=target_imgs)
    return masks, targets


@pytest.mark.parametrize("use_mesh", [False, True])
@pytest.mark.parametrize("k_env,n_copies,expect_fallback", [
    ("3", 1, False),   # selection succeeds: <= k emittable anywhere
    ("2", 6, True),    # 6 ratio-1.0 copies > k: fallback must fire
])
def test_emit_topk_select_matches_dense(tmp_path, monkeypatch, use_mesh,
                                        k_env, n_copies, expect_fallback):
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine
    from colormipsearch_tpu.utils.metrics import GLOBAL

    assert len(jax.devices()) == 8
    masks, targets = _build_workload(tmp_path, n_copies)
    # pct high enough that random cross-pairs are filtered but the
    # exact copies (ratio 1.0) emit
    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True, pct_positive_pixels=50.0)
    engine = CDSearchEngine(params, use_mesh=use_mesh)

    monkeypatch.setenv("CDS_EMIT_TOPK", "0")
    dense = engine.find_all_matches(masks, targets)
    assert dense, "expected the copy pairs to emit"

    monkeypatch.setenv("CDS_EMIT_TOPK", k_env)
    sel0 = GLOBAL.get("cds.emitSelect.count")
    fb0 = GLOBAL.get("cds.emitSelectFallback.count")
    selected = engine.find_all_matches(masks, targets)
    assert _match_key(selected) == _match_key(dense)
    if expect_fallback:
        assert GLOBAL.get("cds.emitSelectFallback.count") > fb0
    else:
        assert GLOBAL.get("cds.emitSelect.count") > sel0
        assert GLOBAL.get("cds.emitSelectFallback.count") == fb0


@pytest.mark.parametrize("use_mesh", [False, True])
def test_emit_select_disabled_without_threshold(tmp_path, monkeypatch,
                                                use_mesh):
    """pctPositivePixels == 0 means any score > 0 emits — the selection
    must stay off (no provable emit cutoff) and results match."""
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine
    from colormipsearch_tpu.utils.metrics import GLOBAL

    masks, targets = _build_workload(tmp_path, 1)
    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True)
    engine = CDSearchEngine(params, use_mesh=use_mesh)
    monkeypatch.setenv("CDS_EMIT_TOPK", "4")
    sel0 = GLOBAL.get("cds.emitSelect.count")
    fb0 = GLOBAL.get("cds.emitSelectFallback.count")
    with_env = engine.find_all_matches(masks, targets)
    assert GLOBAL.get("cds.emitSelect.count") == sel0
    assert GLOBAL.get("cds.emitSelectFallback.count") == fb0
    monkeypatch.setenv("CDS_EMIT_TOPK", "0")
    dense = engine.find_all_matches(masks, targets)
    assert _match_key(with_env) == _match_key(dense) and dense
