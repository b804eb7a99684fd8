"""Direct GradScoreEngine tests: streamed multi-tile groups vs oracle."""

import numpy as np
import pytest
from PIL import Image

from colormipsearch_tpu.engine.cds import CDSParams
from colormipsearch_tpu.engine.gradscore import GradScoreEngine
from colormipsearch_tpu.model import CDMatch, ComputeFileType
from colormipsearch_tpu.model.entities import Neuron
from colormipsearch_tpu.oracle.shape import (
    ShapeMatchOracle,
    dilate_rgb,
    mask_rgb,
)


def _mk_cdm(rng, h, w, n):
    img = np.zeros((h, w, 3), np.uint8)
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = rng.integers(0, 256, (n, 3))
    return img


@pytest.mark.parametrize("with_zgap", [True, False])
def test_streamed_tiles_match_oracle(tmp_path, monkeypatch, with_zgap):
    """A group larger than GROUP_TILE streams through the prefetch
    iterator; scores must equal the float64 oracle per match (zgap
    variant present, and the on-the-fly dilation fallback)."""
    rng = np.random.default_rng(21)
    h, w = 60, 80
    mask_img = _mk_cdm(rng, h, w, 400)
    Image.fromarray(mask_img).save(tmp_path / "mask.png")
    mask_neuron = Neuron(mip_id="mask-1")
    mask_neuron.set_compute_file(
        ComputeFileType.InputColorDepthImage, str(tmp_path / "mask.png"))

    n_targets = 5
    matches, expected = [], []
    params = CDSParams(mask_threshold=20, data_threshold=20,
                       mirror_mask=True, negative_radius=20)
    region = params.shape_excluded_region(h, w)
    oracle = ShapeMatchOracle(mask_img, 20, mirror=True, negative_radius=20,
                              excluded_region=region)
    for i in range(n_targets):
        t_img = _mk_cdm(rng, h, w, 500)
        grad = rng.integers(0, 300, (h, w)).astype(np.uint16)
        Image.fromarray(t_img).save(tmp_path / f"t{i}.png")
        Image.fromarray(grad).save(
            tmp_path / f"t{i}_grad.png")
        target = Neuron(mip_id=f"t-{i}")
        target.set_compute_file(
            ComputeFileType.InputColorDepthImage, str(tmp_path / f"t{i}.png"))
        target.set_compute_file(
            ComputeFileType.GradientImage, str(tmp_path / f"t{i}_grad.png"))
        from colormipsearch_tpu.oracle.shape import clear_region
        if with_zgap:
            zgap = dilate_rgb(mask_rgb(t_img, 20), 20)
            Image.fromarray(zgap).save(tmp_path / f"t{i}_zgap.png")
            target.set_compute_file(
                ComputeFileType.ZGapImage, str(tmp_path / f"t{i}_zgap.png"))
        else:
            # fallback dilates the region-cleared masked target
            zgap = dilate_rgb(mask_rgb(clear_region(t_img, region), 20), 20)
        matches.append(CDMatch(mask_image=mask_neuron, matched_image=target,
                               matching_pixels=40 + i))
        expected.append(oracle.score(t_img, grad, zgap))

    monkeypatch.setattr(GradScoreEngine, "GROUP_TILE", 2)
    # force a mid-stream flush (2 chunks accumulate, then 1 remains)
    # so both the concat flush and the tail flush run
    monkeypatch.setattr(GradScoreEngine, "DISPATCH_TILE", 3)
    engine = GradScoreEngine(params, use_device=True)
    scored = engine.score_matches(matches)
    assert len(scored) == n_targets
    for m, exp in zip(matches, expected):
        assert m.gradient_area_gap == exp.gradient_area_gap
        assert m.high_expression_area == exp.high_expression_area


def test_multi_mask_normalization_is_per_mask(tmp_path):
    """Normalization maxima must come from ONE mask's matches, not the
    union (CalculateGradientScoresCmd.updateNormalizedScores:443-459):
    a weak mask normalized against a strong mask's maxima would get the
    wrong normalizedScore."""
    from colormipsearch_tpu.engine.gradscore import update_normalized_scores
    from colormipsearch_tpu.oracle.shape import normalized_score

    rng = np.random.default_rng(33)
    h, w = 40, 50
    matches = []
    for mi, px_scale in ((0, 100), (1, 700)):
        mask_img = _mk_cdm(rng, h, w, 300)
        Image.fromarray(mask_img).save(tmp_path / f"m{mi}.png")
        mask_neuron = Neuron(mip_id=f"mask-{mi}")
        mask_neuron.set_compute_file(
            ComputeFileType.InputColorDepthImage,
            str(tmp_path / f"m{mi}.png"))
        for i in range(3):
            t_img = _mk_cdm(rng, h, w, 400)
            grad = rng.integers(0, 300, (h, w)).astype(np.uint16)
            Image.fromarray(t_img).save(tmp_path / f"m{mi}t{i}.png")
            Image.fromarray(grad).save(
                tmp_path / f"m{mi}t{i}_grad.png")
            target = Neuron(mip_id=f"m{mi}-t-{i}")
            target.set_compute_file(
                ComputeFileType.InputColorDepthImage,
                str(tmp_path / f"m{mi}t{i}.png"))
            target.set_compute_file(
                ComputeFileType.GradientImage,
                str(tmp_path / f"m{mi}t{i}_grad.png"))
            matches.append(CDMatch(mask_image=mask_neuron,
                                   matched_image=target,
                                   matching_pixels=px_scale + i * 10))

    params = CDSParams(mask_threshold=20, data_threshold=20,
                       mirror_mask=True, negative_radius=20)
    engine = GradScoreEngine(params, use_device=True)
    scored = engine.score_matches(matches)
    assert len(scored) == 6
    # recompute expectation per mask independently
    for mi in (0, 1):
        ms = [m for m in scored if m.mask_image.mip_id == f"mask-{mi}"]
        max_px = max(m.matching_pixels for m in ms)
        max_neg = max(m.negative_score() for m in ms)
        for m in ms:
            want = normalized_score(
                m.matching_pixels, m.gradient_area_gap,
                m.high_expression_area, max_px, max_neg)
            assert abs(m.normalized_score - want) < 1e-9, (mi, want)
    # cross-check the bug would have been visible: union-normalized
    # scores for the weak mask differ from per-mask ones
    weak = [m for m in scored if m.mask_image.mip_id == "mask-0"]
    all_max_px = max(m.matching_pixels for m in scored)
    union_scores = [normalized_score(
        m.matching_pixels, m.gradient_area_gap, m.high_expression_area,
        all_max_px, max(x.negative_score() for x in scored))
        for m in weak]
    assert any(abs(u - m.normalized_score) > 1e-6
               for u, m in zip(union_scores, weak))
