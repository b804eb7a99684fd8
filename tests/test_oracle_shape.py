"""Oracle shape-score tests: normalization goldens, dilation, slice LUT."""

import numpy as np

from colormipsearch_tpu.constants import RAINBOW_LUT
from colormipsearch_tpu.oracle.shape import (
    ShapeMatchOracle,
    circular_footprint,
    dilate_rgb,
    gray16_no_gamma,
    normalized_score,
    rgb_signal,
    slice_gap,
    slice_numbers,
)


def test_normalized_score_goldens():
    """GradientAreaGapUtilsTest.scoreCalculator golden values."""
    assert abs(normalized_score(636, 0, 1897, 679, 1114361) - 44041.78) < 0.1
    assert abs(normalized_score(636, 0, 1644, 679, 1107088) - 46833.58) < 0.1
    assert abs(normalized_score(636, 0, 1644, 679, 1114361) - 46833.58) < 0.1
    assert abs(normalized_score(795, 0, 93, 875, 1606182) - 45428.57) < 0.1
    assert abs(normalized_score(795, 0, 93, 875, 1606182) - 45428.57) < 0.1


def test_normalized_score_degenerate():
    assert normalized_score(0, 0, 93, 875, 1606182) == 0.0
    assert normalized_score(10, -1, 93, 875, 1606182) == 10.0
    assert normalized_score(10, 5, 3, 0, 100) == 10.0


def test_circular_footprint_r10_matches_imagej():
    """The documented r=10 line radii (ImageTransformation.java:542-544)."""
    fp = circular_footprint(10)
    k = fp.shape[0] // 2
    extents = [int(np.flatnonzero(fp[y])[-1] - k) for y in range(fp.shape[0])]
    assert extents == [1, 4, 6, 7, 8, 8, 9, 9, 9, 10, 10,
                       10, 9, 9, 9, 8, 8, 7, 6, 4, 1]


def test_circular_footprint_quantized_radii():
    # ImageJ quantizes r in [1.5,1.75) and [2.5,2.85) upward
    assert circular_footprint(1.5).shape == circular_footprint(1.75).shape
    assert circular_footprint(2.5).shape == circular_footprint(2.85).shape


def test_dilate_rgb_vs_bruteforce():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    # sparsify like real CDMs
    img[rng.random((17, 23)) > 0.2] = 0
    for radius in (1, 2, 3.5, 5):
        fp = circular_footprint(radius)
        k = fp.shape[0] // 2
        out = dilate_rgb(img, radius)
        h, w = img.shape[:2]
        for y in range(h):
            for x in range(w):
                best = np.zeros(3, dtype=np.int32)
                for dy in range(-k, k + 1):
                    for dx in range(-k, k + 1):
                        if not fp[dy + k, dx + k]:
                            continue
                        ay, ax = y + dy, x + dx
                        if 0 <= ay < h and 0 <= ax < w:
                            best = np.maximum(best, img[ay, ax])
                assert (out[y, x] == best).all(), (y, x, radius)


def test_slice_numbers_lut_identity():
    sl = slice_numbers(RAINBOW_LUT.astype(np.uint8).reshape(256, 1, 3))
    assert (sl.reshape(-1) == np.arange(1, 257)).all()


def test_slice_numbers_black_and_gap():
    assert slice_numbers(np.zeros((1, 1, 3), np.uint8))[0, 0] == 0
    s1 = np.array([[10]])
    s2 = np.array([[250]])
    assert slice_gap(s1, s2)[0, 0] == 240
    assert slice_gap(np.array([[0]]), s2)[0, 0] == 250
    assert slice_gap(s1, np.array([[0]]))[0, 0] == 0


def test_gray_signal_formulas():
    rgb = np.array([[[7, 7, 8]], [[8, 8, 7]], [[0, 0, 0]], [[255, 255, 255]]],
                   dtype=np.uint8)
    # gray16 = (2*(r+g+b)+3)//6
    assert gray16_no_gamma(rgb).reshape(-1).tolist() == [7, 8, 0, 255]
    # signal(2): gray >= 8 ; signal(0): gray >= 2
    assert rgb_signal(rgb, 2).reshape(-1).tolist() == [0, 1, 0, 1]
    assert rgb_signal(np.array([[[1, 1, 2]], [[2, 2, 1]]], np.uint8),
                      0).reshape(-1).tolist() == [0, 1]


def test_shape_oracle_runs_and_mirror_quirk():
    """Smoke: shape scorer on synthetic planes; mirrored pass mirrors the
    query AND the z-gap but not the gradient (reference quirk)."""
    rng = np.random.default_rng(2)
    h, w = 32, 48
    q = np.zeros((h, w, 3), np.uint8)
    q[10:20, 5:15] = np.array(RAINBOW_LUT[100], np.uint8)  # green-ish block
    t = np.zeros((h, w, 3), np.uint8)
    t[12:22, 30:40] = np.array(RAINBOW_LUT[100], np.uint8)
    grad = rng.integers(0, 300, size=(h, w)).astype(np.uint16)

    oracle = ShapeMatchOracle(q, 20, mirror=False, negative_radius=5)
    res = oracle.score(t, grad)
    assert res.gradient_area_gap >= 0 and res.high_expression_area >= 0
    # identical query/target with zgap=dilation of itself: overlap pixels
    # have sliceGap 0 < 80, so they contribute the gradient term
    res_self = oracle.score(q, np.zeros((h, w), np.uint16))
    assert res_self.gradient_area_gap == 0

    oracle_m = ShapeMatchOracle(q, 20, mirror=True, negative_radius=5)
    res_m = oracle_m.score(t, grad)
    assert res_m.negative_score <= res.negative_score
