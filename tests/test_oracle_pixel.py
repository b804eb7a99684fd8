"""Oracle pixel-match tests: golden score + scalar cross-validation.

The scalar `java_pixel_gap` below is an independent line-by-line
transliteration of the reference's calculatePixelGap
(cds/AbstractColorDepthSearchAlgorithm.java:157-390); Python floats are
IEEE float64, so it is bit-identical to the Java original.  The vectorized
oracle must agree with it everywhere.
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


def java_pixel_gap(red1, green1, blue1, red2, green2, blue2):
    BR1 = BG1 = GR1 = GB1 = RB1 = RG1 = 0
    BR2 = BG2 = GR2 = GB2 = RB2 = RG2 = 0
    rb1 = rg1 = gb1 = gr1 = br1 = bg1 = 0.0
    rb2 = rg2 = gb2 = gr2 = br2 = bg2 = 0.0
    pxGap = 10000.0
    BrBg = 0.354862745
    BgGb = 0.996078431
    GbGr = 0.505882353
    GrRg = 0.996078431
    RgRb = 0.505882353

    if blue1 > red1 and blue1 > green1:
        if red1 > green1:
            BR1 = blue1 + red1
            if blue1 != 0 and red1 != 0:
                br1 = red1 / blue1
        else:
            BG1 = blue1 + green1
            if blue1 != 0 and green1 != 0:
                bg1 = green1 / blue1
    elif green1 > blue1 and green1 > red1:
        if blue1 > red1:
            GB1 = green1 + blue1
            if green1 != 0 and blue1 != 0:
                gb1 = blue1 / green1
        else:
            GR1 = green1 + red1
            if green1 != 0 and red1 != 0:
                gr1 = red1 / green1
    elif red1 > blue1 and red1 > green1:
        if green1 > blue1:
            RG1 = red1 + green1
            if red1 != 0 and green1 != 0:
                rg1 = green1 / red1
        else:
            RB1 = red1 + blue1
            if red1 != 0 and blue1 != 0:
                rb1 = blue1 / red1

    if blue2 > red2 and blue2 > green2:
        if red2 > green2:
            BR2 = blue2 + red2
            if blue2 != 0 and red2 != 0:
                br2 = red2 / blue2
        else:
            BG2 = blue2 + green2
            if blue2 != 0 and green2 != 0:
                bg2 = green2 / blue2
    elif green2 > blue2 and green2 > red2:
        if blue2 > red2:
            GB2 = green2 + blue2
            if green2 != 0 and blue2 != 0:
                gb2 = blue2 / green2
        else:
            GR2 = green2 + red2
            if green2 != 0 and red2 != 0:
                gr2 = red2 / green2
    elif red2 > blue2 and red2 > green2:
        if green2 > blue2:
            RG2 = red2 + green2
            if red2 != 0 and green2 != 0:
                rg2 = green2 / red2
        else:
            RB2 = red2 + blue2
            if red2 != 0 and blue2 != 0:
                rb2 = blue2 / red2

    if BR1 > 0:
        if BR2 > 0:
            if br1 > 0 and br2 > 0:
                pxGap = abs(br2 - br1) if br1 != br2 else 0.0
        elif BG2 > 0:
            if br1 < 0.44 and bg2 < 0.54:
                pxGap = (br1 - BrBg) + (bg2 - BrBg)
    elif BG1 > 0:
        if BG2 > 0:
            if bg1 > 0 and bg2 > 0:
                pxGap = abs(bg2 - bg1) if bg1 != bg2 else 0.0
        elif GB2 > 0:
            if bg1 > 0.8 and gb2 > 0.8:
                pxGap = (BgGb - bg1) + (BgGb - gb2)
        elif BR2 > 0:
            if bg1 < 0.54 and br2 < 0.44:
                pxGap = (br2 - BrBg) + (bg1 - BrBg)
    elif GB1 > 0:
        if GB2 > 0:
            if gb1 > 0 and gb2 > 0:
                pxGap = abs(gb2 - gb1) if gb1 != gb2 else 0.0
        elif BG2 > 0:
            if gb1 > 0.8 and bg2 > 0.8:
                pxGap = (BgGb - gb1) + (BgGb - bg2)
        elif GR2 > 0:
            if gb1 < 0.7 and gr2 < 0.7:
                pxGap = (gb1 - GbGr) + (gr2 - GbGr)
    elif GR1 > 0:
        if GR2 > 0:
            if gr1 > 0 and gr2 > 0:
                pxGap = abs(gr2 - gr1) if gr1 != gr2 else 0.0
        elif GB2 > 0:
            if gr1 < 0.7 and gb2 < 0.7:
                pxGap = (gr1 - GbGr) + (gb2 - GbGr)
        elif RG2 > 0:
            if gr1 > 0.8 and rg2 > 0.8:
                pxGap = (GrRg - gr1) + (GrRg - rg2)
    elif RG1 > 0:
        if RG2 > 0:
            if rg1 > 0 and rg2 > 0:
                pxGap = abs(rg2 - rg1) if rg1 != rg2 else 0.0
        elif GR2 > 0:
            if rg1 > 0.8 and gr2 > 0.8:
                pxGap = (GrRg - gr2) + (GrRg - rg1)
        elif RB2 > 0:
            if rg1 < 0.7 and rb2 < 0.7:
                pxGap = (rb2 - RgRb) + (rg1 - RgRb)
    elif RB1 > 0:
        if RB2 > 0:
            if rb1 > 0 and rb2 > 0:
                pxGap = abs(rb2 - rb1) if rb1 != rb2 else 0.0
        elif RG2 > 0:
            if rg2 < 0.7 and rb1 < 0.7:
                pxGap = (rg2 - RgRb) + (rb1 - RgRb)
    return pxGap


def _gap_via_oracle(rgb1, rgb2):
    c1, s1, p1 = classify_rgb(np.asarray(rgb1, np.uint8).reshape(1, 3))
    c2, s2, p2 = classify_rgb(np.asarray(rgb2, np.uint8).reshape(1, 3))
    r1 = ratio_f64(c1, s1, p1)
    r2 = ratio_f64(c2, s2, p2)
    return pixel_gap(c1, r1, c2, r2)[0]


def test_pixel_gap_matches_scalar_java_on_random_pairs():
    rng = np.random.default_rng(0)
    pairs = rng.integers(0, 256, size=(20000, 6))
    # bias towards structured hues too
    hue = rng.integers(0, 256, size=(20000, 2))
    structured = np.stack([
        np.zeros(20000), hue[:, 0], np.full(20000, 255),
        np.zeros(20000), hue[:, 1], np.full(20000, 255),
    ], axis=1).astype(np.int64)
    allpairs = np.concatenate([pairs, structured]).astype(np.int64)
    c1, s1, p1 = classify_rgb(allpairs[:, 0:3].astype(np.uint8))
    c2, s2, p2 = classify_rgb(allpairs[:, 3:6].astype(np.uint8))
    vec = pixel_gap(c1, ratio_f64(c1, s1, p1), c2, ratio_f64(c2, s2, p2))
    for i, row in enumerate(allpairs):
        expected = java_pixel_gap(*[int(v) for v in row])
        assert vec[i] == expected, (row, vec[i], expected)


def test_pixel_gap_zero_ratio_corner_cases():
    # pure blue query (class BG, ratio 0) vs BR target with small ratio:
    # the adjacent-class branch fires and goes negative => match
    g = _gap_via_oracle((0, 0, 200), (50, 0, 200))
    assert g == java_pixel_gap(0, 0, 200, 50, 0, 200)
    assert g < 0
    # same-class with zero ratio never matches
    assert _gap_via_oracle((0, 0, 200), (0, 0, 100)) == 10000.0
    # black pixels
    assert _gap_via_oracle((0, 0, 0), (0, 0, 0)) == 10000.0


def test_shift_offsets():
    assert shift_offsets(0) == [(0, 0)]
    offs = shift_offsets(2)
    assert len(offs) == 9 and (0, 0) in offs
    assert set(offs) == {(dx, dy) for dx in (-2, 0, 2) for dy in (-2, 0, 2)}


def test_golden_pixel_score(mask_rgb, target_rgb, golden_region):
    """Reference golden: PixelMatchColorDepthSearchAlgorithmTest => 87."""
    oracle = PixelMatchOracle(
        mask_rgb, 20, mirror=True, target_threshold=20,
        z_tolerance=0.01, xy_shift=2, excluded_region=golden_region)
    res = oracle.score(target_rgb)
    assert res.matching_pixels == 87
    assert not res.mirrored


def test_self_match_is_query_size(mask_rgb, golden_region):
    oracle = PixelMatchOracle(
        mask_rgb, 20, mirror=False, target_threshold=20,
        z_tolerance=0.01, xy_shift=0, excluded_region=golden_region)
    res = oracle.score(mask_rgb)
    assert res.matching_pixels == oracle.query_size
    assert res.matching_pixels_ratio == 1.0
