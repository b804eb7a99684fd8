"""Image-processing operations: the reference's transformation layer.

Concrete parity surface for the reference's LImage/ImageTransformation/
ColorTransformation stack (SURVEY §2.1 A4-A7) as plain array functions —
the TPU-first replacement for lazy per-pixel pipelines.  Each function
documents its reference twin; the heavy ops delegate to the validated
implementations in oracle/shape.py.
"""

from __future__ import annotations

import numpy as np

from colormipsearch_tpu.oracle.shape import (
    circular_footprint,
    clear_region,
    dilate_rgb,
    gray16_no_gamma,
    mask_rgb,
    rgb_signal,
)

__all__ = [
    "circular_footprint",
    "clear_region",
    "gray16_no_gamma",
    "horizontal_mirror",
    "mask_rgb",
    "max_filter",
    "rgb_signal",
    "shift",
]


def horizontal_mirror(img: np.ndarray) -> np.ndarray:
    """ImageTransformation.horizontalMirror:158 — flip across the Y axis."""
    return img[:, ::-1]


def shift(img: np.ndarray, dx: int, dy: int, fill=0) -> np.ndarray:
    """ImageTransformation.shift:167 — translate; exposed pixels filled.

    Matches the reference semantics where out-of-image source pixels
    contribute the fill value (the pixel-match kernel instead drops them
    via -1 position sentinels — PixelMatchColorDepthSearchAlgorithm:138-143).
    """
    out = np.full_like(img, fill)
    h, w = img.shape[:2]
    sx0, dx0 = (0, dx) if dx >= 0 else (-dx, 0)
    sy0, dy0 = (0, dy) if dy >= 0 else (-dy, 0)
    ww = w - abs(dx)
    hh = h - abs(dy)
    if ww > 0 and hh > 0:
        out[dy0:dy0 + hh, dx0:dx0 + ww] = img[sy0:sy0 + hh, sx0:sx0 + ww]
    return out


def max_filter(img: np.ndarray, radius: float) -> np.ndarray:
    """ImageTransformation.maxFilter/unsafeMaxFilter:201-205 — circular
    grayscale/RGB dilation with the ImageJ RankFilters kernel."""
    if img.ndim == 2:
        rgb = np.repeat(img[..., None], 3, axis=-1)
        return dilate_rgb(rgb, radius)[..., 0]
    return dilate_rgb(img, radius)
