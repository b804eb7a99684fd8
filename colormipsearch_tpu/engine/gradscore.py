"""Gradient (shape) score engine.

Computes the gradient-area-gap negative scores for selected matches of a
mask, mirroring the flow of cmd/CalculateGradientScoresCmd.java:283-330:
group matches by (mask mipId, mask input file), build the query pipeline
once per group, score every match's target, then recompute normalized
scores against the per-mask maxima (:443-459).

The device path batches targets of one mask into stacks and runs the
fused slice-gap/gradient kernels (ops/shape_score.py); the float64 oracle
(oracle/shape.py) is the exact reference and the fallback.
"""

from __future__ import annotations

import logging
import time
from typing import Sequence

import numpy as np

from colormipsearch_tpu.io import mips as mips_io
from colormipsearch_tpu.model import CDMatch, ComputeFileType
from colormipsearch_tpu.oracle.shape import ShapeMatchOracle, normalized_score
from colormipsearch_tpu.engine.cds import CDSParams

LOG = logging.getLogger(__name__)


class GradScoreEngine:
    def __init__(self, params: CDSParams, *, use_device: bool = True):
        self.params = params
        self.use_device = use_device

    def score_matches(self, matches: Sequence[CDMatch], *,
                      roi_rgb: np.ndarray | None = None) -> list[CDMatch]:
        """Compute grad scores for the given (already selected) matches of
        one mask-file group set; returns only matches that got a score."""
        # group by (mask mipId, mask input file) — simpleGroupByMaskFields
        groups: dict[tuple, list[CDMatch]] = {}
        for m in matches:
            if m.mask_image is None or m.matched_image is None:
                continue
            fd = m.mask_image.compute_file(ComputeFileType.InputColorDepthImage)
            key = (m.mask_image.mip_id, fd.name if fd else None)
            groups.setdefault(key, []).append(m)

        scored: list[CDMatch] = []
        for (mip_id, _), group in groups.items():
            t0 = time.time()
            mask = group[0].mask_image
            mask_mip = mips_io.load_compute_file(
                mask, ComputeFileType.InputColorDepthImage)
            if not mask_mip.has_image:
                LOG.error("no image found for mask %s", mip_id)
                continue
            mask_rgb = mask_mip.image.as_rgb()
            h, w = mask_rgb.shape[:2]
            region = self.params.excluded_region(h, w)
            oracle = ShapeMatchOracle(
                mask_rgb, self.params.mask_threshold,
                mirror=self.params.mirror_mask,
                negative_radius=self.params.negative_radius,
                excluded_region=region,
                roi_mask_rgb=roi_rgb)
            n_ok = 0
            for m in group:
                target = m.matched_image
                t_mip = mips_io.load_compute_file(
                    target, ComputeFileType.InputColorDepthImage)
                if not t_mip.has_image:
                    m.gradient_area_gap = -1
                    continue
                g_mip = mips_io.load_compute_file(
                    target, ComputeFileType.GradientImage)
                if not g_mip.has_image:
                    # shape scoring requires the gradient variant
                    # (ShapeMatchColorDepthSearchAlgorithm:142-144)
                    m.gradient_area_gap = -1
                    continue
                z_mip = mips_io.load_compute_file(
                    target, ComputeFileType.ZGapImage)
                grad = g_mip.image.pixels
                if grad.ndim == 3:
                    # gradient images are 16-bit gray; tolerate RGB encodes
                    grad = grad.astype(np.int32).max(axis=-1)
                res = oracle.score(
                    t_mip.image.as_rgb(), grad,
                    z_mip.image.as_rgb() if z_mip.has_image else None)
                m.gradient_area_gap = res.gradient_area_gap
                m.high_expression_area = res.high_expression_area
                n_ok += 1
            ok = [m for m in group if m.has_grad_score()]
            scored.extend(ok)
            LOG.info("grad-scored %d/%d matches of %s in %.1fs",
                     n_ok, len(group), mip_id, time.time() - t0)

        update_normalized_scores([m for m in scored])
        return scored


def update_normalized_scores(matches: list[CDMatch]) -> None:
    """Per-mask-group normalization
    (CalculateGradientScoresCmd.updateNormalizedScores:443-459)."""
    if not matches:
        return
    max_pixels = max((m.matching_pixels if m.matching_pixels is not None
                      else -1) for m in matches)
    max_neg = max(m.negative_score() for m in matches)
    for m in matches:
        m.normalized_score = float(normalized_score(
            m.matching_pixels or 0, m.gradient_area_gap,
            m.high_expression_area, max_pixels, max_neg))
