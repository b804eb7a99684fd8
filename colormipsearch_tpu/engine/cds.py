"""Color depth search engine: batched device scoring + exact fallback.

TPU-first replacement of the reference's per-pair threaded loop
(cmd/cdsprocess/LocalColorMIPSearchProcessor.java:51-124):

  * targets are decoded once and packed into pixel-major uint32 summary
    planes resident on device (HBM), grouped by image shape,
  * each mask is compiled into a QueryPlan (padded position/attribute
    arrays for all shift/mirror variants) and scored against a whole
    target shard in one fused device call — the device returns per-variant
    match counts AND ambiguity flags,
  * the rare pairs whose near-threshold pixels make the fast predicate
    ambiguous are re-scored with the float64 oracle, keeping results
    bit-identical to the reference,
  * matches are assembled into CDMatch entities with the same semantics as
    AbstractColorMIPSearchProcessor.findPixelMatch:59-90 (matchingPixels,
    matchingPixelsRatio == initial normalizedScore, mirrored, isMatch
    filter from ColorMIPSearch.isMatch:42-45).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from colormipsearch_tpu.io import mips as mips_io
from colormipsearch_tpu.model import (
    CDMatch,
    ComputeFileType,
    Neuron,
    ProcessingType,
)
from colormipsearch_tpu.oracle.pixel import PixelMatchOracle, label_regions_mask
from colormipsearch_tpu.ops import common, pixel_match

LOG = logging.getLogger(__name__)


@dataclasses.dataclass
class CDSParams:
    """Shared CDS parameters (cmd/AbstractColorDepthMatchArgs.java)."""
    mask_threshold: int = 100
    data_threshold: int = 100
    pix_color_fluctuation: float = 2.0
    xy_shift: int = 0
    mirror_mask: bool = False
    pct_positive_pixels: float = 0.0
    negative_radius: int = 20
    border_size: int = 0
    with_name_label_region: bool = False
    with_color_scale_region: bool = False
    processing_partition_size: int = 100

    def __post_init__(self):
        if self.xy_shift % 2 != 0:
            # reference validates xyShift is even (factory :59-61)
            raise ValueError("xyShift must be an even value")

    def excluded_region(self, height: int, width: int) -> np.ndarray | None:
        if not (self.with_name_label_region or self.with_color_scale_region):
            return None
        return label_regions_mask(
            width, height,
            with_name_label=self.with_name_label_region,
            with_color_scale_label=self.with_color_scale_region)

    def as_map(self) -> dict:
        """CDS parameter audit map (ColorMIPSearch.getCDSParameters)."""
        return {
            "mirrorMask": str(self.mirror_mask),
            "dataThreshold": str(self.data_threshold),
            "pixColorFluctuation": str(self.pix_color_fluctuation),
            "xyShift": str(self.xy_shift),
            "negativeRadius": str(self.negative_radius),
            "borderSize": str(self.border_size),
            "pctPositivePixels": str(self.pct_positive_pixels),
            "defaultMaskThreshold": str(self.mask_threshold),
        }


@dataclasses.dataclass
class TargetShard:
    """Packed targets of one image shape, device-resident."""
    neurons: list[Neuron]
    shape: tuple[int, int]           # (H, W)
    planes: jax.Array                # uint32 [P, T]
    host_rgb: np.ndarray             # uint8 [T, H, W, 3] for oracle rescore

    @property
    def count(self) -> int:
        return len(self.neurons)


def load_target_shards(targets: Sequence[Neuron], *,
                       file_type: ComputeFileType =
                       ComputeFileType.InputColorDepthImage,
                       tile_size: int = 4096) -> list[TargetShard]:
    """Decode target CDMs and pack them into device planes, grouped by
    image shape and tiled to bound single-allocation size."""
    by_shape: dict[tuple[int, int], tuple[list[Neuron], list[np.ndarray]]] = {}
    skipped = 0
    for n in targets:
        mip = mips_io.load_compute_file(n, file_type)
        if not mip.has_image:
            skipped += 1
            continue
        rgb = mip.image.as_rgb()
        by_shape.setdefault(rgb.shape[:2], ([], []))[0].append(n)
        by_shape[rgb.shape[:2]][1].append(rgb)
    if skipped:
        LOG.warning("skipped %d targets with missing/corrupt images", skipped)

    shards = []
    for shape, (neurons, rgbs) in by_shape.items():
        for i in range(0, len(neurons), tile_size):
            stack = np.stack(rgbs[i:i + tile_size])
            planes = common.pack_target_planes(jnp.asarray(stack))
            shards.append(TargetShard(neurons[i:i + tile_size], shape,
                                      planes, stack))
    return shards


class CDSearchEngine:
    """All-pairs masked CDS scoring (pixel-match pass)."""

    def __init__(self, params: CDSParams):
        self.params = params

    def find_all_matches(self, masks: Sequence[Neuron],
                         targets: Sequence[Neuron], *,
                         tags: Iterable[str] = (),
                         session_ref_id: int | None = None) -> list[CDMatch]:
        """Score masks x targets; returns entities for found matches only
        (LocalColorMIPSearchProcessor filters isMatchFound :110)."""
        t0 = time.time()
        shards = load_target_shards(targets)
        n_targets = sum(s.count for s in shards)
        LOG.info("packed %d targets into %d shards in %.1fs",
                 n_targets, len(shards), time.time() - t0)
        tags = set(tags)

        matches: list[CDMatch] = []
        for mask in masks:
            mask_mip = mips_io.load_compute_file(
                mask, ComputeFileType.InputColorDepthImage)
            if not mask_mip.has_image:
                LOG.warning("mask %s has no loadable image", mask.mip_id)
                continue
            matches.extend(self._search_one_mask(
                mask, mask_mip.image.as_rgb(), shards, tags, session_ref_id))
        LOG.info("found %d matches for %d masks x %d targets in %.1fs",
                 len(matches), len(masks), n_targets, time.time() - t0)
        return matches

    def _search_one_mask(self, mask: Neuron, mask_rgb: np.ndarray,
                         shards: list[TargetShard], tags: set,
                         session_ref_id) -> list[CDMatch]:
        p = self.params
        h, w = mask_rgb.shape[:2]
        region = p.excluded_region(h, w)
        plan = pixel_match.build_query_plan(
            mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
            xy_shift=p.xy_shift, pix_color_fluctuation=p.pix_color_fluctuation,
            excluded_region=region)
        if plan.query_size == 0:
            return []
        oracle = None  # lazy: only when an ambiguous pair appears

        out: list[CDMatch] = []
        for shard in shards:
            if shard.shape != (h, w):
                # the reference requires target size == query size
                continue
            scores, flags = pixel_match.score_query_against_planes(
                shard.planes, jnp.asarray(plan.positions),
                jnp.asarray(plan.q_cls), jnp.asarray(plan.q_s),
                jnp.asarray(plan.q_p),
                target_threshold=p.data_threshold,
                ztol_num=plan.ztol_num, ztol_den=plan.ztol_den)
            scores = np.asarray(scores)
            pair_flags = np.asarray(flags).sum(axis=0)
            best, mirrored = pixel_match.reduce_variant_scores(scores, plan)

            for t_idx in np.flatnonzero(best > 0):
                score = int(best[t_idx])
                is_mirrored = bool(mirrored[t_idx])
                if pair_flags[t_idx] > 0:
                    if oracle is None:
                        oracle = PixelMatchOracle(
                            mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
                            target_threshold=p.data_threshold,
                            z_tolerance=p.pix_color_fluctuation / 100,
                            xy_shift=p.xy_shift, excluded_region=region)
                    res = oracle.score(shard.host_rgb[t_idx])
                    score, is_mirrored = res.matching_pixels, res.mirrored
                    if score == 0:
                        continue
                ratio = score / plan.query_size
                if not (score > 0 and ratio > p.pct_positive_pixels / 100):
                    continue
                target = shard.neurons[t_idx]
                mask.add_processed_tags(ProcessingType.ColorDepthSearch, tags)
                target.add_processed_tags(ProcessingType.ColorDepthSearch, tags)
                out.append(CDMatch(
                    mask_image=mask,
                    matched_image=target,
                    mask_image_ref_id=mask.entity_id,
                    matched_image_ref_id=target.entity_id,
                    session_ref_id=session_ref_id,
                    mirrored=is_mirrored,
                    matching_pixels=score,
                    matching_pixels_ratio=ratio,
                    normalized_score=ratio,
                    match_found=True,
                    tags=set(tags),
                ))
        return out
