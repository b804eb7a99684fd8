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
import os
import threading
import time
from typing import Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from colormipsearch_tpu.io import mips as mips_io
from colormipsearch_tpu.utils.metrics import GLOBAL as _METRICS
from colormipsearch_tpu.model import (
    CDMatch,
    ComputeFileType,
    Neuron,
    ProcessingType,
)
from colormipsearch_tpu.oracle.pixel import PixelMatchOracle, label_regions_mask
from colormipsearch_tpu.ops import common, pixel_match

LOG = logging.getLogger(__name__)

# opt-in 3-byte split-plane pixel kernel (u16 (p<<8)|s + u8 cls); proven
# bit-equal to the packed path, pending the hardware gather A/B before
# becoming the default (docs/DESIGN.md §6 open question)
_USE_SPLIT = os.environ.get("CDS_SPLIT_PLANES", "0") == "1"

# opt-in rank-key planes + interval predicate (ops/pixel_match
# build_key_intervals): exact device verdicts (no ambiguity band, no
# oracle fallback) and ~3x fewer per-element VPU intermediates at the
# same gather traffic; pending the hardware A/B (scripts/perf_sweep.py
# --keys) before becoming the default
_USE_KEYS = os.environ.get("CDS_KEY_PLANES", "0") == "1"

# union lane forms of the key kernel (imply key planes): "x" gathers
# the x-dilated union once per dy-set (0.5x the gathered rows for 1.5x
# the range tests); "full" gathers one fully dilated union per
# orientation (0.25x rows, 3x tests).  The hardware A/B (TPU v5e,
# T=4096 x B=8, 2026-08-19; bench_runs/, docs/DESIGN.md §6) measured
# full 2.41M > x 2.21M > classic keys 1.30M > packed 1.15M pairs/s, so
# "full" — which also covers any xyShift with no grid precondition —
# is the production default; every bare opt-in shorthand
# (CDS_UNION_KEYS=1, use_union_keys=True, bare --use-union-keys)
# selects "full"; CDS_UNION_KEYS=0|x opts out/down.  The env default
# applies only when the caller pinned NEITHER kernel kwarg — an
# explicit use_key_planes choice selects exactly that kernel.
_USE_UNION = os.environ.get("CDS_UNION_KEYS", "full")
_USE_UNION = False if _USE_UNION == "0" else _USE_UNION


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
        if not (float(self.pix_color_fluctuation) >= 0):
            # the device predicates' exactness proofs cover z >= 0 only
            # (a negative tolerance matches nothing useful; NaN fails
            # the inverted comparison too)
            raise ValueError("pixColorFluctuation must be >= 0")

    def excluded_region(self, height: int, width: int) -> np.ndarray | None:
        if not (self.with_name_label_region or self.with_color_scale_region):
            return None
        return label_regions_mask(
            width, height,
            with_name_label=self.with_name_label_region,
            with_color_scale_label=self.with_color_scale_region)

    def shape_excluded_region(self, height: int,
                              width: int) -> np.ndarray | None:
        """Label regions + the borderSize frame — the shape provider
        creates the query LImage with borders
        (ColorDepthSearchAlgorithmProviderFactory:113); the pixel-match
        pass does not use the border."""
        region = self.excluded_region(height, width)
        if self.border_size <= 0:
            return region
        b = self.border_size
        border = np.ones((height, width), dtype=bool)
        if height > 2 * b and width > 2 * b:
            border[b:height - b, b:width - b] = False
        return border if region is None else (region | border)

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
    """Packed targets of one image shape, device-resident.

    Raw pixels are NOT retained once packed (the rare ambiguity-flagged
    pairs re-decode their one target through host_rgb() / the MIP
    cache) — EXCEPT for deferred shards, which hold their decoded
    uint8 stack (~8 GB at production width) on the HOST until the
    consumer packs them; peak host RSS in the multi-shard prefetch
    path is therefore ~2 stacks (~17 GB), traded deliberately against
    the HBM limit that forbids two PACKED plane sets (ensure_planes
    docstring)."""
    neurons: list[Neuron]
    shape: tuple[int, int]           # (H, W)
    planes: jax.Array                # uint32 [P, T] (or int32 [P+1, T]
    #                                  rank-key planes when kind="keys")
    kind: str = "packed"
    file_type: ComputeFileType = ComputeFileType.InputColorDepthImage
    device_planes: jax.Array | None = None  # mesh-sharded copy (lazy)
    # when set, below-threshold pixels are packed as zero words and the
    # kernels run with target_threshold=-1 (the test is folded away)
    packed_threshold: int | None = None
    # lazy 3-byte split-plane pair (CDS_SPLIT_PLANES=1)
    split_planes: tuple | None = None
    # mesh identity the cached device/split planes were sharded for
    mesh_token: object = None
    split_mesh_token: object = None
    # padded target-axis width (kernel shape; stable even after the
    # unsharded planes are released under a mesh)
    t_pad: int = 0
    # decoded uint8 stack pending a DEFERRED device pack: shards after
    # the first defer their pack until consumed, because two packed
    # T=4096 plane sets (11.2 GB each) cannot coexist in the 16 GB HBM
    # — the eager prefetch OOMed the first real multi-shard run
    # (44,593 x 7,391, round 5)
    host_stack: np.ndarray | None = None

    def __post_init__(self):
        if not self.t_pad and self.planes is not None:
            self.t_pad = self.planes.shape[1]

    @property
    def count(self) -> int:
        return len(self.neurons)

    def ensure_planes(self) -> None:
        """Pack the deferred host stack onto the device (no-op for
        eagerly-packed shards).  Callers release the PREVIOUS shard
        first so only one packed plane set is ever resident."""
        if self.planes is not None or self.host_stack is None:
            return
        from colormipsearch_tpu.utils.metrics import GLOBAL
        t0 = time.time()
        self.planes = _pack_target_stack(
            self.host_stack, self.t_pad, self.kind,
            self.packed_threshold)
        np.asarray(self.planes[-1, :1])  # honest stage timing
        GLOBAL.add("cds.packUpload.seconds", time.time() - t0)
        self.host_stack = None

    def release(self) -> None:
        """Free this shard's device arrays (planes, mesh-sharded and
        split copies) so the next shard's pack has the HBM."""
        for arr in (self.planes, self.device_planes,
                    *(self.split_planes or ())):
            if arr is not None:
                try:
                    arr.delete()
                except Exception:  # noqa: BLE001 - already deleted
                    pass
        self.planes = None
        self.device_planes = None
        self.split_planes = None
        self.host_stack = None

    def host_rgb(self, t_idx: int) -> np.ndarray:
        """Re-decode one target's RGB (ambiguity-flagged rescore only)."""
        from colormipsearch_tpu.io import cache as mips_cache

        mip = mips_cache.load_mip(self.neurons[t_idx], self.file_type)
        return mip.image.as_rgb()


def load_target_shards(targets: Sequence[Neuron], *,
                       file_type: ComputeFileType =
                       ComputeFileType.InputColorDepthImage,
                       tile_size: int = 4096,
                       pack_threshold: int | None = None,
                       plane_kind: str = "packed",
                       defer_pack: bool = False
                       ) -> list[TargetShard]:
    """Decode target CDMs and pack them into device planes, grouped by
    image shape and tiled to bound single-allocation size.

    Same-shape RGB TIFF/PNG batches go through the native multithreaded
    decoder (io/native_decoder.py); everything else decodes via PIL.
    """
    from colormipsearch_tpu.utils.metrics import GLOBAL

    try:
        from colormipsearch_tpu.io import native_decoder
        native_ok = native_decoder.available()
    except ImportError:
        native_ok = False

    by_shape: dict[tuple[int, int], tuple[list[Neuron], list]] = {}
    pending: dict[tuple[int, int], tuple[list[Neuron], list[bytes]]] = {}
    skipped = 0
    t_decode0 = time.time()
    for n in targets:
        fd = n.compute_file(file_type)
        if fd is None:
            skipped += 1
            continue
        blob = None
        if native_ok:
            try:
                blob = mips_io.read_bytes(fd)
            except (OSError, FileNotFoundError):
                skipped += 1
                continue
            info = native_decoder.img_info(blob)
            if info is not None and info[2] == 3 and info[3] == 8:
                w, h = info[0], info[1]
                pending.setdefault((h, w), ([], []))[0].append(n)
                pending[(h, w)][1].append(blob)
                continue
        mip = mips_io.load_compute_file(n, file_type) if blob is None \
            else mips_io.NeuronMIP(n, fd, _decode_or_none(blob))
        if not mip.has_image:
            skipped += 1
            continue
        rgb = mip.image.as_rgb()
        by_shape.setdefault(rgb.shape[:2], ([], []))[0].append(n)
        by_shape[rgb.shape[:2]][1].append(rgb)

    # batch-decode the native-eligible groups
    for (h, w), (neurons, blobs) in pending.items():
        from colormipsearch_tpu.io import native_decoder
        res = native_decoder.decode_img_batch(
            blobs, width=w, height=h, channels=3)
        if res is None:
            for n, b in zip(neurons, blobs):
                img = _decode_or_none(b)
                if img is None:
                    skipped += 1
                    continue
                by_shape.setdefault((h, w), ([], []))[0].append(n)
                by_shape[(h, w)][1].append(img.as_rgb())
            continue
        arena, ok = res
        dst = by_shape.setdefault((h, w), ([], []))
        for i, n in enumerate(neurons):
            if not ok[i]:
                # per-image fallback: the native decoder rejects some
                # valid encodings (e.g. interlaced PNG) that PIL handles
                img = _decode_or_none(blobs[i])
                if img is None:
                    skipped += 1
                    continue
                dst[0].append(n)
                dst[1].append(img.as_rgb())
                continue
            dst[0].append(n)
            dst[1].append(arena[i])
    if skipped:
        LOG.warning("skipped %d targets with missing/corrupt images", skipped)
    GLOBAL.add("cds.decodeTargets.seconds", time.time() - t_decode0)

    shards = []
    for shape, (neurons, rgbs) in by_shape.items():
        for i in range(0, len(neurons), tile_size):
            t_pack0 = time.time()
            stack = np.stack(rgbs[i:i + tile_size])
            t = stack.shape[0]
            t_pad = _target_bucket(t)
            if defer_pack:
                # keep the decoded stack on the host; the consumer
                # packs it after releasing the previous shard's planes
                # (two packed plane sets would exceed HBM)
                shards.append(TargetShard(
                    neurons[i:i + tile_size], shape, None,
                    kind=plane_kind, file_type=file_type,
                    packed_threshold=pack_threshold, t_pad=t_pad,
                    host_stack=stack))
                continue
            planes = _pack_target_stack(stack, t_pad, plane_kind,
                                        pack_threshold)
            # force the pack/upload to complete so the stage split is
            # honest (block_until_ready can be a no-op on the tunneled
            # backend; a 1-element materialization is not)
            np.asarray(planes[-1, :1])
            GLOBAL.add("cds.packUpload.seconds", time.time() - t_pack0)
            shards.append(TargetShard(neurons[i:i + tile_size], shape,
                                      planes, kind=plane_kind,
                                      file_type=file_type,
                                      packed_threshold=pack_threshold))
    return shards


def _pack_target_stack(stack: np.ndarray, t_pad: int, plane_kind: str,
                       pack_threshold: int | None):
    """Pack a decoded uint8 [T, H, W, 3] stack into device planes."""
    t = stack.shape[0]
    if plane_kind == "keys":
        # rank-key planes packed directly (never materializing the u32
        # summary planes alongside — the two together would not fit
        # HBM at production shard widths)
        assert pack_threshold is not None, \
            "key planes require a folded data threshold"
        if os.environ.get("CDS_DENSE_UPLOAD", "0") == "1":
            # dense A/B path: upload the full uint8 stack and pack on
            # device
            planes = common.pack_target_planes_keys(
                jnp.asarray(stack), pack_threshold,
                common.rank_lut_device())
            if t_pad != t:
                planes = jnp.pad(planes, ((0, 0), (0, t_pad - t)))
        else:
            # default: sparse COO upload of the ~2% foreground
            # (bit-identical planes, ~25x less tunnel traffic)
            planes = common.pack_target_planes_keys_sparse(
                stack, pack_threshold, common.rank_lut_device(), t_pad)
    else:
        planes = common.pack_target_planes(
            jnp.asarray(stack), data_threshold=pack_threshold)
        # pad the target axis to power-of-two buckets so kernel shapes
        # (and their compilations) are reused across shards; zero
        # columns can never score (zero word/key)
        if t_pad != t:
            planes = jnp.pad(planes, ((0, 0), (0, t_pad - t)))
    return planes


def _target_bucket(t: int, minimum: int = 32) -> int:
    n = minimum
    while n < t:
        n *= 2
    return n


def _trim_per_mask(matches: list[CDMatch], k: int) -> list[CDMatch]:
    """Keep the k best matches (by matchingPixels desc) per mask."""
    by_mask: dict[int, list[CDMatch]] = {}
    for m in matches:
        by_mask.setdefault(id(m.mask_image), []).append(m)
    out: list[CDMatch] = []
    for ms in by_mask.values():
        ms.sort(key=lambda m: -(m.matching_pixels or 0))
        out.extend(ms[:k])
    return out


def _decode_or_none(blob: bytes):
    from colormipsearch_tpu.io.image import read_image
    try:
        return read_image(blob)
    except (OSError, ValueError):
        return None


def iter_target_shards(targets: Sequence[Neuron], *,
                       file_type: ComputeFileType =
                       ComputeFileType.InputColorDepthImage,
                       tile_size: int = 4096,
                       prefetch: bool = True,
                       pack_threshold: int | None = None,
                       plane_kind: str = "packed"):
    """Stream target shards tile by tile with background prefetch.

    For libraries that exceed host/device memory (the production MCFO
    library is ~360 GB raw — SURVEY §7 'Memory budget'), targets are
    decoded and packed one `tile_size` tile at a time; while the device
    scores tile i, a worker thread decodes tile i+1 (the double-buffering
    the reference gets from its Spark executors holding shards resident).
    """
    import concurrent.futures

    chunks = [list(targets[i:i + tile_size])
              for i in range(0, len(targets), tile_size)]
    # only the FIRST chunk packs eagerly (its device planes can build
    # during mask prep, nothing else resident); later chunks DECODE in
    # the prefetch thread but defer their device pack to the consumer,
    # which releases the previous shard first — two packed T=4096
    # plane sets (11.2 GB each) cannot coexist in 16 GB HBM (the
    # eager-prefetch OOM of the first real 44,593x7,391 run, round 5)
    if not prefetch or len(chunks) <= 1:
        for ci, chunk in enumerate(chunks):
            yield from load_target_shards(chunk, file_type=file_type,
                                          tile_size=tile_size,
                                          pack_threshold=pack_threshold,
                                          plane_kind=plane_kind,
                                          defer_pack=ci > 0)
        return
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        fut = pool.submit(load_target_shards, chunks[0],
                          file_type=file_type, tile_size=tile_size,
                          pack_threshold=pack_threshold,
                          plane_kind=plane_kind)
        for nxt in chunks[1:]:
            shards = fut.result()
            fut = pool.submit(load_target_shards, nxt,
                              file_type=file_type, tile_size=tile_size,
                              pack_threshold=pack_threshold,
                              plane_kind=plane_kind, defer_pack=True)
            yield from shards
        yield from fut.result()
    finally:
        # on abnormal close (a scoring failure upstream) do NOT join
        # the in-flight next-chunk decode — the old `with` waited on
        # it, stalling process exit by a full chunk decode (review r5)
        pool.shutdown(wait=False, cancel_futures=True)


class CDSearchEngine:
    """All-pairs masked CDS scoring (pixel-match pass).

    On a multi-device platform the target shards are automatically
    distributed over a 1-D device mesh and scored with the shard_map
    step (parallel/mesh.py); on one device the plain batched kernel
    runs.  Both paths produce identical scores (tests/test_parallel.py).
    """

    def __init__(self, params: CDSParams, *, use_mesh: bool | None = None,
                 neg_query_rgb: np.ndarray | None = None,
                 neg_query_threshold: int | None = None,
                 mirror_neg_query: bool = False,
                 decode_concurrency: int = 8,
                 use_key_planes: bool | None = None,
                 use_union_keys: bool | None = None):
        self.params = params
        # rank-key planes + exact interval predicate (CDS_KEY_PLANES=1)
        self.use_key_planes = _USE_KEYS if use_key_planes is None \
            else use_key_planes
        # union lane forms of the key kernel (CDS_UNION_KEYS=1|x|full;
        # implies key planes).  "x" gathers the x-dilated union per
        # dy-set and requires the offsets to form a {dx} x {dy} grid
        # (falls back to the classic key kernel otherwise); "full"
        # gathers ONE fully-dilated union per orientation and covers any
        # xyShift (docs/DESIGN.md §6)
        if use_union_keys is None:
            # the env default kicks in only when the caller pinned
            # neither kernel kwarg: an explicit use_key_planes=False
            # must run the packed kernel and an explicit
            # use_key_planes=True the classic key kernel, not be
            # silently upgraded to the union default (ADVICE r2)
            use_union = _USE_UNION if use_key_planes is None else False
        else:
            use_union = use_union_keys
        if use_union in (True, 1, "1"):
            # every bare opt-in shorthand selects the production
            # default form (full-union), matching bare --use-union-keys
            use_union = "full"
        if use_union in (False, 0, "0", "off", None):
            use_union = False
        if use_union not in (False, "x", "full"):
            raise ValueError(f"use_union_keys: {use_union!r} "
                             "(expected False, 'x' or 'full')")
        self.use_union_keys = use_union
        if use_union == "x" and \
                not pixel_match.offsets_form_grid(params.xy_shift):
            # a non-grid offset set (xyShift > 2) falls back to the
            # classic key kernel on the same planes
            self.use_union_keys = False
            LOG.warning("x-union keys disabled: xyShift %d offsets are "
                        "not a {dx} x {dy} grid", params.xy_shift)
        if use_union:
            self.use_key_planes = True
        self._key_plans: dict = {}
        # host-side decode/pack thread count (--cdsConcurrency; the
        # reference's executor pool sizing, CmdUtils.java:15-29 — the
        # device side here is one fused kernel, so threads only feed it)
        self.decode_concurrency = max(1, decode_concurrency)
        # optional negative query applied to every mask
        # (PixelMatchColorDepthSearchAlgorithm:29-57 negQueryImage)
        self.neg_query_rgb = neg_query_rgb
        self.neg_query_threshold = (params.mask_threshold
                                    if neg_query_threshold is None
                                    else neg_query_threshold)
        self.mirror_neg_query = mirror_neg_query
        if use_mesh is None:
            use_mesh = len(jax.devices()) > 1
        self._mesh = None
        self._sharded_steps: dict = {}
        self._plan_args_cache: dict = {}
        self._plan_args_inflight: dict = {}
        self._plan_args_lock = threading.Lock()
        self._itabs = None  # device interval tables (qkey wire form)
        # re-read the env at construction so in-process callers (bench)
        # can tune the dispatch width per run
        self.MASK_BATCH = int(os.environ.get(
            "CDS_MASK_BATCH", str(type(self).MASK_BATCH)))
        if use_mesh and len(jax.devices()) > 1:
            from colormipsearch_tpu.parallel import create_mesh

            self._mesh = create_mesh()
            LOG.info("scoring over a %d-device mesh",
                     len(self._mesh.devices.ravel()))

    def _keys_step(self, n_straight: int, top_k: int = 0):
        from colormipsearch_tpu.parallel.mesh import (
            make_sharded_batch_step_keys,
        )

        key = ("keys", n_straight, top_k)
        if key not in self._sharded_steps:
            self._sharded_steps[key] = make_sharded_batch_step_keys(
                self._mesh, n_straight=n_straight, top_k=top_k)
        return self._sharded_steps[key]

    _KEY_PLANS_MAX = 512

    def _key_plan(self, plan, n_pixels: int):
        # entries hold a strong ref to the source plan so a recycled
        # object id can never alias a freed plan's cache slot; n_pixels
        # is part of the key because the sentinel encoding depends on
        # the plane shape
        key = (id(plan), n_pixels)
        cached = self._key_plans.get(key)
        if cached is not None and cached[0] is plan:
            return cached[1]
        kp = pixel_match.key_plan_from_query_plan(
            plan, n_pixels, self.params.pix_color_fluctuation)
        if len(self._key_plans) >= self._KEY_PLANS_MAX:
            self._key_plans.pop(next(iter(self._key_plans)))
        self._key_plans[key] = (plan, kp)
        return kp

    def _stacked_key_args(self, plans, n_pixels: int):
        def build():
            kplans = [self._key_plan(pl, n_pixels) for pl in plans]
            return (jnp.asarray(np.stack([kp.positions for kp in kplans])),
                    jnp.asarray(np.stack([kp.lo for kp in kplans])),
                    jnp.asarray(np.stack([kp.span for kp in kplans])))

        return self._cached_plan_args(("keys", n_pixels), plans, build)

    def _union_keys_step(self, top_k: int = 0,
                         u2: int | None = None,
                         form: str | None = None):
        from colormipsearch_tpu.parallel.mesh import (
            make_sharded_batch_step_union_keys,
            make_sharded_batch_step_union_qkeys,
        )

        key = ("ukeys", top_k, u2, form)
        if key not in self._sharded_steps:
            maker = (make_sharded_batch_step_union_qkeys
                     if form == "qkeys"
                     else make_sharded_batch_step_union_keys)
            self._sharded_steps[key] = maker(
                self._mesh, top_k=top_k, u2=u2)
        return self._sharded_steps[key]

    def _interval_tables_device(self):
        """The shared per-tolerance interval tables as device arrays
        (uploaded once per engine — the qkey wire form's counterpart)."""
        if self._itabs is None:
            arrs = pixel_match.interval_table_arrays(
                float(self.params.pix_color_fluctuation) / 100.0)
            assert arrs is not None  # qkey plans exist => tables do
            self._itabs = tuple(jnp.asarray(a) for a in arrs)
        return self._itabs

    def _stacked_union_args(self, batch, n_pixels: int):
        """Stacked union-key plan device arrays for one mask batch.

        Union plans are built here (not at group time) because only the
        union path needs them; the batch's plans pad to a common bucket
        so they stack into one dispatch.  Cached on the classic plans'
        identities — each batch uploads once for all target shards."""
        plans = [e[3] for e in batch]
        p = self.params

        builder = (pixel_match.build_full_union_key_plan
                   if self.use_union_keys == "full"
                   else pixel_match.build_union_key_plan)

        def build_one(entry):
            _mask, mask_rgb, region, _plan, _neg = entry
            up = builder(
                mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
                xy_shift=p.xy_shift,
                pix_color_fluctuation=p.pix_color_fluctuation,
                excluded_region=region)
            assert up is not None  # grid-checked at engine init
            return up

        def build():
            import concurrent.futures

            if isinstance(plans[0], pixel_match.UnionKeyPlan):
                # the prep pass already built the union plans (pure
                # full-union path) — no per-batch rebuild
                ups = plans
            else:
                # union builds are the heaviest host plan work (per-lane
                # table gathers over the dilated support); fan the batch
                # out like the mask prep does
                with concurrent.futures.ThreadPoolExecutor(
                        max_workers=min(len(batch),
                                        self.decode_concurrency)) as pool:
                    ups = list(pool.map(build_one, batch))
            # compressed wire forms for full-union plans (under the
            # table disjointness proof); the lane tables are
            # re-EXPANDED on device once per batch so dispatches run
            # the fast expanded-tables kernel.  Preferred: the
            # POSITIONAL form (~65 KB/mask — the per-lane index matrix
            # is re-derived on device); fallback: the factored qkey
            # form (~110 KB/mask).
            if self.use_union_keys == "full":
                pa = pixel_match.stack_union_pos_args(ups, n_pixels)
                if pa is not None:
                    from colormipsearch_tpu.oracle.pixel import (
                        shift_offsets)

                    u_pos, mu_pos, q_pos, key_list, u2 = pa
                    h, w = batch[0][1].shape[:2]
                    offs = tuple((int(dx), int(dy)) for dx, dy
                                 in shift_offsets(self.params.xy_shift))
                    u_dev = jnp.asarray(u_pos)  # upload ONCE, reuse
                    lane_lo, lane_span = \
                        pixel_match.expand_union_tables_from_pos(
                            u_dev, jnp.asarray(q_pos),
                            jnp.asarray(key_list),
                            *self._interval_tables_device(),
                            offsets=offs, w=w, h=h)
                    return ("tables", u_dev,
                            jnp.asarray(mu_pos), lane_lo, lane_span,
                            u2)
                qk = pixel_match.stack_union_qkey_args(ups, n_pixels)
                if qk is not None:
                    u_pos, mu_pos, qidx, key_list, u2 = qk
                    lane_lo, lane_span = pixel_match.expand_union_tables(
                        jnp.asarray(qidx), jnp.asarray(key_list),
                        *self._interval_tables_device())
                    return ("tables", jnp.asarray(u_pos),
                            jnp.asarray(mu_pos), lane_lo, lane_span,
                            u2)
            # plans pad to the batch's common union bucket AND interval
            # slot count (slots vary per mask after compaction); the
            # trailing u2 (slot-2 segmentation prefix) stays a host int
            *arrs, u2 = pixel_match.stack_union_plan_args(ups, n_pixels)
            return ("tables",) + tuple(
                jnp.asarray(a) for a in arrs) + (u2,)

        return self._cached_plan_args(
            ("ukeys", self.use_union_keys, n_pixels), plans, build)

    def _mesh_planes(self, shard: TargetShard):
        """The shard's planes sharded over the current mesh, built
        lazily; the unsharded copy is released once the sharded one
        exists so device 0 is not pinned with the full stack alongside
        its shard."""
        from colormipsearch_tpu.parallel import shard_target_planes

        planes = shard.device_planes
        if planes is None or shard.mesh_token is not self._mesh:
            planes = shard_target_planes(self._mesh, shard.planes)
            shard.device_planes = planes
            shard.mesh_token = self._mesh
            shard.planes = None
        return planes

    def _sharded_step(self, n_straight: int, ztol, top_k: int = 0,
                      target_threshold: int | None = None):
        from colormipsearch_tpu.parallel.mesh import make_sharded_batch_step

        if target_threshold is None:
            target_threshold = self.params.data_threshold
        key = (n_straight, ztol, top_k, target_threshold)
        if key not in self._sharded_steps:
            self._sharded_steps[key] = make_sharded_batch_step(
                self._mesh, target_threshold=target_threshold,
                ztol_num=ztol[0], ztol_den=ztol[1], n_straight=n_straight,
                top_k=top_k)
        return self._sharded_steps[key]

    # query plans scored per device dispatch; wider batches amortize
    # per-dispatch host<->device round trips (decisive when thousands
    # of masks stream against a resident shard over a high-latency link)
    MASK_BATCH = int(os.environ.get("CDS_MASK_BATCH", "8"))

    def find_all_matches(self, masks: Sequence[Neuron],
                         targets: Sequence[Neuron], *,
                         tags: Iterable[str] = (),
                         session_ref_id: int | None = None,
                         max_matches_per_mask: int = 0) -> list[CDMatch]:
        """Score masks x targets; returns entities for found matches only
        (LocalColorMIPSearchProcessor filters isMatchFound :110)."""
        matches: list[CDMatch] = []
        for chunk in self.find_all_matches_iter(
                masks, targets, tags=tags, session_ref_id=session_ref_id,
                max_matches_per_mask=max_matches_per_mask):
            matches.extend(chunk)
        if max_matches_per_mask > 0:
            matches = _trim_per_mask(matches, max_matches_per_mask)
        return matches

    def find_all_matches_iter(self, masks: Sequence[Neuron],
                              targets: Sequence[Neuron], *,
                              tags: Iterable[str] = (),
                              session_ref_id: int | None = None,
                              max_matches_per_mask: int = 0):
        """Streaming variant: yields lists of CDMatch per scored
        (target tile x mask batch) so callers can write results in
        batches instead of holding the full match set in RAM (the
        reference writes in batches too — ColorDepthSearchCmd.java:
        297-316).  With `max_matches_per_mask`, each target tile
        contributes at most that many matches per mask (per-shard
        device top-k on a mesh); the list wrapper applies the final
        global per-mask trim."""
        from colormipsearch_tpu.utils.metrics import GLOBAL, stage_timer

        t0 = time.time()
        p = self.params
        tags = set(tags)

        import concurrent.futures

        # precompute all query plans, grouped by (shape, padded Q) so a
        # whole group goes through one batched dispatch; mask decode AND
        # plan building run on a thread pool (native decode, PIL, and
        # the numpy classify/shift work all release the GIL) — at
        # production scale (44k masks x ~36 ms/plan) a serial build
        # would exceed the device scoring time
        # on the pure full-union path the CLASSIC plan is never consumed
        # (the qkey/table dispatch and the emit ratio only need the
        # union plan), so prep builds the union plan DIRECTLY — one
        # build per mask instead of classic-at-prep + union-at-batch,
        # and light plans drop the expanded lane tables when the qkey
        # wire form applies (~740 KB/mask of host RAM at 44k masks)
        union_prep = (self.use_union_keys == "full"
                      and self.use_key_planes
                      and self.neg_query_rgb is None)

        region_cache: dict = {}
        region_lock = threading.Lock()

        def shared_region(h, w):
            # one region array per image shape instead of per mask
            # (8192 masks x 685 KB was 5.6 GB of identical booleans)
            with region_lock:
                key = (h, w)
                if key not in region_cache:
                    region_cache[key] = p.excluded_region(h, w)
                return region_cache[key]

        def prep_mask(mask):
            mask_mip = mips_io.load_compute_file(
                mask, ComputeFileType.InputColorDepthImage)
            if not mask_mip.has_image:
                LOG.warning("mask %s has no loadable image", mask.mip_id)
                return None
            mask_rgb = mask_mip.image.as_rgb()
            h, w = mask_rgb.shape[:2]
            region = shared_region(h, w)
            if union_prep:
                plan = pixel_match.build_full_union_key_plan(
                    mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
                    xy_shift=p.xy_shift,
                    pix_color_fluctuation=p.pix_color_fluctuation,
                    excluded_region=region, light=True)
                # the decoded image (2 MB/mask) is only ever consumed
                # by the flag-triggered oracle rescore — structurally
                # unreachable on this path (flags are identically 0) —
                # so drop it instead of pinning ~17 GB at 8k masks.
                # A zero-byte stub keeps the shape for the group key
                # and fails loudly on any accidental pixel use.
                mask_rgb = np.empty((h, w, 0), np.uint8)
            else:
                plan = pixel_match.build_query_plan(
                    mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
                    xy_shift=p.xy_shift,
                    pix_color_fluctuation=p.pix_color_fluctuation,
                    excluded_region=region)
            if plan.query_size == 0:
                return None
            neg_plan = None
            if self.neg_query_rgb is not None:
                neg_plan = pixel_match.build_neg_query_plan(
                    mask_rgb, p.mask_threshold,
                    self.neg_query_rgb, self.neg_query_threshold,
                    mirror_neg_query=self.mirror_neg_query,
                    xy_shift=p.xy_shift,
                    pix_color_fluctuation=p.pix_color_fluctuation,
                    excluded_region=region)
            return (mask, mask_rgb, region, plan, neg_plan)

        # start decoding + packing the FIRST target shard while the
        # masks prep (different resources: shard decode is native-
        # threaded C++ + device transfer, prep is numpy): at production
        # mask counts prep takes minutes and fully hides the target
        # decode+upload
        # CDS_TARGET_TILE: shard width override (default 4096 — the
        # measured best HBM-fitting width; tests shrink it to exercise
        # the multi-shard phase-2 path on tiny target sets)
        shard_iter = iter_target_shards(
            list(targets), pack_threshold=p.data_threshold,
            tile_size=int(os.environ.get("CDS_TARGET_TILE", "4096")),
            plane_kind="keys" if self.use_key_planes else "packed")
        shard0_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1)
        shard0_fut = shard0_pool.submit(lambda: next(shard_iter, None))

        # Mask prep STREAMS into shard-0 scoring (VERDICT r4 weak #5:
        # building all 44.6k plans up front was ~8 min of dead critical
        # path).  All prep futures are submitted at once; batches form
        # as results arrive IN SUBMIT ORDER (deterministic: batch
        # composition is identical to the old all-up-front grouping),
        # and each full batch scores against the first target shard
        # while later masks are still prepping.  Remaining shards
        # iterate the recorded batch list exactly as before.
        prep_t0 = time.time()
        prep_done_ts: list[float] = []

        def prep_one(mask):
            try:
                return prep_mask(mask)
            finally:
                prep_done_ts.append(time.time())

        prep_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=self.decode_concurrency)
        prep_futs = [prep_pool.submit(prep_one, m) for m in masks]

        def entry_key(entry):
            _, mask_rgb, _, plan, neg_plan = entry
            q_pad = (plan.u_pos.shape[1] if union_prep
                     else plan.positions.shape[1])
            return (mask_rgb.shape[:2], q_pad,
                    None if neg_plan is None
                    else neg_plan.positions.shape[1])

        def stream_batches():
            # yields (group key, batch) with full batches as soon as
            # MASK_BATCH same-key masks have prepped; remainders after
            # prep drains.  The prep pool runs independently of this
            # consumption, so the recorded prepMasks span is the true
            # (overlapped) prep time, not the consumption time.
            pending: dict[tuple, list] = {}
            for fut in prep_futs:
                entry = fut.result()
                if entry is None:
                    continue
                k = entry_key(entry)
                pending.setdefault(k, []).append(entry)
                if len(pending[k]) >= self.MASK_BATCH:
                    yield k, pending.pop(k)
            prep_pool.shutdown()
            span = (max(prep_done_ts) - prep_t0) if prep_done_ts else 0.0
            GLOBAL.add("cds.prepMasks.seconds", span)
            LOG.info("cds.prepMasks finished in %.2fs (overlapped with "
                     "shard-0 scoring)", span)
            for k, b in pending.items():
                if b:
                    yield k, b

        n_matches = 0
        n_targets = 0
        n_pairs = 0
        first_shard = None
        all_batches: list[tuple[tuple, list]] = []

        def warm(key, batch):
            # build+upload a batch's plan args on a worker thread while
            # the device scores the previous batch (the union-plan
            # build + its ~MB-scale arg upload is the per-batch serial
            # cost at production mask counts; _stacked_*_args caches by
            # plan identity and shares in-flight builds, so
            # _score_batch then hits the cache)
            n_px = key[0][0] * key[0][1]
            try:
                if self.use_key_planes and self.use_union_keys:
                    self._stacked_union_args(batch, n_px)
                elif self.use_key_planes:
                    self._stacked_key_args([e[3] for e in batch], n_px)
            except Exception:  # noqa: BLE001 - warm only
                pass  # the real call surfaces the error

        def score(key, batch, shard):
            nonlocal n_pairs, n_matches
            out = self._score_batch(batch, shard, tags, session_ref_id,
                                    top_k=max_matches_per_mask)
            GLOBAL.add("pairsScored", len(batch) * shard.count)
            n_pairs += len(batch) * shard.count
            n_matches += len(out)
            return out

        warm_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
          with stage_timer("cds.scoreAllPairs"):
            # phase 1: shard 0 scores each mask batch as prep yields it
            # (prep of later masks + the next batch's plan-arg warm
            # overlap the device scoring of the current batch)
            prev = None
            for kb in stream_batches():
                all_batches.append(kb)
                if first_shard is None:
                    # first usable batch: now (and only now) consume the
                    # prefetched shard — if every mask fails, the tunnel
                    # never pays for the target upload (ADVICE r4)
                    first_shard = shard0_fut.result()
                    shard0_pool.shutdown()
                    if first_shard is not None:
                        first_shard.ensure_planes()
                        n_targets += first_shard.count
                if first_shard is None:
                    continue  # no targets: just record batches
                warm_pool.submit(warm, *kb)
                if prev is not None and prev[0][0] == first_shard.shape:
                    yield score(prev[0], prev[1], first_shard)
                prev = kb
            if prev is not None and first_shard is not None \
                    and prev[0][0] == first_shard.shape:
                yield score(prev[0], prev[1], first_shard)
            warm_pool.shutdown()
            if not all_batches:
                if masks:
                    LOG.warning(
                        "no usable masks: every mask image failed to "
                        "load or produced an EMPTY query (threshold %d "
                        "over the non-excluded region — note the "
                        "name/color-scale label regions cover "
                        "x<330/y<100 and the right corner and are "
                        "excluded by default)", p.mask_threshold)
                # nothing to score: do not stream the REMAINING shards.
                # shard0's decode+upload may already be in flight on its
                # worker thread — cancel() is a no-op on a running
                # future (review r5), so the honest best effort is to
                # release its device planes the moment it completes
                # (masks that never prepped means nobody else will)
                shard0_fut.cancel()

                def _drop(fut):
                    try:
                        sh = fut.result()
                        if sh is not None:
                            sh.release()
                    except Exception:  # noqa: BLE001 - cleanup only
                        pass

                shard0_fut.add_done_callback(_drop)
                return
            # phase 2: remaining shards iterate the recorded batches;
            # the previous shard's device planes are RELEASED before
            # the next shard packs (one packed plane set in HBM at a
            # time — see iter_target_shards)
            prev_shard = first_shard
            for shard in shard_iter:
                if prev_shard is not None:
                    prev_shard.release()
                prev_shard = shard
                n_targets += shard.count
                matching = [kb for kb in all_batches
                            if kb[0][0] == shard.shape]
                if not matching:
                    continue  # never pack a shard no batch can score
                shard.ensure_planes()
                with concurrent.futures.ThreadPoolExecutor(
                        max_workers=1) as argpool:
                    fut = None
                    for bi, kb in enumerate(matching):
                        if bi + 1 < len(matching):
                            fut = argpool.submit(warm, *matching[bi + 1])
                        yield score(kb[0], kb[1], shard)
                        if fut is not None:
                            fut.result()
                            fut = None
        finally:
            # a scoring failure (e.g. a wedged tunnel) must not leave
            # tens of thousands of queued prep tasks grinding through
            # mask decodes — they would block process exit for minutes
            # (review r5); normal completion has drained everything and
            # these are no-ops
            prep_pool.shutdown(wait=False, cancel_futures=True)
            warm_pool.shutdown(wait=False, cancel_futures=True)
            shard0_pool.shutdown(wait=False, cancel_futures=True)
        GLOBAL.add("matchesFound", n_matches)
        if n_pairs == 0 and all_batches and n_targets > 0:
            LOG.warning(
                "0 pairs scored: no target tile matched any mask's image "
                "shape (the reference requires target size == query "
                "size); mask shapes: %s",
                sorted({k[0] for k, _ in all_batches}))
        LOG.info("found %d matches for %d masks x %d targets in %.1fs "
                 "(%.0f pairs/s)",
                 n_matches, len(masks), n_targets, time.time() - t0,
                 n_pairs / max(time.time() - t0, 1e-9))

    def _split_planes(self, shard: TargetShard):
        """Lazy 3-byte split-plane pair for a shard (sharded over the
        mesh when one is active)."""
        if shard.split_planes is None or \
                shard.split_mesh_token is not self._mesh:
            t_sp, t_c8 = common.split_planes_from_packed(shard.planes)
            if self._mesh is not None:
                from colormipsearch_tpu.parallel import shard_target_planes

                t_sp = shard_target_planes(self._mesh, t_sp)
                t_c8 = shard_target_planes(self._mesh, t_c8)
                if self.neg_query_rgb is None:
                    # the sharded copy is the only consumer now
                    shard.planes = None
            shard.split_planes = (t_sp, t_c8)
            shard.split_mesh_token = self._mesh
        return shard.split_planes

    def _split_step(self, n_straight: int, ztol):
        from colormipsearch_tpu.parallel.mesh import (
            make_sharded_batch_step_split,
        )

        key = ("split", n_straight, ztol)
        if key not in self._sharded_steps:
            self._sharded_steps[key] = make_sharded_batch_step_split(
                self._mesh, ztol_num=ztol[0], ztol_den=ztol[1],
                n_straight=n_straight)
        return self._sharded_steps[key]

    # stacked query-plan device arrays, cached so a batch re-scored
    # against every streamed target shard uploads its plans ONCE (the
    # axon tunnel uploads at ~10 MB/s); bounded FIFO.  Small: the
    # full-union entries now hold device-EXPANDED lane tables
    # (~94 MB per 64-mask batch) and 64 cached entries next to a
    # T=4096 plane set blew the 16 GB HBM
    _ARGS_CACHE_MAX = 4

    def _cached_plan_args(self, tag, plans, build):
        """id()-keyed device-args cache.  Each entry pins the source
        plan objects, so an id can only hit while its plan is alive —
        a recycled id of a freed plan can never alias a live entry
        (the identity check is belt-and-braces).  Locked: the warm-
        ahead thread and the scoring thread both mutate the FIFO, and
        a concurrent double-evict of the same oldest key would raise.
        build() runs outside the lock (it uploads over the tunnel), but
        concurrent requesters of the SAME key share one in-flight build
        via a per-key future — without it the warm-ahead thread and the
        scoring thread could both upload multi-MB plan args (ADVICE r4)."""
        import concurrent.futures

        key = (tag,) + tuple(id(pl) for pl in plans)
        with self._plan_args_lock:
            cached = self._plan_args_cache.get(key)
            if cached is not None and all(
                    a is b for a, b in zip(cached[0], plans)):
                return cached[1]
            fut = self._plan_args_inflight.get(key)
            if fut is None:
                fut = concurrent.futures.Future()
                self._plan_args_inflight[key] = fut
                owner = True
            else:
                owner = False
        if not owner:
            return fut.result()
        try:
            args = build()
        except BaseException as e:
            fut.set_exception(e)
            with self._plan_args_lock:
                self._plan_args_inflight.pop(key, None)
            raise
        with self._plan_args_lock:
            while len(self._plan_args_cache) >= self._ARGS_CACHE_MAX:
                self._plan_args_cache.pop(
                    next(iter(self._plan_args_cache)), None)
            self._plan_args_cache[key] = (tuple(plans), args)
            self._plan_args_inflight.pop(key, None)
        fut.set_result(args)
        return args

    def _stacked_plan_args(self, plans):
        def build():
            return (jnp.asarray(np.stack([pl.positions for pl in plans])),
                    jnp.asarray(np.stack([pl.q_cls for pl in plans])),
                    jnp.asarray(np.stack([pl.q_s for pl in plans])),
                    jnp.asarray(np.stack([pl.q_p for pl in plans])))

        return self._cached_plan_args("packed", plans, build)

    def _emit_select_k(self, top_k: int) -> int:
        """Device-side emit-selection width (0 = disabled).

        With a positive pctPositivePixels threshold and no negative
        query, only pairs with score/querySize > pct/100 can emit (the
        reference's isMatch filter), so union-key dispatches can pull a
        [B, k] per-mask top-k selection instead of the dense [B, T]
        rows — ~10-30x less result wire per dispatch, the dominant
        production dispatch cost over a slow host link and the
        pod-scale bottleneck.  Lossless by construction: the caller
        checks every mask's k-th (smallest selected) score against the
        emit test and falls back to the dense pull if a dropped pair
        could still emit.  CDS_EMIT_TOPK overrides the width (0
        disables); read per invocation like the other dispatch knobs."""
        if (top_k > 0 or self.neg_query_rgb is not None
                or self.params.pct_positive_pixels <= 0):
            return 0
        return max(0, int(os.environ.get("CDS_EMIT_TOPK", "256")))

    def _topk_kth_emittable(self, kth: np.ndarray, batch) -> bool:
        """True if any mask's k-th selected score passes the emit test
        (score > 0 and score/querySize > pct/100) — a dropped pair
        could then also pass, so the top-k selection is not provably
        lossless and the caller must pull dense.  ``kth`` is [B] or
        [B, n_shards] (per-device-shard k-th under the mesh step)."""
        pct = self.params.pct_positive_pixels / 100.0
        for b, e in enumerate(batch):
            qsize = e[3].query_size
            for s in np.ravel(kth[b]):
                if s > 0 and s / qsize > pct:
                    return True
        return False

    def _score_batch(self, batch, shard: TargetShard, tags: set,
                     session_ref_id, top_k: int = 0) -> list[CDMatch]:
        p = self.params
        # threshold folded into the packed planes => the kernel's
        # per-element threshold test compiles away
        thr = -1 if shard.packed_threshold is not None \
            else p.data_threshold
        if shard.packed_threshold is not None:
            assert shard.packed_threshold == p.data_threshold
        if self.neg_query_rgb is not None:
            # neg-query subtraction changes the ranking, so top-k
            # preselection on positive scores would be wrong
            top_k = 0
        plans = [e[3] for e in batch]
        n_dev = (len(self._mesh.devices.ravel())
                 if self._mesh is not None else 1)
        use_keys = shard.kind == "keys"
        t_disp0 = time.time()  # re-set after plan-arg build on key paths
        # classic plan args upload only when a non-key path consumes them
        args = None if use_keys else self._stacked_plan_args(plans)
        # CDS_SPLIT_PLANES=1: 3-byte split-plane kernel (requires the
        # folded threshold; dense path only — the top-k step stays on
        # the packed kernel)
        use_split = (not use_keys and _USE_SPLIT
                     and shard.packed_threshold is not None
                     and top_k == 0)
        on_mesh = self._mesh is not None and shard.t_pad % n_dev == 0
        if use_keys:
            # rank-key planes: exact interval predicate (flags are
            # structurally zero, so no oracle fallback and no flag-leak
            # dense pulls on the top-k path).  CDS_UNION_KEYS=1 swaps in
            # the x-union lane form on the same planes.
            union = self.use_union_keys
            n_pixels = shard.shape[0] * shard.shape[1]
            t_args0 = time.time()
            u2 = None
            uform = None
            if union:
                # uform is always "tables" now (the factored qkey wire
                # form expands to device lane tables at build time)
                uform, *kargs, u2 = \
                    self._stacked_union_args(batch, n_pixels)
                kargs = tuple(kargs)
            else:
                kargs = self._stacked_key_args(plans, n_pixels)
            _METRICS.add("cds.planArgs.seconds", time.time() - t_args0)
            t_disp0 = time.time()
            if on_mesh:
                planes = self._mesh_planes(shard)
                if top_k > 0:
                    step = (self._union_keys_step(top_k, u2, uform)
                            if union else
                            self._keys_step(plans[0].n_straight, top_k))
                    scores_k, idx_k, mirr_k, flags_k, _gmax, _nf = \
                        step(planes, *kargs)
                    _METRICS.add("cds.dispatch.seconds",
                                 time.time() - t_disp0)
                    return self._emit_from_topk(
                        batch, shard, np.asarray(scores_k),
                        np.asarray(idx_k), np.asarray(mirr_k),
                        np.asarray(flags_k), tags, session_ref_id)
                n_shard = shard.t_pad // n_dev
                sel_k = self._emit_select_k(top_k) if union else 0
                if sel_k and sel_k < n_shard:
                    # threshold-emit selection: per-shard device top-k
                    # (the existing collective step), dense re-dispatch
                    # only if a mask's k-th could still emit
                    step = self._union_keys_step(sel_k, u2, uform)
                    scores_k, idx_k, mirr_k, flags_k, _gmax, _nf = \
                        step(planes, *kargs)
                    sk = np.asarray(scores_k)  # [B, n_shards*k]
                    kth = sk.reshape(sk.shape[0], -1, sel_k)[:, :, -1]
                    if not self._topk_kth_emittable(kth, batch):
                        _METRICS.add("cds.emitSelect.count", 1)
                        _METRICS.add("cds.dispatch.seconds",
                                     time.time() - t_disp0)
                        return self._emit_from_topk(
                            batch, shard, sk, np.asarray(idx_k),
                            np.asarray(mirr_k), np.asarray(flags_k),
                            tags, session_ref_id)
                    _METRICS.add("cds.emitSelectFallback.count", 1)
                step = (self._union_keys_step(u2=u2, form=uform)
                        if union else
                        self._keys_step(plans[0].n_straight))
                best, mirrored, pair_flags, _gmax = step(planes, *kargs)
            elif union:
                sel_k = self._emit_select_k(top_k)
                if sel_k and sel_k < shard.t_pad:
                    # threshold-emit selection: pull only the [B, k]
                    # top-k; the dense arrays stay on device as the
                    # no-recompute fallback handle
                    sk, ik, mk, best, mirrored = \
                        pixel_match.score_query_batch_union_keys_topk(
                            shard.planes, *kargs, u2=u2, k=sel_k)
                    sk = np.asarray(sk)
                    if not self._topk_kth_emittable(sk[:, -1], batch):
                        del best, mirrored  # free the device buffers
                        ik, mk = np.asarray(ik), np.asarray(mk)
                        _METRICS.add("cds.emitSelect.count", 1)
                        _METRICS.add("cds.dispatch.seconds",
                                     time.time() - t_disp0)
                        return self._emit_from_topk(
                            batch, shard, sk, ik, mk,
                            np.zeros_like(sk), tags, session_ref_id)
                    _METRICS.add("cds.emitSelectFallback.count", 1)
                else:
                    best, mirrored, _pf = \
                        pixel_match.score_query_batch_union_keys(
                            shard.planes, *kargs, u2=u2)
                pair_flags = None  # structurally zero: skip the pull
            else:
                best, mirrored, pair_flags = \
                    pixel_match.score_query_batch_keys(
                        shard.planes, *kargs,
                        n_straight=plans[0].n_straight)
        elif use_split and (self._mesh is None
                            or shard.t_pad % n_dev == 0):
            t_sp, t_c8 = self._split_planes(shard)
            ztol = (plans[0].ztol_num, plans[0].ztol_den)
            if self._mesh is not None:
                step = self._split_step(plans[0].n_straight, ztol)
                best, mirrored, pair_flags, _gmax = step(
                    t_sp, t_c8, *args)
            else:
                best, mirrored, pair_flags = \
                    pixel_match.score_query_batch_split(
                        t_sp, t_c8, *args, ztol_num=ztol[0],
                        ztol_den=ztol[1], n_straight=plans[0].n_straight)
        elif on_mesh:
            planes = self._mesh_planes(shard)
            dense_needed = top_k == 0
            if top_k > 0:
                # collective per-shard top-k: only D*k candidates per
                # mask ever reach the host (VERDICT: dense pulls are the
                # pod-scale bottleneck the top-k path removes)
                step = self._sharded_step(
                    plans[0].n_straight,
                    (plans[0].ztol_num, plans[0].ztol_den), top_k, thr)
                scores_k, idx_k, mirr_k, flags_k, _gmax, n_flagged = \
                    step(planes, *args)
                flags_sel = np.asarray(flags_k)
                idx_sel = np.asarray(idx_k)
                valid = (idx_sel >= 0) & (idx_sel < shard.count)
                sel_flagged = ((flags_sel > 0) & valid).sum(axis=1)
                if (np.asarray(n_flagged) > sel_flagged).any():
                    # ambiguity-flagged pairs fell outside the per-shard
                    # top-k: their exact (oracle) score could beat the
                    # selected fast scores, so pull dense for this batch
                    # (rare — flags are boundary cases)
                    dense_needed = True
                else:
                    return self._emit_from_topk(
                        batch, shard, np.asarray(scores_k), idx_sel,
                        np.asarray(mirr_k), flags_sel, tags,
                        session_ref_id)
            if dense_needed:
                step = self._sharded_step(
                    plans[0].n_straight,
                    (plans[0].ztol_num, plans[0].ztol_den),
                    target_threshold=thr)
                best, mirrored, pair_flags, _gmax = step(planes, *args)
        else:
            best, mirrored, pair_flags = pixel_match.score_query_batch(
                shard.planes, *args,
                target_threshold=thr,
                ztol_num=plans[0].ztol_num, ztol_den=plans[0].ztol_den,
                n_straight=plans[0].n_straight)
        # optional negative-query pass: same batched kernel over the
        # per-mask neg plans; the overall max (straight vs mirrored)
        # is the negative score to subtract
        neg_plans = [e[4] for e in batch]
        neg_best = neg_flags = None
        if neg_plans[0] is not None and use_keys:
            ref = neg_plans[0]
            n_pixels = shard.shape[0] * shard.shape[1]
            neg_kargs = self._stacked_key_args(neg_plans, n_pixels)
            if self._mesh is not None and shard.device_planes is not None \
                    and shard.t_pad % n_dev == 0:
                nstep = self._keys_step(ref.n_straight)
                nb, _nm, nf, _g = nstep(shard.device_planes, *neg_kargs)
            else:
                nb, _nm, nf = pixel_match.score_query_batch_keys(
                    shard.planes, *neg_kargs, n_straight=ref.n_straight)
            from colormipsearch_tpu.parallel.mesh import (
                pull_target_cols as _pull)

            neg_best = np.maximum(_pull(nb), 0)[:, :shard.count]
            neg_flags = _pull(nf)[:, :shard.count]
        elif neg_plans[0] is not None:
            # the group key pins the padded neg width, so a batch either
            # has neg plans for every mask or for none
            ref = neg_plans[0]
            neg_args = self._stacked_plan_args(neg_plans)
            if self._mesh is not None and shard.device_planes is not None \
                    and shard.t_pad % n_dev == 0:
                nstep = self._sharded_step(
                    ref.n_straight, (ref.ztol_num, ref.ztol_den),
                    target_threshold=thr)
                nb, _nm, nf, _g = nstep(shard.device_planes, *neg_args)
            else:
                nb, _nm, nf = pixel_match.score_query_batch(
                    shard.planes, *neg_args,
                    target_threshold=thr,
                    ztol_num=ref.ztol_num, ztol_den=ref.ztol_den,
                    n_straight=ref.n_straight)
            from colormipsearch_tpu.parallel.mesh import (
                pull_target_cols as _pull)

            neg_best = np.maximum(_pull(nb), 0)[:, :shard.count]
            neg_flags = _pull(nf)[:, :shard.count]

        # drop the zero-padded target columns (see _target_bucket);
        # under jax.distributed the pull keeps only THIS process's
        # target columns (zeros elsewhere), so each process emits its
        # own shard of the matches — per-process sharded writes
        from colormipsearch_tpu.parallel.mesh import pull_target_cols

        best = pull_target_cols(best)[:, :shard.count]
        mirrored = pull_target_cols(mirrored)[:, :shard.count]
        pair_flags = (np.zeros_like(best) if pair_flags is None
                      else pull_target_cols(pair_flags)[:, :shard.count])
        _METRICS.add("cds.dispatch.seconds", time.time() - t_disp0)
        t_emit0 = time.time()

        out: list[CDMatch] = []
        for b, (mask, mask_rgb, region, plan, neg_plan) in enumerate(batch):
            flags_b = pair_flags[b]
            if neg_flags is not None and neg_plans[b] is not None:
                flags_b = flags_b + neg_flags[b]
            # flagged pairs join the candidates even at fast score 0:
            # the oracle rescore may flip them to a positive exact score
            cand = np.flatnonzero((best[b] > 0) | (flags_b > 0))
            if top_k > 0 and cand.size > top_k:
                # interval-safe preselection: the exact score lies in
                # [best - flags, best + flags]; keep every candidate
                # whose upper bound reaches the k-th largest lower bound
                # (the caller's final per-mask trim ranks exact scores)
                lower = best[b][cand] - flags_b[cand]
                upper = best[b][cand] + flags_b[cand]
                kth = -np.partition(-lower, top_k - 1)[top_k - 1]
                cand = cand[upper >= kth]
            out.extend(self._emit_matches(
                mask, mask_rgb, region, plan, shard, cand,
                best[b], mirrored[b], flags_b, tags, session_ref_id,
                neg_plan=neg_plan,
                neg_best=None if neg_plan is None or neg_best is None
                else neg_best[b]))
        _METRICS.add("cds.emit.seconds", time.time() - t_emit0)
        return out

    def _emit_from_topk(self, batch, shard, scores_k, idx_k, mirr_k,
                        flags_k, tags, session_ref_id) -> list[CDMatch]:
        """Emit from the collective top-k candidates [B, D*k].  The
        all_gather makes the candidate set replicated, so under
        jax.distributed each process keeps only the candidates whose
        target column lives on its own devices (per-process sharded
        writes, same as the dense pull)."""
        out: list[CDMatch] = []
        t_emit0 = time.time()
        t_pad = shard.t_pad
        lmask = None
        if jax.process_count() > 1 and shard.device_planes is not None:
            from colormipsearch_tpu.parallel.mesh import local_target_mask

            lmask = local_target_mask(shard.device_planes, t_pad)
        for b, (mask, mask_rgb, region, plan, _neg) in enumerate(batch):
            best = np.zeros(shard.count, scores_k.dtype)
            mirrored = np.zeros(shard.count, bool)
            flags = np.zeros(shard.count, flags_k.dtype)
            keep = (idx_k[b] < shard.count) & (idx_k[b] >= 0) & \
                (idx_k[b] < t_pad)
            if lmask is not None:
                keep &= lmask[np.clip(idx_k[b], 0, t_pad - 1)]
            ti = idx_k[b][keep]
            best[ti] = scores_k[b][keep]
            mirrored[ti] = mirr_k[b][keep].astype(bool)
            flags[ti] = flags_k[b][keep]
            out.extend(self._emit_matches(
                mask, mask_rgb, region, plan, shard,
                np.unique(ti), best, mirrored, flags, tags,
                session_ref_id))
        _METRICS.add("cds.emit.seconds", time.time() - t_emit0)
        return out

    def _emit_matches(self, mask, mask_rgb, region, plan, shard,
                      candidates, best, mirrored, pair_flags, tags,
                      session_ref_id, *, neg_plan=None,
                      neg_best=None) -> list[CDMatch]:
        p = self.params
        oracle = None  # lazy: only when an ambiguous pair appears
        out: list[CDMatch] = []
        for t_idx in candidates:
            if best[t_idx] <= 0 and pair_flags[t_idx] <= 0:
                continue
            score = int(best[t_idx])
            is_mirrored = bool(mirrored[t_idx])
            ratio = score / plan.query_size
            if neg_best is not None:
                # Java Math.round(double) == floor(x + 0.5)
                neg = int(neg_best[t_idx])
                score = int(np.floor(
                    float(score)
                    - float(neg) * plan.query_size / neg_plan.query_size
                    + 0.5))
                ratio -= neg / neg_plan.query_size
            if pair_flags[t_idx] > 0:
                if oracle is None:
                    oracle = PixelMatchOracle(
                        mask_rgb, p.mask_threshold, mirror=p.mirror_mask,
                        target_threshold=p.data_threshold,
                        z_tolerance=p.pix_color_fluctuation / 100,
                        xy_shift=p.xy_shift, excluded_region=region,
                        neg_query_rgb=self.neg_query_rgb,
                        neg_query_threshold=self.neg_query_threshold,
                        mirror_neg_query=self.mirror_neg_query)
                res = oracle.score(shard.host_rgb(t_idx))
                score, is_mirrored = res.matching_pixels, res.mirrored
                ratio = res.matching_pixels_ratio
                if score <= 0:
                    continue
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
