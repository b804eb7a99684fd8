"""Pallas TPU kernel for the shape-score pair pass.

The gradient-area-gap pass is a pure elementwise+reduce over the packed
planes (see ops/shape_score.py for the packing contract): for every pixel
row p and target t,

    val = select(overlap & sg>=80, sg-40, q_sig*grad); zero if <= 3
    accumulate (val>>10, val&0x3FF, he-bit)

This kernel tiles the [P, T] plane over a 1-D grid of row blocks,
streaming each tile HBM->VMEM once and accumulating the three partial
sums in revisited VMEM output blocks — the canonical memory-bound
elementwise+reduction shape on TPU (guide: Grid/BlockSpec + revisiting
output accumulation).  Semantics are identical to
shape_score.shape_score_pairs_raw (tested bit-equal); use it via
`shape_score_pairs_pallas`.

Why the PIXEL-match kernel stays on the XLA gather path instead: its hot
loop reads ~0.3% of plane rows at data-dependent positions, which maps to
an HBM gather (XLA lowers this well); a Pallas version would need one
tiny DMA per query position and loses to the fused gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from colormipsearch_tpu.constants import DEFAULT_COLOR_FLUX, GAP_THRESHOLD

# field layout — keep in sync with ops/shape_score.py
_SL_SHIFT = 16
_ZNZ_SHIFT = 25
_TFG_SHIFT = 26
_Q_SL_MASK = 0x1FF
_Q_NZ_SHIFT = 9
_Q_SIG_SHIFT = 10
_Q_HE_SHIFT = 11

_TILE_P = 2048  # rows per grid step (x T lanes x 4B stays well under VMEM)


def _kernel(t_ref, q_ref, hi_ref, lo_ref, he_ref):
    step = pl.program_id(0)

    w = t_ref[...].astype(jnp.int32)
    grad = w & 0xFFFF
    z_sl = (w >> _SL_SHIFT) & 0x1FF
    z_nz = (w >> _ZNZ_SHIFT) & 1
    t_fg = (w >> _TFG_SHIFT) & 1

    q = q_ref[...]  # [TILE_P, 1]
    q_sl = q & _Q_SL_MASK
    q_nz = (q >> _Q_NZ_SHIFT) & 1
    q_sig = (q >> _Q_SIG_SHIFT) & 1
    q_he = (q >> _Q_HE_SHIFT) & 1

    sg = jnp.where((q_sl == 0) | (z_sl == 0), z_sl, jnp.abs(q_sl - z_sl))
    overlap = (q_nz & z_nz) == 1
    val = jnp.where(overlap & (sg >= 2 * DEFAULT_COLOR_FLUX),
                    sg - DEFAULT_COLOR_FLUX, q_sig * grad)
    val = jnp.where(val > GAP_THRESHOLD, val, 0)

    part_lo = (val & 0x3FF).sum(axis=0, keepdims=True, dtype=jnp.int32)
    part_hi = (val >> 10).sum(axis=0, keepdims=True, dtype=jnp.int32)
    part_he = (q_he & t_fg).sum(axis=0, keepdims=True, dtype=jnp.int32)

    @pl.when(step == 0)
    def _init():
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)
        he_ref[...] = jnp.zeros_like(he_ref)

    hi_ref[...] += part_hi
    lo_ref[...] += part_lo
    he_ref[...] += part_he


@functools.partial(jax.jit, static_argnames=("interpret",))
def _shape_score_pairs_pallas(t_pack: jax.Array, q_pack: jax.Array, *,
                              interpret: bool):
    p, t = t_pack.shape
    p_pad = (p + _TILE_P - 1) // _TILE_P * _TILE_P
    t_pad = (t + 127) // 128 * 128  # lane alignment
    if p_pad != p or t_pad != t:
        # zero rows/cols are neutral: q fields all 0 -> val 0, he 0
        t_pack = jnp.pad(t_pack, ((0, p_pad - p), (0, t_pad - t)))
    if p_pad != p:
        q_pack = jnp.pad(q_pack, (0, p_pad - p))
    q2 = q_pack.reshape(-1, 1).astype(jnp.int32)

    grid = (p_pad // _TILE_P,)
    hi, lo, he = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_P, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
        ),
        interpret=interpret,
    )(t_pack, q2)
    return hi[0, :t], lo[0, :t], he[0, :t]


def shape_score_pairs_pallas(t_pack: jax.Array, q_pack: jax.Array):
    """Pallas twin of shape_score.shape_score_pairs (same signature,
    [P, T] uint32 x [P] int32 -> three int32 [T] sums).  Compiles the
    real TPU kernel on TPU backends; uses the Pallas interpreter on CPU
    so semantics stay testable everywhere."""
    return _shape_score_pairs_pallas(
        t_pack, q_pack, interpret=jax.default_backend() != "tpu")


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Probe whether the Pallas kernel compiles on this backend."""
    import numpy as np

    try:
        t = jnp.asarray(np.zeros((8, 128), np.uint32))
        q = jnp.asarray(np.zeros(8, np.int32))
        jax.block_until_ready(shape_score_pairs_pallas(t, q))
        return True
    except Exception:  # pragma: no cover - backend dependent
        return False
