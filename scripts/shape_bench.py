"""Shape (gradient-area-gap) pass throughput on the real TPU.

Measures the fused XLA kernel (ops/shape_score.shape_score_pairs) in two
forms, reporting shape-scored pairs/s (both orientations, the
mirror-enabled production config) and the effective HBM read bandwidth:

  * dense — full [P, T] packed planes (the round-2 engine form),
  * sparse — only the query-support rows [S_pad, T] (the production
    engine form since round 2b: every score term has a query-side
    factor, so rows with a zero query word cannot contribute; the
    fixture mask's support incl. the r=60 ring is ~5% of the plane).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/shape_bench.py

Historical note: a Pallas twin (tiled grid + revisited-output VMEM
accumulation) measured 22.1k pairs/s / 121 GB/s on TPU v5e vs the
XLA form's 41.5k / 227 GB/s at T=256 — both VPU-op-bound — so the
Pallas kernel was removed (docs/DESIGN.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 566, 1210          # production CDM shape (rows x cols)
T = int(os.environ.get("SHAPE_BENCH_TARGETS", 256))
REPEATS = int(os.environ.get("SHAPE_BENCH_REPEATS", 20))
SPARSE_REPEATS = int(os.environ.get("SHAPE_BENCH_SPARSE_REPEATS",
                                    REPEATS * 10))
RUN_DENSE = os.environ.get("SHAPE_BENCH_DENSE", "1") == "1"

FIX = ("/root/reference/colormipsearch-api/src/test/resources/"
       "colormipsearch/api/cdsearch")
MASK_TIF = f"{FIX}/1752016801-LPLC2-RT_18U.tif"


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build_planes():
    """Device-synthesized packed target planes with realistic field
    content, plus the REAL fixture query pack (so the sparse support
    size is the production one, ~5% of the plane)."""
    p = H * W

    @jax.jit
    def make(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        grad = jax.random.randint(k1, (p, T), 0, 1 << 16)
        sl = jax.random.randint(k2, (p, T), 0, 257)
        znz = (jax.random.uniform(k3, (p, T)) < 0.06).astype(jnp.int32)
        tfg = (jax.random.uniform(k4, (p, T)) < 0.06).astype(jnp.int32)
        word = (grad | (sl << 16) | (znz << 25) | (tfg << 26))
        return word.astype(jnp.uint32)

    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.pixel import label_regions_mask
    from colormipsearch_tpu.ops import shape_score

    mask_rgb = read_image(MASK_TIF).as_rgb()
    assert mask_rgb.shape[:2] == (H, W)
    region = label_regions_mask(W, H)
    q_pack = shape_score.pack_query(mask_rgb, excluded_region=region)

    t_pack = jax.block_until_ready(make(jax.random.PRNGKey(0)))
    return t_pack, q_pack


def time_fn(fn, t_pack, q_pack, repeats):
    np.asarray(fn(t_pack, q_pack)[0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn(t_pack, q_pack)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    # production mirror config reads the straight AND mirror planes:
    # 2 plane passes per scored pair
    pairs = repeats * T / 2
    read_gb = repeats * t_pack.nbytes / dt / 1e9
    return pairs / dt, read_gb


def main():
    log(f"devices: {jax.devices()}  T={T}  plane={H}x{W}")
    t_pack, q_pack = build_planes()
    log(f"dense planes: {t_pack.nbytes / 1e9:.1f} GB")

    from colormipsearch_tpu.ops import shape_score

    if RUN_DENSE:
        qj = jnp.asarray(q_pack)
        rate, gbs = time_fn(shape_score.shape_score_pairs, t_pack, qj,
                            REPEATS)
        print(json.dumps({"kind": "xla-dense", "pairs_per_s": round(rate, 1),
                          "read_gb_per_s": round(gbs, 1)}), flush=True)

    # sparse: support rows of the real fixture query
    pos = shape_score.support_positions(q_pack)
    n_pad = shape_score.support_bucket(pos.size)
    log(f"support {pos.size} rows ({100 * pos.size / (H * W):.1f}% of "
        f"plane), padded {n_pad}")
    q_sp = jnp.asarray(shape_score.sparse_query(q_pack, pos, n_pad))
    # slice the same synthesized planes (device gather, untimed) so the
    # sparse pass sees identical field content
    idx = np.zeros(n_pad, np.int32)
    idx[:pos.size] = pos
    t_rows = jax.block_until_ready(
        jnp.where((jnp.arange(n_pad) < pos.size)[:, None],
                  jnp.take(t_pack, jnp.asarray(idx), axis=0),
                  jnp.uint32(0)))
    rate, gbs = time_fn(shape_score.shape_score_pairs, t_rows, q_sp,
                        SPARSE_REPEATS)
    print(json.dumps({"kind": "xla-sparse", "pairs_per_s": round(rate, 1),
                      "read_gb_per_s": round(gbs, 1),
                      "support_rows": int(pos.size),
                      "padded_rows": int(n_pad)}), flush=True)

    # production form: both orientations stacked in one dispatch
    t2 = jax.block_until_ready(jnp.stack([t_rows, t_rows]))
    q2 = jnp.stack([q_sp, q_sp])

    def both_fn(t, q):
        return shape_score.shape_score_pairs_both(t, q)

    np.asarray(both_fn(t2, q2)[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(SPARSE_REPEATS):
        out = both_fn(t2, q2)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    rate = SPARSE_REPEATS * T / dt
    print(json.dumps({"kind": "xla-sparse-both",
                      "pairs_per_s": round(rate, 1),
                      "read_gb_per_s": round(
                          SPARSE_REPEATS * t2.nbytes / dt / 1e9, 1)}),
          flush=True)

    # split (gap-row / he-row) production form: gap rows keep the
    # grad|slice word, ring rows bitpack to 32 fg bits per uint32
    pos_gap, pos_he = shape_score.support_split(q_pack)
    n_gap = shape_score.support_bucket(pos_gap.size, minimum=1024)
    n_he = shape_score.he_words(pos_he.size)
    log(f"split: {pos_gap.size} gap rows (pad {n_gap}), "
        f"{pos_he.size} he rows ({n_he} packed words)")
    qg, qh = shape_score.sparse_query_split(q_pack, pos_gap, n_gap,
                                            pos_he, n_he)
    q_gap2 = jnp.asarray(np.stack([qg, qg]))
    q_he2 = jnp.asarray(np.stack([qh, qh]))

    def slice_rows(pos, n_pad, fn):
        idx = np.zeros(n_pad, np.int32)
        idx[:pos.size] = pos
        rows = jnp.where((jnp.arange(n_pad) < pos.size)[:, None],
                         fn(jnp.take(t_pack, jnp.asarray(idx), axis=0)),
                         0)
        return jnp.stack([rows, rows])

    t_gap2 = jax.block_until_ready(slice_rows(
        pos_gap, n_gap,
        lambda w: (w & jnp.uint32((0x1FF << 16) | 0xFFFF))))
    # he bits come to the host for packing (small: Sh x T bools)
    tfg_host = np.asarray(
        (jnp.take(t_pack, jnp.asarray(pos_he), axis=0) >> 26) & 1
    ).astype(bool).T                                  # [T, Sh]
    t_he_1 = jnp.asarray(
        np.ascontiguousarray(
            shape_score._packbits32(tfg_host, n_he).T))
    t_he2 = jax.block_until_ready(jnp.stack([t_he_1, t_he_1]))

    def split_fn():
        return shape_score.shape_score_pairs_split(t_gap2, q_gap2,
                                                   t_he2, q_he2)

    np.asarray(split_fn()[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(SPARSE_REPEATS):
        out = split_fn()
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    rate = SPARSE_REPEATS * T / dt
    read_gb = (t_gap2.nbytes + t_he2.nbytes) * SPARSE_REPEATS / dt / 1e9
    print(json.dumps({"kind": "xla-split",
                      "pairs_per_s": round(rate, 1),
                      "read_gb_per_s": round(read_gb, 1),
                      "gap_rows": int(pos_gap.size),
                      "he_rows": int(pos_he.size)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
