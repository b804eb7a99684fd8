"""Shape (gradient-area-gap) pass throughput on the real TPU.

Measures the fused XLA kernel (ops/shape_score.shape_score_pairs) on
production-sized packed planes, reporting shape-scored pairs/s (both
orientations, the mirror-enabled production config) and the effective
HBM read bandwidth.

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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 1210, 566          # production CDM shape
T = int(os.environ.get("SHAPE_BENCH_TARGETS", 256))
REPEATS = int(os.environ.get("SHAPE_BENCH_REPEATS", 20))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build_planes():
    """Device-synthesized packed planes with realistic field content."""
    p = H * W

    @jax.jit
    def make(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        grad = jax.random.randint(k1, (p, T), 0, 1 << 16)
        sl = jax.random.randint(k2, (p, T), 0, 257)
        znz = (jax.random.uniform(k3, (p, T)) < 0.06).astype(jnp.int32)
        tfg = (jax.random.uniform(k4, (p, T)) < 0.06).astype(jnp.int32)
        word = (grad | (sl << 16) | (znz << 25) | (tfg << 26))
        q_sl = jax.random.randint(k5, (p,), 0, 257)
        q_bits = jax.random.randint(k5, (p, 3), 0, 2)
        q = (q_sl | (q_bits[:, 0] << 9) | (q_bits[:, 1] << 10)
             | (q_bits[:, 2] << 11))
        return word.astype(jnp.uint32), q.astype(jnp.int32)

    t_pack, q_pack = make(jax.random.PRNGKey(0))
    return jax.block_until_ready(t_pack), jax.block_until_ready(q_pack)


def time_fn(fn, t_pack, q_pack):
    np.asarray(fn(t_pack, q_pack)[0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(REPEATS):
        out = fn(t_pack, q_pack)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    # production mirror config reads the straight AND mirror planes:
    # 2 plane passes per scored pair
    pairs = REPEATS * T / 2
    read_gb = REPEATS * t_pack.nbytes / dt / 1e9
    return pairs / dt, read_gb


def main():
    log(f"devices: {jax.devices()}  T={T}  plane={H}x{W}")
    t_pack, q_pack = build_planes()
    log(f"planes: {t_pack.nbytes / 1e9:.1f} GB")

    from colormipsearch_tpu.ops import shape_score

    rate, gbs = time_fn(shape_score.shape_score_pairs, t_pack, q_pack)
    print(json.dumps({"kind": "xla", "pairs_per_s": round(rate, 1),
                      "read_gb_per_s": round(gbs, 1)}), flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
