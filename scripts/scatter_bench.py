"""Device-side key-plane scatter microbenchmark.

The sparse COO upload ends in a [P+1, T] scatter on device; TPU scatter
lowering can be catastrophic, so this measures the variants:
  * set / unique / sorted-hint combinations
  * the scatter-free alternative: sort-by-destination + segment reduce

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scatter_bench.py [T] [nnz_per_target]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    t_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 14000
    h, w = 566, 1210
    n_px = h * w
    rng = np.random.default_rng(0)
    n = t_pad * nnz
    # unique (pos, tidx) pairs, tidx-major like the COO select emits
    tidx = np.repeat(np.arange(t_pad, dtype=np.int32), nnz)
    pos = np.stack([rng.choice(n_px, nnz, replace=False)
                    for _ in range(t_pad)]).astype(np.int32).reshape(-1)
    key = rng.integers(1, 1 << 18, n).astype(np.int32)
    d_pos = jax.device_put(pos)
    d_tidx = jax.device_put(tidx)
    d_key = jax.device_put(key)

    def timeit(name, fn):
        out = fn()  # compile
        np.asarray(out[-1, :1])
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[-1, :1])
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s ({n / dt / 1e6:.1f}M elem/s)",
              flush=True)

    @jax.jit
    def scatter_plain(p, ti, k):
        planes = jnp.zeros((n_px + 1, t_pad), jnp.int32)
        return planes.at[p, ti].set(k)

    @jax.jit
    def scatter_unique(p, ti, k):
        planes = jnp.zeros((n_px + 1, t_pad), jnp.int32)
        return planes.at[p, ti].set(k, unique_indices=True,
                                    mode="drop")

    @jax.jit
    def scatter_flat_unique(p, ti, k):
        flat = jnp.zeros((n_px + 1) * t_pad, jnp.int32)
        idx = p.astype(jnp.int32) * t_pad + ti
        return flat.at[idx].set(k, unique_indices=True,
                                mode="drop").reshape(n_px + 1, t_pad)

    @jax.jit
    def scatter_flat_sorted(p, ti, k):
        # destination index is monotone when sorted by (pos, tidx);
        # host provides tidx-major order, so sort on device first
        idx = p.astype(jnp.int32) * t_pad + ti
        order = jnp.argsort(idx)
        flat = jnp.zeros((n_px + 1) * t_pad, jnp.int32)
        return flat.at[idx[order]].set(
            k[order], unique_indices=True, indices_are_sorted=True,
            mode="drop").reshape(n_px + 1, t_pad)

    timeit("scatter [P,T] .set", lambda: scatter_plain(
        d_pos, d_tidx, d_key))
    timeit("scatter [P,T] unique+drop", lambda: scatter_unique(
        d_pos, d_tidx, d_key))
    timeit("scatter flat unique+drop", lambda: scatter_flat_unique(
        d_pos, d_tidx, d_key))
    timeit("scatter flat sort+sorted-hint", lambda: scatter_flat_sorted(
        d_pos, d_tidx, d_key))

    ref = np.asarray(scatter_plain(d_pos, d_tidx, d_key))
    for fn in (scatter_unique, scatter_flat_unique, scatter_flat_sorted):
        got = np.asarray(fn(d_pos, d_tidx, d_key))
        assert (got == ref).all(), fn
    print("all variants equal")


if __name__ == "__main__":
    main()
