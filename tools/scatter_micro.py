"""Scatter-add microbenchmark: the build-backward bottleneck.

The VJP of `rows = table[idx]` (table (P,16), idx (N,)) is a scatter-add of N
16-float rows. XLA scatter cost is superlinear in N (PERF.md). Variants:
  s1: single scatter-add of all N rows
  sK: K sequential scatter-adds of N/K rows each (summed into same table)
  sorted: single scatter with indices sorted ascending (upper bound on the
          sorted-layout win; our tile-major indices are NOT sorted)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/scatter_micro.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, n: int = 20):
    v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def main():
    P = 46080
    rng = np.random.default_rng(0)
    for N in (233472, 155648):
        idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))

        @jax.jit
        def s1(idx, vals):
            return jnp.zeros((P, 16), jnp.float32).at[idx].add(
                vals, mode="promise_in_bounds"
            )

        def make_sk(K):
            @jax.jit
            def sk(idx, vals):
                out = jnp.zeros((P, 16), jnp.float32)
                step = N // K
                for k in range(K):
                    out = out.at[idx[k * step:(k + 1) * step]].add(
                        vals[k * step:(k + 1) * step], mode="promise_in_bounds"
                    )
                return out
            return sk

        idx_sorted = jnp.sort(idx)

        @jax.jit
        def ssorted(idxs, vals):
            return jnp.zeros((P, 16), jnp.float32).at[idxs].add(
                vals, mode="promise_in_bounds", indices_are_sorted=True
            )

        print(f"N={N}")
        print(f"  s1     : {queued_time(s1, idx, vals)*1e3:6.2f} ms")
        for K in (2, 4, 8):
            print(f"  s{K:<2d}    : {queued_time(make_sk(K), idx, vals)*1e3:6.2f} ms")
        print(f"  sorted : {queued_time(ssorted, idx_sorted, vals)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
