"""Round 2: honest sort costs, realistic-index scatters, transpose, budget sizing.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bwd_micro2.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def qt(fn, *args, n: int = 20):
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


def realistic_idx(rng, NP2, P, run=384):
    """Piecewise-ascending runs (tile slices sorted by depth rank)."""
    nruns = -(-NP2 // run)
    out = np.sort(rng.integers(0, P, (nruns, run)), axis=1)
    return out.reshape(-1)[:NP2].astype(np.int32)


def main():
    P = 46080
    rng = np.random.default_rng(0)

    # honest sorts: reduce with position-weighted sums so nothing folds
    w3 = None
    for N in (309888, 737280):
        key = jnp.asarray(rng.integers(0, 1 << 24, N).astype(np.int32))
        iota = jnp.arange(N, dtype=jnp.int32)
        wts = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
        dt = qt(jax.jit(lambda k: jnp.sum(jax.lax.sort(k) * wts)), key)
        print(f"1-op sort {N}: {dt*1e3:7.3f} ms")
        dt = qt(jax.jit(lambda k, i: jnp.sum(
            jax.lax.sort((k, i), num_keys=1)[1].astype(jnp.float32) * wts)),
            key, iota)
        print(f"2-op sort {N}: {dt*1e3:7.3f} ms")

    # transpose (16, NP2) -> (NP2, 16)
    NP2 = 309888
    gT = jnp.asarray(rng.normal(size=(16, NP2)).astype(np.float32))
    dt = qt(jax.jit(lambda x: jnp.sum(x.T * jnp.arange(16.0))), gT)
    print(f"transpose (16,{NP2})->rows + cheap use: {dt*1e3:7.3f} ms")

    # realistic-index scatters at candidate budgets
    for NP2c in (241664, 258048, 283648, 309888):
        g = jnp.asarray(rng.normal(size=(NP2c, 16)).astype(np.float32))
        idx = jnp.asarray(realistic_idx(rng, NP2c, P))

        def scat(g, idx, nsplit):
            out = jnp.zeros((P, 16), g.dtype)
            step = -(-NP2c // nsplit)
            for k in range(nsplit):
                out = out.at[idx[k * step:(k + 1) * step]].add(
                    g[k * step:(k + 1) * step], mode="promise_in_bounds")
            return out

        for ns in (1, 4):
            dt = qt(jax.jit(lambda g, i, ns=ns: jnp.sum(scat(g, i, ns))), g, idx)
            print(f"scatter f32 realistic NP2={NP2c} nsplit={ns}: {dt*1e3:7.3f} ms")

    # fwd row gather reference at candidate budgets
    src = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    for NP2c in (241664, 258048, 309888):
        idx = jnp.asarray(realistic_idx(rng, NP2c, P))
        dt = qt(jax.jit(lambda s, i: jnp.sum(s[i])), src, idx)
        print(f"row gather ({NP2c},16) from (P,16): {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
