"""Microbenchmarks for pair-build BACKWARD reformulations (TPU).

The build backward today is a 4-way chunked scatter-add of (NP2, 16) grad
rows into the (P, 16) geometry table (~1.9 ms at NP2=310k). Candidate
replacements route through sorts / gathers / segment reduces; this measures
every primitive so the design is chosen on numbers, not folklore.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bwd_micro.py
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


def main():
    P = 46080
    B = 16
    PB = P * B
    rng = np.random.default_rng(0)

    for NP2 in (241664, 309888, 412160):
        g = jnp.asarray(rng.normal(size=(NP2, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, P, NP2).astype(np.int32))

        def scat(g, idx, nsplit=4):
            out = jnp.zeros((P, 16), g.dtype)
            step = -(-NP2 // nsplit)
            for k in range(nsplit):
                out = out.at[idx[k * step:(k + 1) * step]].add(
                    g[k * step:(k + 1) * step], mode="promise_in_bounds")
            return out

        for ns in (1, 4, 8):
            dt = qt(jax.jit(lambda g, i, ns=ns: jnp.sum(scat(g, i, ns))), g, idx)
            print(f"scatter f32 NP2={NP2} nsplit={ns}: {dt*1e3:7.3f} ms")
        # sorted-indices variant
        idx_s = jnp.sort(idx)
        dt = qt(jax.jit(lambda g, i: jnp.sum(
            jnp.zeros((P, 16), g.dtype).at[i].add(
                g, mode="promise_in_bounds", indices_are_sorted=True))), g, idx_s)
        print(f"scatter f32 NP2={NP2} SORTED ns=1: {dt*1e3:7.3f} ms")

    NP2 = 309888
    g = jnp.asarray(rng.normal(size=(NP2, 16)).astype(np.float32))
    key = jnp.asarray(rng.integers(0, P, NP2).astype(np.int32))

    # 2-op sorts (the occ route)
    iota = jnp.arange(NP2, dtype=jnp.int32)
    dt = qt(jax.jit(lambda k: jnp.sum(jax.lax.sort(k))), key)
    print(f"1-op sort {NP2}: {dt*1e3:7.3f} ms")
    dt = qt(jax.jit(lambda k, i: jnp.sum(jax.lax.sort((k, i), num_keys=1)[1])),
            key, iota)
    print(f"2-op sort {NP2}: {dt*1e3:7.3f} ms")
    NBIG = NP2 + PB  # with pad-to-B synthetic entries
    keyb = jnp.asarray(rng.integers(0, P, NBIG).astype(np.int32))
    iotab = jnp.arange(NBIG, dtype=jnp.int32)
    dt = qt(jax.jit(lambda k, i: jnp.sum(jax.lax.sort((k, i), num_keys=1)[1])),
            keyb, iotab)
    print(f"2-op sort {NBIG}: {dt*1e3:7.3f} ms")
    dt = qt(jax.jit(lambda k: jnp.sum(jax.lax.sort(k))), keyb)
    print(f"1-op sort {NBIG}: {dt*1e3:7.3f} ms")

    # the occ-route backward: gather PB rows from (NP2,16) then (P,B,16).sum(1)
    occ = jnp.asarray(rng.integers(0, NP2, PB).astype(np.int32))
    dt = qt(jax.jit(lambda g, o: jnp.sum(
        g[o].reshape(P, B, 16).sum(1))), g, occ)
    print(f"row-gather {PB}x16 + (P,B,16).sum(1): {dt*1e3:7.3f} ms")

    # tiny scatters (recheck the '256-element scatter ~2ms' claim)
    for nsc in (512, 4096, 32768):
        sidx = jnp.asarray(rng.integers(0, NP2, nsc).astype(np.int32))
        sval = jnp.ones((nsc,), jnp.int32)
        dt = qt(jax.jit(lambda i, v: jnp.sum(
            jnp.zeros((NP2,), jnp.int32).at[i].add(v))), sidx, sval)
        print(f"element scatter {nsc} -> ({NP2},): {dt*1e3:7.3f} ms")

    # element gather from small table (the per-pair tile lookup)
    tbl = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    gi = jnp.asarray(rng.integers(0, 512, PB).astype(np.int32))
    dt = qt(jax.jit(lambda t, i: jnp.sum(t[i])), tbl, gi)
    print(f"element gather {PB} from 512-table: {dt*1e3:7.3f} ms")

    # fat-row gather: (P,512) f32 rows permuted
    fat = jnp.asarray(rng.normal(size=(P, 512)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    dt = qt(jax.jit(lambda f, p: jnp.sum(f[p])), fat, perm)
    print(f"fat-row gather (P,512) perm: {dt*1e3:7.3f} ms")

    # LT matmul cum-hist: (361,128,128)bf16 @ (361,128,512)bf16 -> f32
    LT = jnp.asarray(np.tril(np.ones((128, 128), np.float32), -1).astype(jnp.bfloat16))
    NBK = 361
    J = jnp.asarray(rng.integers(0, 2, (NBK, 128, 512)).astype(np.float32)).astype(jnp.bfloat16)
    dt = qt(jax.jit(lambda j: jnp.sum(jnp.einsum(
        'ab,kbt->kat', LT, j, preferred_element_type=jnp.float32))), J)
    print(f"LT cumhist batched matmul (361x128x128x512): {dt*1e3:7.3f} ms")

    # dense (P,64,8) liveind eval (~30 flops each) stand-in
    m = jnp.asarray(rng.normal(size=(P, 1, 1)).astype(np.float32))
    ty = jnp.arange(64, dtype=jnp.float32)[None, :, None]
    tx = jnp.arange(8, dtype=jnp.float32)[None, None, :]
    dt = qt(jax.jit(lambda m: jnp.sum(
        (jnp.exp(-(ty - m) ** 2 - (tx + m) ** 2) + (ty * m + tx) * 0.5
         + jnp.minimum(ty * m, tx * m)) > 0.5)), m)
    print(f"dense (P,64,8) eval (~10 ops): {dt*1e3:7.3f} ms")

    # lane-dim cumsum of (16, NP2) f32
    gT = g.T
    dt = qt(jax.jit(lambda x: jnp.sum(jnp.cumsum(x, axis=1))), gT)
    print(f"lane cumsum (16,{NP2}): {dt*1e3:7.3f} ms")

    # (P,B) dense math + (P,B,16) reduce cost floor
    pb = jnp.asarray(rng.normal(size=(P, B, 16)).astype(np.float32))
    dt = qt(jax.jit(lambda x: jnp.sum(x.sum(1))), pb)
    print(f"(P,B,16).sum(1): {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
