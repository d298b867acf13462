"""Micro-profile LPIPS variants on the real TPU.

Current implementation uses reduce_window max-pool (whose VJP is
select_and_scatter — historically slow on TPU) and f32 activations.
Variants measured here:
  v0: current lpips()
  v1: reshape-based 2x2 max pool (exact same math, cheap VJP)
  v2: v1 + bf16 activations (convs bf16, normalize/diff f32)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_lpips.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from moss_tpu.ops import lpips_jax


def queued_time(fn, *args, n: int = 10):
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


def pool_reshape(h):
    N, H, W, C = h.shape
    h = h.reshape(N, H // 2, 2, W // 2, 2, C)
    return jnp.max(jnp.max(h, axis=4), axis=2)


def features_v(params, x, pool, dtype=None):
    feats = []
    h = x
    for bi, block in enumerate(params["convs"]):
        for p in block:
            w = p["w"]
            b = p["b"]
            if dtype is not None:
                h = h.astype(dtype)
                w = jnp.asarray(w, dtype)
                b = jnp.asarray(b, dtype)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
        feats.append(h)
        if bi < len(params["convs"]) - 1:
            h = pool(h)
    return feats


def lpips_v(params, img1, img2, pool, dtype=None):
    def norm_input(im):
        x = im * 2.0 - 1.0
        return (x - lpips_jax._SHIFT) / lpips_jax._SCALE

    x1 = norm_input(img1)[None]
    x2 = norm_input(img2)[None]
    f1 = features_v(params, x1, pool, dtype)
    f2 = features_v(params, x2, pool, dtype)
    total = 0.0
    for a, b, lin in zip(f1, f2, params["lins"]):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def pool_rw(h):
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def main():
    H = W = 512
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    params = lpips_jax.get_default_params()

    v0 = jax.jit(lambda x, y: lpips_jax.lpips(params, x, y))
    v0g = jax.jit(jax.grad(lambda x, y: lpips_jax.lpips(params, x, y)))
    v1 = jax.jit(lambda x, y: lpips_v(params, x, y, pool_reshape))
    v1g = jax.jit(jax.grad(lambda x, y: lpips_v(params, x, y, pool_reshape)))
    v2 = jax.jit(lambda x, y: lpips_v(params, x, y, pool_reshape, jnp.bfloat16))
    v2g = jax.jit(jax.grad(lambda x, y: lpips_v(params, x, y, pool_reshape, jnp.bfloat16)))

    # value parity v0 vs v1 (must be exact-ish), v2 (bf16, loose)
    r0, r1, r2 = float(v0(a, b)), float(v1(a, b)), float(v2(a, b))
    print(f"values: v0={r0:.6f} v1={r1:.6f} v2={r2:.6f}")
    g0, g1, g2 = v0g(a, b), v1g(a, b), v2g(a, b)
    def rel(x, y):
        return float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-12))
    print(f"grad rel: v1 vs v0 {rel(g1, g0):.2e}  v2 vs v0 {rel(g2, g0):.2e}")

    for name, f in [("v0 fwd", v0), ("v0 fwd+bwd", v0g),
                    ("v1 fwd", v1), ("v1 fwd+bwd", v1g),
                    ("v2 fwd", v2), ("v2 fwd+bwd", v2g)]:
        dt = queued_time(f, a, b)
        print(f"{name:12s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
