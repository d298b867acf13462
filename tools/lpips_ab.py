"""Whole-tower A/B timing of LPIPS conv formulations (queued difference method).

Variants:
  conv    — current: lax.conv_general_dilated (im2col only for Cin<=4)
  im2col  — every 3x3 conv as explicit 9-tap im2col + one matmul

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/lpips_ab.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from moss_tpu.ops import lpips_jax as L


def qt(fn, *args, n=30):
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


def conv_im2col(p, x, dtype):
    cin = p["w"].shape[2]
    n, h, w_, _ = x.shape
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    pat = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w_, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    wm = jnp.asarray(p["w"], dtype).reshape(9 * cin, -1)
    return pat @ wm + jnp.asarray(p["b"], dtype)


def features_with(conv_fn, params, x, dtype):
    feats = []
    h = x
    for bi, block in enumerate(params["convs"]):
        for p in block:
            h = jax.nn.relu(conv_fn(p, h, dtype))
        feats.append(h)
        if bi < len(params["convs"]) - 1:
            h = jax.lax.reduce_window(h, h.dtype.type(-jnp.inf), jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def main():
    params = L.get_default_params()
    dtype = jnp.bfloat16
    H = W = 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def head(f1, f2, lins):
        total = 0.0
        for a, b, lin in zip(f1, f2, lins):
            a = a.astype(jnp.float32); b = b.astype(jnp.float32)
            inv_a = 1.0 / (jnp.sqrt(jnp.sum(a * a, -1)) + 1e-10)
            inv_b = 1.0 / (jnp.sqrt(jnp.sum(b * b, -1)) + 1e-10)
            aa = jnp.sum(a * a * lin, -1); bb = jnp.sum(b * b * lin, -1)
            ab = jnp.sum(a * b * lin, -1)
            total = total + jnp.mean(aa * inv_a**2 + bb * inv_b**2 - 2 * ab * inv_a * inv_b)
        return total

    for name, conv_fn in [("conv", L._conv), ("im2col", conv_im2col)]:
        cached = jax.jit(lambda im: features_with(conv_fn, params, L._norm_input(im)[None], dtype))(img)
        cached = jax.tree.map(jax.device_put, cached)

        def fwd(im):
            f1 = features_with(conv_fn, params, L._norm_input(im)[None], dtype)
            return head(f1, cached, params["lins"])

        jf = jax.jit(fwd)
        jg = jax.jit(jax.grad(fwd))
        tf = qt(jf, img)
        tg = qt(jg, img)
        print(f"{name:8s} fwd {tf*1e3:6.2f} ms   grad(fwd+bwd) {tg*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
