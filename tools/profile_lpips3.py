"""Per-layer cost of the CURRENT in-train LPIPS conv formulation.

Times moss_tpu.ops.lpips_jax._conv (im2col fwd + conv-adjoint input-grad bwd,
custom VJP) per VGG16 layer shape at batch 1 in bf16 — exactly what the
training step pays for the render tower (gt tower is cached). Also times the
max-pools, the distance head, and the full lpips() fwd+bwd for cross-check.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_lpips3.py
     [MOSS_CROP=512]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from moss_tpu.ops import lpips_jax as L


def qt(fn, *args, n=20):
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
    H0 = int(os.environ.get("MOSS_CROP", "512"))
    rng = np.random.default_rng(0)
    dt_name = "bfloat16"
    layers = []  # (H, cin, cout)
    h = H0
    for bi, (cout, nl) in enumerate(L._VGG_CFG):
        cin = 3 if bi == 0 else L._VGG_CFG[bi - 1][0]
        for j in range(nl):
            layers.append((h, cin if j == 0 else cout, cout))
        if bi < 4:
            h //= 2

    tot_f = tot_fb = 0.0
    if os.environ.get("MOSS_SKIP_LAYERS"):
        layers = []
    for (h, cin, cout) in layers:
        x = jnp.asarray(rng.normal(size=(1, h, h, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = np.random.default_rng(1).normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
        b = np.zeros(cout, np.float32)

        f = jax.jit(lambda x: jnp.sum(
            L._conv_p(w, b, x, dt_name).astype(jnp.float32)))
        fb = jax.jit(jax.grad(lambda x: jnp.sum(jax.nn.relu(
            L._conv_p(w, b, x, dt_name)).astype(jnp.float32))))
        dt_f = qt(f, x)
        dt_fb = qt(fb, x)
        flops = 2 * h * h * cout * 9 * cin
        print(f"{h:4d}^2 {cin:3d}->{cout:3d}: fwd {dt_f*1e3:6.3f} ms ({flops/dt_f/1e12:5.1f} TF/s)"
              f"  f+b {dt_fb*1e3:6.3f} ms ({3*flops/dt_fb/1e12:5.1f} TF/s)")
        tot_f += dt_f
        tot_fb += dt_fb
    print(f"conv totals: fwd {tot_f*1e3:.2f} ms   fwd+bwd {tot_fb*1e3:.2f} ms")

    # whole lpips fwd+bwd wrt img1, cached gt tower (the in-train config)
    params = L.init_random(3407)
    img1 = jnp.asarray(rng.uniform(size=(H0, H0, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(size=(H0, H0, 3)).astype(np.float32))
    cached = jax.jit(lambda im: L.gt_features(params, im, jnp.bfloat16))(img2)
    g = jax.jit(jax.grad(
        lambda a: L.lpips(params, a, dtype=jnp.bfloat16, cached_f2=cached)))
    print(f"lpips fwd+bwd (cached gt, bf16): {qt(g, img1)*1e3:.2f} ms")
    f = jax.jit(lambda a: L.lpips(params, a, dtype=jnp.bfloat16, cached_f2=cached))
    print(f"lpips fwd      (cached gt, bf16): {qt(f, img1)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
