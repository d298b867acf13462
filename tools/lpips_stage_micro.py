"""Per-conv-stage timing of the LPIPS VGG tower at the 512^2 train shape.

Finds which conv layers run far from MXU peak (fwd and fwd+input-grad), to
target layout fixes. Run: PYTHONPATH=/root/.axon_site:/root/repo python
tools/lpips_stage_micro.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

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
    params = L.get_default_params()
    dtype = jnp.bfloat16
    H = W = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    h = x
    rows = []
    for bi, block in enumerate(params["convs"]):
        for li, p in enumerate(block):
            cin = p["w"].shape[2]
            cout = p["w"].shape[3]
            hh = h.shape[1]

            def fwd(v, p=p):
                return L._conv(p, v, dtype)

            def fvjp(v, p=p):
                out, vjp = jax.vjp(lambda u: L._conv(p, u, dtype), v)
                (g,) = vjp(jnp.ones_like(out))
                return g

            jf = jax.jit(fwd)
            jb = jax.jit(fvjp)
            tf = qt(jf, h)
            tb = qt(jb, h)
            gflop = 2 * hh * hh * cin * cout * 9 / 1e9
            rows.append((f"conv{bi}_{li} {hh}^2 {cin}->{cout}", tf * 1e3,
                         tb * 1e3, gflop / tf / 1e3, gflop * 3 / tb / 1e3))
            h = jax.nn.relu(jax.jit(fwd)(h))
        if bi < 4:
            h = jax.lax.reduce_window(h, h.dtype.type(-jnp.inf), jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    print(f"{'layer':28s} {'fwd ms':>8s} {'f+vjp ms':>9s} {'fwd TF/s':>9s} {'fvjp TF/s':>10s}")
    for name, tf, tb, tfl, tbl in rows:
        print(f"{name:28s} {tf:8.3f} {tb:9.3f} {tfl:9.1f} {tbl:10.1f}")
    print("total fwd ms", sum(r[1] for r in rows), " total f+vjp ms", sum(r[2] for r in rows))


if __name__ == "__main__":
    main()
