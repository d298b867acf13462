"""Per-layer conv timing for the LPIPS VGG backbone on TPU.

For each VGG stage layer shape, time fwd and fwd+bwd of a single conv at
batch 2 (two towers), report achieved TFLOPS vs the ~197 TFLOPS bf16 peak.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_lpips2.py
"""
from __future__ import annotations

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


LAYERS = [  # (H, Cin, Cout, count_in_vgg)
    (512, 3, 64, 1),
    (512, 64, 64, 1),
    (256, 64, 128, 1),
    (256, 128, 128, 1),
    (128, 128, 256, 1),
    (128, 256, 256, 2),
    (64, 256, 512, 1),
    (64, 512, 512, 2),
    (32, 512, 512, 3),
]


def main():
    rng = np.random.default_rng(0)
    tot_f = tot_fb = 0.0
    for H, cin, cout, cnt in LAYERS:
        x = jnp.asarray(rng.normal(size=(2, H, H, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        f = jax.jit(lambda x, w: jnp.sum(conv(x, w)))
        fb = jax.jit(jax.grad(lambda x, w: jnp.sum(conv(x, w)), argnums=0))
        dt_f = queued_time(f, x, w)
        dt_fb = queued_time(fb, x, w)
        flops = 2 * 2 * H * H * cout * (9 * cin)
        print(
            f"{H:4d}x{H:<4d} {cin:3d}->{cout:3d}: fwd {dt_f*1e3:6.2f} ms "
            f"({flops/dt_f/1e12:5.1f} TF/s)  fwd+bwd {dt_fb*1e3:6.2f} ms "
            f"({2*flops/dt_fb/1e12:5.1f} TF/s)  x{cnt}"
        )
        tot_f += dt_f * cnt
        tot_fb += dt_fb * cnt
    print(f"sum fwd {tot_f*1e3:.2f} ms   sum fwd+bwd {tot_fb*1e3:.2f} ms")


if __name__ == "__main__":
    main()
