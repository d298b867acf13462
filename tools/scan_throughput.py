"""Pure-device rasterizer throughput via scan-of-K (dispatch-gating probe).

bench.py times one fwd+bwd per dispatch with the queued difference method;
through the axon relay each dispatch costs a host->device hop, so if the
device step is fast enough the queue may be dispatch-gated rather than
compute-gated, and the published rays/s understates the chip. This tool
measures the same fwd+bwd inside a lax.scan of K steps — ONE dispatch, K
device iterations — which removes per-step dispatch entirely.

The scanned step perturbs opacity by a tiny carry-dependent epsilon so XLA
cannot CSE the K iterations into one.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/scan_throughput.py
       [MOSS_BENCH_SHAPE=1024] [K=20]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import moss_tpu

    moss_tpu.enable_compilation_cache()

    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops.binning import measure_slot_need
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.render.camera import Camera

    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True

    H = W = int(os.environ.get("MOSS_BENCH_SHAPE", "512"))
    K = int(os.environ.get("K", "20"))
    P = 46080
    rng = np.random.default_rng(0)
    f = 550.0 * H / 512.0
    Kmat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(Kmat, np.eye(3), np.zeros(3), H, W)
    means = np.stack(
        [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P), rng.uniform(1.5, 2.5, P)],
        -1,
    ).astype(np.float32)
    cov3d = tf.build_covariance(
        jnp.asarray(rng.uniform(0.004, 0.012, (P, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
    )
    proj = preprocess(
        jnp.asarray(means), cov3d,
        jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, P).astype(np.float32)),
        cam,
    )
    bg = jnp.zeros(3)
    need = int(jax.jit(
        lambda p: measure_slot_need(
            p.mean2d, p.conic, p.opacity, p.depth, p.radius, p.valid,
            H, W, rt.TILE_H, rt.TILE_W, groups=rt.DEFAULT_GROUPS,
            radius_xy=p.radius_xy,
        )["need"]
    )(proj))
    slot_budget = -(-int(need * 1.06) // 16384) * 16384

    def loss_with(fields, pr):
        o = rt.rasterize_tpu(
            pr._replace(
                mean2d=fields[0], conic=fields[1], color=fields[2],
                opacity=fields[3], depth=fields[4],
            ),
            bg, H, W, slot_budget=slot_budget,
        )
        return jnp.sum(o["color"]) + jnp.sum(o["alpha"]) + 0.01 * jnp.sum(o["depth"])

    g = jax.grad(loss_with)

    @jax.jit
    def scan_k(pr):
        def step(carry, _):
            a = (pr.mean2d, pr.conic, pr.color,
                 pr.opacity * (1.0 + 1e-7 * carry), pr.depth)
            gr = g(a, pr)
            s = jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.sum(jnp.abs(y)), gr, 0.0)
            return carry + 1e-12 * s, None

        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
        return out

    # queued difference timing of the scan itself (n dispatches of K steps)
    v = scan_k(proj); _ = float(v)
    n = 3
    t0 = time.time()
    for _ in range(n):
        v = scan_k(proj)
    _ = float(v)
    t1 = time.time()
    for _ in range(2 * n):
        v = scan_k(proj)
    _ = float(v)
    t2 = time.time()
    dt = max((t2 - t1) - (t1 - t0), 1e-9) / n / K
    print(f"scan-of-{K} fwd+bwd: {dt*1e3:.3f} ms/step  -> {H*W/dt/1e6:.1f}M rays/s (pure device)")

    # per-dispatch for comparison (bench.py method)
    @jax.jit
    def one(pr):
        a = (pr.mean2d, pr.conic, pr.color, pr.opacity, pr.depth)
        gr = g(a, pr)
        return jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.sum(jnp.abs(y)), gr, 0.0)

    v = one(proj); _ = float(v)
    n = 10
    t0 = time.time()
    for _ in range(n):
        v = one(proj)
    _ = float(v)
    t1 = time.time()
    for _ in range(2 * n):
        v = one(proj)
    _ = float(v)
    t2 = time.time()
    dt1 = max((t2 - t1) - (t1 - t0), 1e-9) / n
    print(f"per-dispatch fwd+bwd: {dt1*1e3:.3f} ms/step -> {H*W/dt1/1e6:.1f}M rays/s (queued)")


if __name__ == "__main__":
    main()
