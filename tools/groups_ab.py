"""A/B the lane-pack group count G at the bench workload (no oracle).

G is the number of 8x(128/G) sub-tile Gaussian streams packed into one
8x128 vreg in the blend kernels (rasterize_tpu.py:81-84). PERF.md's earlier
measurement (pre measured-slot-budget) had G=4 kernels faster but the fatter
pair buffer losing the difference in the build backward; the measured slot
budget changed the buffer economics, so re-measure.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/groups_ab.py [G ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _queued_time(fn, *args, n: int = 10):
    v = fn(*args)
    _ = float(v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    _ = float(v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    _ = float(v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


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

    H = W = 512
    P = 46080
    rng = np.random.default_rng(0)
    K = np.array([[550.0, 0, W / 2], [0, 550.0, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
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
    args = (proj.mean2d, proj.conic, proj.color, proj.opacity, proj.depth)

    for G in [int(a) for a in (sys.argv[1:] or ["2", "4"])]:
        need = int(jax.jit(
            lambda p: measure_slot_need(
                p.mean2d, p.conic, p.opacity, p.depth, p.radius, p.valid,
                H, W, rt.TILE_H, rt.TILE_W, groups=G, radius_xy=p.radius_xy,
            )["need"]
        )(proj))
        budget = -(-int(need * 1.06) // 16384) * 16384

        def loss_with(fields, pr):
            o = rt.rasterize_tpu(
                pr._replace(
                    mean2d=fields[0], conic=fields[1], color=fields[2],
                    opacity=fields[3], depth=fields[4],
                ),
                bg, H, W, groups=G, slot_budget=budget,
            )
            return jnp.sum(o["color"]) + jnp.sum(o["alpha"]) + 0.01 * jnp.sum(o["depth"])

        g = jax.grad(loss_with)
        f = jax.jit(
            lambda a, p: jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.sum(jnp.abs(y)), g(a, p), 0.0
            )
        )
        dt = _queued_time(f, args, proj, n=10)
        print(f"G={G} budget={budget} ({need} need): {dt*1e3:.2f} ms  "
              f"{H*W/dt/1e6:.1f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
