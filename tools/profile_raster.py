"""Stage-by-stage timing of the differentiable rasterization pipeline.

Times each stage of the 512x512/46k north-star workload separately with the
difference method (PERF.md "Measurement methodology") so kernel/binning
changes can be attributed. Run on the real TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_raster.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, n: int = 10):
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
    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import rasterize_tpu as rt
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

    def with_fields(pr, fields):
        return pr._replace(
            mean2d=fields[0], conic=fields[1], color=fields[2],
            opacity=fields[3], depth=fields[4],
        )

    # --- stage: pair build fwd only
    @jax.jit
    def build_fwd(fields, pr):
        tg, gh, gw = rt._build_pairs(with_fields(pr, fields), H, W, 16, 0)
        return jnp.sum(tg.geom) + jnp.sum(tg.tile_count)

    # --- stage: pair build fwd+bwd
    @jax.jit
    def build_fwdbwd(fields, pr):
        def f(fields):
            tg, gh, gw = rt._build_pairs(with_fields(pr, fields), H, W, 16, 0)
            return jnp.sum(tg.geom * tg.geom)
        g = jax.grad(f)(fields)
        return sum(jnp.sum(jnp.abs(x)) for x in g)

    # --- stage: kernel only (prebuilt pairs), fwd and fwd+bwd
    tg, grid_h, grid_w = rt._build_pairs(proj, H, W, 16, 0)
    kern = rt._make_rasterize_pairs(int(grid_h), int(grid_w))

    @jax.jit
    def kernel_fwd(geom, ts, tc):
        outs = kern(geom, ts, tc)
        return sum(jnp.sum(o) for o in outs)

    @jax.jit
    def kernel_fwdbwd(geom, ts, tc):
        def f(geom):
            outs = kern(geom, ts, tc)
            return sum(jnp.sum(o * o) for o in outs)
        return jnp.sum(jnp.abs(jax.grad(f)(geom)))

    # --- full pipeline
    @jax.jit
    def full_fwd(fields, pr):
        o = rt.rasterize_tpu(with_fields(pr, fields), bg, H, W)
        return jnp.sum(o["color"]) + jnp.sum(o["alpha"]) + 0.01 * jnp.sum(o["depth"])

    @jax.jit
    def full_fwdbwd(fields, pr):
        g = jax.grad(lambda f: full_fwd(f, pr))(fields)
        return sum(jnp.sum(jnp.abs(x)) for x in g)

    stages = [
        ("build fwd", build_fwd, (args, proj)),
        ("build fwd+bwd", build_fwdbwd, (args, proj)),
        ("kernel fwd", kernel_fwd, (tg.geom, tg.tile_start, tg.tile_count)),
        ("kernel fwd+bwd", kernel_fwdbwd, (tg.geom, tg.tile_start, tg.tile_count)),
        ("FULL fwd", full_fwd, (args, proj)),
        ("FULL fwd+bwd", full_fwdbwd, (args, proj)),
    ]
    print(f"# NP2={tg.geom.shape[1]}  live_pairs~{int(jnp.sum(tg.pair_valid))}")
    for name, fn, a in stages:
        dt = queued_time(fn, *a, n=10)
        print(f"{name:18s} {dt*1e3:8.2f} ms   ({H*W/dt/1e6:6.1f} Mrays/s)")




def substages():
    """Finer breakdown of the pair build."""
    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops.binning import align_binning, bin_gaussians
    from moss_tpu.render.camera import Camera

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
    num_tiles = (H // 8) * (W // 128)
    budget = 6 * P + 32 * num_tiles

    @jax.jit
    def s_bin(pr):
        b = bin_gaussians(pr.mean2d, pr.depth, pr.radius, pr.valid, H, W, 8, 128, 16)
        return jnp.sum(b.pair_gaussian) + jnp.sum(b.tile_start)

    @jax.jit
    def s_align(pr):
        b = bin_gaussians(pr.mean2d, pr.depth, pr.radius, pr.valid, H, W, 8, 128, 16)
        ab = align_binning(b, num_tiles, pair_budget=budget)
        return jnp.sum(ab.pair_gaussian) + jnp.sum(ab.tile_start)

    @jax.jit
    def s_gather(pr):
        b = bin_gaussians(pr.mean2d, pr.depth, pr.radius, pr.valid, H, W, 8, 128, 16)
        ab = align_binning(b, num_tiles, pair_budget=budget)
        src = jnp.concatenate(
            [pr.mean2d, pr.conic, pr.opacity[:, None], pr.color, pr.depth[:, None]], axis=1
        )
        rows = src[ab.pair_gaussian]
        return jnp.sum(rows)

    for name, fn in [("bin(sort)", s_bin), ("+align", s_align), ("+gather", s_gather)]:
        dt = queued_time(fn, proj, n=10)
        print(f"{name:12s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    import sys as _sys
    if "--sub" in _sys.argv:
        substages()
        raise SystemExit
    main()
