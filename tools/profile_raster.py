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
    import os
    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.render.camera import Camera

    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True
    G = int(os.environ.get("MOSS_RASTER_GROUPS", "1"))
    print(f"groups={G}")

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
        tg, gh, gw = rt._build_pairs(with_fields(pr, fields), H, W, 16, 0, G)
        return jnp.sum(tg.geom) + jnp.sum(tg.tile_count)

    # --- stage: pair build fwd+bwd
    @jax.jit
    def build_fwdbwd(fields, pr):
        def f(fields):
            tg, gh, gw = rt._build_pairs(with_fields(pr, fields), H, W, 16, 0, G)
            return jnp.sum(tg.geom * tg.geom)
        g = jax.grad(f)(fields)
        return sum(jnp.sum(jnp.abs(x)) for x in g)

    # --- stage: kernel only (prebuilt pairs), fwd and fwd+bwd
    tg, grid_h, grid_w = rt._build_pairs(proj, H, W, 16, 0, G)
    kern = rt._make_rasterize_pairs(int(grid_h), int(grid_w), G)

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
        o = rt.rasterize_tpu(with_fields(pr, fields), bg, H, W, groups=G)
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


def substages2():
    """Decompose build_pair_rows (the fast fused path) stage by stage."""
    import functools

    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops import binning
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
    jnp_ = jnp

    def partial_build(stage):
        """Re-run build_pair_rows' math up to `stage`, returning a scalar."""
        tile_h, tile_w, B, align = 8, 128, 16, 128
        grid_h, grid_w = H // tile_h, W // tile_w
        num_tiles = grid_h * grid_w

        def f(pr):
            mean2d, conic, opacity = pr.mean2d, pr.conic, pr.opacity
            color, depth, radius, valid = pr.color, pr.depth, pr.radius, pr.valid
            KB = max(int(np.ceil(np.log2(max(P, 2)))), 1)
            sort_depth = jnp_.where(valid, depth, jnp_.inf)
            order = jnp_.argsort(sort_depth).astype(jnp_.int32)
            inv_order = jnp_.argsort(order).astype(jnp_.int32)
            if stage == "argsorts":
                return jnp_.sum(order) + jnp_.sum(inv_order)
            min_y, min_x, max_y, max_x = binning.tile_rect_aabb(
                mean2d, radius, pr.radius_xy, grid_h, grid_w, tile_h, tile_w
            )
            n_x = max_x - min_x
            n_tiles = n_x * (max_y - min_y)
            slot = jnp_.arange(B, dtype=jnp_.int32)[None, :]
            n_x_safe = jnp_.maximum(n_x, 1)[:, None]
            ty = min_y[:, None] + slot // n_x_safe
            tx = min_x[:, None] + slot % n_x_safe
            pair_live = valid[:, None] & (slot < jnp_.minimum(n_tiles, B)[:, None])
            tile_id = jnp_.where(pair_live, ty * grid_w + tx, num_tiles)
            key = (tile_id.astype(jnp_.int32) << KB) | inv_order[:, None]
            if stage == "keys":
                return jnp_.sum(key)
            key_sorted = jax.lax.sort(key.reshape(-1))
            if stage == "sort":
                return jnp_.sum(key_sorted[:100])
            pair_budget = 4 * P + 64 * num_tiles
            NPb = min(((pair_budget + align - 1) // align) * align, P * B)
            keys_b = key_sorted[:NPb]
            tiles = jnp_.arange(num_tiles, dtype=jnp_.int32)
            t_start = jnp_.searchsorted(keys_b, tiles << KB, side="left").astype(jnp_.int32)
            t_end = jnp_.searchsorted(keys_b, (tiles + 1) << KB, side="left").astype(jnp_.int32)
            tile_count = t_end - t_start
            padded_counts = ((tile_count + align - 1) // align) * align
            astart = jnp_.concatenate(
                [jnp_.zeros((1,), jnp_.int32), jnp_.cumsum(padded_counts).astype(jnp_.int32)]
            )
            NP2 = ((NPb + align * num_tiles + align - 1) // align) * align
            nb = NP2 // align
            blocks = jnp_.arange(nb, dtype=jnp_.int32)
            astart_b = astart // align
            tob = jnp_.clip(
                jnp_.searchsorted(astart_b[1:], blocks, side="right").astype(jnp_.int32),
                0, num_tiles - 1,
            )
            in_tail_b = blocks >= astart_b[num_tiles]
            block_off = blocks * align - astart[tob]
            lane = jnp_.arange(align, dtype=jnp_.int32)[None, :]
            off = block_off[:, None] + lane
            in_range = (~in_tail_b[:, None]) & (off < tile_count[tob][:, None])
            in_range = in_range.reshape(NP2)
            src_idx = jnp_.clip(t_start[tob][:, None] + off, 0, NPb - 1).reshape(NP2)
            if stage == "ranges":
                return jnp_.sum(src_idx) + jnp_.sum(in_range)
            k_rank = keys_b & ((1 << KB) - 1)
            k_aligned = jnp_.minimum(k_rank[src_idx], P - 1)
            if stage == "intgather":
                return jnp_.sum(k_aligned)
            zeros6 = jnp_.zeros((P, 16 - 10), mean2d.dtype)
            src16 = jnp_.concatenate(
                [mean2d, conic, opacity[:, None], color, depth[:, None], zeros6], axis=1
            )
            src_depth = src16[order]
            if stage == "prowgather":
                return jnp_.sum(src_depth)
            rows = src_depth[k_aligned]
            if stage == "rowgather":
                return jnp_.sum(rows)
            ox = ((tob % grid_w) * tile_w).astype(rows.dtype)
            oy = ((tob // grid_w) * tile_h).astype(rows.dtype)
            shift = jnp_.stack([ox, oy], axis=1)[:, None, :]
            local01 = (rows[:, 0:2].reshape(nb, align, 2) - shift).reshape(NP2, 2)
            vcol = in_range.astype(rows.dtype)[:, None]
            rows = jnp_.concatenate(
                [local01, rows[:, 2:10], vcol, rows[:, 11:16]], axis=1
            )
            rows = jnp_.where(in_range[:, None], rows, 0.0)
            return jnp_.sum(rows)

        return jax.jit(f)

    for stage in ["argsorts", "keys", "sort", "ranges", "intgather",
                  "prowgather", "rowgather", "full"]:
        fn = partial_build(stage)
        dt = queued_time(fn, proj, n=10)
        print(f"{stage:12s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    import sys as _sys
    if "--sub" in _sys.argv:
        substages()
        raise SystemExit
    if "--sub2" in _sys.argv:
        substages2()
        raise SystemExit
    main()
