"""Piecewise timing of build_pair_rows (ops/binning.py) on the real TPU.

Times jitted PREFIXES of the pair-build pipeline (each returns a scalar sum
so nothing is dead-code-eliminated); stage costs are prefix differences.
Mirrors the stage structure of build_pair_rows — keep in sync when editing.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_build.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, n: int = 20):
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
    from moss_tpu.ops import binning as bn
    from moss_tpu.render.camera import Camera

    H = W = 512
    P = 46080
    tile_h, tile_w = 8, 128
    rng = np.random.default_rng(0)
    K = np.array([[550.0, 0, W / 2], [0, 550.0, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
    means = np.stack(
        [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P),
         rng.uniform(1.5, 2.5, P)], -1,
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

    grid_h = -(-H // tile_h)
    grid_w = -(-W // tile_w)
    num_tiles = grid_h * grid_w
    B = 16
    align = 128
    KB = max(int(np.ceil(np.log2(max(P, 2)))), 1)

    mean2d, conic, opacity = proj.mean2d, proj.conic, proj.opacity
    color, depth = proj.color, proj.depth
    radius, valid, radius_xy = proj.radius, proj.valid, proj.radius_xy

    def stage_sort(_):
        sort_depth = jnp.where(valid, depth, jnp.inf)
        order = jnp.argsort(sort_depth).astype(jnp.int32)
        inv_order = jnp.argsort(order).astype(jnp.int32)
        return order, inv_order

    def stage_rect_cull(order, inv_order):
        min_y, min_x, max_y, max_x = bn.tile_rect_aabb(
            mean2d, radius, radius_xy, grid_h, grid_w, tile_h, tile_w)
        n_x = max_x - min_x
        n_tiles = n_x * (max_y - min_y)
        slot = jnp.arange(B, dtype=jnp.int32)[None, :]
        n_x_safe = jnp.maximum(n_x, 1)[:, None]
        ty = min_y[:, None] + slot // n_x_safe
        tx = min_x[:, None] + slot % n_x_safe
        pair_live = valid[:, None] & (slot < jnp.minimum(n_tiles, B)[:, None])
        f32 = mean2d.dtype
        ca, cb, cc = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
        mx, my = mean2d[:, 0:1], mean2d[:, 1:2]
        dx0 = tx.astype(f32) * tile_w - mx
        dx1 = dx0 + (tile_w - 1)
        dy0 = ty.astype(f32) * tile_h - my
        dy1 = dy0 + (tile_h - 1)

        def q(dx_, dy_):
            return 0.5 * (ca * dx_ * dx_ + cc * dy_ * dy_) + cb * dx_ * dy_

        a_safe = jnp.maximum(ca, 1e-12)
        c_safe = jnp.maximum(cc, 1e-12)
        qmin = jnp.minimum(
            jnp.minimum(q(dx0, jnp.clip(-cb * dx0 / c_safe, dy0, dy1)),
                        q(dx1, jnp.clip(-cb * dx1 / c_safe, dy0, dy1))),
            jnp.minimum(q(jnp.clip(-cb * dy0 / a_safe, dx0, dx1), dy0),
                        q(jnp.clip(-cb * dy1 / a_safe, dx0, dx1), dy1)),
        )
        inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)
        qmin = jnp.where(inside, 0.0, qmin)
        qcap = jnp.log(jnp.maximum(opacity[:, None], 1e-12) * 255.0) + 1e-3
        pair_live = pair_live & (qmin <= qcap)
        tile_id = jnp.where(pair_live, ty * grid_w + tx, num_tiles)
        key = (tile_id.astype(jnp.int32) << KB) | inv_order[:, None]
        return key

    def stage_keysort(key):
        return jax.lax.sort(key.reshape(-1))

    NPb = min(((4 * P + 64 * num_tiles + align - 1) // align) * align, P * B)

    def stage_ranges(key_sorted):
        keys_b = key_sorted[:NPb]
        tiles = jnp.arange(num_tiles, dtype=jnp.int32)
        t_start = jnp.searchsorted(keys_b, tiles << KB, side="left").astype(jnp.int32)
        t_end = jnp.searchsorted(keys_b, (tiles + 1) << KB, side="left").astype(jnp.int32)
        return keys_b, t_start, t_end - t_start

    NP2 = ((NPb + align * num_tiles + align - 1) // align) * align
    nb = NP2 // align

    def stage_kaligned(keys_b, t_start, tile_count):
        padded_counts = ((tile_count + align - 1) // align) * align
        astart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)])
        blocks = jnp.arange(nb, dtype=jnp.int32)
        astart_b = astart // align
        tob = jnp.clip(jnp.searchsorted(astart_b[1:], blocks, side="right").astype(jnp.int32),
                       0, num_tiles - 1)
        in_tail_b = blocks >= astart_b[num_tiles]
        block_off = blocks * align - astart[tob]
        lane = jnp.arange(align, dtype=jnp.int32)[None, :]
        off = block_off[:, None] + lane
        in_range = ((~in_tail_b[:, None]) & (off < tile_count[tob][:, None])).reshape(NP2)
        k_rank = keys_b & ((1 << KB) - 1)
        s_d = jnp.clip(t_start[tob] + block_off, 0, NPb - 1)
        KR = 16
        kr_rows = k_rank.reshape(NPb // KR, KR)
        base = s_d // KR
        nrow = align // KR + 1
        row_idx = jnp.clip(base[:, None] + jnp.arange(nrow, dtype=jnp.int32)[None, :],
                           0, NPb // KR - 1)
        cand = kr_rows[row_idx.reshape(-1)].reshape(nb, nrow * KR)
        r = (s_d - base * KR)[:, None]
        out = jnp.zeros((nb, align), jnp.int32)
        for r0 in range(KR):
            out = out + jnp.where(r == r0, cand[:, r0:r0 + align], 0)
        k_aligned = jnp.minimum(out.reshape(NP2), P - 1)
        return k_aligned, in_range, tob

    def stage_rowgather(order, k_aligned):
        zeros6 = jnp.zeros((P, 16 - 10), mean2d.dtype)
        src16 = jnp.concatenate(
            [mean2d, conic, opacity[:, None], color, depth[:, None], zeros6], axis=1)
        src_depth = src16[order]
        return src_depth[k_aligned]

    def stage_finish(rows, in_range, tob):
        geomT = rows.T
        ox = ((tob % grid_w) * tile_w).astype(geomT.dtype)
        oy = ((tob // grid_w) * tile_h).astype(geomT.dtype)
        oxe = jnp.broadcast_to(ox[:, None], (nb, align)).reshape(1, NP2)
        oye = jnp.broadcast_to(oy[:, None], (nb, align)).reshape(1, NP2)
        live = in_range.astype(geomT.dtype)[None, :]
        geomT = jnp.concatenate(
            [geomT[0:1] - oxe, geomT[1:2] - oye, geomT[2:10], live,
             geomT[11:16]], axis=0)
        return jnp.where(live > 0, geomT, 0.0)

    # jitted prefixes
    def p1(x):
        o, i = stage_sort(x)
        return jnp.sum(o + i).astype(jnp.float32)

    def p2(x):
        o, i = stage_sort(x)
        return jnp.sum(stage_rect_cull(o, i)).astype(jnp.float32)

    def p3(x):
        o, i = stage_sort(x)
        return jnp.sum(stage_keysort(stage_rect_cull(o, i))).astype(jnp.float32)

    def p4(x):
        o, i = stage_sort(x)
        kb, ts, tc = stage_ranges(stage_keysort(stage_rect_cull(o, i)))
        return (jnp.sum(ts + tc) + jnp.sum(kb)).astype(jnp.float32)

    def p5(x):
        o, i = stage_sort(x)
        kb, ts, tc = stage_ranges(stage_keysort(stage_rect_cull(o, i)))
        ka, ir, tob = stage_kaligned(kb, ts, tc)
        return (jnp.sum(ka) + jnp.sum(ir) + jnp.sum(tob)).astype(jnp.float32)

    def p6(x):
        o, i = stage_sort(x)
        kb, ts, tc = stage_ranges(stage_keysort(stage_rect_cull(o, i)))
        ka, ir, tob = stage_kaligned(kb, ts, tc)
        return jnp.sum(stage_rowgather(o, ka))

    def p7(x):
        o, i = stage_sort(x)
        kb, ts, tc = stage_ranges(stage_keysort(stage_rect_cull(o, i)))
        ka, ir, tob = stage_kaligned(kb, ts, tc)
        return jnp.sum(stage_finish(stage_rowgather(o, ka), ir, tob))

    names = ["sort(depth)+inv", "rect+cull+keys", "key sort", "ranges",
             "k_aligned", "row gather", "finish"]
    prev = 0.0
    x0 = jnp.zeros(())
    for name, fn in zip(names, [p1, p2, p3, p4, p5, p6, p7]):
        dt = queued_time(jax.jit(fn), x0)
        print(f"{name:18s} prefix {dt*1e3:7.3f} ms   stage {max(dt-prev,0)*1e3:7.3f} ms")
        prev = dt

    # full build fwd + bwd via the real entry
    def full(m2d):
        plx = bn.build_pair_rows(
            m2d, conic, opacity, color, depth, radius, valid,
            H, W, tile_h, tile_w, radius_xy=radius_xy)
        return jnp.sum(plx.rows)

    dt = queued_time(jax.jit(full), mean2d)
    print(f"{'FULL build fwd':18s}        {dt*1e3:7.3f} ms")
    gfull = jax.jit(jax.grad(lambda m: full(m)))
    dt2 = queued_time(lambda m: jnp.sum(gfull(m)), mean2d)
    print(f"{'FULL build f+b':18s}        {dt2*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
