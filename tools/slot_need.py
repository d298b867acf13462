"""Measure the actual slot need (pre-clamp) of build_pair_rows on the bench
scene and the train-shaped scene, for sizing the static slot budget.

Run: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=cpu python tools/slot_need.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from moss_tpu.ops import transforms as tf
from moss_tpu.ops.projection import preprocess
from moss_tpu.ops import binning as bn
from moss_tpu.render.camera import Camera


def need_for(proj, H, W, tile_h, tile_w, G, B=16, align=128):
    sub_w = tile_w // G
    grid_h = -(-H // tile_h)
    grid_w_sup = -(-W // tile_w)
    grid_w = grid_w_sup * G
    num_tiles = grid_h * grid_w
    num_super = grid_h * grid_w_sup
    P = proj.mean2d.shape[0]
    KB = max(int(np.ceil(np.log2(max(P, 2)))), 1)

    mean2d, conic, opacity = proj.mean2d, proj.conic, proj.opacity
    depth, radius, valid = proj.depth, proj.radius, proj.valid
    radius_xy = proj.radius_xy

    sort_depth = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_depth).astype(jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    min_y, min_x, max_y, max_x = bn.tile_rect_aabb(
        mean2d, radius, radius_xy, grid_h, grid_w, tile_h, sub_w)
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
    dx0 = tx.astype(f32) * sub_w - mx
    dx1 = dx0 + (sub_w - 1)
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
    key_sorted = jax.lax.sort(key.reshape(-1))
    NPb = min(((4 * P + 64 * num_tiles + align - 1) // align) * align, P * B)
    keys_b = key_sorted[:NPb]
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = jnp.searchsorted(keys_b, tiles << KB, side="left").astype(jnp.int32)
    t_end = jnp.searchsorted(keys_b, (tiles + 1) << KB, side="left").astype(jnp.int32)
    tile_count = t_end - t_start
    counts_sg = tile_count.reshape(num_super, G)
    n_chunks_s = (jnp.max(counts_sg, axis=1) + align - 1) // align
    need = int(jnp.sum(n_chunks_s) * G * align)
    live = int(jnp.sum(tile_count))
    cur_exact = G * NPb + G * align * num_super
    cur_heur = NPb + NPb // 8 + G * align * num_super
    print(f"G={G}: live={live} NPb={NPb} need={need} "
          f"cur_budget=min({cur_exact},{cur_heur})={min(cur_exact, cur_heur)}")
    return need


def main():
    H = W = 512
    P = 46080
    rng = np.random.default_rng(0)
    K = np.array([[550.0, 0, W / 2], [0, 550.0, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
    means = np.stack(
        [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P),
         rng.uniform(1.5, 2.5, P)], -1).astype(np.float32)
    cov3d = tf.build_covariance(
        jnp.asarray(rng.uniform(0.004, 0.012, (P, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)))
    proj = preprocess(
        jnp.asarray(means), cov3d,
        jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, P).astype(np.float32)), cam)
    print("bench scene (uniform 46k):")
    for G in (1, 2, 4):
        need_for(proj, H, W, 8, 128, G)

    # a 'training-like' cloud: clustered, larger splats, few live
    P2 = 46080
    live_n = 7000
    means2 = np.concatenate([
        np.stack([rng.normal(0, 0.12, live_n), rng.normal(0, 0.3, live_n),
                  rng.uniform(1.8, 2.2, live_n)], -1),
        np.zeros((P2 - live_n, 3)) + [0, 0, 1e6],
    ]).astype(np.float32)
    valid2 = np.arange(P2) < live_n
    cov3d2 = tf.build_covariance(
        jnp.asarray(rng.uniform(0.01, 0.03, (P2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(P2, 4)).astype(np.float32)))
    proj2 = preprocess(
        jnp.asarray(means2), cov3d2,
        jnp.asarray(rng.uniform(size=(P2, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, P2).astype(np.float32)), cam,
        valid_mask=jnp.asarray(valid2))
    print("train-like scene (7k live, fat splats):")
    for G in (1, 2, 4):
        need_for(proj2, H, W, 8, 128, G)


if __name__ == "__main__":
    main()
