"""Predict kernel-chunk counts for lane-packed subtile variants.

The blend kernels do fixed VPU work per (128-pair, 8x128-px) chunk. Packing G
subtiles of width 128/G into the lane dim means each chunk row carries G
independent pairs (one per 32- or 64-lane group), and a supertile (the column
of G subtiles) consumes ceil(max_g count_g / 128) chunks. This script
computes, on the exact bench scene:

  G=1 (current): chunks = sum_t ceil(count_t / 128)
  G=2, 4       : chunks = sum_supertile ceil(max_g count_g / 128)

with the same AABB + exact peak-alpha tile culling as build_pair_rows.

Run (CPU fine): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/subtile_stats.py
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from moss_tpu.ops import transforms as tf
from moss_tpu.ops.projection import preprocess
from moss_tpu.render.camera import Camera

TILE_H = 8


def pair_stats(proj, H, W, tile_w):
    grid_h = -(-H // TILE_H)
    grid_w = -(-W // tile_w)
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    radius = np.asarray(proj.radius)
    rxy = np.asarray(proj.radius_xy)
    opacity = np.asarray(proj.opacity)
    valid = np.asarray(proj.valid)
    x, y = mean2d[:, 0], mean2d[:, 1]

    # reference rect
    r = radius.astype(np.float32)
    min_x = np.clip(np.floor((x - r) / tile_w), 0, grid_w).astype(np.int64)
    max_x = np.clip(np.floor((x + r + tile_w - 1) / tile_w), 0, grid_w).astype(np.int64)
    min_y = np.clip(np.floor((y - r) / TILE_H), 0, grid_h).astype(np.int64)
    max_y = np.clip(np.floor((y + r + TILE_H - 1) / TILE_H), 0, grid_h).astype(np.int64)
    # AABB intersect
    rxf, ryf = rxy[:, 0], rxy[:, 1]
    min_x = np.maximum(min_x, np.clip(np.floor((x - rxf) / tile_w), 0, grid_w).astype(np.int64))
    max_x = np.minimum(max_x, np.clip(np.floor((x + rxf) / tile_w) + 1, 0, grid_w).astype(np.int64))
    min_y = np.maximum(min_y, np.clip(np.floor((y - ryf) / TILE_H), 0, grid_h).astype(np.int64))
    max_y = np.minimum(max_y, np.clip(np.floor((y + ryf) / TILE_H) + 1, 0, grid_h).astype(np.int64))
    empty = (~valid) | (radius <= 0) | (rxf <= 0) | (ryf <= 0)
    max_x = np.where(empty, min_x, np.maximum(max_x, min_x))
    max_y = np.where(empty, min_y, np.maximum(max_y, min_y))

    counts = np.zeros(grid_h * grid_w, np.int64)
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    qcap = np.log(np.maximum(opacity, 1e-12) * 255.0) + 1e-3
    P = mean2d.shape[0]
    total = 0
    for i in range(P):
        if empty[i]:
            continue
        for ty in range(min_y[i], max_y[i]):
            dy0 = ty * TILE_H - y[i]
            dy1 = dy0 + (TILE_H - 1)
            for tx in range(min_x[i], max_x[i]):
                dx0 = tx * tile_w - x[i]
                dx1 = dx0 + (tile_w - 1)
                a_s, c_s = max(ca[i], 1e-12), max(cc[i], 1e-12)

                def q(dx_, dy_):
                    return 0.5 * (ca[i] * dx_ * dx_ + cc[i] * dy_ * dy_) + cb[i] * dx_ * dy_

                if dx0 <= 0 <= dx1 and dy0 <= 0 <= dy1:
                    qmin = 0.0
                else:
                    qmin = min(
                        q(dx0, np.clip(-cb[i] * dx0 / c_s, dy0, dy1)),
                        q(dx1, np.clip(-cb[i] * dx1 / c_s, dy0, dy1)),
                        q(np.clip(-cb[i] * dy0 / a_s, dx0, dx1), dy0),
                        q(np.clip(-cb[i] * dy1 / a_s, dx0, dx1), dy1),
                    )
                if qmin <= qcap[i]:
                    counts[ty * grid_w + tx] += 1
                    total += 1
    return counts.reshape(grid_h, grid_w), total


def main():
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

    base_chunks = None
    for G in (1, 2, 4):
        tile_w = 128 // G
        counts, total = pair_stats(proj, H, W, tile_w)
        gh, gw = counts.shape
        # supertile = G adjacent subtile columns
        sup = counts.reshape(gh, gw // G, G)
        chunks = int(np.ceil(sup.max(axis=2) / 128.0).sum())
        slots = chunks * 128 * G
        if base_chunks is None:
            base_chunks = chunks
        print(
            f"G={G} tile_w={tile_w:3d}: pairs={total:7d} ({total/P:.2f}/splat) "
            f"chunks={chunks:5d} (x{base_chunks/chunks:.2f} vs G=1) "
            f"slot-fill={total/slots*100:.0f}%"
        )


if __name__ == "__main__":
    main()
