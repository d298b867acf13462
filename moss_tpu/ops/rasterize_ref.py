"""Reference (oracle) rasterizer in pure jnp — slow, exact, differentiable.

Implements exactly the per-pixel front-to-back alpha compositing of the
reference CUDA renderer (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:261-383) with its skip/termination rules:

  power = -0.5 (a dx^2 + c dy^2) - b dx dy     (skip if power > 0)
  alpha = min(0.99, opacity * exp(power))      (skip if alpha < 1/255)
  stop when T * (1 - alpha) < 1e-4             (the triggering splat is skipped)
  out_color = sum alpha_i T_i c_i + T_final * bg
  out_alpha = sum alpha_i T_i                  (weight, not 1 - T)
  out_depth = sum alpha_i T_i depth_i

and the reference's *tile-rect* spatial cutoff: a Gaussian only contributes to
pixels whose tile lies inside its screen rect (auxiliary.h getRect) — so the
oracle is parameterized by (tile_h, tile_w) and reproduces either the
reference's 16x16 tiles or our TPU kernel's tile shape bit-for-bit in
semantics.

The sequential per-pixel recurrence is vectorized with cumulative ops (see the
derivation in ops/rasterize_tpu.py which shares this math inside the Pallas
tile kernel): for chunk-local alphas a_k with skip mask m_k,

  a_hat = a * m
  Ttil_k  = T_in * prod_{j<=k} (1 - a_hat_j)          candidate transmittance
  fired_k = cummax_k( m_k & (Ttil_k < 1e-4) )         termination (inclusive)
  contrib_k = m_k & ~fired_k
  T_before_k = T_in * prod_{j<k} (1 - a_j * contrib_j)

which reproduces the sequential loop exactly (the first fired index is exact,
and everything after it is masked out).

Gradients flow by jax autodiff — this oracle is the ground truth the custom-VJP
Pallas kernel is tested against (SURVEY.md §4).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .binning import tile_rect
from .projection import Projected, preprocess

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _composite_chunk(T_in, done_in, alpha, feat):
    """Vectorized sequential compositing of one depth-ordered chunk.

    T_in: (N,) carry transmittance per pixel.
    done_in: (N,) bool — pixel already hit the T < 1e-4 termination earlier.
    alpha: (K, N) chunk alphas, already masked to 0 where skipped.
    feat: (K, N, F) per-splat features (rgb, depth, 1) to accumulate.
    Returns (T_out (N,), done_out (N,), acc (N, F)).
    """
    one_minus = 1.0 - alpha
    cum = jnp.cumprod(one_minus, axis=0)  # inclusive
    T_incl = T_in[None] * cum
    trigger = (alpha > 0) & (T_incl < T_EPS)
    fired = (jax.lax.cummax(trigger.astype(jnp.int32), axis=0) > 0) | done_in[None]
    contrib = (alpha > 0) & ~fired
    a = jnp.where(contrib, alpha, 0.0)
    # exclusive cumprod of (1 - a)
    cum2 = jnp.cumprod(1.0 - a, axis=0)
    T_excl = T_in[None] * jnp.concatenate([jnp.ones_like(cum2[:1]), cum2[:-1]], axis=0)
    w = a * T_excl  # (K, N)
    acc = jnp.einsum("kn,knf->nf", w, feat)
    T_out = T_in * cum2[-1]
    return T_out, fired[-1], acc


@partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "chunk", "remat"),
)
def rasterize_reference(
    proj: Projected,
    bg_color,
    height: int,
    width: int,
    tile_h: int = 16,
    tile_w: int = 16,
    chunk: int = 128,
    remat: bool = False,
):
    """Rasterize pre-projected Gaussians. Returns dict of (H,W,*) images."""
    P = proj.mean2d.shape[0]
    grid_h = -(-height // tile_h)
    grid_w = -(-width // tile_w)

    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    depth = proj.depth[order]
    opacity = proj.opacity[order]
    radius = proj.radius[order]
    valid = proj.valid[order]

    min_y, min_x, max_y, max_x = tile_rect(mean2d, radius, grid_h, grid_w, tile_h, tile_w)

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    px = px.reshape(-1)
    py = py.reshape(-1)
    pt_y = (py // tile_h).astype(jnp.int32)
    pt_x = (px // tile_w).astype(jnp.int32)
    N = height * width

    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0) if pad else x

    mean2d, conic, color, depth = map(pad0, (mean2d, conic, color, depth))
    opacity = pad0(opacity)
    valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0) if pad else valid
    min_y, min_x = pad0(min_y), pad0(min_x)
    max_y, max_x = pad0(max_y), pad0(max_x)

    def body(carry, inputs):
        T, done = carry
        m2d, con, col, dep, op, val, r0, c0, r1, c1 = inputs
        dx = m2d[:, 0:1] - px[None]  # (K, N)
        dy = m2d[:, 1:2] - py[None]
        a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op[:, None] * jnp.exp(power))
        in_rect = (
            (pt_y[None] >= r0[:, None]) & (pt_y[None] < r1[:, None])
            & (pt_x[None] >= c0[:, None]) & (pt_x[None] < c1[:, None])
        )
        mask = val[:, None] & (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rect
        alpha = jnp.where(mask, alpha, 0.0)
        feat = jnp.concatenate(
            [jnp.broadcast_to(col[:, None, :], (col.shape[0], N, col.shape[1])),
             jnp.broadcast_to(dep[:, None, None], (dep.shape[0], N, 1)),
             jnp.ones((col.shape[0], N, 1), col.dtype)],
            axis=-1,
        )
        T, done, acc = _composite_chunk(T, done, alpha, feat)
        return (T, done), acc

    def reshape_chunks(x):
        return x.reshape(n_chunks, chunk, *x.shape[1:])

    inputs = tuple(
        map(reshape_chunks, (mean2d, conic, color, depth, opacity, valid, min_y, min_x, max_y, max_x))
    )
    T0 = jnp.ones((N,), jnp.float32)
    done0 = jnp.zeros((N,), bool)
    scan_body = jax.checkpoint(body) if remat else body
    (T_final, _), accs = jax.lax.scan(scan_body, (T0, done0), inputs)
    acc = accs.sum(0)  # (N, C+2)

    C = proj.color.shape[-1]
    out_color = acc[:, :C] + T_final[:, None] * bg_color[None, :]
    out_depth = acc[:, C]
    out_alpha = acc[:, C + 1]
    return {
        "color": out_color.reshape(height, width, C),
        "depth": out_depth.reshape(height, width),
        "alpha": out_alpha.reshape(height, width),
        "final_T": T_final.reshape(height, width),
    }


def render_reference(
    means3d,
    cov3d_packed,
    color,
    opacity,
    camera,
    bg_color,
    valid_mask=None,
    tile_h: int = 16,
    tile_w: int = 16,
):
    """preprocess + rasterize in one call (oracle end-to-end forward)."""
    proj = preprocess(means3d, cov3d_packed, color, opacity, camera, valid_mask)
    return rasterize_reference(
        proj, bg_color, camera.height, camera.width, tile_h=tile_h, tile_w=tile_w
    ), proj
