"""Gaussian preprocess: 3D -> 2D projection, EWA covariance, conic/radius/culling.

Pure-jnp re-derivation of the per-Gaussian preprocess stage of the reference
CUDA rasterizer (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:154-256 and auxiliary.h:139-164):

  * near culling at view z <= 0.2
  * perspective projection with the +1e-7 w-guard
  * EWA 2D covariance cov2d = J U Sigma U^T J^T with the 1.3*tan_fov frustum
    clamp on the view-space point and the +0.3 low-pass on the diagonal
  * conic = inverse cov2d; screen radius = ceil(3 sqrt(max eigenvalue))
  * ndc2Pix pixel mapping ((v+1)*S - 1)/2

This runs fully vectorized over all P Gaussians (VPU-friendly elementwise math;
XLA fuses it). The rasterizer consumes the returned `Projected` struct; both the
jnp oracle (ops/rasterize_ref.py) and the Pallas kernel (ops/rasterize_tpu.py)
share it, so their numerical contract is identical by construction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NEAR_Z = 0.2  # reference auxiliary.h:151 in_frustum near plane
LOWPASS = 0.3  # reference forward.cu:110-111 dilation of the 2D covariance


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all (P,...) arrays)."""

    mean2d: jnp.ndarray    # (P, 2) pixel coords
    depth: jnp.ndarray     # (P,) view-space z
    conic: jnp.ndarray     # (P, 3) inverse 2D covariance [a, b, c] for [[a,b],[b,c]]
    radius: jnp.ndarray    # (P,) int32 screen radius (0 for culled)
    color: jnp.ndarray     # (P, C) per-view RGB (SH already evaluated) or features
    opacity: jnp.ndarray   # (P,) sigmoid-activated opacity
    valid: jnp.ndarray     # (P,) bool: survives culling
    # (P, 2) optional tighter per-axis AABB extents (x, y) for tile binning.
    # 3.4*sqrt(diag cov2d), capped by `radius`: pixels beyond 3.4 sigma on
    # either axis have alpha < 1/255 even at opacity 1, so the blend skips
    # them — AABB-culled tiles contribute exactly 0 (output-identical to the
    # reference's square 3*sqrt(lambda_max) rect, just fewer dead pairs).
    radius_xy: jnp.ndarray = None


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(means3d, world_view, full_proj):
    """World points -> (view_z, ndc xyz). Row-vector convention (camera.py).

    Component form: [x y z 1] @ M columns as full-width (P,) FMAs (the
    (P, 4) @ (4, 4) form wastes the MXU/vreg lanes at these shapes).
    """
    mx, my, mz = means3d[..., 0], means3d[..., 1], means3d[..., 2]

    def col(M, j):
        return mx * M[0, j] + my * M[1, j] + mz * M[2, j] + M[3, j]

    view_z = col(world_view, 2)
    p_w = 1.0 / (col(full_proj, 3) + 1e-7)
    p_proj = jnp.stack(
        [col(full_proj, 0) * p_w, col(full_proj, 1) * p_w, col(full_proj, 2) * p_w],
        axis=-1,
    )
    return view_z, p_proj


def ewa_cov2d(means3d, cov3d_packed, world_view, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA splatting 2D covariance (reference forward.cu:74-113).

    Returns (P, 3) packed [xx, xy, yy] including the +0.3 low-pass.
    """
    U = world_view[:3, :3].T  # math world->view rotation (x_view = U x_world)
    mx_, my_, mz_ = means3d[..., 0], means3d[..., 1], means3d[..., 2]

    def col(j):
        return (mx_ * world_view[0, j] + my_ * world_view[1, j]
                + mz_ * world_view[2, j] + world_view[3, j])

    t0, t1, tz = col(0), col(1), col(2)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t0 / tz, -limx, limx) * tz
    ty = jnp.clip(t1 / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J: 2x3 Jacobian of perspective projection at the clamped view point.
    # All contractions in component form: batched (P, 2, 3) matmuls lower to
    # minor-dim-3 vector ops on TPU; (P,) component math is full-width.
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    # M = J @ U with U a constant 3x3 (J rows are [j00, 0, j02], [0, j11, j12])
    u00, u01, u02 = U[0, 0], U[0, 1], U[0, 2]
    u10, u11, u12 = U[1, 0], U[1, 1], U[1, 2]
    u20, u21, u22 = U[2, 0], U[2, 1], U[2, 2]
    m00 = j00 * u00 + j02 * u20
    m01 = j00 * u01 + j02 * u21
    m02 = j00 * u02 + j02 * u22
    m10 = j11 * u10 + j12 * u20
    m11 = j11 * u11 + j12 * u21
    m12 = j11 * u12 + j12 * u22

    # cov2d = M Sigma M^T on the packed-6 Sigma
    s00, s01, s02, s11, s12, s22 = (cov3d_packed[..., i] for i in range(6))
    v00 = m00 * s00 + m01 * s01 + m02 * s02
    v01 = m00 * s01 + m01 * s11 + m02 * s12
    v02 = m00 * s02 + m01 * s12 + m02 * s22
    v10 = m10 * s00 + m11 * s01 + m12 * s02
    v11 = m10 * s01 + m11 * s11 + m12 * s12
    v12 = m10 * s02 + m11 * s12 + m12 * s22
    xx = v00 * m00 + v01 * m01 + v02 * m02 + LOWPASS
    xy = v00 * m10 + v01 * m11 + v02 * m12
    yy = v10 * m10 + v11 * m11 + v12 * m12 + LOWPASS
    return jnp.stack([xx, xy, yy], axis=-1)


def conic_and_radius(cov2d):
    """Invert 2D covariance; screen radius from eigenvalues (forward.cu:218-232).

    Returns (conic (P,3), radius (P,) float, det (P,)).
    """
    xx, xy, yy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = xx * yy - xy * xy
    det_inv = 1.0 / jnp.where(det != 0.0, det, 1.0)
    conic = jnp.stack([yy * det_inv, -xy * det_inv, xx * det_inv], axis=-1)
    mid = 0.5 * (xx + yy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, mid - disc)))
    return conic, radius, det


def mark_visible(means3d, world_view, full_proj):
    """(P,) bool frustum visibility (reference markVisible,
    rasterizer_impl.cu:141-153 / auxiliary.h:139-152: near-plane-only check
    prefiltering before training on a view)."""
    depth, _ = project_points(means3d, world_view, full_proj)
    return depth > NEAR_Z


def preprocess(
    means3d,
    cov3d_packed,
    color,
    opacity,
    camera,
    valid_mask=None,
) -> Projected:
    """Full per-Gaussian preprocess (culling + projection + conic).

    `color` is the already-evaluated per-view RGB (use ops.sh.sh_to_color) or
    any per-Gaussian feature vector; `opacity` is (P,) or (P,1) activated.
    `valid_mask` optionally marks capacity-padding slots dead (static-shape
    densification, see models/gaussians.py).
    """
    opacity = opacity.reshape(opacity.shape[0])
    depth, p_proj = project_points(means3d, camera.world_view, camera.full_proj)
    cov2d = ewa_cov2d(
        means3d, cov3d_packed, camera.world_view,
        camera.focal_x, camera.focal_y, camera.tan_fovx, camera.tan_fovy,
    )
    conic, radius, det = conic_and_radius(cov2d)
    mean2d = jnp.stack(
        [ndc2pix(p_proj[..., 0], camera.width), ndc2pix(p_proj[..., 1], camera.height)],
        axis=-1,
    )
    valid = (depth > NEAR_Z) & (det > 0.0)
    if valid_mask is not None:
        valid = valid & valid_mask
    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    # AABB extents, opacity-adaptive: the blend skips alpha = op*exp(-q)
    # < 1/255 (ALPHA_MIN, forward.cu:341-349), and alpha can only reach
    # 1/255 inside the ellipse q <= ln(255*op), whose bounding box
    # half-extent along an axis is sqrt(2 ln(255*op)) * sigma_axis. Clamped
    # to 3.4 (exp(-0.5*3.4^2) = 3.1e-3 < 1/255: the opacity-blind bound for
    # op ~ 1), with the same q-space margin (1e-3) the binning peak-alpha
    # cull uses, so the box always encloses every pixel the blend can accept
    # — output-bit-identical to the reference's opacity-blind square rect
    # (forward.cu:229-232), but low-opacity splats get much smaller rects
    # BEFORE pair expansion, cutting every downstream cost that scales with
    # pair count. op <= 1/255 gives extent 0: the splat contributes nowhere
    # and tile_rect_aabb drops it entirely.
    nsig = jnp.sqrt(jnp.maximum(
        2.0 * (jnp.log(jnp.maximum(opacity, 1e-12) * 255.0) + 1e-3), 0.0))
    nsig = jnp.minimum(nsig, 3.4)
    ext = jnp.ceil(nsig[:, None] * jnp.sqrt(jnp.maximum(cov2d[..., (0, 2)], 0.0)))
    radius_xy = jnp.minimum(ext, radius[:, None].astype(ext.dtype)).astype(jnp.int32)
    return Projected(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        color=color,
        opacity=opacity,
        valid=valid & (radius > 0),
        radius_xy=radius_xy,
    )
