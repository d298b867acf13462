"""Real spherical-harmonics evaluation for Gaussian view-dependent color.

Degree 0..4 evaluation with the standard real-SH constants, matching the
semantics of the reference CUDA evaluator
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-71)
and the python helper (/root/reference/utils/sh_utils.py): colors are
``eval_sh(deg, sh, dir) + 0.5`` clamped to >= 0.

All functions are pure jnp and differentiable; XLA fuses them into the
surrounding projection/rasterization computation.
"""
from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def rgb_to_sh(rgb):
    """Convert an RGB albedo in [0,1] into the degree-0 SH coefficient."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh):
    """Inverse of :func:`rgb_to_sh`."""
    return sh * SH_C0 + 0.5


def eval_sh(deg: int, sh, dirs):
    """Evaluate real SH at unit directions.

    Args:
      deg: static int in [0, 4]; only the first ``(deg+1)**2`` coefficients are used.
      sh: (..., K, C) coefficients with K >= (deg+1)**2 (channel-last layout).
      dirs: (..., 3) unit directions.

    Returns:
      (..., C) the SH-weighted sum (no +0.5 offset, no clamping).
    """
    if not 0 <= deg <= 4:
        raise ValueError(f"SH degree must be in [0,4], got {deg}")
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - SH_C1 * y * sh[..., 1, :]
            + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
                if deg > 3:
                    result = (
                        result
                        + SH_C4[0] * xy * (xx - yy) * sh[..., 16, :]
                        + SH_C4[1] * yz * (3.0 * xx - yy) * sh[..., 17, :]
                        + SH_C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18, :]
                        + SH_C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19, :]
                        + SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20, :]
                        + SH_C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21, :]
                        + SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22, :]
                        + SH_C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23, :]
                        + SH_C4[8]
                        * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy))
                        * sh[..., 24, :]
                    )
    return result


def sh_to_color(deg: int, sh, means3d, campos):
    """SH -> clamped RGB as the rasterizer preprocess does.

    dir = normalize(mean - campos); color = max(eval_sh + 0.5, 0).
    Mirrors computeColorFromSH (reference forward.cu:20-71) including the
    clamp whose mask gates the backward (handled automatically by autodiff
    through ``maximum``).
    """
    dirs = means3d - campos
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    rgb = eval_sh(deg, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def degree_coeff_mask(active_deg, n_coeffs: int):
    """(n_coeffs, 1) f32 mask of the coefficients live at a TRACED degree.

    Coefficient k is active iff k < (active_deg + 1)^2. Multiplying the SH
    coefficients by this mask before a full-degree eval_sh is exactly
    equivalent to eval_sh(active_deg, ...): inactive coefficients contribute
    zero forward (they are zero-initialized and receive masked gradients, so
    they stay zero while inactive — the reference's oneupSHdegree warmup
    semantics) — but the degree is a runtime value, so the train step
    compiles ONCE instead of once per warmup stage.
    """
    n_live = (active_deg + 1) * (active_deg + 1)
    return (jnp.arange(n_coeffs) < n_live).astype(jnp.float32)[:, None]
