"""Combined training loss (train_ZJU.py:108-131 semantics).

loss = L1(bound) + 0.5*mask_L2 + 0.2*(1-SSIM) + 0.5*LPIPS + 0.06*FisherNLL
       + 0.3*S3IM

Differences from the reference forced by static shapes (documented, not
hidden): the reference crops to the exact per-frame cv2.boundingRect of the
bound mask before SSIM/LPIPS/S3IM (train_ZJU.py:115-117); XLA needs a static
crop, so frames carry a fixed-size crop window (data pipeline precomputes the
per-frame top-left so the whole bound rect fits). The window may contain a few
more true-background pixels than the exact rect — both images see the same
pixels, so the metrics stay well-defined; only the averaging region differs
slightly.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lpips_jax
from ..ops.fisher import matrix_fisher_nll
from ..ops.ssim import s3im as s3im_fn
from ..ops.ssim import ssim as ssim_fn


class LossWeights(NamedTuple):
    l1: float = 1.0
    mask: float = 0.5
    ssim: float = 0.2
    lpips: float = 0.5
    nll: float = 0.06
    s3im: float = 0.3


def crop_window(img, y0, x0, crop_h: int, crop_w: int):
    """Dynamic-start static-size crop; img (H, W, C) or (H, W)."""
    if img.ndim == 2:
        return jax.lax.dynamic_slice(img, (y0, x0), (crop_h, crop_w))
    return jax.lax.dynamic_slice(
        img, (y0, x0, 0), (crop_h, crop_w, img.shape[-1])
    )


def compute_losses(
    render_out: Dict,
    gt_image,            # (H, W, 3)
    bkgd_mask,           # (H, W) soft alpha target
    bound_mask,          # (H, W) 0/1 region of interest
    target_pose_rotmats, # (23, 3, 3) dataset pose rotations
    crop_y0,
    crop_x0,
    crop_h: int,
    crop_w: int,
    lpips_params=None,
    weights: LossWeights = LossWeights(),
    gt_lpips_feats=None,
):
    img = render_out["render"]
    alpha = render_out["render_alpha"]

    bound = bound_mask.astype(img.dtype)
    n_bound = jnp.sum(bound) + 1e-8

    l1 = jnp.sum(jnp.abs(img - gt_image) * bound[..., None]) / (3.0 * n_bound)
    mask_l2 = jnp.sum(((alpha - bkgd_mask) ** 2) * bound) / n_bound

    img_c = crop_window(img, crop_y0, crop_x0, crop_h, crop_w)
    gt_c = crop_window(gt_image, crop_y0, crop_x0, crop_h, crop_w)
    ssim_val = ssim_fn(img_c, gt_c)
    s3im_loss = s3im_fn(img_c, gt_c)

    if weights.lpips != 0.0:
        if lpips_params is None:
            lpips_params = lpips_jax.get_default_params()
        # bf16 activations in the TRAINING loss only (eval metrics stay f32):
        # v5e convs already run f32 inputs at bf16 MXU precision, so this
        # halves HBM traffic of the memory-bound VGG stages without changing
        # compute precision class (see lpips_jax.lpips docstring; tolerance
        # test in tests/test_losses_parity.py).
        # gt_lpips_feats: precomputed gt tower (lpips_jax.gt_features) staged
        # once per frame by the Trainer — the gt image is constant across the
        # run, so its VGG forward need not be recomputed every step
        lpips_loss = lpips_jax.lpips(
            lpips_params, img_c, gt_c, dtype=jnp.bfloat16,
            cached_f2=gt_lpips_feats,
        )
    else:
        # weights.lpips is a static python float: gate at trace time so a
        # w_lpips=0 config doesn't pay both VGG towers fwd+bwd (~7.5 ms/step,
        # the single largest loss-term cost) multiplied by zero
        lpips_loss = jnp.zeros(())

    pose_out = render_out.get("pose_out")
    if pose_out is not None:
        nll = jnp.mean(matrix_fisher_nll(pose_out["Rs"], target_pose_rotmats))
    else:
        nll = jnp.zeros(())

    total = (
        weights.l1 * l1
        + weights.mask * mask_l2
        + weights.ssim * (1.0 - ssim_val)
        + weights.lpips * lpips_loss
        + weights.nll * nll
        + weights.s3im * s3im_loss
    )
    return total, {
        "loss": total,
        "l1": l1,
        "mask": mask_l2,
        "ssim": ssim_val,
        "lpips": lpips_loss,
        "nll": nll,
        "s3im": s3im_loss,
    }
