"""SSIM / S3IM / PSNR in pure jnp (XLA convs on the MXU).

Mirrors /root/reference/utils/loss_utils.py:17-87 and utils/image_utils.py:
  * ssim: 11x11 gaussian window (sigma 1.5), per-channel depthwise conv,
    SAME padding, C1=0.01^2, C2=0.03^2.
  * s3im: the reference's S3IM as *actually executed* with batch size 1 —
    torch.randperm(len(tar_vec)) permutes a length-1 batch axis
    (loss_utils.py:30), so no stochastic shuffle ever happens and the op
    reduces to SSIM over the image with every pixel repeated 10x along width
    (the reshape at :35-36 interleaves the repeats per pixel). We reproduce
    that deterministic behavior exactly rather than the paper's intent.
  * psnr over [0,1] images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_SIZE = 11
SIGMA = 1.5
C1 = 0.01**2
C2 = 0.03**2


def _gaussian_1d():
    xs = np.arange(WINDOW_SIZE) - WINDOW_SIZE // 2
    g = np.exp(-(xs**2) / (2 * SIGMA**2))
    return (g / g.sum()).astype(np.float32)


_G1D = _gaussian_1d()


def _blur_axis(x, axis: int):
    """SAME-padded 11-tap gaussian blur along `axis` as shift-adds."""
    r = WINDOW_SIZE // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    acc = None
    for k in range(WINDOW_SIZE):
        term = float(_G1D[k]) * jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
        acc = term if acc is None else acc + term
    return acc


def _filter(img):
    """Separable 11-tap gaussian blur as 2x11 shifted adds (pure VPU).

    A depthwise 11x11 conv lowers catastrophically on TPU (~46 ms fwd+bwd at
    256^2 measured). Banded MXU matmuls are exact but O(W^2) — fine at 512
    but 28 ms fwd+bwd inside s3im's 10x-repeated 5120-wide images. Shift-adds
    are exact f32 and O(W * window). img: (H, W, C) -> (H, W, C)."""
    return _blur_axis(_blur_axis(img, 0), 1)


def ssim(img1, img2):
    """Mean SSIM. Images (H, W, C) in [0, 1]."""
    mu1 = _filter(img1)
    mu2 = _filter(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter(img1 * img1) - mu1_sq
    s2 = _filter(img2 * img2) - mu2_sq
    s12 = _filter(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return jnp.mean(ssim_map)


def _filter_rep(x, repeat: int):
    """Gaussian blur of the `repeat`x column-repeated image, phase-major.

    (H, W, C) -> (repeat, H, W, C) with out[p, h, t] == _filter(rep(x))[h,
    repeat*t + p]. Because WINDOW_SIZE <= repeat + 1, the 11-tap window over
    the repeated signal spans at most TWO distinct source columns, so each
    phase is a 2-tap combination of the H-blurred original — the W-axis blur
    never touches the repeat-width image (110 taps -> 20)."""
    r = WINDOW_SIZE // 2
    u = _blur_axis(x, 0)
    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
    um1, u0, up1 = up[:, :-2], up[:, 1:-1], up[:, 2:]
    outs = []
    for p in range(repeat):
        # output column j = repeat*t + p reads repeated indices m = j+k-r,
        # k in [0, WINDOW): sources floor(m/repeat) in {t-1, t} for p < r,
        # {t, t+1} for p >= r; zero-padding of u matches SAME-pad clipping.
        if p < r:
            a = float(_G1D[: r - p].sum())
            outs.append(a * um1 + (1.0 - a) * u0)
        else:
            a = float(_G1D[: repeat + r - p].sum())
            outs.append(a * u0 + (1.0 - a) * up1)
    return jnp.stack(outs, 0)


def s3im(img1, img2, repeat: int = 10):
    """The reference's effective S3IM (see module docstring): SSIM over images
    with each pixel repeated `repeat` times along width. Returns the *loss*
    (1 - ssim), matching s3im_fun's return."""
    if WINDOW_SIZE > repeat + 1:
        a = jnp.repeat(img1, repeat, axis=1)
        b = jnp.repeat(img2, repeat, axis=1)
        return 1.0 - ssim(a, b)
    # phase decomposition: rep(x)^2 == rep(x^2), so every filtered field of
    # the repeated pair is a _filter_rep of an original-width image, and the
    # SSIM map mean over (H, repeat*W) equals the mean over (repeat, H, W).
    F = lambda x: _filter_rep(x, repeat)  # noqa: E731
    mu1 = F(img1)
    mu2 = F(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F(img1 * img1) - mu1_sq
    s2 = F(img2 * img2) - mu2_sq
    s12 = F(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return 1.0 - jnp.mean(ssim_map)


def psnr(img1, img2):
    """PSNR per the reference image_utils.psnr (mean over pixels, 20log10(1/rmse))."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)
