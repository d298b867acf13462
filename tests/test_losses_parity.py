"""SSIM / S3IM parity vs an independent torch implementation.

The reference computes SSIM with an 11x11 gaussian window (sigma 1.5) as a
per-channel SAME-padded depthwise conv (/root/reference/utils/loss_utils.py:
47-87), and its S3IM with batch size 1 degenerates to SSIM over the image
with each pixel repeated 10x along width (loss_utils.py:17-38; see
moss_tpu/ops/ssim.py module docstring). Our implementation uses shift-add
separable blurs — these tests pin it against a straightforward torch conv2d
formulation of the same math.
"""
from __future__ import annotations

import numpy as np
import pytest


def _torch_ssim(img1, img2):
    """Standard SSIM, 11x11 gaussian window sigma=1.5, depthwise SAME conv."""
    import torch
    import torch.nn.functional as F

    win = 11
    sigma = 1.5
    xs = np.arange(win) - win // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    k2d = np.outer(g, g)

    def to_t(x):  # (H, W, C) -> (1, C, H, W)
        return torch.from_numpy(np.ascontiguousarray(x.transpose(2, 0, 1))[None])

    a, b = to_t(img1), to_t(img2)
    C = a.shape[1]
    w = torch.from_numpy(np.broadcast_to(k2d, (C, 1, win, win)).copy())

    def filt(x):
        return F.conv2d(x, w, padding=win // 2, groups=C)

    mu1, mu2 = filt(a), filt(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(a * a) - mu1_sq
    s2 = filt(b * b) - mu2_sq
    s12 = filt(a * b) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return float(m.mean())


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(7)
    a = rng.uniform(size=(48, 56, 3)).astype(np.float32)
    # correlated pair so SSIM is in a non-degenerate range
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    return a, b


def test_ssim_matches_torch(imgs):
    import jax.numpy as jnp

    from moss_tpu.ops.ssim import ssim

    a, b = imgs
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)
    assert abs(ours - ref) < 2e-6, (ours, ref)


def test_s3im_matches_torch_repeat(imgs):
    import jax.numpy as jnp

    from moss_tpu.ops.ssim import s3im

    a, b = imgs
    ours = float(s3im(jnp.asarray(a), jnp.asarray(b)))
    ref = 1.0 - _torch_ssim(np.repeat(a, 10, axis=1), np.repeat(b, 10, axis=1))
    assert abs(ours - ref) < 2e-6, (ours, ref)


def test_ssim_gradient_finite(imgs):
    import jax
    import jax.numpy as jnp

    from moss_tpu.ops.ssim import ssim

    a, b = imgs
    g = jax.grad(lambda x: ssim(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(g)))


def test_lpips_bf16_close_to_f32():
    """The training loss runs the VGG towers in bf16 (losses.py); the metric
    path stays f32. The two must agree to ~1% so the loss-term gradient
    direction is preserved."""
    import jax.numpy as jnp
    import numpy as np
    from moss_tpu.ops import lpips_jax

    rng = np.random.default_rng(7)
    p = lpips_jax.get_default_params()
    a = jnp.asarray(rng.random((96, 96, 3)).astype(np.float32))
    b = jnp.clip(a + 0.1 * jnp.asarray(rng.random((96, 96, 3)).astype(np.float32)), 0, 1)
    f32 = float(lpips_jax.lpips(p, a, b))
    bf16 = float(lpips_jax.lpips(p, a, b, dtype=jnp.bfloat16))
    assert f32 > 0
    assert abs(bf16 - f32) / f32 < 2e-2, (f32, bf16)


def test_lpips_cached_gt_tower_exact():
    """lpips(cached_f2=gt_features(gt)) must equal the inline two-tower form
    bit-for-bit (the gt tower is the same computation, just hoisted)."""
    import jax.numpy as jnp
    import numpy as np
    from moss_tpu.ops import lpips_jax

    rng = np.random.default_rng(11)
    p = lpips_jax.get_default_params()
    a = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    inline = float(lpips_jax.lpips(p, a, b, dtype=jnp.bfloat16))
    feats = lpips_jax.gt_features(p, b, dtype=jnp.bfloat16)
    cached = float(lpips_jax.lpips(p, a, dtype=jnp.bfloat16, cached_f2=feats))
    assert inline == cached, (inline, cached)


def test_trainer_gt_lpips_cache_step_parity():
    """One fused-dispatch step with the staged gt-feature cache must produce
    the same loss as the uncached step (identical math, hoisted gt tower)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.train.trainer import Trainer
    from moss_tpu.train.train_step import make_train_many

    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48))
    feats = tr._stage_gt_lpips_feats()
    assert feats is not None and feats[0].shape[0] == 2

    from moss_tpu.parallel.sharded import stack_frames

    stacked = stack_frames(frames)
    many = make_train_many(tr.step_fn)
    order = jnp.asarray([0, 1], jnp.int32)
    _, logs_cached = many(tr.ts, stacked, order, 1, feats)
    _, logs_plain = many(tr.ts, stacked, order, 1, None)
    np.testing.assert_allclose(
        float(logs_cached["lpips"]), float(logs_plain["lpips"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(logs_cached["loss"]), float(logs_plain["loss"]), rtol=1e-6
    )
