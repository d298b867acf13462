"""Stage timing of a full training step on the real TPU.

Decomposes one train iteration at the north-star-ish shape (synthetic scene,
512x512 frame, 46k-capacity cloud, full loss stack with a 512x512 crop) into
render fwd, per-loss-term fwd / fwd+bwd, and the full step (fwd+bwd+adam),
so loss-side regressions are attributable (the rasterizer has its own
profiler, tools/profile_raster.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_train.py
MOSS_PROFILE_SHAPE=1024 validates the MonoCap full-res shape (the reference
trains MonoCap at full resolution, dataset_readers.py:299) — including the
LPIPS im2col HBM transient PERF.md flags as linear in crop pixels.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, n: int = 10):
    v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def main():
    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops import lpips_jax
    from moss_tpu.ops import ssim as ssim_mod
    from moss_tpu.train.trainer import Trainer

    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True

    H = W = int(os.environ.get("MOSS_PROFILE_SHAPE", "512"))
    scene = make_scene(n_verts=6890)
    frames, _ = make_frames(scene, n_frames=2, H=H, W=W, crop=H)
    cfg = Config(model=ModelConfig(sh_degree=3, capacity=46080,
                                   n_init_points=6890))
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(H, W))
    frame = frames[0]

    from moss_tpu.render.render import render_frame

    bg = jnp.zeros(3)

    @jax.jit
    def render_train_fwd(params, valid, fr):
        out = render_frame(
            params["gauss"], valid, params.get("mlps"), scene,
            fr.smpl_params, fr.camera, bg, 3,
            rasterize_fn=tr.rasterize_fn, motion_offset=True,
        )
        return jnp.sum(out["render"])

    @jax.jit
    def render_train_fwdbwd(params, valid, fr):
        g = jax.grad(lambda p: render_train_fwd(p, valid, fr))(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    def full_step(ts, fr):
        ts2, logs = tr.step_fn(ts, fr, 3)
        return logs["loss"]

    # loss-term micro timings at (512, 512, 3)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    lp = tr.lpips_params

    @jax.jit
    def t_lpips(a, b):
        return lpips_jax.lpips(lp, a, b)

    @jax.jit
    def t_lpips_grad(a, b):
        return jnp.sum(jnp.abs(jax.grad(lambda x: lpips_jax.lpips(lp, x, b))(a)))

    @jax.jit
    def t_ssim(a, b):
        return ssim_mod.ssim(a, b)

    @jax.jit
    def t_ssim_grad(a, b):
        return jnp.sum(jnp.abs(jax.grad(lambda x: jnp.mean(ssim_mod.ssim(x, b)))(a)))

    @jax.jit
    def t_s3im_grad(a, b):
        return jnp.sum(jnp.abs(jax.grad(lambda x: jnp.mean(ssim_mod.s3im(x, b)))(a)))

    from moss_tpu.train.losses import compute_losses, LossWeights
    from moss_tpu.train.train_step import TrainState

    weights = LossWeights(
        l1=cfg.optim.w_l1, mask=cfg.optim.w_mask, ssim=cfg.optim.w_ssim,
        lpips=cfg.optim.w_lpips, nll=cfg.optim.w_nll, s3im=cfg.optim.w_s3im,
    )

    @jax.jit
    def t_lossfn_fwdbwd(params, valid, fr):
        def loss_fn(p):
            out = render_frame(
                p["gauss"], valid, p.get("mlps"), scene,
                fr.smpl_params, fr.camera, bg, 3,
                rasterize_fn=tr.rasterize_fn, motion_offset=True,
            )
            total, logs = compute_losses(
                out, fr.image, fr.bkgd_mask, fr.bound_mask,
                fr.pose_rotmats, fr.crop_y0, fr.crop_x0,
                H, W, lpips_params=lp, weights=weights,
            )
            return total
        g = jax.grad(loss_fn)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    for name, fn, args in [
        ("render train fwd", render_train_fwd, (tr.ts.params, tr.ts.gstate.valid, frame)),
        ("render train fwd+bwd", render_train_fwdbwd, (tr.ts.params, tr.ts.gstate.valid, frame)),
        ("lpips fwd", t_lpips, (a, b)),
        ("lpips fwd+bwd", t_lpips_grad, (a, b)),
        ("ssim fwd", t_ssim, (a, b)),
        ("ssim fwd+bwd", t_ssim_grad, (a, b)),
        ("s3im fwd+bwd", t_s3im_grad, (a, b)),
        ("loss_fn fwd+bwd", t_lossfn_fwdbwd, (tr.ts.params, tr.ts.gstate.valid, frame)),
        ("FULL train step", full_step, (tr.ts, frame)),
    ]:
        dt = queued_time(fn, *args)
        print(f"{name:24s} {dt*1e3:8.2f} ms")

    # relay-robust FULL-step number: one dispatch covers K steps, so the
    # per-dispatch jitter that corrupts the small-stage rows above (PERF.md
    # "Train-step timing caveats", r3: ssim measured 0.00 ms on a degraded
    # relay) amortizes 20x. Trust THIS row across sessions.
    from moss_tpu.parallel.sharded import stack_frames
    from moss_tpu.train.train_step import make_train_many

    stacked = stack_frames(frames)
    gt = tr._stage_gt_lpips_feats(stacked=True)
    many = make_train_many(tr.step_fn, cfg.model.sh_degree)
    K = 20
    order = jnp.asarray(np.tile(np.arange(len(frames)), K)[:K].astype(np.int32))

    def scan_steps(ts):
        ts2, logs = many(ts, stacked, order, 0, gt)
        return logs["loss"], ts2

    _, ts0 = scan_steps(tr.ts)  # compile

    def timed_blocks(n):
        ts = ts0
        l = None
        t0 = time.time()
        for _ in range(n):
            l, ts = scan_steps(ts)
        _ = float(l)  # ONE fetch per window — cancelled by the difference
        return time.time() - t0

    timed_blocks(1)  # warm
    n = 3
    t1 = timed_blocks(n)
    t2 = timed_blocks(2 * n)
    per_step = max(t2 - t1, 1e-9) / (n * K)
    print(f"{'FULL step (scan-of-20)':24s} {per_step*1e3:8.2f} ms  "
          f"(incl. ~10 ms/iter scan loop-carried overhead)")

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    limit = stats.get("bytes_limit")
    if peak:
        margin = f" ({peak / limit * 100:.0f}% of {limit / 2**30:.1f} GiB)" \
            if limit else ""
        print(f"peak HBM: {peak / 2**30:.2f} GiB{margin}")


if __name__ == "__main__":
    main()
