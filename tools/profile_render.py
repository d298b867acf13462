"""Decompose the train-mode render (deform + MLPs + rasterize) on TPU.

The bench scene (46k live uniform splats) and the training scene (SMPL-grown
cloud, ~7k live of 46k capacity, larger splats) are different rasterization
regimes — this profiles the exact projected cloud the train step rasterizes,
plus the deform/MLP stages, so train-step render time is attributable.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_render.py
"""
from __future__ import annotations

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
    import os
    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.train.trainer import Trainer
    from moss_tpu.render import render as rmod

    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True
    G = int(os.environ.get("MOSS_RASTER_GROUPS", "0")) or rt.DEFAULT_GROUPS
    print(f"groups={G}")

    H = W = 512
    scene = make_scene(n_verts=6890)
    frames, _ = make_frames(scene, n_frames=2, H=H, W=W, crop=H)
    cfg = Config(model=ModelConfig(sh_degree=3, capacity=46080,
                                   n_init_points=6890))
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(H, W))
    frame = frames[0]
    params, valid = tr.ts.params, tr.ts.gstate.valid
    bg = jnp.zeros(3)

    # full train render fwd / fwd+bwd
    @jax.jit
    def render_fwd(params, fr):
        out = rmod.render_frame(
            params["gauss"], valid, params.get("mlps"), scene,
            fr.smpl_params, fr.camera, bg, 3,
            rasterize_fn=tr.rasterize_fn, motion_offset=True,
        )
        return jnp.sum(out["render"])

    @jax.jit
    def render_fwdbwd(params, fr):
        g = jax.grad(render_fwd)(params, fr)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    # deform-only (no rasterize): project and sum
    @jax.jit
    def deform_fwd(params, fr):
        out = rmod.render_frame(
            params["gauss"], valid, params.get("mlps"), scene,
            fr.smpl_params, fr.camera, bg, 3,
            rasterize_fn=lambda proj, b, h, w: {
                "render": None,
                "color": jnp.zeros((h, w, 3)),
                "depth": jnp.zeros((h, w)),
                "alpha": jnp.zeros((h, w)),
                "final_T": jnp.zeros((h, w)),
                "overflow": jnp.sum(proj.mean2d) + jnp.sum(proj.conic)
                + jnp.sum(proj.color) + jnp.sum(proj.opacity),
            },
            motion_offset=True,
        )
        return out["overflow"]

    @jax.jit
    def deform_fwdbwd(params, fr):
        g = jax.grad(deform_fwd)(params, fr)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    # capture the projected cloud, rasterize-only fwd / fwd+bwd
    from moss_tpu.ops.projection import Projected
    captured = {}

    def capture_fn(proj, b, h, w):
        captured["proj"] = jax.tree.map(np.asarray, proj)
        return rt.rasterize_tpu(proj, b, h, w)

    rmod.render_frame(
        params["gauss"], valid, params.get("mlps"), scene,
        frame.smpl_params, frame.camera, bg, 3,
        rasterize_fn=capture_fn, motion_offset=True,
    )
    proj = jax.tree.map(jnp.asarray, captured["proj"])
    nlive = int(np.sum(np.asarray(proj.valid)))
    r = np.asarray(proj.radius)[np.asarray(proj.valid)]
    print(f"projected cloud: P={proj.mean2d.shape[0]} live={nlive} "
          f"radius mean={r.mean():.1f} p95={np.percentile(r, 95):.1f}")

    def loss_r(fields, pr):
        o = rt.rasterize_tpu(
            pr._replace(mean2d=fields[0], conic=fields[1], color=fields[2],
                        opacity=fields[3], depth=fields[4]),
            bg, H, W,
        )
        return jnp.sum(o["color"]) + jnp.sum(o["alpha"])

    fields = (proj.mean2d, proj.conic, proj.color, proj.opacity, proj.depth)
    rast_fwd = jax.jit(lambda f, p: loss_r(f, p))
    rast_fwdbwd = jax.jit(
        lambda f, p: sum(jnp.sum(jnp.abs(x))
                         for x in jax.grad(loss_r)(f, p))
    )

    for name, fn, a in [
        ("render fwd", render_fwd, (params, frame)),
        ("render fwd+bwd", render_fwdbwd, (params, frame)),
        ("deform-only fwd", deform_fwd, (params, frame)),
        ("deform-only fwd+bwd", deform_fwdbwd, (params, frame)),
        ("rasterize-only fwd", rast_fwd, (fields, proj)),
        ("rasterize-only fwd+bwd", rast_fwdbwd, (fields, proj)),
    ]:
        dt = queued_time(fn, *a)
        print(f"{name:24s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
