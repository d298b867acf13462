"""Eval-mode (novel-view) render FPS on the real TPU.

The reference measures wall-clock FPS over the test set with the MLP-free
cached-transform path (/root/reference/render_ZJU.py:56-72). Same measurement
here: render_frame with cached transforms/translation (no correction MLPs) at
512x512 on a 46k-capacity cloud, difference-method timing (link-latency
robust, see bench.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_eval_fps.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, n: int = 20):
    v = fn(*args)
    _ = np.asarray(v).sum()
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    _ = np.asarray(v).sum()
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    _ = np.asarray(v).sum()
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / n


def main():
    import moss_tpu

    moss_tpu.enable_compilation_cache()
    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_scene, make_frames
    from moss_tpu.render.render import render_frame
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=6890)
    import os

    HW = int(os.environ.get("MOSS_BENCH_SHAPE", "512"))
    frames, _ = make_frames(scene, n_frames=3, H=HW, W=HW, crop=min(448, HW))
    cfg = Config(model=ModelConfig(sh_degree=3, capacity=46080,
                                   n_init_points=6890))
    tr = Trainer(scene, frames[:2], frames[2:], cfg,
                 crop_hw=(min(448, HW), min(448, HW)))
    frame = frames[2]
    out = tr.render_eval(frame)
    transforms, translation = out["transforms"], out["translation"]
    bg = jnp.zeros(3)

    @jax.jit
    def cached_render(frame, transforms, translation):
        out = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid, None, scene,
            frame.smpl_params, frame.camera, bg, cfg.model.sh_degree,
            rasterize_fn=tr.rasterize_fn,
            cached_transforms=transforms, cached_translation=translation,
        )
        return out["render"]

    dt = queued_time(cached_render, frame, transforms, translation)
    print(f"eval render: {dt * 1e3:.2f} ms/frame = {1.0 / dt:.1f} FPS "
          f"({HW}x{HW}, 46k cap, cached-transform MLP-free path)")

    # full path (MLPs + deform) for comparison — what a live viewer
    # driving novel poses would pay
    @jax.jit
    def full_render(frame):
        out = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid,
            tr.ts.params.get("mlps"), scene,
            frame.smpl_params, frame.camera, bg, cfg.model.sh_degree,
            rasterize_fn=tr.rasterize_fn,
        )
        return out["render"]

    dt2 = queued_time(full_render, frame)
    print(f"full render: {dt2 * 1e3:.2f} ms/frame = {1.0 / dt2:.1f} FPS "
          f"(with pose MLPs + LBS deform)")

    # The rows above render the INIT cloud: 6890 mean-3NN-scaled splats whose
    # rects cover up to ~60 subtiles each (the trainer escalates the rect cap
    # to 64 and renders them EXACTLY — r2's 428-FPS figure was measured while
    # the default cap silently rect-dropped ~3/4 of those tiles, the same
    # caveat PERF.md records for the r2 step time). A TRAINED cloud has
    # small splats; emulate it by clamping scales to a post-densify-typical
    # 1 cm and re-probing the budgets — the regime the reference's eval FPS
    # (render_ZJU.py:56-72, trained checkpoints) actually measures.
    import dataclasses
    import os as _os
    import tempfile

    g = tr.ts.params["gauss"]
    g2 = dataclasses.replace(
        g, scaling=jnp.minimum(g.scaling, jnp.log(0.01)))
    tr.ts = tr.ts._replace(params={**tr.ts.params, "gauss": g2})
    # go through save/load — the render drivers' actual path — so the r5
    # from-scratch budget re-probe drops the init cloud's escalated rect cap
    # (a stale cap keeps the key sort at capacity*B_escalated keys)
    with tempfile.TemporaryDirectory() as d:
        ck = _os.path.join(d, "trained.npz")
        tr.save(ck)
        tr.load(ck)
    print(f"post-load budgets: slot={tr._slot_budget} pair={tr._pair_budget} "
          f"max_tiles={tr._max_tiles}")
    # serving capacity fit (render drivers do this by default): key sort /
    # pair table scale with CAPACITY, not live count
    cap = tr.compact_for_eval()
    print(f"compact_for_eval: capacity {cap} "
          f"(live {int(np.asarray(tr.ts.gstate.valid).sum())}), budgets "
          f"slot={tr._slot_budget} max_tiles={tr._max_tiles}")
    # per-Gaussian caches are invalidated by the compaction — recompute the
    # cached transforms on the compacted cloud (the render drivers cache
    # AFTER compacting for the same reason)
    out = tr.render_eval(frame)
    transforms, translation = out["transforms"], out["translation"]

    # sub-ms frames: the per-dispatch difference method is UNRELIABLE here
    # (CLAUDE.md — relay jitter produced a NEGATIVE reading at 1024²); use a
    # scan-of-K single-dispatch probe. The per-step micron translation nudge
    # defeats loop-invariant hoisting of the otherwise-constant render.
    K = 50

    @jax.jit
    def scan_render(frame, transforms, translation):
        def body(acc, i):
            out = render_frame(
                tr.ts.params["gauss"], tr.ts.gstate.valid, None, scene,
                frame.smpl_params, frame.camera, bg, cfg.model.sh_degree,
                rasterize_fn=tr.rasterize_fn,
                cached_transforms=transforms,
                cached_translation=translation + 1e-6 * i,
            )
            return acc + jnp.sum(out["render"]), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return acc

    dt3 = queued_time(scan_render, frame, transforms, translation, n=3) / K
    print(f"eval render: {dt3 * 1e3:.2f} ms/frame = {1.0 / dt3:.1f} FPS "
          f"(trained-scale cloud: sigma <= 1 cm, cached-transform path, "
          f"scan-of-{K} single-dispatch probe)")

    # live-viewer regime on the compacted cloud: novel POSES need the full
    # path (pose MLPs + LBS deform + rasterize) every frame
    @jax.jit
    def scan_render_full(frame):
        def body(acc, i):
            # smpl_params is a dict (data/frames.py); the micro pose nudge
            # defeats loop-invariant hoisting of the whole render
            sp = dict(frame.smpl_params)
            sp["poses"] = sp["poses"] + 1e-6 * i
            out = render_frame(
                tr.ts.params["gauss"], tr.ts.gstate.valid,
                tr.ts.params.get("mlps"), scene, sp, frame.camera, bg,
                cfg.model.sh_degree, rasterize_fn=tr.rasterize_fn,
            )
            return acc + jnp.sum(out["render"]), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return acc

    dt4 = queued_time(scan_render_full, frame, n=3) / K
    print(f"full render: {dt4 * 1e3:.2f} ms/frame = {1.0 / dt4:.1f} FPS "
          f"(trained-scale cloud, pose MLPs + LBS deform, scan-of-{K})")


if __name__ == "__main__":
    main()
