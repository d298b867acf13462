"""Benchmark: rays(pixels)/s/chip, forward+backward, 512x512, 46k Gaussians.

The north-star metric (BASELINE.json): full differentiable rasterization
(binning + Pallas tile kernel + custom-VJP backward + per-Gaussian gradient
reduction) at the reference workload shape — 512x512 pixels, 46,080 splats
(the reference's own densification cap, gaussian_model.py:496).

vs_baseline = speedup over the pure-XLA (jnp oracle) rasterizer on the SAME
chip and workload — the reference repo publishes no throughput numbers
(BASELINE.md), so the XLA-native formulation is the measurable baseline the
Pallas kernel has to beat.

Timing is robust to host<->device link latency: executions are queued in
batches of N and 2N with a single device fetch each; dt = (T2 - T1) / N
cancels fetch/dispatch overhead exactly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The north-star value is the MEDIAN of three independent measurements and
extra carries the spread (VERDICT r4 next 7: single-sample rows made
cross-round 25.4-vs-25.1M deltas unclassifiable against the relay's ±25%
session noise, PERF.md "Train-step timing caveats").

extra rows:
  * post_reset_rays_per_s (+_spread) — the same rasterization on a
    post-opacity-reset cloud (op == 0.01, gaussian_model.py:314-317): the
    regime where the opacity-adaptive splat extents actually pay (PERF.md
    r3 — 1.37 sigma boxes, ~6x fewer candidate tiles), with ITS measured
    budgets.
  * train_step_scan20_ms — the FULL fused train step (deform + raster +
    6-term loss + AdamW) at 512^2/46k via a scan-of-20 block
    (relay-jitter-proof), so step regressions are driver-visible, not
    PERF.md prose. Skipped on CPU (interpret-mode Pallas; set
    MOSS_BENCH_STEP=1 to force).
  * psnr_400 / psnr_floor / psnr_ok — the QUALITY gate (VERDICT r4 next 3):
    a reduced-but-real pipeline run (400 iters, full densify window, fixed
    seed, synthetic scene at the 512^2/46k-capacity shape) whose eval PSNR
    must clear a pinned floor, so a regression in densify/loss/raster math
    moves a driver-visible number the way result/ZJU.txt gates the
    reference. Gated like the step row (TPU, or MOSS_BENCH_STEP=1).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _queued_time(fn, *args, n: int = 10):
    """Amortized per-iteration device time via the difference method."""
    import jax

    v = fn(*args)
    _ = float(v)  # warm compile + sync
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    _ = float(v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    _ = float(v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def main():
    import os

    import jax

    import moss_tpu

    moss_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops.rasterize_ref import rasterize_reference
    from moss_tpu.render.camera import Camera

    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True

    # MOSS_BENCH_SHAPE=1024 benchmarks the MonoCap full-res shape
    # (dataset_readers.py:299, image_scaling=1.0) instead of the ZJU 512^2
    # north-star; same 46k splats, 4x the rays.
    H = W = int(os.environ.get("MOSS_BENCH_SHAPE", "512"))
    P = 46080
    rng = np.random.default_rng(0)
    f = 550.0 * H / 512.0  # keep the subject's angular size across shapes
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
    means = np.stack(
        [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P), rng.uniform(1.5, 2.5, P)],
        -1,
    ).astype(np.float32)
    cov3d = tf.build_covariance(
        jnp.asarray(rng.uniform(0.004, 0.012, (P, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
    )
    colors = jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32))
    opacity_train = jnp.asarray(rng.uniform(0.3, 0.95, P).astype(np.float32))
    proj = preprocess(jnp.asarray(means), cov3d, colors, opacity_train, cam)
    # the post-reset regime: every live opacity clamped to 0.01
    # (reference reset_opacity, gaussian_model.py:314-317) — the cloud shape
    # the densify window actually rasterizes on white-background runs
    proj_reset = preprocess(
        jnp.asarray(means), cov3d, colors,
        jnp.full((P,), 0.01, jnp.float32), cam,
    )
    bg = jnp.zeros(3)

    # Size the static pair buffer to this scene's measured need (+6% and a
    # 16k bucket to absorb jitter) — the TPU analog of the reference's
    # per-frame arena resizing (rasterize_points.cu:27-33): the backward
    # scatter-add and row gather scale with the buffer, and the safe default
    # heuristic overshoots the measured need by ~40%. Drops (impossible for
    # this exact cloud) would be counted in overflow, never silent.
    from moss_tpu.ops.binning import measure_slot_need

    def _measure(p, B):
        return jax.jit(
            lambda p: jax.tree.map(jnp.asarray, measure_slot_need(
                p.mean2d, p.conic, p.opacity, p.depth, p.radius, p.valid,
                H, W, rt.TILE_H, rt.TILE_W, max_tiles_per_gaussian=B,
                pair_budget=P * B, groups=rt.DEFAULT_GROUPS,
                radius_xy=p.radius_xy,
            )), static_argnums=()
        )(p)

    def sized_raster_fn(pr):
        """Measured budgets for THIS cloud (exact — drops would be counted):
        rect cap = the measured max rect (the key sort runs over P*B entries,
        so a tight B cuts it; B need not be pow2), slot budget = need +6%."""
        m0 = _measure(pr, 16)
        max_tiles = max(int(m0["max_rect"]), 1)
        need = int(_measure(pr, max_tiles)["need"]) if max_tiles != 16 \
            else int(m0["need"])
        slot_budget = -(-int(need * 1.06) // 16384) * 16384

        def raster_sized(prr, bgc, h, w):
            return rt.rasterize_tpu(prr, bgc, h, w, slot_budget=slot_budget,
                                    max_tiles_per_gaussian=max_tiles)

        return raster_sized

    def loss_with(raster_fn, fields, pr):
        o = raster_fn(
            pr._replace(
                mean2d=fields[0], conic=fields[1], color=fields[2],
                opacity=fields[3], depth=fields[4],
            ),
            bg, H, W,
        )
        return jnp.sum(o["color"]) + jnp.sum(o["alpha"]) + 0.01 * jnp.sum(o["depth"])

    args = (proj.mean2d, proj.conic, proj.color, proj.opacity, proj.depth)

    def gradsum(raster_fn):
        g = jax.grad(lambda a, p: loss_with(raster_fn, a, p))
        return jax.jit(
            lambda a, p: jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.sum(jnp.abs(y)), g(a, p), 0.0
            )
        )

    def rays_median(fn, a, p, n=10, reps=3):
        """Median + [min, max] rays/s over `reps` independent difference-
        method measurements — cross-round deltas smaller than the spread are
        session noise, larger ones are real regressions (VERDICT r4 next 7)."""
        rays = sorted(H * W / _queued_time(fn, a, p, n=n) for _ in range(reps))
        return rays[len(rays) // 2], [round(rays[0], 1), round(rays[-1], 1)]

    # Pallas fwd+bwd — training regime (the north-star row)
    f_pallas = gradsum(sized_raster_fn(proj))
    rays_pallas, spread_pallas = rays_median(f_pallas, args, proj)

    # Pallas fwd+bwd — post-opacity-reset regime (op == 0.01 everywhere):
    # the opacity-adaptive extents shrink every box to ~1.37 sigma, so this
    # row makes the lever (and any regression of it) driver-visible
    f_reset = gradsum(sized_raster_fn(proj_reset))
    args_reset = (proj_reset.mean2d, proj_reset.conic, proj_reset.color,
                  proj_reset.opacity, proj_reset.depth)
    rays_reset, spread_reset = rays_median(f_reset, args_reset, proj_reset)

    # XLA-oracle fwd+bwd baseline (rematerialized scan to bound memory)
    def oracle(pr_proj, bgc, h, w):
        return rasterize_reference(pr_proj, bgc, h, w, tile_h=rt.TILE_H,
                                   tile_w=rt.TILE_W, chunk=128, remat=True)

    try:
        f_oracle = gradsum(oracle)
        dt_oracle = _queued_time(f_oracle, args, proj, n=2)
        rays_oracle = H * W / dt_oracle
        vs_baseline = rays_pallas / rays_oracle
    except Exception as e:  # oracle may OOM at full scale on small chips
        print(f"# oracle baseline failed: {e}", file=sys.stderr)
        vs_baseline = float("nan")

    # FULL fused train step (deform + raster + 6-term loss + AdamW) via a
    # scan-of-20 block: one dispatch per 20 steps, so per-dispatch relay
    # jitter amortizes 20x (PERF.md "Train-step timing caveats"). The number
    # INCLUDES the scan's loop-carried overhead (~10 ms/iter on a degraded
    # relay, near-zero locally) — stable across sessions, which is what a
    # regression gate needs. Skipped on CPU (interpret-mode Pallas) unless
    # MOSS_BENCH_STEP=1; MOSS_BENCH_STEP=0 skips everywhere.
    step_env = os.environ.get("MOSS_BENCH_STEP", "")
    run_step = (step_env == "1"
                or (step_env != "0" and jax.devices()[0].platform != "cpu"))
    step_ms = _train_step_ms(H, W) if run_step else None
    psnr, psnr_floor = (_quality_psnr(H, W) if run_step else (None, None))
    if psnr is not None and psnr_floor is not None and psnr < psnr_floor:
        # loud, but keep exit 0 + the JSON line: the driver records the JSON
        # (psnr_ok: false IS the machine-readable failure); a nonzero exit
        # would discard the measurement that shows the regression
        print(f"# QUALITY GATE FAILED: psnr_400 {psnr:.2f} < floor "
              f"{psnr_floor} — a densify/loss/raster math regression",
              file=sys.stderr)

    print(json.dumps({
        "metric": f"rays_per_s_per_chip_fwd_bwd_{H}x{W}_46k",
        "value": round(rays_pallas, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline == vs_baseline else None,
        "extra": {
            "rays_per_s_spread": spread_pallas,
            "post_reset_rays_per_s": round(rays_reset, 1),
            "post_reset_spread": spread_reset,
            "post_reset_vs_train_regime": round(rays_reset / rays_pallas, 3),
            "train_step_scan20_ms": (round(step_ms, 2)
                                     if step_ms is not None else None),
            "psnr_400": round(psnr, 2) if psnr is not None else None,
            "psnr_floor": psnr_floor,
            "psnr_ok": (bool(psnr >= psnr_floor)
                        if psnr is not None and psnr_floor is not None
                        else None),
        },
    }))


# Pinned PSNR floors for the quality gate, keyed by frame shape. Measured on
# the real chip (r5): the 400-iter run converges to 32.35 at 512^2 (the
# 3000-iter full e2e reaches ~37.4, PERF.md). The floor leaves ~2.3 dB of
# compiler/platform drift slack while any real densify/loss/raster math
# regression costs far more (tests/test_quality_gate.py demonstrates the
# same gate at CPU scale). No pinned floor yet for other shapes.
PSNR_FLOORS = {512: 30.0}


def _quality_psnr(H: int, W: int, capacity: int = 46080, n_verts: int = 6890,
                  iters: int = 400, crop: int = 0):
    """The quality gate (VERDICT r4 next 3): a reduced-but-real pipeline run
    — full Trainer loop, every loss term, the motion-aware densify window,
    measured budgets, fixed seed — on the synthetic LBS-posed scene
    (data/synthetic.py), evaluated on a HELD-OUT frame. Returns
    (psnr, floor). This is the driver-visible stand-in for the reference's
    committed result/ZJU.txt metrics (the real-dataset parity gate is
    environment-blocked: no ZJU data / SMPL pickle / LPIPS weights here)."""
    from moss_tpu.config import Config, ModelConfig, OptimConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=n_verts)
    frames, _ = make_frames(scene, n_frames=3, H=H, W=W,
                            crop=crop or min(H, 512))
    cfg = Config(
        model=ModelConfig(sh_degree=3, capacity=capacity,
                          n_init_points=n_verts),
        optim=OptimConfig(
            iterations=iters,
            densify_from_iter=iters // 4, densify_until_iter=3 * iters // 4,
            densification_interval=iters // 4, opacity_reset_interval=10 * iters,
        ),
    )
    tr = Trainer(scene, frames[:2], frames[2:], cfg,
                 crop_hw=(crop or min(H, 512),) * 2)
    tr.train(iters, eval_iters=[iters])
    return float(tr.metrics_history[-1]["psnr"]), PSNR_FLOORS.get(H)


def _train_step_ms(H: int, W: int) -> float:
    """ms/iter of the full fused train step at the (H, W) frame shape with
    the reference-scale cloud (46,080 capacity, 6,890 SMPL-vertex init),
    measured as scan-of-20 blocks with the difference method."""
    import jax
    import jax.numpy as jnp

    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.parallel.sharded import stack_frames
    from moss_tpu.train.train_step import make_train_many
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=6890)
    frames, _ = make_frames(scene, n_frames=2, H=H, W=W, crop=H)
    cfg = Config(model=ModelConfig(sh_degree=3, capacity=46080,
                                   n_init_points=6890))
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(H, W))
    stacked = stack_frames(frames)
    gt = tr._stage_gt_lpips_feats(stacked=True)
    many = make_train_many(tr.step_fn, cfg.model.sh_degree)
    K = 20
    order = jnp.asarray(np.tile(np.arange(len(frames)), K)[:K].astype(np.int32))

    def scan_steps(ts):
        ts2, logs = many(ts, stacked, order, 0, gt)
        return logs["loss"], ts2

    _, ts0 = scan_steps(tr.ts)  # compile

    def timed(n):
        ts = ts0
        loss = None
        t0 = time.time()
        for _ in range(n):
            loss, ts = scan_steps(ts)
        _ = float(loss)  # ONE fetch per window — cancelled by the difference
        return time.time() - t0

    timed(1)  # warm
    n = 3
    t1 = timed(n)
    t2 = timed(2 * n)
    return max(t2 - t1, 1e-9) / (n * K) * 1e3


if __name__ == "__main__":
    main()
