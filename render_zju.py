#!/usr/bin/env python
"""Evaluate / render ZJU-MoCap-Refine checkpoints (TPU-native equivalent of
/root/reference/render_ZJU.py).

Loads a training checkpoint, caches per-pose deformation transforms (the
reference's smpl_rot.pickle shortcut, render_ZJU.py:42-58), renders the test
split through the MLP-free path while measuring wall-clock FPS, and reports
PSNR/SSIM/LPIPS with optional PNG dumps.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--smpl", default=None)
    p.add_argument("--subjects", nargs="+",
                   default=["377", "386", "387", "392", "393", "394"])
    p.add_argument("--iterations", nargs="+", type=int,
                   default=[2700, 2700, 3000, 3000, 2500, 2700],
                   help="best iteration per subject (render_ZJU.py:135)")
    p.add_argument("--output", default="output/zju_mocap_refine")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--rasterizer", choices=["pallas", "reference"], default="pallas")
    p.add_argument("--reader", default="zju", choices=["zju", "monocap"])
    p.add_argument("--keep_capacity", action="store_true",
                   help="skip the eval capacity fit (render inside the full "
                        "training-capacity buffer; slower, for debugging "
                        "buffer-dependent behavior)")
    p.add_argument("--novel_view", type=int, default=0, metavar="N",
                   help="free-viewpoint mode: render N orbit views evenly "
                        "spaced over the full orbit circle per test pose "
                        "instead of the captured test views (the reference's "
                        "novel_view_vis path, dataset_readers.py:509-538, "
                        "which fixes 36 views); metrics are skipped (no gt "
                        "exists at novel viewpoints) and PNGs are always "
                        "saved")
    return p.parse_args()


def render_subject(args, subject: str, iteration: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moss_tpu.config import Config, ModelConfig, PipelineConfig
    from moss_tpu.data.readers import read_monocap, read_zju_mocap_refine
    from moss_tpu.ops import lpips_jax
    from moss_tpu.ops.ssim import psnr as psnr_fn, ssim as ssim_fn
    from moss_tpu.render.render import render_frame
    from moss_tpu.train.checkpoint import restore_checkpoint
    from moss_tpu.train.trainer import Trainer

    reader = read_zju_mocap_refine if args.reader == "zju" else read_monocap
    path = os.path.join(args.data_root, f"my_{subject}" if args.reader == "zju" else subject)
    scene, test_specs = reader(path, "test", args.white_background, smpl_path=args.smpl)
    if args.novel_view:
        import dataclasses

        from moss_tpu.render.novel_view import novel_view_specs

        # camera_view_num = N too: N is "views around the FULL orbit", so
        # the angle step is 2pi/N — leaving the reference's fixed 36 divisor
        # would render duplicate views for N > 36 and a partial arc for
        # N < 36 (N = 36 matches the reference exactly)
        test_specs = novel_view_specs(
            test_specs, dataset=args.reader, n_views=args.novel_view,
            camera_view_num=args.novel_view,
        )
        # decode each pose ONCE: the orbit views reuse the base frame's
        # pixels/masks/SMPL (gt is unused at novel viewpoints) and swap in
        # the orbit camera, which make_camera builds without any decode —
        # loading per spec would re-decode the identical image n_views times
        loaded, test_frames = {}, []
        for s in test_specs:
            pid = int(s.pose_id)
            if pid not in loaded:
                loaded[pid] = s.load()
            f = loaded[pid]
            test_frames.append(dataclasses.replace(
                f, camera=s.make_camera((f.camera.height, f.camera.width))))
    else:
        test_frames = [s.load() for s in test_specs]

    model_path = os.path.join(
        args.output, f"my_{subject}" if args.reader == "zju" else subject
    )
    cfg_json = os.path.join(model_path, "cfg.json")
    if os.path.exists(cfg_json):
        # get_combined_args analog (reference arguments/__init__.py:88-108):
        # the saved training config wins for model params (capacity etc. must
        # match the checkpoint); CLI overrides the pipeline knobs
        import dataclasses

        from moss_tpu.config import load_json

        cfg = load_json(cfg_json)
        cfg = dataclasses.replace(
            cfg,
            pipe=dataclasses.replace(cfg.pipe, rasterizer=args.rasterizer),
            model_path=model_path,
        )
    else:
        cfg = Config(
            model=ModelConfig(white_background=args.white_background),
            pipe=PipelineConfig(rasterizer=args.rasterizer),
            model_path=model_path,
        )
    trainer = Trainer(scene, test_frames[:1], test_frames, cfg)
    if iteration < 0:
        # searchForMaxIteration analog (reference utils/system_utils.py /
        # Scene(load_iteration=-1)): resolve the newest checkpoint on disk —
        # either layout (chkpnt{N}.npz or point_cloud/iteration_N/)
        import glob
        import re

        cands = glob.glob(os.path.join(cfg.model_path, "chkpnt*.npz"))
        cands += glob.glob(
            os.path.join(cfg.model_path, "point_cloud", "iteration_*")
        )
        if not cands:
            raise FileNotFoundError(f"no checkpoints under {cfg.model_path}")
        iteration = max(
            int(re.findall(r"(\d+)", os.path.basename(p))[0]) for p in cands
        )
        print(f"[{subject}] loading latest iteration {iteration}")
    ckpt_path = os.path.join(cfg.model_path, f"chkpnt{iteration}.npz")
    if os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
    else:
        # reference directory layout (point_cloud/iteration_N/point_cloud.ply
        # + mlp_ckpt/iteration_N/ckpt.npz) — renders reference-style outputs
        # and this repo's own save_reference_layout trees
        from moss_tpu.train.checkpoint import load_reference_layout

        trainer.set_state(
            load_reference_layout(cfg.model_path, iteration, trainer.ts))

    if not args.keep_capacity:
        # serving-path capacity fit: the key sort / pair table scale with
        # CAPACITY, not live count — fitting the buffer to the loaded cloud
        # is worth ~4x/frame at typical trained sizes (Trainer.compact_for_
        # eval; the reference sizes its model to the PLY's point count)
        cap = trainer.compact_for_eval()
        n_live = int(jnp.sum(trainer.ts.gstate.valid))
        print(f"[{subject}] eval capacity fit: {n_live} live points in "
              f"{cap}-slot buffer")

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    lp = lpips_jax.get_default_params()

    # 1. cache per-pose transforms (MLP-free eval path)
    smpl_rot = {}
    for frame in test_frames:
        pid = int(frame.pose_id)
        if pid not in smpl_rot:
            out = trainer.render_eval(frame)
            smpl_rot[pid] = (out["transforms"], out["translation"])
    cache_dir = os.path.join(cfg.model_path, "smpl_rot", f"iteration_{iteration}")
    os.makedirs(cache_dir, exist_ok=True)
    with open(os.path.join(cache_dir, "smpl_rot.pickle"), "wb") as f:
        pickle.dump({k: jax.device_get(v) for k, v in smpl_rot.items()}, f)

    # 2. timed MLP-free rendering + metrics
    def cached_render(frame, transforms, translation):
        return render_frame(
            trainer.ts.params["gauss"], trainer.ts.gstate.valid,
            trainer.ts.params.get("mlps"), scene, frame.smpl_params,
            frame.camera, bg, cfg.model.sh_degree,
            rasterize_fn=trainer.rasterize_fn,
            cached_transforms=transforms, cached_translation=translation,
        )["render"]

    # warm compile
    f0 = test_frames[0]
    _ = jax.block_until_ready(cached_render(f0, *smpl_rot[int(f0.pose_id)]))

    t0 = time.time()
    renders = []
    for frame in test_frames:
        renders.append(cached_render(frame, *smpl_rot[int(frame.pose_id)]))
    jax.block_until_ready(renders[-1])
    fps = len(test_frames) / (time.time() - t0)

    if args.novel_view:
        # free-viewpoint mode: no gt exists at the orbit viewpoints, so
        # metrics are meaningless — save every rendered frame instead (the
        # reference's novel_view_vis path likewise only writes images,
        # render_ZJU.py render set -> renders/ directory)
        import imageio.v2 as imageio

        img_dir = os.path.join(
            cfg.model_path, "renders", f"novel_view_iteration_{iteration}"
        )
        os.makedirs(img_dir, exist_ok=True)
        for i, img in enumerate(renders):
            img = jnp.clip(img, 0, 1)
            imageio.imwrite(
                os.path.join(img_dir, f"{i:05d}.png"),
                (np.asarray(img) * 255).astype(np.uint8),
            )
        result = {
            "subject": subject, "iteration": iteration, "fps": fps,
            "novel_views": len(test_frames), "img_dir": img_dir,
        }
        print(json.dumps(result))
        return result

    psnr_v = ssim_v = lpips_v = 0.0
    img_dir = os.path.join(cfg.model_path, "renders", f"iteration_{iteration}")
    if args.save_images:
        os.makedirs(img_dir, exist_ok=True)
    for i, (frame, img) in enumerate(zip(test_frames, renders)):
        img = jnp.clip(img, 0, 1)
        gt = jnp.clip(frame.image, 0, 1)
        psnr_v += float(psnr_fn(img, gt))
        ssim_v += float(ssim_fn(img, gt))
        lpips_v += float(lpips_jax.lpips(lp, img, gt))
        if args.save_images:
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(img_dir, f"{i:05d}.png"),
                (np.asarray(img) * 255).astype(np.uint8),
            )
    n = len(test_frames)
    result = {
        "subject": subject, "iteration": iteration, "fps": fps,
        "psnr": psnr_v / n, "ssim": ssim_v / n, "lpips_x1000": lpips_v / n * 1000,
        "lpips_backbone": lpips_jax.backbone_info()[0],
    }
    print(json.dumps(result))
    return result


def main():
    # NOTE: no install_timestamped_stdout() here — the render drivers emit a
    # machine-parsed JSON metrics line on stdout (test_drivers.py consumes
    # it); the safe_state timestamping lives on the train drivers
    args = parse_args()
    import moss_tpu

    moss_tpu.enable_compilation_cache()
    for subject, iteration in zip(args.subjects, args.iterations):
        render_subject(args, subject, iteration)


if __name__ == "__main__":
    main()
