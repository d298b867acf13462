#!/usr/bin/env python
"""Train on MonoCap sequences (TPU-native equivalent of
/root/reference/train_monocap.py).

Same loop as train_zju.py over MonoCap sequences at full resolution, metrics
appended to result/monocap.txt.
"""
from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--smpl", default=None)
    p.add_argument("--sequences", nargs="+", default=["olek_images0812"])
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--test_iterations", nargs="+", type=int, default=[2500, 2700, 3000])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[2500, 2700, 3000],
                   help="checkpoint/PLY save iterations — independent of "
                        "--test_iterations (reference train_ZJU.py:298-307)")
    p.add_argument("--output", default="output/monocap")
    p.add_argument("--result_file", default="result/monocap.txt")
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--rasterizer", choices=["pallas", "reference"], default="pallas")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--debug_nans", action="store_true",
                   help="abort on the first NaN in any jitted computation "
                        "(TPU analog of the reference's --detect_anomaly, "
                        "train_ZJU.py:305,328)")
    p.add_argument("--crop", type=int, default=0,
                   help="static SSIM/LPIPS crop size; 0 = autosize to the "
                        "split's max bound rect (bucketed, never clips)")
    p.add_argument("--capacity", type=int, default=46080)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port for "
                        "jax.distributed.initialize (run the same command on "
                        "every host with its own --process_id)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--n_data", type=int, default=0,
                   help="data-parallel mesh axis (frames/step); with --n_tile "
                        "selects the multi-chip trainer. 0 0 = single chip")
    p.add_argument("--n_tile", type=int, default=0,
                   help="pixel-band mesh axis (chips per image)")
    p.add_argument("--n_init", type=int, default=6890)
    p.add_argument("--dispatch", choices=["queued", "scan", "eager"],
                   default="queued",
                   help="dispatch engine: queued async per-step (fastest on "
                        "a healthy link), scan = fixed lax.scan blocks (one "
                        "host round trip per ~100 iters — use when the "
                        "host<->device link is slow/degraded), eager = "
                        "per-step with fetches (debugging)")
    p.add_argument("--gui_port", type=int, default=0,
                   help="SIBR remote-viewer port (0=off); reference network_gui")
    p.add_argument("--quiet", action="store_true",
                   help="silence stdout (reference safe_state(quiet))")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest chkpnt*.npz in the output "
                        "dir (the reference's --start_checkpoint analog; its "
                        "restore path is broken, gaussian_model.py:131 — "
                        "this one replays the identical schedule)")
    return p.parse_args()


def train_sequence(args, seq: str):
    import jax

    from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
    from moss_tpu.data.readers import read_monocap
    from moss_tpu.train.observability import EMALogger, TBWriter, append_result_line
    from moss_tpu.train.trainer import Trainer

    path = os.path.join(args.data_root, seq)
    print(f"[{seq}] reading {path}")
    scene, train_specs = read_monocap(
        path, "train", args.white_background, smpl_path=args.smpl
    )
    _, test_specs = read_monocap(
        path, "test", args.white_background, smpl_path=args.smpl
    )
    if args.crop > 0:
        crop_hw = (args.crop, args.crop)
    else:
        from moss_tpu.data.readers import autosize_crop

        crop_hw = autosize_crop(train_specs)
        print(f"[{seq}] autosized loss crop: {crop_hw}")
    train_frames = [s.load(crop_hw) for s in train_specs]
    # test split stays LAZY: streamed per-eval by the trainer's prefetching
    # iterator, so peak device memory is independent of its ~374 frames
    test_hw = test_specs[0].image_size() if test_specs else None
    test_cameras = [s.make_camera(test_hw) for s in test_specs]

    cfg = Config(
        model=ModelConfig(white_background=args.white_background,
                          capacity=args.capacity, n_init_points=args.n_init),
        optim=OptimConfig(iterations=args.iterations),
        pipe=PipelineConfig(
            rasterizer=args.rasterizer,
            test_iterations=tuple(args.test_iterations),
            save_iterations=tuple(args.save_iterations),
        ),
        exp_name=f"monocap/{seq}",
        model_path=os.path.join(args.output, seq),
    )
    from moss_tpu.config import save_json
    from moss_tpu.render.camera import dump_cameras_json

    # multi-process runs (--coordinator): every process executes the same
    # loop but only process 0 writes artifacts/results (SURVEY §5.8)
    is_main = jax.process_index() == 0
    if is_main:
        save_json(cfg, os.path.join(cfg.model_path, "cfg.json"))
        dump_cameras_json(
            os.path.join(cfg.model_path, "cameras.json"),
            test_cameras + [f.camera for f in train_frames],
        )
    tb = TBWriter(cfg.model_path if args.tensorboard and is_main else None)
    ema = EMALogger()
    t0 = time.time()

    def log(it, logs):
        sm = ema.update(logs)
        tb.scalars(logs, it)
        if it % 100 == 0 and is_main:
            print(f"[{seq}] iter {it} loss={sm.get('loss', 0):.4f} "
                  f"l1={sm.get('l1', 0):.4f} ({time.time() - t0:.0f}s)")

    mesh = None
    if args.n_data or args.n_tile:
        from moss_tpu.parallel.distributed import global_mesh

        mesh = global_mesh(args.n_data, args.n_tile)
        print(f"[{seq}] mesh: data={mesh.shape['data']} "
              f"tile={mesh.shape['tile']}")
    gui = None
    if args.gui_port:
        from moss_tpu.train.network_gui import NetworkGUI

        gui = NetworkGUI(port=args.gui_port)
        gui.init()
    trainer = Trainer(scene, train_frames, test_specs, cfg, crop_hw=crop_hw,
                      log_fn=log, tb=tb, mesh=mesh, gui=gui,
                      source_path=path)
    from moss_tpu.train.checkpoint import save_reference_layout

    def save_at(it):
        # fires at --save_iterations with iteration it's PRE-STEP state (the
        # reference's scene.save runs before optimizer.step(),
        # train_ZJU.py:160-190). Only process 0 writes.
        if is_main:
            save_reference_layout(cfg.model_path, it, trainer.ts)

    def ckpt_at(it):
        # full train-state checkpoint, POST-step at the test iterations
        # (reference torch.save, train_ZJU.py:197-200); --resume restores it.
        if is_main:
            trainer.save(os.path.join(cfg.model_path, f"chkpnt{it}.npz"))

    if args.resume:
        resumed = trainer.resume_latest(cfg.model_path)
        if resumed and is_main:
            print(f"[{seq}] resumed from iteration {resumed}")

    metrics = trainer.train(eval_iters=args.test_iterations,
                            save_iters=args.save_iterations,
                            dispatch_engine=args.dispatch,
                            save_fn=save_at, ckpt_fn=ckpt_at)
    if is_main:
        from moss_tpu.ops.lpips_jax import result_note

        for m in metrics:
            append_result_line(args.result_file, m["iteration"], m["psnr"],
                               m["ssim"], m["lpips"], note=result_note())
            print(f"[{seq}] iter {m['iteration']}: PSNR {m['psnr']:.3f} "
                  f"SSIM {m['ssim']:.5f} LPIPSx1e3 {m['lpips'] * 1000:.3f}")
    tb.close()
    return metrics


def main():
    args = parse_args()
    from moss_tpu.train.observability import install_timestamped_stdout

    # reference safe_state: seeded + timestamped stdout (general_utils.py:120-148)
    install_timestamped_stdout(quiet=args.quiet)
    if args.coordinator or args.num_processes:
        # must run before any other jax API touches the backend
        from moss_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(os.path.dirname(args.result_file) or ".", exist_ok=True)
    for seq in args.sequences:
        if is_main:
            with open(args.result_file, "a") as f:
                f.write(f"\n{seq}\n")
        train_sequence(args, seq)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
