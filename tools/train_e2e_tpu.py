"""Full-scale end-to-end training run on real hardware (synthetic scene).

The reference's training shape (3000 iters, 512x512 monocular frames, 46k
capacity, densify window 400-2000 every 100, eval at {2500,2700,3000}) driven
through the production Trainer — validates densification, pair-buffer
autosize growth, fused dispatch and eval at scale, and reports wall-clock.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_e2e_tpu.py
"""
from __future__ import annotations

import time

import jax


def main():
    from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
    from moss_tpu.data.synthetic import make_scene, make_frames
    from moss_tpu.train.trainer import Trainer

    import moss_tpu

    moss_tpu.enable_compilation_cache()
    t0 = time.time()
    scene = make_scene(n_verts=6890)
    frames, _ = make_frames(scene, n_frames=12, H=512, W=512, crop=448)
    cfg = Config(
        model=ModelConfig(sh_degree=3, capacity=46080, n_init_points=6890),
        optim=OptimConfig(iterations=3000),
        pipe=PipelineConfig(test_iterations=(2500, 2700, 3000)),
    )
    tlog = {"last": time.time()}

    def log(it, logs):
        # log_fn now fires per ITERATION (trainer._log_segment); print the
        # wall-clock chunk line at the driver cadence only
        if it % 100:
            return
        now = time.time()
        print(f"  chunk -> iter {it}: {now - tlog['last']:.1f}s "
              f"(pts {int(logs['num_points'])}, budget {tr._slot_budget})",
              flush=True)
        tlog["last"] = now

    tr = Trainer(scene, frames[:10], frames[10:], cfg, crop_hw=(448, 448),
                 log_fn=log)
    print(f"setup {time.time()-t0:.0f}s; init slot budget {tr._slot_budget}")
    m0 = tr.evaluate()
    print(f"eval before: {m0}")
    t1 = time.time()
    engine = __import__("os").environ.get("MOSS_E2E_DISPATCH", "queued")
    print(f"dispatch engine: {engine}")
    hist = tr.train(3000, dispatch_engine=engine)
    t2 = time.time()
    for m in hist:
        print({k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in m.items()})
    print(f"train wall: {t2-t1:.1f}s for 3000 iters "
          f"({(t2-t1)/3000*1e3:.1f} ms/iter incl. densify/eval/compiles)")
    print(f"final slot budget {tr._slot_budget}, "
          f"points {int(tr.ts.gstate.num_valid)}")


if __name__ == "__main__":
    main()
