"""Child process for the multi-process runtime tests (test_multiprocess.py).

Run as:  python tests/_mp_child.py <process_id> <num_processes> <port> <outdir>

Every process runs the SAME code (the JAX multi-controller contract,
SURVEY.md §5.8): join the coordinator via
parallel.distributed.initialize_distributed, build the global ('data','tile')
mesh spanning both processes' virtual CPU devices, run the full
Trainer(mesh=...) loop (queued dispatch, a densify round, eval), and let only
process 0 write the result artifact — mirroring the train drivers'
--coordinator/--num_processes/--process_id path.
"""
import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // nproc}"
)
os.environ["MOSS_PALLAS_INTERPRET"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# must run before any other jax API touches the backend
from moss_tpu.parallel.distributed import initialize_distributed, global_mesh

assert initialize_distributed(f"localhost:{port}", nproc, pid), (
    "explicit coordinator args must initialize unconditionally"
)

import jax
import numpy as np

from moss_tpu.config import Config, ModelConfig, OptimConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer

assert jax.process_index() == pid
assert len(jax.local_devices()) == 8 // nproc
assert len(jax.devices()) == 8, "global device view must span both processes"

# identical construction in every process (same seeds -> same frames/shuffle)
scene = make_scene(n_verts=150)
frames, _ = make_frames(scene, n_frames=4, H=64, W=128, crop=32)
cfg = Config(
    model=ModelConfig(sh_degree=1, capacity=384, n_init_points=150),
    optim=OptimConfig(
        iterations=20, densify_from_iter=9, densify_until_iter=16,
        densification_interval=10, opacity_reset_interval=10_000,
    ),
)
mesh = global_mesh(2, 4)  # 'data' spans the two processes
assert mesh.shape == {"data": 2, "tile": 4}
assert len(set(d.process_index for d in mesh.devices.flat)) == nproc

tr = Trainer(scene, frames[:3], frames[3:], cfg, crop_hw=(32, 32), mesh=mesh)
hist = tr.train(20, eval_iters=[20])

if jax.process_index() == 0:
    g = tr.ts.params["gauss"]
    np.savez(
        os.path.join(outdir, "final.npz"),
        xyz=np.asarray(g.xyz), opacity=np.asarray(g.opacity),
        scaling=np.asarray(g.scaling),
        valid=np.asarray(tr.ts.gstate.valid),
        psnr=np.asarray(hist[-1]["psnr"]),
        slot_budget=np.asarray(tr._slot_budget),
        step=np.asarray(int(tr.ts.step)),
    )
else:
    # driver semantics: non-main processes write nothing
    open(os.path.join(outdir, f"proc{pid}_done"), "w").close()
print(f"[proc {pid}] done psnr={float(hist[-1]['psnr']):.2f}", flush=True)
