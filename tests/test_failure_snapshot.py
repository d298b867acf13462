"""Failure snapshots: non-finite loss dumps the raster argument set.

TPU analog of the reference debug mode's snapshot_fw.dump on kernel failure
(/root/reference/submodules/diff-gaussian-rasterization/diff_gaussian_rasterization/__init__.py:83-90,135-142):
when a boundary reports a non-finite loss the trainer dumps the boundary
frame's full rasterizer inputs (Projected fields + bg), the installed budgets
and the boundary logs to `<model_path>/snapshot_iterN.npz`, then aborts with
FloatingPointError.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer


def test_nan_loss_dumps_loadable_snapshot(tmp_path):
    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=2, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=128, n_init_points=100),
        # iterations must match the train() call: an overridden run length
        # rebuilds step_fn (final-step-skip parity) and would clobber the
        # poisoned wrapper below
        optim=OptimConfig(iterations=5),
        pipe=PipelineConfig(rasterizer="reference"),
        model_path=str(tmp_path / "out"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(16, 16))

    orig = tr.step_fn

    def poisoned_step(ts, frame, deg, gt=None):
        ts2, logs = orig(ts, frame, deg, gt)
        logs = dict(logs)
        logs["loss"] = jnp.asarray(float("nan"))
        return ts2, logs

    tr.step_fn = poisoned_step
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.train(iterations=5, eval_iters=[])

    snap = tmp_path / "out" / "snapshot_iter5.npz"
    assert snap.exists()
    d = np.load(str(snap), allow_pickle=False)
    # the full rasterizer argument set (Projected fields + bg + budgets)
    for k in ("mean2d", "conic", "depth", "radius", "color", "opacity",
              "valid", "bg", "slot_budget", "pair_budget", "max_tiles",
              "iteration", "height", "width", "reason", "log_loss"):
        assert k in d, k
    P = cfg.model.capacity
    assert d["mean2d"].shape == (P, 2)
    assert d["conic"].shape == (P, 3)
    assert int(d["iteration"]) == 5
    assert str(d["reason"]) == "non-finite loss"
    assert np.isnan(d["log_loss"])
    # the captured inputs are the CURRENT (pre-abort) cloud's — finite here
    assert np.isfinite(d["mean2d"][np.asarray(d["valid"], bool)]).all()


def test_finite_run_writes_no_snapshot(tmp_path):
    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=2, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=128, n_init_points=100),
        pipe=PipelineConfig(rasterizer="reference"),
        model_path=str(tmp_path / "out"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(16, 16))
    tr.train(iterations=5, eval_iters=[])
    assert not list((tmp_path / "out").glob("snapshot_*.npz")) \
        if (tmp_path / "out").exists() else True
