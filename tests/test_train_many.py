"""Fused multi-step dispatch must reproduce per-step training exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.parallel.sharded import stack_frames
from moss_tpu.train.train_step import TrainState, make_train_many, make_train_step
from moss_tpu.train.trainer import init_gaussians_and_mlps


def test_fused_equals_stepwise():
    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=3, H=64, W=64)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150))
    params, gstate, mlps = init_gaussians_and_mlps(scene, cfg, jax.random.PRNGKey(0))
    p = {"gauss": params, "mlps": mlps}

    init_fn, step_fn = make_train_step(scene, cfg, None, None, 48, 48)
    ts_a = TrainState(p, init_fn(p), gstate, jnp.asarray(0, jnp.int32))
    ts_b = TrainState(p, init_fn(p), gstate, jnp.asarray(0, jnp.int32))

    order = [0, 2, 1, 0, 1]
    for i in order:
        ts_a, logs_a = step_fn(ts_a, frames[i], 1)

    many_fn = make_train_many(step_fn)
    ts_b, logs_b = many_fn(ts_b, stack_frames(frames), jnp.asarray(order, jnp.int32), 1)

    np.testing.assert_allclose(
        np.asarray(ts_b.params["gauss"].xyz), np.asarray(ts_a.params["gauss"].xyz),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ts_b.gstate.xyz_grad_accum), np.asarray(ts_a.gstate.xyz_grad_accum),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(float(logs_b["loss"]), float(logs_a["loss"]), rtol=1e-5)
    assert int(ts_b.step) == len(order)


def test_scan_sh_degree_is_per_step():
    """A scan block that spans a 1000-multiple must bump the SH degree ON
    the 1000th iteration (the reference's oneupSHdegree runs before that
    step, train_ZJU.py:85-86) — with max_sh_degree given, make_train_many
    derives the degree from the traced ts.step instead of a stale per-block
    constant."""
    import jax.numpy as jnp

    from moss_tpu.train.train_step import TrainState, make_train_many

    degs = []

    def fake_step(ts, frame, deg, feats=None):
        return ts._replace(step=ts.step + 1), {"deg": deg}

    many = make_train_many(fake_step, max_sh_degree=3)
    frames = {"x": jnp.zeros((2, 1))}
    # steps 996..1000 (ts.step starts at 995): iterations 996-999 -> deg 0,
    # iteration 1000 -> deg 1; the chunk's LAST logs carry the boundary step
    ts = TrainState({}, None, None, jnp.asarray(995, jnp.int32))
    ts, logs = many(ts, frames, jnp.zeros(5, jnp.int32), 0)
    assert int(logs["deg"]) == 1 and int(ts.step) == 1000
    # a chunk strictly before the boundary stays at the old degree
    ts2 = TrainState({}, None, None, jnp.asarray(994, jnp.int32))
    _, logs2 = many(ts2, frames, jnp.zeros(5, jnp.int32), 0)
    assert int(logs2["deg"]) == 0
    # degree saturates at max_sh_degree
    ts3 = TrainState({}, None, None, jnp.asarray(8000, jnp.int32))
    _, logs3 = many(ts3, frames, jnp.zeros(5, jnp.int32), 0)
    assert int(logs3["deg"]) == 3
