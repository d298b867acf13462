"""Reference as-executed optimizer-step skips (train_ZJU.py:168-190).

torch skips parameters whose .grad is None; the reference's densify/reset
REPLACE tensors before optimizer.step(), so as executed: densify iterations
skip the whole Gaussian update (MLPs still step), opacity-reset iterations
skip opacity alone, and the final iteration skips everything
(`if iteration < opt.iterations`). The fused TPU step reproduces these with
traced selects (optim.apply_reference_update_skips) so the host-side densify
operates on pre-update parameters exactly like the reference's ordering.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.train_step import TrainState, make_train_step
from moss_tpu.train.trainer import init_gaussians_and_mlps


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=1, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=128, n_init_points=100),
        optim=OptimConfig(
            iterations=8, densify_from_iter=2, densify_until_iter=9,
            densification_interval=5, opacity_reset_interval=6,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    params, gstate, mlps = init_gaussians_and_mlps(
        scene, cfg, jax.random.PRNGKey(0))
    p = {"gauss": params, "mlps": mlps}
    init_fn, step_fn = make_train_step(scene, cfg, None, None, 16, 16)
    return scene, frames, cfg, p, gstate, init_fn, step_fn


def _adam_count(opt_state, group):
    adam = [s for s in jax.tree.leaves(
        opt_state.inner_states[group],
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    return int(adam[0].count)


def _run_at(setup, it):
    scene, frames, cfg, p, gstate, init_fn, step_fn = setup
    ts = TrainState(p, init_fn(p), gstate, jnp.asarray(it - 1, jnp.int32))
    ts2, _ = step_fn(ts, frames[0], 1)
    return ts, ts2


def _changed(a, b):
    return bool(np.any(np.asarray(a) != np.asarray(b)))


def test_normal_iteration_updates_everything(setup):
    ts, ts2 = _run_at(setup, 3)
    g, g2 = ts.params["gauss"], ts2.params["gauss"]
    assert _changed(g.xyz, g2.xyz) and _changed(g.opacity, g2.opacity)
    assert _changed(jax.tree.leaves(ts.params["mlps"])[0],
                    jax.tree.leaves(ts2.params["mlps"])[0])
    assert _adam_count(ts2.opt_state, "xyz") == 1
    assert int(ts2.step) == 3


def test_densify_iteration_skips_gaussians_not_mlps(setup):
    # it=5: 2 < 5 < 9 and 5 % 5 == 0 -> all six Gaussian tensors frozen
    # (the host densify then sees PRE-update params, like the reference
    # running densify_and_prune before step()); the MLPs still step
    ts, ts2 = _run_at(setup, 5)
    g, g2 = ts.params["gauss"], ts2.params["gauss"]
    for f in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g, f)), np.asarray(getattr(g2, f)), err_msg=f)
    assert _changed(jax.tree.leaves(ts.params["mlps"])[0],
                    jax.tree.leaves(ts2.params["mlps"])[0])
    # frozen groups also freeze their Adam step counter (torch's per-param
    # 'step' only advances when the param has a grad)
    assert _adam_count(ts2.opt_state, "xyz") == 0
    assert _adam_count(ts2.opt_state, "pose") == 1
    # stats still accumulate and the iteration counter advances
    assert float(jnp.sum(ts2.gstate.denom)) > 0
    assert int(ts2.step) == 5


def test_reset_iteration_skips_opacity_only(setup):
    # it=6: 6 % opacity_reset_interval == 0 -> opacity frozen, rest update
    ts, ts2 = _run_at(setup, 6)
    g, g2 = ts.params["gauss"], ts2.params["gauss"]
    np.testing.assert_array_equal(np.asarray(g.opacity),
                                  np.asarray(g2.opacity))
    assert _changed(g.xyz, g2.xyz)
    assert _adam_count(ts2.opt_state, "opacity") == 0
    assert _adam_count(ts2.opt_state, "xyz") == 1


def test_final_iteration_skips_everything(setup):
    # it=8 == optim.iterations: `if iteration < opt.iterations` skips step()
    ts, ts2 = _run_at(setup, 8)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert _adam_count(ts2.opt_state, "xyz") == 0
    assert _adam_count(ts2.opt_state, "pose") == 0
    assert int(ts2.step) == 8


def test_white_background_reset_at_densify_from(setup):
    scene, frames, cfg, p, gstate, _, _ = setup
    import dataclasses

    cfg_wb = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, white_background=True))
    init_fn, step_fn = make_train_step(scene, cfg_wb, None, None, 16, 16)
    ts = TrainState(p, init_fn(p), gstate,
                    jnp.asarray(cfg.optim.densify_from_iter - 1, jnp.int32))
    ts2, _ = step_fn(ts, frames[0], 1)
    g, g2 = ts.params["gauss"], ts2.params["gauss"]
    np.testing.assert_array_equal(np.asarray(g.opacity),
                                  np.asarray(g2.opacity))
    assert _changed(g.xyz, g2.xyz)
