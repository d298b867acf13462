"""reset_opacity must zero the opacity Adam moments.

The reference's reset goes through replace_tensor_to_optimizer, which zeroes
exp_avg/exp_avg_sq for the opacity tensor while keeping 'step'
(/root/reference/scene/gaussian_model.py:314-317,362-375). Keeping stale
moments (the round-3 behavior) lets the retained first moment immediately
push opacities back toward their pre-reset values — live on white-background
runs where the reset fires at densify_from_iter (train_ZJU.py:184-185).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.models import gaussians as G
from moss_tpu.train.trainer import Trainer
from moss_tpu.train.train_step import TrainState


def _moments(opt_state, group):
    """(mu leaves, nu leaves, count) of one multi_transform group."""
    masked = opt_state.inner_states[group]
    adam = [
        s for s in jax.tree.leaves(
            masked, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert len(adam) == 1
    a = adam[0]
    return jax.tree.leaves(a.mu), jax.tree.leaves(a.nu), a.count


@pytest.fixture(scope="module")
def trained():
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=48, W=48)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        optim=OptimConfig(
            iterations=12, densify_from_iter=100, densify_until_iter=100
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(40, 40))
    tr.train(iterations=12, eval_iters=[])
    return tr, frames


def test_moments_zeroed_others_untouched(trained):
    tr, _ = trained
    mu, nu, count = _moments(tr.ts.opt_state, "opacity")
    assert any(float(jnp.abs(m).max()) > 0 for m in mu), "no training signal"
    assert any(float(jnp.abs(n).max()) > 0 for n in nu)
    xyz_mu_before = [np.asarray(m) for m in _moments(tr.ts.opt_state, "xyz")[0]]

    ts_before = tr.ts
    tr.reset_opacity()
    mu, nu, count2 = _moments(tr.ts.opt_state, "opacity")
    assert all(float(jnp.abs(m).max()) == 0.0 for m in mu)
    assert all(float(jnp.abs(n).max()) == 0.0 for n in nu)
    # the bias-correction step counter is kept (torch retains stored 'step')
    assert int(count2) == int(count)
    # other groups' moments untouched
    for before, after in zip(xyz_mu_before, _moments(tr.ts.opt_state, "xyz")[0]):
        np.testing.assert_array_equal(before, np.asarray(after))
    # and the opacities themselves were clamped
    op = G.get_opacity(tr.ts.params["gauss"])
    valid = np.asarray(tr.ts.gstate.valid)
    assert float(np.asarray(op)[valid].max()) <= 0.01 + 1e-6
    tr.ts = ts_before  # restore for the trajectory test


def test_post_reset_step_free_of_pre_reset_history(trained):
    """The defect in one probe: apply the optimizer with ZERO gradients right
    after the reset. Stale moments (round-3 behavior) still move the freshly
    reset opacities by O(lr) — pre-reset history contaminating post-reset
    steps; zeroed moments move them only by the tiny AdamW weight-decay term."""
    from moss_tpu.train.optim import make_optimizer

    tr, frames = trained
    ts_before = tr.ts
    tr.reset_opacity()
    ts_fixed = tr.ts
    tr.ts = ts_before

    # stale path: the round-3 behavior — clamp logits, keep the moments
    p = dict(ts_before.params)
    p["gauss"] = G.reset_opacity(ts_before.params["gauss"])
    ts_stale = TrainState(p, ts_before.opt_state, ts_before.gstate, ts_before.step)

    tx = make_optimizer(tr.cfg.optim, spatial_lr_scale=tr.extent)
    valid = np.asarray(ts_before.gstate.valid)

    def opacity_move(ts):
        zero_g = jax.tree.map(jnp.zeros_like, ts.params)
        upd, _ = tx.update(zero_g, ts.opt_state, ts.params)
        return np.abs(np.asarray(upd["gauss"].opacity))[valid]

    move_fixed = opacity_move(ts_fixed)
    move_stale = opacity_move(ts_stale)
    o = tr.cfg.optim
    # weight-decay-only bound for the zeroed path: lr * wd * |logit|
    logit = np.abs(np.asarray(ts_fixed.params["gauss"].opacity))[valid]
    wd_bound = o.opacity_lr * o.weight_decay * logit + 1e-12
    assert (move_fixed <= wd_bound * 1.001).all()
    # the stale path keeps a gradient-driven O(lr) step on many splats
    assert float(move_stale.max()) > 10.0 * float(move_fixed.max())
    assert (move_stale > 2.0 * wd_bound).mean() > 0.2
    tr.ts = ts_before


def test_converges_with_periodic_resets():
    """A run whose opacity_reset_interval fires mid-run still reaches a good
    photometric fit (the reference's reset is part of normal training)."""
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=48, W=48)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        optim=OptimConfig(
            iterations=80, densify_from_iter=100, densify_until_iter=100,
            opacity_reset_interval=30,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    l1s = []
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(40, 40),
                 log_fn=lambda it, logs: l1s.append(float(logs["l1"])))
    tr.train(iterations=80, eval_iters=[80])
    assert np.isfinite(l1s[-1]) and l1s[-1] < 0.08
    assert np.isfinite(tr.metrics_history[-1]["psnr"])
