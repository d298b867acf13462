"""Multi-chip sharding on the 8-virtual-device CPU mesh.

The standard JAX answer to testing multi-host logic on one machine
(SURVEY.md §4): a fake-device mesh + shard_map. Verifies that the
('data','tile') sharded train step matches the single-chip step numerically
(same loss, same parameter updates) — i.e. the pixel-band decomposition with
replicated Gaussians and psum'd gradients is exact, not approximate.
"""
import os

os.environ["MOSS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.parallel.sharded import make_mesh, make_sharded_train_step, stack_frames
from moss_tpu.train.train_step import TrainState, make_train_step
from moss_tpu.train.trainer import init_gaussians_and_mlps
from moss_tpu.ops.rasterize_tpu import rasterize_tpu


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "tests need the 8-virtual-device CPU mesh"
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200))
    key = jax.random.PRNGKey(0)
    params, gstate, mlps = init_gaussians_and_mlps(scene, cfg, key)
    p = {"gauss": params, "mlps": mlps}
    return scene, frames, cfg, p, gstate


class TestShardedStep:
    def test_matches_single_chip(self, setup):
        scene, frames, cfg, p, gstate = setup
        mesh = make_mesh(2, 4)

        init_s, step_s = make_sharded_train_step(scene, cfg, mesh, 48, 48)
        ts0 = TrainState(p, init_s(p), gstate, jnp.asarray(0))
        frames_b = stack_frames(frames[:2])
        ts_sharded, logs_sharded = step_s(ts0, frames_b, 1)

        # single-chip: average the two frames' losses by running both and
        # averaging gradients is NOT the same as two sequential steps, so
        # compare against a batch-of-2 manual computation instead: run the
        # sharded step with n_data=1 twice and compare to n_data=2 once.
        mesh1 = make_mesh(1, 4)
        init_1, step_1 = make_sharded_train_step(scene, cfg, mesh1, 48, 48)
        ts0b = TrainState(p, init_1(p), gstate, jnp.asarray(0))
        _, logs_f0 = step_1(ts0b, stack_frames(frames[:1]), 1)

        # and against the fully unsharded single-frame step
        init_u, step_u = make_train_step(scene, cfg, rasterize_tpu, None, 48, 48)
        ts0c = TrainState(p, init_u(p), gstate, jnp.asarray(0))
        _, logs_u = step_u(ts0c, frames[0], 1)

        np.testing.assert_allclose(
            float(logs_f0["loss"]), float(logs_u["loss"]), rtol=1e-4, atol=1e-5
        )
        # batch loss = mean of per-frame losses
        _, logs_f1 = step_1(ts0b, stack_frames(frames[1:2]), 1)
        expect = 0.5 * (float(logs_f0["loss"]) + float(logs_f1["loss"]))
        np.testing.assert_allclose(float(logs_sharded["loss"]), expect, rtol=1e-4, atol=1e-5)

    def test_param_updates_match(self, setup):
        """n_data=1 sharded update == unsharded update (same frame)."""
        scene, frames, cfg, p, gstate = setup
        mesh1 = make_mesh(1, 4)
        init_1, step_1 = make_sharded_train_step(scene, cfg, mesh1, 48, 48)
        ts0 = TrainState(p, init_1(p), gstate, jnp.asarray(0))
        ts1, _ = step_1(ts0, stack_frames(frames[:1]), 1)

        init_u, step_u = make_train_step(scene, cfg, rasterize_tpu, None, 48, 48)
        ts0u = TrainState(p, init_u(p), gstate, jnp.asarray(0))
        ts1u, _ = step_u(ts0u, frames[0], 1)

        a = np.asarray(ts1.params["gauss"].xyz)
        b = np.asarray(ts1u.params["gauss"].xyz)
        np.testing.assert_allclose(a, b, atol=2e-5)
        ga = np.asarray(ts1.gstate.xyz_grad_accum)
        gb = np.asarray(ts1u.gstate.xyz_grad_accum)
        np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-5)


def test_sharded_gt_lpips_cache_parity(setup):
    """Sharded step with the staged gt LPIPS towers == without (hoisted gt
    tower is the same computation; see trainer._stage_gt_lpips_feats)."""
    from moss_tpu.ops import lpips_jax
    from moss_tpu.train.losses import crop_window

    scene, frames, cfg, p, gstate = setup
    mesh = make_mesh(2, 4)
    init_s, step_s = make_sharded_train_step(scene, cfg, mesh, 48, 48)
    ts0 = TrainState(p, init_s(p), gstate, jnp.asarray(0))
    frames_b = stack_frames(frames[:2])

    lp = lpips_jax.get_default_params()
    feats = [
        lpips_jax.gt_features(
            lp, crop_window(f.image, f.crop_y0, f.crop_x0, 48, 48)
        )
        for f in frames[:2]
    ]
    feats_b = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *feats)

    _, logs_plain = step_s(ts0, frames_b, 1)
    _, logs_cached = step_s(ts0, frames_b, 1, feats_b)
    np.testing.assert_allclose(
        float(logs_cached["lpips"]), float(logs_plain["lpips"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(logs_cached["loss"]), float(logs_plain["loss"]), rtol=1e-5
    )
