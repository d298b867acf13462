"""End-to-end training smoke/convergence tests on a synthetic scene (CPU).

BASELINE config-2/3 analogs at toy scale: a known Gaussian cloud posed by LBS
renders ground-truth frames; training from a perturbed/random init must
reduce the loss and improve PSNR. Uses the jnp oracle rasterizer on CPU.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer
from moss_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_verts=300)
    frames, target = make_frames(scene, n_frames=3, H=64, W=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=512, n_init_points=300),
        optim=OptimConfig(
            iterations=60, densify_from_iter=15, densify_until_iter=50,
            densification_interval=20,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    return scene, frames, cfg


class TestEndToEnd:
    def test_loss_decreases_and_densify_runs(self, setup):
        scene, frames, cfg = setup
        l1s = []

        def log(it, logs):
            l1s.append(float(logs["l1"]))

        tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48), log_fn=log)
        n0 = int(tr.ts.gstate.num_valid)
        tr.train(iterations=60, eval_iters=[60])
        assert len(l1s) >= 2
        # the photometric term must land at a good fit (the total loss can be
        # negative because the Fisher NLL is a true NLL)
        assert np.isfinite(l1s[-1]) and l1s[-1] < 0.05
        m = tr.metrics_history[-1]
        assert np.isfinite(m["psnr"]) and m["psnr"] > 25.0
        # params still finite after densify rounds
        leaves = jax.tree_util.tree_leaves(tr.ts.params)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves if l.dtype.kind == "f")

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48))
        tr.train(iterations=3, eval_iters=[])
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, tr.ts)
        ts2 = restore_checkpoint(path, tr.ts)
        for a, b in zip(jax.tree_util.tree_leaves(tr.ts), jax.tree_util.tree_leaves(ts2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_cached_transform_path(self, setup):
        """The MLP-free eval path must reproduce the full forward."""
        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48))
        tr.train(iterations=2, eval_iters=[])
        frame = frames[0]
        out_full = tr.render_eval(frame, sh_degree=0)
        from moss_tpu.render.render import render_frame

        out_cached = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid, tr.ts.params.get("mlps"),
            scene, frame.smpl_params, frame.camera, jnp.zeros(3), 0,
            rasterize_fn=tr.rasterize_fn,
            cached_transforms=out_full["transforms"],
            cached_translation=out_full["translation"],
        )
        np.testing.assert_allclose(
            np.asarray(out_cached["render"]), np.asarray(out_full["render"]), atol=1e-4
        )


class TestRenderAPISurface:
    """Reference render() extras: override_color, scaling_modifier, markVisible
    (gaussian_renderer/__init__.py:21; rasterizer_impl.cu:141-153)."""

    def test_override_color_and_scaling_modifier(self, setup):
        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48))
        frame = frames[0]
        from moss_tpu.render.render import render_frame

        P = tr.ts.params["gauss"].capacity
        flat = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (P, 1))
        out = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid, tr.ts.params.get("mlps"),
            scene, frame.smpl_params, frame.camera, jnp.zeros(3), 1,
            rasterize_fn=tr.rasterize_fn, override_color=flat,
        )
        img = np.asarray(out["render"])
        # all-red cloud on black background: green/blue channels stay 0
        assert img[..., 0].max() > 0.1
        np.testing.assert_allclose(img[..., 1:], 0.0, atol=1e-6)

        out_small = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid, tr.ts.params.get("mlps"),
            scene, frame.smpl_params, frame.camera, jnp.zeros(3), 1,
            rasterize_fn=tr.rasterize_fn, scaling_modifier=0.25,
        )
        out_base = render_frame(
            tr.ts.params["gauss"], tr.ts.gstate.valid, tr.ts.params.get("mlps"),
            scene, frame.smpl_params, frame.camera, jnp.zeros(3), 1,
            rasterize_fn=tr.rasterize_fn,
        )
        # shrunk splats cover less: alpha mass strictly drops
        assert float(out_small["render_alpha"].sum()) < float(out_base["render_alpha"].sum())

    def test_mark_visible(self, setup):
        scene, frames, cfg = setup
        frame = frames[0]
        from moss_tpu.ops.projection import mark_visible

        pts = np.asarray(scene.big_pose_vertices)
        vis = np.asarray(mark_visible(
            jnp.asarray(pts), frame.camera.world_view, frame.camera.full_proj
        ))
        assert vis.shape == (pts.shape[0],) and vis.dtype == bool
        assert vis.all()  # the synthetic rig looks at the body
        behind = jnp.asarray(np.asarray(frame.camera.cam_center)[None, :])
        # a point exactly at the camera center has view z = 0 < NEAR_Z
        assert not bool(mark_visible(
            behind, frame.camera.world_view, frame.camera.full_proj
        )[0])


def test_pair_buffer_autosize_growth(tiny_setup=None):
    """_resize_pair_buffer grows all three raster budgets monotonically in
    buckets, rebuilds the step exactly when something grows, never shrinks,
    and keeps binning defaults when they already cover the measured need."""
    import numpy as np
    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_scene, make_frames
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200))
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(48, 48))
    assert tr._autosize
    cap = tr._default_budget_cap()
    bucket = 32768 if cap >= 4 * 32768 else 2048
    pair_default = tr._default_pair_budget(16)
    v0 = tr._step_version

    # forced probe: (slot need, live pairs, max tiles per gaussian)
    tr._probe_slot_need = lambda f, B: np.array([1000, 100, 4])
    tr._resize_pair_buffer()
    b1 = -(-2000 // bucket) * bucket  # densify_ahead at default config: 2x
    if b1 >= cap:
        assert tr._slot_budget == 0 and tr._step_version == v0
    else:
        assert tr._slot_budget == b1 and tr._step_version == v0 + 1
        v0 += 1
    s0 = tr._slot_budget

    # smaller need: never shrink, never rebuild
    tr._probe_slot_need = lambda f, B: np.array([100, 10, 4])
    tr._resize_pair_buffer()
    assert tr._slot_budget == s0 and tr._step_version == v0

    # live pairs past the default NPb: pair budget engages (1.5x, bucketed)
    live = pair_default + 1000
    tr._probe_slot_need = lambda f, B: np.array([100, live, 4])
    tr._resize_pair_buffer()
    assert tr._pair_budget == -(-int(live * 1.5) // bucket) * bucket
    assert tr._step_version == v0 + 1
    v0 += 1

    # splats touching more tiles than the rect cap: max_tiles grows, but
    # never past the subtile count (a rect is clipped to the grid, so any
    # larger cap is pure waste — the (B, P) rect math scales with it)
    n_sub = tr._num_subtiles()
    tr._install_budgets(tr._slot_budget, tr._pair_budget, max_tiles=4)
    v0 = tr._step_version
    tr._probe_slot_need = lambda f, B: np.array([100, 10, 10])
    tr._resize_pair_buffer()
    assert tr._max_tiles == min(16, n_sub) and tr._step_version == v0 + 1
    v0 += 1
    # a (physically impossible) rect bigger than the grid: clamped, no thrash
    tr._probe_slot_need = lambda f, B: np.array([100, 10, 10 * n_sub])
    tr._resize_pair_buffer()
    assert tr._max_tiles == min(1024, n_sub)
    v0 = tr._step_version

    # recovery (grow_from): strictly grows the slot budget past the overflowed
    # one even when the probe claims the need is tiny — but never past the
    # TRUE worst-case slot bound (beyond it nothing can be dropped)
    cur = tr._slot_budget or cap
    hard = tr._max_slot_budget(tr._pair_budget, tr._max_tiles)
    tr._probe_slot_need = lambda f, B: np.array([100, 10, 4])
    tr._resize_pair_buffer(full=True, grow_from=cur)
    assert tr._slot_budget == min(cur + bucket, hard)
    assert tr._step_version == v0 + 1
    # overflow reported AT the worst-case bound: first call may legitimately
    # grow up TO the bound; a second identical report must NOT thrash
    tr._resize_pair_buffer(full=True, grow_from=hard)
    assert tr._slot_budget == hard
    v0 = tr._step_version
    tr._resize_pair_buffer(full=True, grow_from=hard)
    assert tr._slot_budget == hard and tr._step_version == v0


def test_stale_pair_budget_cannot_undercut_default():
    """VERDICT-r3 review finding: a previously-installed explicit pair budget
    must not survive once the (max_tiles-dependent) binning default has grown
    past it — 0-means-default beats a stale smaller explicit number, so the
    EFFECTIVE pair capacity never shrinks."""
    import numpy as np
    from moss_tpu.config import Config, ModelConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200))
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(48, 48))
    # force an explicit pair budget smaller than the current default
    default = tr._default_pair_budget(tr._max_tiles)
    stale = max(128, default // 2)
    tr._install_budgets(tr._slot_budget, pair_budget=stale,
                        max_tiles=tr._max_tiles)
    # a probe whose live-pair count fits the default but exceeds the stale
    # explicit budget: the resize must end with effective capacity >= live
    live = stale + 1
    assert live <= default
    tr._probe_slot_need = lambda f, B: np.array([100, live, 4])
    tr._resize_pair_buffer()
    effective = tr._pair_budget or tr._default_pair_budget(tr._max_tiles)
    assert effective >= live, (
        f"stale explicit pair budget {stale} undercuts live count {live}")


def test_config_json_roundtrip(tmp_path):
    import dataclasses
    from moss_tpu.config import (
        Config, ModelConfig, OptimConfig, save_json, load_json,
    )

    c = dataclasses.replace(
        Config(
            model=ModelConfig(sh_degree=2, capacity=1024),
            optim=OptimConfig(iterations=123, w_lpips=0.7),
        ),
        exp_name="roundtrip", model_path=str(tmp_path / "out"),
    )
    p = str(tmp_path / "cfg.json")
    save_json(c, p)
    assert load_json(p) == c


def test_spatial_lr_scale_scales_xyz_updates():
    """make_optimizer(spatial_lr_scale=s) multiplies ONLY the xyz LR by s —
    the reference's training_setup passes position_lr_init*spatial_lr_scale
    (gaussian_model.py:208,263-269; extent=1 for monocular, nerfpp radius for
    COLMAP/Blender scenes)."""
    import jax.numpy as jnp
    import numpy as np

    from moss_tpu.config import OptimConfig
    from moss_tpu.models.gaussians import create_from_points
    from moss_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    params, _ = create_from_points(pts, rng.uniform(size=(16, 3)).astype(np.float32),
                                   capacity=16)
    p = {"gauss": params}
    grads = jax.tree.map(jnp.ones_like, p)
    cfg = OptimConfig(weight_decay=0.0)

    def xyz_update(scale):
        opt = make_optimizer(cfg, spatial_lr_scale=scale)
        upd, _ = opt.update(grads, opt.init(p), p)
        return upd

    u1, u2 = xyz_update(1.0), xyz_update(2.0)
    np.testing.assert_allclose(
        np.asarray(u2["gauss"].xyz), 2.0 * np.asarray(u1["gauss"].xyz), rtol=1e-6
    )
    # non-xyz groups unaffected
    np.testing.assert_allclose(
        np.asarray(u2["gauss"].scaling), np.asarray(u1["gauss"].scaling), rtol=0
    )


class TestOverflowRecovery:
    """Pair-buffer overflow must be self-healing (VERDICT r2 weak 1): a
    boundary that reports raster_overflow > 0 re-probes the whole split and
    regrows the budget — the TPU analog of the reference's resize-on-retry
    arenas (rasterize_points.cu:27-33) — including OUTSIDE the densify window."""

    def test_overflow_self_heals(self):
        scene = make_scene(n_verts=200)
        frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
        cfg = Config(
            model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
            optim=OptimConfig(
                # densify window CLOSED: recovery must fire anyway
                iterations=20, densify_from_iter=100, densify_until_iter=0,
                densification_interval=100, opacity_reset_interval=10_000,
            ),
        )
        overflows = {}
        tr = Trainer(
            scene, frames, frames[:1], cfg, crop_hw=(48, 48),
            log_fn=lambda it, lg: overflows.__setitem__(
                it, int(lg.get("raster_overflow", 0))),
        )
        sabotage = 512  # far below any plausible aligned-slot need
        tr._install_budgets(sabotage)
        tr.train(iterations=20, eval_iters=[4, 20])
        # the first heal fires at the first boundary that sees a drop — the
        # eval-at-4 pre-step boundary (iteration 3); everything before it
        # must have overflowed, everything after the regrow must not
        assert overflows[3] > 0, "sabotaged budget failed to overflow"
        assert tr._slot_budget > sabotage, "trainer never regrew the budget"
        assert overflows[20] == 0, (
            f"regrown budget {tr._slot_budget} still drops pairs")


class TestReferenceLayout:
    """save_reference_layout / load_reference_layout roundtrip — the
    reference's per-iteration artifact tree (scene/__init__.py:109-123:
    point_cloud/iteration_N/point_cloud.ply + mlp_ckpt/iteration_N/ckpt.npz)
    written alongside chkpnt{N}.npz and loadable for rendering."""

    def test_roundtrip(self, setup, tmp_path):
        from moss_tpu.train.checkpoint import (
            load_reference_layout,
            save_reference_layout,
        )

        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg)
        tr.train(iterations=2, eval_iters=[])
        save_reference_layout(str(tmp_path), 2, tr.ts)

        ply = tmp_path / "point_cloud" / "iteration_2" / "point_cloud.ply"
        mlp = tmp_path / "mlp_ckpt" / "iteration_2" / "ckpt.npz"
        assert ply.exists() and mlp.exists()

        tr2 = Trainer(scene, frames, frames[:1], cfg)
        ts2 = load_reference_layout(str(tmp_path), 2, tr2.ts)

        valid = np.asarray(tr.ts.gstate.valid)
        n = int(valid.sum())
        # PLY stores only live rows, loader packs them into slots [0, n)
        valid2 = np.asarray(ts2.gstate.valid)
        assert valid2.sum() == n and valid2[:n].all()
        for field in ("xyz", "f_dc", "f_rest", "opacity", "scaling",
                      "rotation"):
            orig = np.asarray(getattr(tr.ts.params["gauss"], field))[valid]
            back = np.asarray(getattr(ts2.params["gauss"], field))[:n]
            np.testing.assert_allclose(back, orig, atol=1e-6, err_msg=field)
        # MLP params restored exactly
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0),
            tr.ts.params["mlps"], ts2.params["mlps"],
        )
        assert int(ts2.step) == 2

    def test_rendered_image_matches(self, setup, tmp_path):
        from moss_tpu.train.checkpoint import (
            load_reference_layout,
            save_reference_layout,
        )

        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg)
        tr.train(iterations=2, eval_iters=[])
        save_reference_layout(str(tmp_path), 2, tr.ts)
        img0 = np.asarray(tr.render_eval(frames[0])["render"])

        tr2 = Trainer(scene, frames, frames[:1], cfg)
        tr2.ts = load_reference_layout(str(tmp_path), 2, tr2.ts)
        img1 = np.asarray(tr2.render_eval(frames[0])["render"])
        np.testing.assert_allclose(img1, img0, atol=1e-5)


class TestScanDispatchEngine:
    """The lax.scan dispatch engine (Trainer.train(dispatch_engine='scan'),
    --dispatch scan) — one host round trip per gcd-sized block, for degraded
    host<->device links — must train equivalently to the default queued
    engine: same step function over the same seeded frame order."""

    def test_scan_matches_queued(self, setup):
        scene, frames, cfg = setup
        import dataclasses

        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(
                cfg.optim, iterations=30, densify_from_iter=5,
                densify_until_iter=25, densification_interval=10))

        def run(engine):
            losses = []
            tr = Trainer(scene, frames, frames[:1], cfg,
                         log_fn=lambda it, lg: losses.append(float(lg["loss"])))
            tr.train(30, eval_iters=[], dispatch_engine=engine)
            return tr, losses

        tr_q, loss_q = run("queued")
        tr_s, loss_s = run("scan")
        # identical math modulo compilation differences (scan body vs plain
        # step): trajectories and final live clouds agree tightly
        np.testing.assert_allclose(loss_s[-1], loss_q[-1], rtol=1e-3)
        vq = np.asarray(tr_q.ts.gstate.valid)
        vs = np.asarray(tr_s.ts.gstate.valid)
        assert vq.sum() == vs.sum()
        np.testing.assert_allclose(
            np.asarray(tr_s.ts.params["gauss"].xyz)[vs],
            np.asarray(tr_q.ts.params["gauss"].xyz)[vq], atol=1e-4)
        assert int(tr_s.ts.step) == 30

    def test_scan_overflow_self_heals(self):
        """The chunk-total overflow counter and the regrow hook work under
        the scan engine too."""
        scene = make_scene(n_verts=200)
        frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
        cfg = Config(
            model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
            optim=OptimConfig(
                iterations=20, densify_from_iter=100, densify_until_iter=0,
                densification_interval=100, opacity_reset_interval=10_000,
            ),
        )
        overflows = {}
        tr = Trainer(
            scene, frames, frames[:1], cfg, crop_hw=(48, 48),
            log_fn=lambda it, lg: overflows.__setitem__(
                it, int(lg.get("raster_overflow", 0))),
        )
        sabotage = 512
        tr._install_budgets(sabotage)
        tr.train(iterations=20, eval_iters=[4, 20], dispatch_engine="scan")
        # first heal at the eval-at-4 pre-step boundary (iteration 3)
        assert overflows[3] > 0, "sabotaged budget failed to overflow"
        assert tr._slot_budget > sabotage, "trainer never regrew the budget"
        assert overflows[20] == 0


class TestTorchCkptInterop:
    """load_reference_layout on a GENUINE reference-produced tree: mlp_ckpt
    holds a torch-pickled ckpt.pth of Autoregression/CrossAttention_lbs
    state dicts (scene/__init__.py:119-123), converted weight-for-weight into
    the mlps pytree; a deform model with NO mlp checkpoint at all is refused
    (random-init MLPs would render garbage silently)."""

    def _reference_state_dicts(self):
        import sys

        import torch

        torch.Tensor.cuda = lambda self, *a, **k: self
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from nets.mlp_delta_body_pose import Autoregression
        from nets.mlp_delta_weight_lbs import CrossAttention_lbs

        torch.manual_seed(7)
        return Autoregression(device="cpu"), CrossAttention_lbs()

    def test_pth_roundtrip_matches_torch_forward(self, setup, tmp_path):
        import torch

        from moss_tpu.models import lbs_field, pose_refine
        from moss_tpu.train.checkpoint import (
            load_reference_layout,
            save_reference_layout,
        )

        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg)
        save_reference_layout(str(tmp_path), 1, tr.ts)
        # overwrite the npz with a reference-style torch pickle
        mlp_dir = tmp_path / "mlp_ckpt" / "iteration_1"
        (mlp_dir / "ckpt.npz").unlink()
        autoreg, cross = self._reference_state_dicts()
        torch.save({"iter": 1, "Autoregression": autoreg.state_dict(),
                    "CrossAttention_lbs": cross.state_dict()},
                   str(mlp_dir / "ckpt.pth"))

        ts2 = load_reference_layout(str(tmp_path), 1, tr.ts)
        # converted weights reproduce the torch forward exactly
        rng = np.random.default_rng(3)
        poses = rng.normal(0, 0.3, (1, 72)).astype(np.float32)
        with torch.no_grad():
            rs_ref = autoreg(torch.tensor(poses))["Rs"].numpy()
        rs = np.asarray(
            pose_refine.apply(ts2.params["mlps"]["pose"], jnp.asarray(poses))["Rs"])
        np.testing.assert_allclose(rs, rs_ref, rtol=1e-4, atol=1e-5)

        pts = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        Rs = (np.broadcast_to(np.eye(3, dtype=np.float32), (23, 3, 3))
              + rng.normal(0, 0.05, (23, 3, 3)).astype(np.float32))
        with torch.no_grad():
            bw_ref = cross(torch.tensor(pts)[None], torch.tensor(Rs)[None])[0].numpy()
        bw = np.asarray(
            lbs_field.apply(ts2.params["mlps"]["lbs"], jnp.asarray(pts),
                            jnp.asarray(Rs)))
        np.testing.assert_allclose(bw, bw_ref, rtol=1e-4, atol=1e-5)

    def test_missing_mlp_ckpt_refused(self, setup, tmp_path):
        import shutil

        import pytest as _pytest

        from moss_tpu.train.checkpoint import (
            load_reference_layout,
            save_reference_layout,
        )

        scene, frames, cfg = setup
        tr = Trainer(scene, frames, frames[:1], cfg)
        save_reference_layout(str(tmp_path), 1, tr.ts)
        shutil.rmtree(tmp_path / "mlp_ckpt")
        with _pytest.raises(FileNotFoundError, match="mlp_ckpt"):
            load_reference_layout(str(tmp_path), 1, tr.ts)


def test_load_reprobes_budgets_for_denser_cloud(tmp_path):
    """Trainer.load() must re-probe the raster budgets under the LOADED
    cloud: the render drivers build a small-init trainer (test_frames[:1])
    and then load a trained checkpoint whose cloud is several times denser —
    budgets probed on the init cloud would silently truncate eval renders
    (no overflow hook exists on that path). Asserts the post-load budget
    covers the loaded cloud's measured need and the render matches the
    original trainer bit-for-bit."""
    from moss_tpu.render.render import render_frame

    scene = make_scene(n_verts=300)
    frames, _ = make_frames(scene, n_frames=2, H=96, W=128, crop=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=2048, n_init_points=300),
        optim=OptimConfig(
            iterations=40, densify_from_iter=5, densify_until_iter=35,
            densification_interval=5, densify_grad_threshold=1e-6,
            opacity_reset_interval=10_000,
        ),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(64, 64))
    tr.train(40, eval_iters=[])
    assert int(tr.ts.gstate.num_valid) > 600  # densify grew the cloud
    path = str(tmp_path / "ck.npz")
    tr.save(path)

    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, n_init_points=60))
    tr2 = Trainer(scene, frames[:1], frames[:1], cfg2, crop_hw=(64, 64))
    pre_budget = tr2._slot_budget
    tr2.load(path)
    # the re-probe sized the budget for the DENSE loaded cloud
    need = int(tr2._probe_slot_need(frames[0], tr2._max_tiles)[0])
    eff = tr2._slot_budget or tr2._default_budget_cap(
        tr2._pair_budget, tr2._max_tiles)
    assert eff >= need, (pre_budget, tr2._slot_budget, need)
    out = render_frame(
        tr2.ts.params["gauss"], tr2.ts.gstate.valid,
        tr2.ts.params.get("mlps"), scene, frames[0].smpl_params,
        frames[0].camera, jnp.zeros(3), 1, rasterize_fn=tr2.rasterize_fn)
    assert int(out["overflow"]) == 0
    ref = tr.render_eval(frames[0])["render"]
    np.testing.assert_allclose(np.asarray(out["render"]), np.asarray(ref),
                               atol=1e-5)


def test_eager_dispatch_engine():
    """The eager engine (per-step fetches, debugging) still trains."""
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        optim=OptimConfig(iterations=5),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    seen = []
    tr = Trainer(scene, frames, frames[:1], cfg,
                 log_fn=lambda it, lg: seen.append(it))
    tr.train(5, eval_iters=[], dispatch_engine="eager")
    assert int(tr.ts.step) == 5
    tr2 = Trainer(scene, frames, frames[:1], cfg)
    tr2.train(5, eval_iters=[], fused_dispatch=False)  # back-compat spelling
    assert int(tr2.ts.step) == 5


def test_rect_cap_lowering_only_on_first_probe():
    """r3 review finding: the init-only rect-cap lowering was gated on
    _budgets_installed, which stays False when the init probe fits the
    defaults (every early-return path installs nothing) — so a later
    densify-boundary resize could lower the effective cap from 16 MID-RUN,
    shrinking a budget the policy says never shrinks. The gate is now
    "first probe ever" (_init_probe_done), independent of whether that
    probe installed."""
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=48)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200))
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(48, 48))
    assert tr._init_probe_done  # the constructor probe is the one first probe
    # recreate the historical bug state: init probe fit the defaults, so
    # nothing was installed and the default budgets are in force
    tr._slot_budget, tr._pair_budget, tr._max_tiles = 0, 0, 16
    # a probe that WOULD qualify for lowering (max_rect 4 -> cap 8) on a
    # first probe must not lower at a densify-boundary resize
    tr._probe_slot_need = lambda f, B: np.array([100, 10, 4])
    tr._resize_pair_buffer()
    # slot-budget growth may legitimately install here; the regression is
    # the rect cap: it must stay at the default 16, not lower to 8
    assert tr._max_tiles == 16


def test_load_reprobes_budgets_from_scratch(tmp_path):
    """A stale escalated rect cap must not outlive the cloud that caused it
    (r5 finding, tools/bench_eval_fps.py): the render drivers build a
    big-splat init cloud — the probe escalates max_tiles — then load a
    small-splat trained cloud; the key sort scales with capacity*max_tiles,
    so keeping the escalation taxes every eval frame (measured 2.95M sort
    keys vs ~500k). load() resets the probe/heal state and re-probes the
    loaded cloud fresh; budget history is not checkpointed, so resume never
    relied on it."""
    import dataclasses as dc

    from moss_tpu.train.checkpoint import save_checkpoint

    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=2, H=512, W=128, crop=32)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150),
        optim=OptimConfig(iterations=4),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(32, 32))
    B0 = cfg.pipe.max_tiles_per_gaussian
    assert tr._max_tiles > B0, (
        "fixture failed to escalate the rect cap — init splats too small")

    # a "trained" cloud: tiny splats
    g = tr.ts.params["gauss"]
    small = dc.replace(g, scaling=jnp.full_like(g.scaling, jnp.log(0.002)))
    ts_small = tr.ts._replace(params={**tr.ts.params, "gauss": small})
    ck = str(tmp_path / "trained.npz")
    save_checkpoint(ck, ts_small)

    v_before = tr._step_version
    tr.load(ck)
    assert tr._max_tiles <= B0, (
        f"stale escalated rect cap survived load(): {tr._max_tiles} > {B0}")
    assert tr._step_version > v_before  # live fns rebuilt under fresh budgets


def test_compact_for_eval_preserves_renders_and_shrinks_capacity():
    """The serving-path capacity fit (Trainer.compact_for_eval): packing the
    live slots into a granularity-aligned buffer must leave the rendered
    image and eval metrics EXACTLY unchanged (blending order is depth-sorted,
    slot order is irrelevant; dead slots contribute nothing) while every
    per-pair buffer shrinks with the capacity."""
    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=2, H=48, W=48, crop=32)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=4096, n_init_points=150),
        optim=OptimConfig(iterations=6, densify_from_iter=2,
                          densify_until_iter=5, densification_interval=2),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(32, 32))
    tr.train(6, eval_iters=[])
    # scatter the live slots: densify left them non-contiguous already in
    # general; force at least one hole to make the packing non-trivial
    import dataclasses as dc

    valid = np.asarray(tr.ts.gstate.valid).copy()
    live_idx = np.flatnonzero(valid)
    assert valid.sum() > 10
    before_img = np.asarray(tr.render_eval(frames[1])["render"])
    before_m = tr.evaluate(frames[1:])

    cap = tr.compact_for_eval(granularity=256)
    assert cap < 4096 and cap % 256 == 0
    assert tr.ts.params["gauss"].capacity == cap
    assert int(np.asarray(tr.ts.gstate.valid).sum()) == len(live_idx)
    after_img = np.asarray(tr.render_eval(frames[1])["render"])
    after_m = tr.evaluate(frames[1:])
    np.testing.assert_allclose(after_img, before_img, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(after_m["psnr"], before_m["psnr"], rtol=1e-6)
    # no-op when the cloud already fills the buffer
    assert tr.compact_for_eval(granularity=256) == cap


def test_eval_at_intermediate_test_iteration_matches_reference_ordering():
    """MIGRATION's former 'one extra Adam step' divergence, now closed
    (VERDICT r4 missing 3): the engines evaluate test iteration i on
    post-step(i-1) params — the state the reference's training_report sees,
    since it runs BEFORE iteration i's optimizer.step()
    (train_ZJU.py:160-190). Pin the queued engine's eval at an intermediate
    test iteration against a hand loop ordered exactly as the reference."""
    from moss_tpu.train.train_step import active_sh_degree

    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=2, H=48, W=48, crop=32)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150),
        optim=OptimConfig(iterations=12, densify_from_iter=100,
                          densify_until_iter=100, w_lpips=0.0),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    k = 7  # intermediate test iteration (k < iterations)

    # reference-ordered oracle: dispatch steps 1..k-1, then evaluate —
    # exactly `training_report(k)` before `optimizer.step()` at iteration k
    tr_ref = Trainer(scene, frames, frames[:1], cfg, crop_hw=(32, 32))
    rng = np.random.default_rng(cfg.seed)
    order = []
    while len(order) < cfg.optim.iterations:
        order.extend(rng.permutation(len(frames)).tolist())
    ts = tr_ref.ts
    for it in range(1, k):
        ts, _ = tr_ref.step_fn(ts, frames[order[it - 1]],
                               active_sh_degree(it, cfg.model.sh_degree), None)
    tr_ref.ts = ts
    expected = tr_ref.evaluate(sh_it=k)
    # ...and the OLD (post-step-k) state the r4 engines evaluated, to show
    # the pin has teeth
    ts_post, _ = tr_ref.step_fn(ts, frames[order[k - 1]],
                                active_sh_degree(k, cfg.model.sh_degree), None)
    tr_ref.ts = ts_post
    stale = tr_ref.evaluate(sh_it=k)
    assert expected["psnr"] != stale["psnr"], (
        "step k moved nothing — the ordering pin would be vacuous")

    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(32, 32))
    tr.train(iterations=12, eval_iters=[k])
    got = tr.metrics_history[0]
    assert got["iteration"] == k
    np.testing.assert_allclose(got["psnr"], expected["psnr"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(got["ssim"], expected["ssim"], rtol=0, atol=1e-8)

    # the scan engine reaches the same pre-step boundary through min-clamped
    # chunk blocks (the k-1 split makes gaps the label-gcd doesn't divide)
    tr_s = Trainer(scene, frames, frames[:1], cfg, crop_hw=(32, 32))
    tr_s.train(iterations=12, eval_iters=[k], dispatch_engine="scan")
    got_s = tr_s.metrics_history[0]
    assert got_s["iteration"] == k
    np.testing.assert_allclose(got_s["psnr"], expected["psnr"],
                               rtol=1e-5, atol=1e-5)


def test_save_and_ckpt_hooks_fire_with_reference_ordering():
    """The reference orders its three in-loop artifact writes around the
    optimizer step (train_ZJU.py:160-200): training_report + scene.save see
    iteration i's PRE-step state (post-step(i-1)); the chkpnt torch.save
    runs POST-step at the test iterations. train() reproduces that:
    save_fn(i) fires at save_iters with ts.step == i-1 (== i only at the
    final iteration, where the traced step skip makes them the same state);
    ckpt_fn(i) fires at eval_iters with ts.step == i. save_iters is
    independent of eval_iters (reference --save_iterations,
    train_ZJU.py:298-307)."""
    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        optim=OptimConfig(iterations=20),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(48, 48))
    saved, ckpts = {}, {}

    def save_fn(it):
        saved[it] = (int(tr.ts.step),
                     np.asarray(tr.ts.params["gauss"].xyz).copy())

    def ckpt_fn(it):
        ckpts[it] = int(tr.ts.step)

    tr.train(iterations=20, eval_iters=[10, 20], save_fn=save_fn,
             save_iters=[6, 10, 20], ckpt_fn=ckpt_fn)
    # save_iters drives save_fn independently of eval_iters
    assert sorted(saved) == [6, 10, 20]
    # pre-step state at non-final saves, identical-state final boundary
    assert saved[6][0] == 5 and saved[10][0] == 9 and saved[20][0] == 20
    # chkpnt is post-step at the eval iterations
    assert ckpts == {10: 10, 20: 20}
    # distinct states — not the final model stamped twice
    assert not np.allclose(saved[10][1], saved[20][1])
    # eval labels match the requested iterations
    assert [m["iteration"] for m in tr.metrics_history] == [10, 20]
