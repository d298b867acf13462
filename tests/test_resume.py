"""Mid-run resume (SURVEY §5.3 elastic recovery) + run-level determinism.

The reference's --start_checkpoint restore is broken (self.self typo,
gaussian_model.py:131). Here, a run killed after a checkpoint and resumed in
a FRESH process-equivalent (new Trainer, load()) must replay the identical
remaining schedule: the frame order is a pure function of the config seed,
densify randomness is fold_in(key, iteration) (not a mutating split, so the
resumed stream matches the uninterrupted one), passed boundaries are
skipped, and the LR schedule rides the restored Adam step count.
"""
import numpy as np
import jax
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer


def _cfg():
    return Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=150),
        optim=OptimConfig(
            iterations=20, densify_from_iter=4, densify_until_iter=18,
            densification_interval=5, opacity_reset_interval=10_000,
        ),
        pipe=PipelineConfig(rasterizer="reference"),
    )


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=3, H=48, W=48, crop=32)
    return scene, frames


def _final_state(tr):
    g = tr.ts.params["gauss"]
    return {
        "xyz": np.asarray(g.xyz), "opacity": np.asarray(g.opacity),
        "scaling": np.asarray(g.scaling),
        "valid": np.asarray(tr.ts.gstate.valid),
        "step": int(tr.ts.step),
    }


def test_resume_matches_uninterrupted(setup, tmp_path):
    scene, frames = setup
    ck = str(tmp_path / "chkpnt10.npz")

    # uninterrupted run, checkpointing at iteration 10 POST-step (after that
    # boundary's densify — exactly what the drivers' ckpt_fn does, matching
    # the reference's torch.save after optimizer.step(), train_ZJU.py:197-200)
    tr = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
    tr.train(20, eval_iters=[10], ckpt_fn=lambda it: tr.save(ck))
    full = _final_state(tr)
    assert full["step"] == 20

    # fresh trainer ("new process"), load, continue — passed boundaries
    # (the iteration-10 eval + densifies at 5/10) must be skipped, the
    # densify at 15 must replay the same noise
    evals = []
    tr2 = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
    tr2.load(ck)
    assert int(tr2.ts.step) == 10
    densify_its = []
    orig = tr2.densify
    tr2.densify = lambda it: densify_its.append(it) or orig(it)
    tr2.train(20, eval_iters=[10])
    resumed = _final_state(tr2)
    assert densify_its == [15]  # 5 and 10 already done pre-checkpoint
    assert not tr2.metrics_history or all(
        m["iteration"] != 10 for m in tr2.metrics_history
    )

    assert resumed["step"] == 20
    np.testing.assert_array_equal(resumed["valid"], full["valid"])
    live = full["valid"]
    for k in ("xyz", "opacity", "scaling"):
        np.testing.assert_allclose(resumed[k][live], full[k][live],
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_resume_scan_engine_matches_queued_resume(setup, tmp_path):
    """Resume under the lax.scan block engine: the remaining boundary gaps
    drive the block gcd, per-step logs stay aligned, and the result matches
    the queued-engine resume."""
    scene, frames = setup
    finals = {}
    for engine in ("queued", "scan"):
        ck = str(tmp_path / f"ck_{engine}.npz")
        tr = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
        tr.train(20, eval_iters=[10], ckpt_fn=lambda it: tr.save(ck),
                 dispatch_engine=engine)
        its = []
        tr2 = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32),
                      log_fn=lambda it, lg: its.append(it))
        tr2.load(ck)
        tr2.train(20, eval_iters=[10], dispatch_engine=engine)
        assert its == list(range(11, 21)), (engine, its)
        finals[engine] = _final_state(tr2)
    np.testing.assert_allclose(
        finals["queued"]["xyz"], finals["scan"]["xyz"], rtol=1e-5, atol=1e-6
    )


def test_resume_refires_eval_whose_prestep_boundary_is_the_resume_point(
        setup, tmp_path):
    """Evals run at the i-1 PRE-step boundary (reference ordering). Resuming
    from a post-step checkpoint at iteration s must re-fire an eval labeled
    s+1 (its boundary IS the resume point, and iteration s+1 > s is replay
    territory) with the identical value, while evals labeled <= s stay
    skipped."""
    scene, frames = setup
    ck = str(tmp_path / "edge.npz")
    tr = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
    tr.train(20, eval_iters=[10, 11, 20],
             ckpt_fn=lambda it: tr.save(ck) if it == 10 else None)
    full = [(m["iteration"], float(m["psnr"])) for m in tr.metrics_history]

    tr2 = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
    tr2.load(ck)
    assert int(tr2.ts.step) == 10
    tr2.train(20, eval_iters=[10, 11, 20])
    resumed = [(m["iteration"], float(m["psnr"])) for m in tr2.metrics_history]
    assert [i for i, _ in resumed] == [11, 20]
    for (i_f, p_f), (i_r, p_r) in zip(
            [x for x in full if x[0] >= 11], resumed):
        assert i_f == i_r
        np.testing.assert_allclose(p_r, p_f, rtol=1e-6)


def test_train_past_end_is_noop(setup, tmp_path):
    scene, frames = setup
    tr = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
    tr.train(5, eval_iters=[])
    before = _final_state(tr)
    tr.train(5, eval_iters=[])  # start == iters -> nothing to do
    after = _final_state(tr)
    assert after["step"] == before["step"] == 5
    np.testing.assert_array_equal(after["xyz"], before["xyz"])


def test_two_identical_runs_bit_identical(setup):
    """Run-level determinism (SURVEY §5.2: deterministic reductions, no
    atomics): two fresh trainers with the same config produce bit-identical
    parameters through densify rounds."""
    scene, frames = setup
    outs = []
    for _ in range(2):
        tr = Trainer(scene, frames, frames[:1], _cfg(), crop_hw=(32, 32))
        tr.train(20, eval_iters=[])
        outs.append(_final_state(tr))
    np.testing.assert_array_equal(outs[0]["valid"], outs[1]["valid"])
    for k in ("xyz", "opacity", "scaling"):
        np.testing.assert_array_equal(outs[0][k], outs[1][k], err_msg=k)
