"""Eval-path overflow is surfaced and self-heals (VERDICT r3 weak 5 / next 3).

No render anywhere in the system may drop pairs without a counter someone
reads: evaluate() returns the summed eval-render drop counter as
`raster_overflow`, and a nonzero count grows the budgets so the NEXT eval
cannot drop (mesh mode keeps separate full-image eval budgets, probed at init
and after every densify — the per-band train budgets cannot cover a
single-program full-image render).
"""
import os

os.environ["MOSS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import pytest

from moss_tpu.config import Config, ModelConfig, OptimConfig
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.parallel.sharded import make_mesh
from moss_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_verts=150)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=128, crop=32)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=384, n_init_points=150))
    return scene, frames, cfg


def test_single_chip_eval_reports_zero_overflow(setup):
    scene, frames, cfg = setup
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32))
    m = tr.evaluate(frames)
    assert m["raster_overflow"] == 0
    # render_eval carries the counter too (render_frame passes extras through)
    out = tr.render_eval(frames[0])
    assert int(out["overflow"]) == 0


def test_mesh_eval_budgets_cover_full_image(setup):
    scene, frames, cfg = setup
    assert len(jax.devices()) >= 8
    mesh = make_mesh(2, 4)
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32), mesh=mesh)
    # the installed (or default-confirmed) eval budget covers the measured
    # FULL-IMAGE need — not just the per-band train need
    need = int(tr._probe_slot_need(frames[0], tr._eval_max_tiles, n_tile=1)[0])
    effective = tr._eval_slot or tr._default_budget_cap(
        tr._eval_pair, tr._eval_max_tiles, full_image=True)
    assert effective >= need
    m = tr.evaluate(frames)
    assert m["raster_overflow"] == 0
    assert np.isfinite(m["psnr"])


def test_mesh_eval_overflow_surfaces_heals_and_retries(setup):
    scene, frames, cfg = setup
    mesh = make_mesh(2, 4)
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32), mesh=mesh)
    # force an undersized eval slot budget: evaluate must detect the drops,
    # regrow, RE-RUN once, and return exact metrics with the pre-heal count
    # surfaced in its own key
    tr._install_eval_budgets(64, 0, 16)
    m1 = tr.evaluate(frames)
    assert m1["raster_overflow"] == 0          # the returned metrics are exact
    assert m1["raster_overflow_healed_from"] > 0  # ...and the drops surfaced
    # healed budgets persist and metrics match a fresh correctly-budgeted
    # trainer
    m2 = tr.evaluate(frames)
    assert m2["raster_overflow"] == 0
    assert "raster_overflow_healed_from" not in m2
    tr_ok = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32), mesh=mesh)
    m_ok = tr_ok.evaluate(frames)
    assert m1["psnr"] == pytest.approx(m_ok["psnr"], rel=1e-5)
    assert m2["psnr"] == pytest.approx(m_ok["psnr"], rel=1e-5)


def test_heal_escalation_doubles_growth_step(setup):
    """Consecutive overflow heals escalate the slot-budget growth step
    (1, 2, 4... buckets, bounded by the worst case): a post-heal re-probe
    can understate the live peak, and each single-bucket regrow costs a full
    recompile — chains of them burned minutes on the real-TPU e2e run."""
    scene, frames, cfg = setup
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32))
    hard = tr._max_slot_budget(tr._pair_budget, max(tr._max_tiles, 16))
    budgets = []
    for _ in range(3):
        cur = tr._slot_budget or tr._default_budget_cap(
            tr._pair_budget, tr._max_tiles)
        tr._resize_train_budgets(full=True, grow_from=cur)
        budgets.append(tr._slot_budget)
    assert tr._heal_events == 3
    assert budgets == sorted(budgets)
    bucket = 2048  # tiny-scene bucket (trainer picks it below 4*32768 caps)
    # growth step doubles per heal: +1, +2, +4 buckets (unless clamped)
    assert budgets[1] >= budgets[0] + 2 * bucket or budgets[1] == hard
    assert budgets[2] >= budgets[1] + 4 * bucket or budgets[2] == hard


def test_single_chip_eval_overflow_surfaces_heals_and_retries(setup):
    scene, frames, cfg = setup
    tr = Trainer(scene, frames, frames, cfg, crop_hw=(32, 32))
    tr._install_budgets(64, 0, 16)
    m1 = tr.evaluate(frames)
    assert m1["raster_overflow"] == 0
    assert m1["raster_overflow_healed_from"] > 0
    m2 = tr.evaluate(frames)
    assert m2["raster_overflow"] == 0
    assert "raster_overflow_healed_from" not in m2
