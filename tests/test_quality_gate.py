"""The bench quality gate at CPU scale (VERDICT r4 next 3).

bench._quality_psnr runs a reduced-but-real pipeline (full Trainer loop, all
six loss terms, the motion-aware densify window, measured budgets, fixed
seed) and its PSNR is the driver-visible stand-in for the reference's
committed result/ZJU.txt metrics (the real-dataset parity gate is
environment-blocked — no ZJU data / SMPL pickle / LPIPS weights). The TPU
bench pins bench.PSNR_FLOORS; this slow CPU test pins the same gate at a
shape CI can afford, so a regression in densify/loss/raster math fails the
suite, not just the next TPU bench run.
"""
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_quality_gate_cpu_scale():
    import bench

    psnr, _ = bench._quality_psnr(128, 128, capacity=768, n_verts=400,
                                  iters=120, crop=48)
    # measured 38.9 on this fixture (r5); the floor leaves ~3 dB of platform
    # slack while any real math regression (a broken loss term, densify op,
    # or kernel gradient) costs far more than that
    assert psnr >= 36.0, f"quality gate: psnr {psnr:.2f} < 36.0 floor"
