"""Configuration dataclasses (no argparse reflection, no eval()).

Replaces the reference's ParamGroup system (/root/reference/arguments/__init__.py)
with plain dataclasses + per-dataset presets (SURVEY.md §5.6). Defaults mirror
the values the reference actually trains with (train_ZJU.py:321 overrides,
arguments/__init__.py:36-86).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    sh_degree: int = 3
    smpl_type: str = "smpl"            # 'smpl' | 'smplx'
    actor_gender: str = "neutral"
    motion_offset: bool = True          # --motion_offset_flag
    # vanilla-3DGS mode for COLMAP/Blender scenes: no body model, no deform
    # chain, vanilla clone/split densify (reference densify_and_clone/split,
    # gaussian_model.py:456-494), no SMPL-distance prune. Requires
    # motion_offset=False.
    static_scene: bool = False
    white_background: bool = False
    # static Gaussian capacity; the reference caps densification at 45,695
    # points (gaussian_model.py:496) — we round up to a lane-aligned 46,080
    # and keep a validity mask (static shapes for XLA).
    capacity: int = 46080
    n_init_points: int = 6890


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    iterations: int = 3000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    pose_refine_lr: float = 0.00025     # 'auto_regression' group
    lbs_field_lr: float = 0.0001        # 'cross_attention_lbs' group
    adam_eps: float = 1e-15             # AdamW eps (gaussian_model.py:226)
    weight_decay: float = 0.01          # torch AdamW default

    percent_dense: float = 0.01
    densification_interval: int = 100
    opacity_reset_interval: int = 4000
    densify_from_iter: int = 400
    densify_until_iter: int = 2000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    kl_threshold: float = 0.4
    kl_merge_threshold: float = 0.1
    max_screen_size: int = 20
    # prune-by-SMPL-distance threshold in meters (EUCLIDEAN): the reference's
    # KNN_CUDA returns sqrt'ed distances (Garcia kNN-CUDA convention), so
    # `distance > 0.05` at gaussian_model.py:657-661 is a 5 cm shell.
    # train/densify.py compares sqrt(d2) against this.
    smpl_dist_threshold: float = 0.05

    # loss weights (train_ZJU.py:131)
    w_l1: float = 1.0
    w_mask: float = 0.5
    w_ssim: float = 0.2
    w_lpips: float = 0.5
    w_nll: float = 0.06
    w_s3im: float = 0.3


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # our rasterizer always folds the deformation into a python-side covariance
    # (the reference default compute_cov3D_python=True) and always evaluates SH
    # on the XLA side before the blend kernel. The tile geometry is NOT
    # configurable: 8x128 tiles are the f32 vreg shape the kernel writes
    # natively (ops/rasterize_tpu.TILE_H/TILE_W, PERF.md "TPU-specific
    # findings") — a knob here would be dead or a silent lie.
    #
    # Initial rect cap (max subtiles one Gaussian may occupy before its
    # overflow tiles are counted + healed). The trainer's probe may LOWER it
    # at init when the measured max rect is smaller (key sort runs over
    # P*B entries) and the self-heal raises it on observed rect overflow.
    max_tiles_per_gaussian: int = 16
    rasterizer: str = "pallas"          # 'pallas' | 'reference'
    # like the reference's separate --test_iterations / --save_iterations
    # (train_ZJU.py:298-307): evals and checkpoint/PLY saves fire
    # independently (Trainer.train eval_iters / save_iters).
    test_iterations: Tuple[int, ...] = (2500, 2700, 3000)
    save_iterations: Tuple[int, ...] = (2500, 2700, 3000)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    optim: OptimConfig = OptimConfig()
    pipe: PipelineConfig = PipelineConfig()
    seed: int = 3407                    # reference safe_state seed
    source_path: str = ""
    model_path: str = "output/default"
    exp_name: str = "default"


def zju_preset(subject: str = "377") -> Config:
    return dataclasses.replace(
        Config(),
        exp_name=f"zju_mocap_refine/my_{subject}",
    )


def monocap_preset(seq: str = "olek_images0812") -> Config:
    return dataclasses.replace(Config(), exp_name=f"monocap/{seq}")


def save_json(cfg: Config, path: str) -> None:
    """Persist the experiment config (the reference dumps an eval()-able
    Namespace repr to cfg_args, arguments/__init__.py:94-102 — this is the
    JSON equivalent, re-read by render drivers via load_json)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_json(path: str) -> Config:
    """Rebuild a Config from save_json output; unknown keys are rejected."""
    import json

    with open(path) as f:
        raw = json.load(f)
    pipe = raw.get("pipe", {})
    for k in ("test_iterations", "save_iterations"):
        if k in pipe:
            pipe[k] = tuple(pipe[k])
    return Config(
        model=ModelConfig(**raw.get("model", {})),
        optim=OptimConfig(**raw.get("optim", {})),
        pipe=PipelineConfig(**pipe),
        **{k: v for k, v in raw.items() if k not in ("model", "optim", "pipe")},
    )
