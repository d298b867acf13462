"""Full differentiable render: deform -> covariance fold-in -> SH -> rasterize.

TPU-native equivalent of the reference renderer glue
(/root/reference/gaussian_renderer/__init__.py:21-136). One pure function from
(Gaussian params, MLP params, frame SMPL params, camera) to images + the
training contract extras (transforms/translation for the MLP-free eval path,
pose-correction output for the Fisher NLL, blend weights for densification) —
the renderer's return is part of the training contract, not just an image
(SURVEY.md §3.2).

The deformation transform is always folded into the 3D covariance on the XLA
side (the reference runs with compute_cov3D_python=True,
arguments/__init__.py:60) and SH colors are always evaluated outside the blend
kernel, so the rasterizer proper only ever sees (mean2d, conic, color,
opacity, depth).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import jax

from ..models import gaussians as G
from ..models import lbs_field, pose_refine
from ..models.deform import apply_cached_transform, coarse_deform_c2source
from ..models.smpl import SMPLModel
from ..ops.projection import preprocess
from ..ops.rasterize_ref import rasterize_reference
from ..ops.sh import sh_to_color
from .camera import Camera


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneContext:
    """Per-sequence constants: body model + canonical big pose."""

    smpl: SMPLModel
    big_pose_params: Any      # dict: poses/shapes/R/Th
    big_pose_vertices: Any    # (V, 3) big-pose world vertices


def render_frame(
    params: G.GaussianParams,
    valid,
    mlps: Optional[Dict],
    scene: SceneContext,
    smpl_params: Dict,
    camera: Camera,
    bg_color,
    sh_degree: int,
    rasterize_fn: Optional[Callable] = None,
    mean2d_offset=None,
    cached_transforms=None,
    cached_translation=None,
    motion_offset: bool = True,
    static_scene: bool = False,
    active_sh=None,
    scaling_modifier: float = 1.0,
    override_color=None,
):
    """Render one frame.

    mlps: {"pose": pose_refine params, "lbs": lbs_field params} or None.
    rasterize_fn(proj, bg, H, W) -> dict; defaults to the jnp oracle.
    mean2d_offset: optional (P, 2) zeros added to mean2d so the train step can
      read d(loss)/d(mean2d) for densification stats (the reference's
      screenspace_points trick, gaussian_renderer/__init__.py:29-33).
    cached_transforms/translation: the MLP-free eval path
      (gaussian_renderer/__init__.py:73-77).
    active_sh: optional TRACED SH warmup degree (see ops/sh.degree_coeff_mask);
      sh_degree stays the static maximum.
    """
    means_canonical = params.xyz
    pose_out = None
    bweights = None
    transforms = cached_transforms
    translation = cached_translation

    if static_scene:
        # vanilla-3DGS path (COLMAP/Blender scenes): no body, no deformation
        means3d = means_canonical
        transforms = None
    elif not motion_offset:
        out = coarse_deform_c2source(
            scene.smpl, means_canonical, smpl_params,
            scene.big_pose_params, scene.big_pose_vertices,
        )
        means3d, transforms, translation = out.world_pts, out.transforms, out.translation
        bweights = out.bweights
    elif transforms is None:
        pose_out = pose_refine.apply(mlps["pose"], smpl_params["poses"])
        correct_Rs = pose_out["Rs"]  # (23, 3, 3)
        lbs_delta = lbs_field.apply(mlps["lbs"], means_canonical, correct_Rs)
        out = coarse_deform_c2source(
            scene.smpl, means_canonical, smpl_params,
            scene.big_pose_params, scene.big_pose_vertices,
            lbs_weight_delta=lbs_delta, correct_Rs=correct_Rs,
        )
        means3d, transforms, translation = out.world_pts, out.transforms, out.translation
        bweights = out.bweights
    else:
        means3d = apply_cached_transform(means_canonical, transforms, translation)

    cov3d = G.get_covariance(
        params, transform=transforms, scaling_modifier=scaling_modifier
    )
    if override_color is not None:
        # reference render(override_color=...) bypasses SH entirely
        # (gaussian_renderer/__init__.py:21,100-107)
        color = override_color
    else:
        feats = G.get_features(params)
        if active_sh is not None:
            # traced warmup degree: mask coefficients instead of specializing
            # the program on the degree (ops/sh.degree_coeff_mask) — one
            # compile for the whole SH warmup instead of one per stage
            from ..ops.sh import degree_coeff_mask

            feats = feats * degree_coeff_mask(active_sh, feats.shape[1])
        color = sh_to_color(sh_degree, feats, means3d, camera.cam_center)
    opacity = G.get_opacity(params)

    proj = preprocess(means3d, cov3d, color, opacity, camera, valid_mask=valid)
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)

    if rasterize_fn is None:
        images = rasterize_reference(proj, bg_color, camera.height, camera.width)
    else:
        images = rasterize_fn(proj, bg_color, camera.height, camera.width)

    # pass rasterizer extras (e.g. the `overflow` drop counter — SURVEY §7:
    # no silent caps) through to the training contract
    extra = {
        k: v for k, v in images.items()
        if k not in ("color", "depth", "alpha", "final_T")
    }
    return {
        "render": images["color"],          # (H, W, 3)
        "render_depth": images["depth"],
        "render_alpha": images["alpha"],
        "final_T": images.get("final_T"),
        "radii": proj.radius,
        "visibility_filter": proj.valid & (proj.radius > 0),
        "transforms": transforms,
        "translation": translation,
        "pose_out": pose_out,
        "lbs_weights": bweights,
        "means3D": means3d,
        **extra,
    }
