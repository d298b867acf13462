"""Synthetic dataset: a posed synthetic SMPL body rendered to frames.

Stands in for ZJU-MoCap / MonoCap when the proprietary assets are absent
(SURVEY.md §4: dataset readers get synthetic-fixture tests). Produces the same
Frame pytrees the real readers emit, with ground-truth images rendered by the
oracle rasterizer from a known Gaussian cloud — so end-to-end training tests
can verify convergence toward a recoverable target.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import smpl as S
from ..models.gaussians import create_from_points
from ..ops.projection import preprocess
from ..ops.rasterize_ref import rasterize_reference
from ..ops.sh import sh_to_color
from ..ops.transforms import build_covariance
from ..render.camera import Camera
from ..render.render import SceneContext
from .frames import Frame


def make_scene(n_verts: int = 800, seed: int = 3407) -> SceneContext:
    model = S.synthetic_smpl(n_verts=n_verts, seed=seed)
    big = S.big_pose_params()
    v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
    return SceneContext(smpl=model, big_pose_params=big, big_pose_vertices=v_big)


def make_camera(H: int = 128, W: int = 128, dist: float = 2.5, angle: float = 0.0):
    """Camera on a circle around the origin, looking at it."""
    fx = 0.9 * max(H, W)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    c, s = np.cos(angle), np.sin(angle)
    # camera position in world
    eye = np.array([dist * s, 0.0, -dist * c])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R_w2c = np.stack([right, up2, fwd], axis=0)  # rows
    T = -R_w2c @ eye
    # reference convention: CameraInfo stores R transposed (dataset_readers)
    return Camera.from_KRT(K, R_w2c.T, T, H, W)


def random_pose(rng, magnitude: float = 0.25):
    poses = np.zeros(72, np.float32)
    poses[3:] = rng.normal(0, magnitude, 69)
    return poses


def make_frames(
    scene: SceneContext,
    n_frames: int = 4,
    H: int = 128,
    W: int = 128,
    seed: int = 0,
    crop: int = 96,
) -> Tuple[List[Frame], dict]:
    """Render ground-truth frames of a target Gaussian cloud deformed by LBS.

    The target cloud sits on the big-pose vertices with random colors; each
    frame poses it with coarse_deform (no learned corrections) and rasterizes
    with the oracle. Returns (frames, target_info).
    """
    from ..models.deform import coarse_deform_c2source

    rng = np.random.default_rng(seed)
    verts = np.asarray(scene.big_pose_vertices)
    colors = rng.uniform(0.2, 0.9, (verts.shape[0], 3)).astype(np.float32)

    params, state = create_from_points(verts, colors, capacity=verts.shape[0])
    from ..models import gaussians as G

    frames = []
    for i in range(n_frames):
        poses = random_pose(rng)
        smpl_params = {
            "poses": jnp.asarray(poses)[None],
            "shapes": jnp.zeros((1, 10)),
            "R": jnp.eye(3),
            "Th": jnp.zeros((1, 3)),
        }
        cam = make_camera(H, W, angle=2 * np.pi * i / max(n_frames, 1))
        out = coarse_deform_c2source(
            scene.smpl, params.xyz, smpl_params,
            scene.big_pose_params, scene.big_pose_vertices,
        )
        cov3d = G.get_covariance(params, transform=out.transforms)
        color = sh_to_color(0, G.get_features(params), out.world_pts, cam.cam_center)
        proj = preprocess(out.world_pts, cov3d, color, G.get_opacity(params), cam)
        imgs = rasterize_reference(proj, jnp.zeros(3), H, W, tile_h=32, tile_w=32)
        alpha = imgs["alpha"]
        bound = (alpha > 0.05).astype(jnp.float32)
        ys, xs = np.nonzero(np.asarray(bound) > 0)
        if len(ys) == 0:
            y0 = x0 = 0
        else:
            y0 = int(np.clip(ys.min(), 0, H - crop))
            x0 = int(np.clip(xs.min(), 0, W - crop))
        from scipy.spatial.transform import Rotation

        rotmats = Rotation.from_rotvec(poses.reshape(24, 3)[1:]).as_matrix()
        frames.append(
            Frame(
                camera=cam,
                image=imgs["color"],
                bkgd_mask=alpha,
                bound_mask=jnp.ones((H, W), jnp.float32),
                poses=jnp.asarray(poses)[None],
                shapes=jnp.zeros((1, 10)),
                R=jnp.eye(3),
                Th=jnp.zeros((1, 3)),
                pose_rotmats=jnp.asarray(rotmats.astype(np.float32)),
                crop_y0=jnp.asarray(y0, jnp.int32),
                crop_x0=jnp.asarray(x0, jnp.int32),
                pose_id=jnp.asarray(i, jnp.int32),
            )
        )
    target = {"xyz": params.xyz, "colors": colors}
    return frames, target
