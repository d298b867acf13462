"""Canonical -> posed-world deformation of the Gaussian cloud (pure JAX).

Re-derivation of GaussianModel.coarse_deform_c2source
(/root/reference/scene/gaussian_model.py:820-923) with TPU-friendly structure:
the k=1 KNN is a blocked MXU matmul (ops/knn.py), blendshape offsets are
gathers + matmuls, and the 24-joint rigid chain is the statically-unrolled
composition from models/smpl.py. Fully differentiable: gradients flow from the
rendered image back to Gaussian positions, LBS weight deltas and the pose
correction rotations under jax.grad.

Pipeline (identical math to the reference):
  1. nearest big-pose SMPL vertex per Gaussian -> base skinning weights;
     optional learned delta added in log space then softmaxed
  2. inverse big-pose rigid transform (big pose -> T pose)
  3. - big-pose pose-blendshape offsets + shape offsets + target-pose
     pose-blendshape offsets (with learned correction rotations folded in)
  4. target-pose rigid chain (T pose -> target), then global R/Th to world
  5. running 'transforms' (3x3) collects every linear factor so the renderer
     can fold it into the Gaussian covariance (compute_cov3D_python semantics,
     gaussian_renderer/__init__.py:88-90)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import jax

from ..ops.knn import knn
from ..ops.transforms import rodrigues
from .smpl import SMPLModel, transform_params


def inv3x3(M, eps: float = 1e-12):
    """Closed-form batched 3x3 inverse (adjugate / det).

    jnp.linalg.inv on (N,3,3) lowers to a batched LU loop on TPU — tens of ms
    for the 46k blended frames here; the adjugate is a handful of fused VPU
    ops and differentiates cleanly."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(*M.shape[:-2], 3, 3)
    return adj * inv_det[..., None, None]


class DeformOut(NamedTuple):
    smpl_pts: jnp.ndarray      # (N, 3) posed points in SMPL space
    world_pts: jnp.ndarray     # (N, 3) posed points in world space
    bweights: jnp.ndarray      # (N, J) final blend weights
    transforms: jnp.ndarray    # (N, 3, 3) linear deformation (for covariance)
    translation: jnp.ndarray   # (N, 3) affine part (for the MLP-free eval path)


def coarse_deform_c2source(
    model: SMPLModel,
    query_pts,            # (N, 3) canonical (big-pose world) Gaussian centers
    params,               # target-frame SMPL params dict
    t_params,             # big-pose params dict
    t_vertices,           # (V, 3) big-pose world vertices
    lbs_weight_delta=None,   # (N, J) learned log-space delta, or None
    correct_Rs=None,         # (J-1, 3, 3) learned pose corrections, or None
    vert_ids=None,           # optional precomputed (N,) nearest-vertex ids
) -> DeformOut:
    J = model.weights.shape[-1]
    V = t_vertices.shape[0]
    N = query_pts.shape[0]

    # 1. nearest SMPL vertex -> skinning weights  (gaussian_model.py:827-833)
    if vert_ids is None:
        _, ids = knn(query_pts, t_vertices, k=1)
        vert_ids = ids[:, 0]
    bweights = model.weights[vert_ids]  # (N, J)
    if lbs_weight_delta is not None:
        bweights = jax.nn.softmax(jnp.log(bweights + 1e-9) + lbs_weight_delta, axis=-1)

    # 2. big pose -> T pose  (gaussian_model.py:836-851)
    A_big, _R, _Th, _joints, big_rot_mats = transform_params(model, t_params)
    A = jnp.einsum("nj,jxy->nxy", bweights, A_big[0])  # (N, 4, 4)
    pts = query_pts - A[:, :3, 3]
    R_inv = inv3x3(A[:, :3, :3])
    pts = jnp.einsum("nxy,ny->nx", R_inv, pts)
    transforms = R_inv
    translation = -A[:, :3, 3]
    translation = jnp.einsum("nxy,ny->nx", R_inv, translation)

    # 3a. remove big-pose pose-blendshape offsets  (gaussian_model.py:853-864)
    ident = jnp.eye(3, dtype=pts.dtype)
    pose_feat_big = (big_rot_mats[0, 1:] - ident).reshape(-1)  # (207,)
    posedirs = model.posedirs.reshape(V * 3, -1)  # (V*3, 207)
    pose_offs_big = (posedirs @ pose_feat_big).reshape(V, 3)
    pts = pts - pose_offs_big[vert_ids]
    translation = translation - pose_offs_big[vert_ids]

    # 3b. add shape offsets  (gaussian_model.py:869-876)
    S = params["shapes"].shape[-1]
    shape_offs = jnp.einsum("vds,s->vd", model.shapedirs[..., :S], params["shapes"][0])
    pts = pts + shape_offs[vert_ids]
    translation = translation + shape_offs[vert_ids]

    # 3c. add target-pose blendshape offsets with correction Rs
    #     (gaussian_model.py:878-898)
    rot_mats = rodrigues(params["poses"].reshape(1, -1, 3))  # (1, J, 3, 3)
    if correct_Rs is not None:
        non_root = rot_mats[:, 1:] @ correct_Rs[None]
        rot_mats = jnp.concatenate([rot_mats[:, :1], non_root], axis=1)
    pose_feat = (rot_mats[0, 1:] - ident).reshape(-1)
    pose_offs = (posedirs @ pose_feat).reshape(V, 3)
    pts = pts + pose_offs[vert_ids]
    translation = translation + pose_offs[vert_ids]

    # 4. T pose -> target pose  (gaussian_model.py:901-909)
    A_tgt, R_glob, Th, _joints, _ = transform_params(model, params, rot_mats=rot_mats)
    A = jnp.einsum("nj,jxy->nxy", bweights, A_tgt[0])
    smpl_pts = jnp.einsum("nxy,ny->nx", A[:, :3, :3], pts) + A[:, :3, 3]
    transforms = A[:, :3, :3] @ transforms
    translation = jnp.einsum("nxy,ny->nx", A[:, :3, :3], translation) + A[:, :3, 3]

    # 5. SMPL space -> world  (gaussian_model.py:915-921)
    R_glob = R_glob.reshape(3, 3)
    Th = Th.reshape(1, 3)
    R_glob_inv = inv3x3(R_glob)
    world_pts = smpl_pts @ R_glob_inv + Th
    transforms = R_glob[None] @ transforms
    translation = translation @ R_glob_inv + Th

    return DeformOut(
        smpl_pts=smpl_pts,
        world_pts=world_pts,
        bweights=bweights,
        transforms=transforms,
        translation=translation,
    )


def apply_cached_transform(query_pts, transforms, translation):
    """MLP-free eval path: x' = T x + t (gaussian_renderer/__init__.py:73-77)."""
    return jnp.einsum("nxy,ny->nx", transforms, query_pts) + translation
