"""SMPL body model in pure JAX.

TPU-native re-implementation of the SMPL machinery the reference uses in three
places (SURVEY.md §2.2 P5):

  * smpl_numpy.SMPL.__call__ (/root/reference/smpl/smpl_numpy.py:46-98) — used
    by the dataset readers to pose the template mesh -> lbs_vertices()
  * SMPL_to_tensor + get_transform_params_torch / get_rigid_transformation_torch
    (/root/reference/scene/gaussian_model.py:931-1031,965-995) — the per-frame
    rigid-transform chain used by the deformation -> transform_params()
  * the canonical "big pose" (legs/arms spread) of the dataset readers
    (/root/reference/scene/dataset_readers.py:586-590) -> big_pose_params()

The 24-joint kinematic chain is composed with a statically unrolled loop
(parents are static metadata) — 24 4x4 matmuls that XLA schedules as one fused
block; no lax.scan bookkeeping needed at this size.

Since SMPL asset files are proprietary, synthetic_smpl() generates a
structurally identical random model (same shapes, valid kinematic tree,
row-normalized skinning weights) for tests, benchmarks and CI. load_smpl_pickle
loads the real asset when available.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transforms import rodrigues

# SMPL kinematic tree (kintree_table row 0 of the standard 24-joint SMPL rig;
# matches nets/mlp_delta_body_pose.py:41 immediate_parents).
SMPL_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21
)
NUM_JOINTS = 24
NUM_VERTS = 6890

# SMPL-X kinematic tree: 55 joints — 22 body + jaw/leye/reye + 2x15 hand
# (smplx/joint_names.py JOINT_NAMES order; parents from the asset's
# kintree_table, vendored smplx/body_models.py:1118 path).
SMPLX_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,                                   # jaw, left_eye, right_eye
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
)
NUM_JOINTS_SMPLX = 55


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLModel:
    v_template: Any   # (V, 3)
    shapedirs: Any    # (V, 3, S)
    posedirs: Any     # (V, 3, 207)
    J_regressor: Any  # (J, V)
    weights: Any      # (V, J) skinning weights
    faces: Any        # (F, 3) int32
    parents: Tuple[int, ...] = dataclasses.field(
        default=SMPL_PARENTS, metadata=dict(static=True)
    )

    @property
    def num_joints(self):
        return len(self.parents)


def load_smpl_pickle(path: str) -> SMPLModel:
    """Load a real SMPL pickle (same keys as SMPL_to_tensor, gaussian_model.py:931)."""
    import pickle

    with open(path, "rb") as f:
        u = pickle._Unpickler(f)
        u.encoding = "latin1"
        params = u.load()
    J_reg = params["J_regressor"]
    if hasattr(J_reg, "toarray"):
        J_reg = J_reg.toarray()
    parents_row = np.asarray(params["kintree_table"])[0].astype(np.int64)
    parents = tuple(int(p) if p < 2**31 else -1 for p in parents_row)
    parents = (-1,) + parents[1:]
    return SMPLModel(
        v_template=jnp.asarray(np.asarray(params["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(np.asarray(params["shapedirs"]), jnp.float32),
        posedirs=jnp.asarray(np.asarray(params["posedirs"]), jnp.float32),
        J_regressor=jnp.asarray(np.asarray(J_reg), jnp.float32),
        weights=jnp.asarray(np.asarray(params["weights"]), jnp.float32),
        faces=jnp.asarray(np.asarray(params["f"]).astype(np.int64), jnp.int32),
        parents=parents,
    )


def load_smplx_npz(path: str, num_betas: int = 10, num_expr: int = 10) -> SMPLModel:
    """Load an SMPL-X .npz (the reference's smpl_type='smplx' asset,
    gaussian_model.py:79-82) into the generic body-model struct.

    SMPL-X has 55 joints and stores shape and expression blendshapes in one
    (V, 3, 400) tensor — columns [:num_betas] are betas, [300:300+num_expr]
    expressions. The DNA-Rendering reader concatenates betas+expression into
    'shapes' (dataset_readers.py:806), so the loaded shapedirs follow the same
    convention and the LBS/deform chain works unchanged with J=55,
    poses (1, 165) = full_pose.
    """
    params = dict(np.load(path, allow_pickle=True))
    sd = np.asarray(params["shapedirs"], np.float32)
    if sd.shape[-1] >= 300 + num_expr:
        shapedirs = np.concatenate(
            [sd[..., :num_betas], sd[..., 300:300 + num_expr]], axis=-1
        )
    else:
        shapedirs = sd[..., : num_betas + num_expr]
    parents_row = np.asarray(params["kintree_table"])[0].astype(np.int64)
    parents = (-1,) + tuple(int(p) for p in parents_row[1:])
    return SMPLModel(
        v_template=jnp.asarray(np.asarray(params["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(np.asarray(params["posedirs"]), jnp.float32),
        J_regressor=jnp.asarray(np.asarray(params["J_regressor"]), jnp.float32),
        weights=jnp.asarray(np.asarray(params["weights"]), jnp.float32),
        faces=jnp.asarray(np.asarray(params["f"]).astype(np.int64), jnp.int32),
        parents=parents,
    )


def big_pose_params_smplx(n_shapes: int = 20):
    """Canonical big pose for SMPL-X (dataset_readers.py:769-785): the same
    four body_pose angles; full_pose layout [global 3 | body 63 | jaw 3 |
    leye 3 | reye 3 | lhand 45 | rhand 45] = 165."""
    poses = np.zeros((1, 165), np.float32)
    poses[0, 3 + 2] = np.deg2rad(45.0)
    poses[0, 3 + 5] = np.deg2rad(-45.0)
    poses[0, 3 + 20] = np.deg2rad(-30.0)
    poses[0, 3 + 23] = np.deg2rad(30.0)
    return {
        "poses": jnp.asarray(poses),
        "shapes": jnp.zeros((1, n_shapes), jnp.float32),
        "R": jnp.eye(3, dtype=jnp.float32),
        "Th": jnp.zeros((1, 3), jnp.float32),
    }


def synthetic_smpl(
    n_verts: int = NUM_VERTS, n_shapes: int = 10, seed: int = 3407,
    parents: Tuple[int, ...] = SMPL_PARENTS,
) -> SMPLModel:
    """Random SMPL-shaped body model for tests/benchmarks (no real asset needed).

    Vertices form a rough capsule around a chain of joints so that LBS produces
    geometrically sensible deformations; skinning weights fall off with
    distance to the two nearest joints and are row-normalized. `parents`
    selects the rig: SMPL_PARENTS (J=24) or SMPLX_PARENTS (J=55,
    synthetic_smplx below).
    """
    rng = np.random.default_rng(seed)
    J = len(parents)

    # joints laid out along a rough humanoid: root at origin, children offset.
    joint_pos = np.zeros((J, 3), np.float32)
    for j in range(1, J):
        p = parents[j]
        joint_pos[j] = joint_pos[p] + rng.normal(0, 0.12, 3) + np.array(
            [0.0, 0.1 if j < 12 else -0.05, 0.0]
        )

    # vertices: sample around random bones
    bone = rng.integers(0, J, n_verts)
    t = rng.uniform(0, 1, (n_verts, 1)).astype(np.float32)
    parent_of = np.array([parents[b] if parents[b] >= 0 else b for b in bone])
    v = joint_pos[bone] * t + joint_pos[parent_of] * (1 - t)
    v = v + rng.normal(0, 0.04, (n_verts, 3)).astype(np.float32)

    # skinning weights ~ softmin of distance to joints
    d = np.linalg.norm(v[:, None, :] - joint_pos[None], axis=-1)
    w = np.exp(-d / 0.07)
    w = (w / w.sum(-1, keepdims=True)).astype(np.float32)

    # J_regressor: rows select nearest vertices of each joint
    J_reg = np.exp(-(d.T) / 0.03)
    J_reg = (J_reg / J_reg.sum(-1, keepdims=True)).astype(np.float32)

    shapedirs = (rng.normal(0, 0.01, (n_verts, 3, n_shapes))).astype(np.float32)
    posedirs = (rng.normal(0, 0.001, (n_verts, 3, 9 * (J - 1)))).astype(np.float32)

    n_faces = 2 * n_verts
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_reg),
        weights=jnp.asarray(w),
        faces=jnp.asarray(faces),
        parents=parents,
    )


def synthetic_smplx(
    n_verts: int = 2000, n_shapes: int = 20, seed: int = 3407
) -> SMPLModel:
    """Random SMPL-X-shaped body model: J=55 rig (SMPLX_PARENTS), 20-dim
    shapes (betas ++ expression, the DNA-Rendering convention,
    dataset_readers.py:806), posedirs over 54 non-root joints — so the J=55
    deform chain / 165-dim full_pose path is testable without the
    proprietary asset."""
    return synthetic_smpl(n_verts, n_shapes, seed, parents=SMPLX_PARENTS)


def big_pose_params(n_shapes: int = 10):
    """The canonical legs/arms-spread rest pose (dataset_readers.py:586-590)."""
    poses = np.zeros((1, 72), np.float32)
    poses[0, 5] = np.deg2rad(45.0)
    poses[0, 8] = np.deg2rad(-45.0)
    poses[0, 23] = np.deg2rad(-30.0)
    poses[0, 26] = np.deg2rad(30.0)
    return {
        "poses": jnp.asarray(poses),
        "shapes": jnp.zeros((1, n_shapes), jnp.float32),
        "R": jnp.eye(3, dtype=jnp.float32),
        "Th": jnp.zeros((1, 3), jnp.float32),
    }


def rigid_transform_chain(rot_mats, joints, parents: Tuple[int, ...]):
    """Compose per-joint world transforms A (reference gaussian_model.py:965-995).

    rot_mats: (B, J, 3, 3); joints: (B, J, 3) rest joints.
    Returns A: (B, J, 4, 4) with the rest-joint offset subtracted
    (A[..., :3, 3] maps rest-space points, not joint-local ones).
    """
    B, J = joints.shape[0], joints.shape[1]
    parents_arr = list(parents)
    rel = [joints[:, 0]]
    for j in range(1, J):
        rel.append(joints[:, j] - joints[:, parents_arr[j]])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # (B, 3, 4)
        bottom = jnp.broadcast_to(
            jnp.array([[0.0, 0.0, 0.0, 1.0]], R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    chain = [make_T(rot_mats[:, 0], rel[0])]
    for j in range(1, J):
        chain.append(chain[parents_arr[j]] @ make_T(rot_mats[:, j], rel[j]))
    A = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    # subtract the transformed rest joint: A[:, :, :3, 3] -= A[..., :3, :3] @ joints
    rot_joint = jnp.einsum("bjxy,bjy->bjx", A[..., :3, :3], joints)
    trans = A[..., :3, 3] - rot_joint
    A = A.at[..., :3, 3].set(trans)
    return A


def shaped_vertices(model: SMPLModel, shapes):
    """v_template + shape blendshapes (shapes: (B, S))."""
    S = shapes.shape[-1]
    offs = jnp.einsum("vds,bs->bvd", model.shapedirs[..., :S], shapes)
    return model.v_template[None] + offs


def transform_params(model: SMPLModel, params, rot_mats=None, correct_Rs=None):
    """(A, R, Th, joints) for LBS — mirrors get_transform_params_torch
    (gaussian_model.py:998-1031).

    params: dict with 'poses' (B,72), 'shapes' (B,S), 'R' (3,3), 'Th' (1,3)|(3,).
    correct_Rs: optional (B, J-1, 3, 3) learned pose-correction rotations,
    right-multiplied into the non-root joint rotations.
    """
    v_shaped = shaped_vertices(model, params["shapes"])
    if rot_mats is None:
        B = params["poses"].shape[0]
        rot_mats = rodrigues(params["poses"].reshape(B, -1, 3))
        if correct_Rs is not None:
            non_root = rot_mats[:, 1:] @ correct_Rs
            rot_mats = jnp.concatenate([rot_mats[:, :1], non_root], axis=1)
    joints = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped)
    A = rigid_transform_chain(rot_mats, joints, model.parents)
    return A, params["R"], params["Th"], joints, rot_mats


def lbs_vertices(model: SMPLModel, poses, shapes):
    """Pose the template mesh; returns (verts (V,3), joints (J,3)) in SMPL space.

    Mirrors smpl_numpy.SMPL.__call__ (smpl_numpy.py:46-98): shape blendshapes,
    pose blendshapes, kinematic chain, LBS. The world transform
    (verts @ R^T + Th, dataset_readers.py) is applied by the callers.
    """
    poses = jnp.reshape(poses, (1, -1))
    shapes = jnp.reshape(shapes, (1, -1))
    B = 1
    v_shaped = shaped_vertices(model, shapes)  # (1, V, 3)
    rot_mats = rodrigues(poses.reshape(B, -1, 3))  # (1, J, 3, 3)
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (1, 207)
    V = model.v_template.shape[0]
    pose_offs = (pose_feature @ model.posedirs.reshape(V * 3, -1).T).reshape(B, V, 3)
    v_posed = v_shaped + pose_offs
    joints = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped)
    A = rigid_transform_chain(rot_mats, joints, model.parents)  # (1, J, 4, 4)
    T = jnp.einsum("vj,bjxy->bvxy", model.weights, A)  # (1, V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    v_out = jnp.einsum("bvxy,bvy->bvx", T, v_h)[..., :3]
    posed_joints = jnp.einsum("bjxy,bjy->bjx", A[..., :3, :3], joints) + A[..., :3, 3]
    return v_out[0], posed_joints[0] + 0.0  # (V,3), (J,3)
