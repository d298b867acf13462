"""Autoregressive per-joint pose-correction MLP (pure JAX).

Re-implementation of `Autoregression` (/root/reference/nets/mlp_delta_body_pose.py:6-82):
a trunk MLP (69 -> 128 -> 128 -> 69) produces a 3-vector per non-root joint;
per-joint one-layer heads then walk the SMPL kinematic tree, each consuming the
joint's own 3-vector concatenated with all its ancestors' (the autoregressive
coupling), and the result is mapped through a smooth Rodrigues formula to 23
correction rotations.

TPU-native structure: the 23 variable-width heads are fused into ONE padded
einsum — weights live in a (23, 3, 3*(1+A_max)) tensor whose padding columns
are zero, and the gather of [self, ancestors...] is a static index matrix.
Mathematically identical to 23 separate nn.Linear heads, but a single MXU op.

Heads are initialized U(-1e-5, 1e-5) with zero bias so corrections start near
identity (reference :26,36-37); the trunk uses torch's default Linear init
(U(+-1/sqrt(fan_in))).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transforms import rodrigues_guarded
from .smpl import SMPL_PARENTS

NUM_JOINTS = 23  # non-root SMPL joints
TRUNK_WIDTH = 128


def _ancestors() -> List[List[int]]:
    """ancestors_dict of mlp_delta_body_pose.py:41-54 (0-indexed, root excluded)."""
    anc: Dict[int, List[int]] = {}
    for i in range(1, len(SMPL_PARENTS)):
        joint = i - 1
        parent = SMPL_PARENTS[i] - 1
        anc[joint] = ([parent] + anc[parent]) if parent >= 0 else []
    return [anc[j] for j in range(NUM_JOINTS)]


ANCESTORS = _ancestors()
MAX_SLOTS = 1 + max(len(a) for a in ANCESTORS)  # self + deepest ancestor chain

# static gather index / mask: slot 0 = self, then ancestors in chain order.
_IDX = np.zeros((NUM_JOINTS, MAX_SLOTS), np.int32)
_MASK = np.zeros((NUM_JOINTS, MAX_SLOTS), np.float32)
for _j, _anc in enumerate(ANCESTORS):
    _chain = [_j] + _anc
    _IDX[_j, : len(_chain)] = _chain
    _MASK[_j, : len(_chain)] = 1.0


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    W = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return {"w": W, "b": b}


def init(key) -> Dict:
    ks = jax.random.split(key, 5)
    heads_w = jax.random.uniform(
        ks[3], (NUM_JOINTS, 3, 3 * MAX_SLOTS), minval=-1e-5, maxval=1e-5
    )
    # zero the padding columns so dead slots can never contribute
    heads_w = heads_w * jnp.repeat(jnp.asarray(_MASK), 3, axis=-1)[:, None, :]
    return {
        "trunk0": _linear_init(ks[0], 69, TRUNK_WIDTH),
        "trunk1": _linear_init(ks[1], TRUNK_WIDTH, TRUNK_WIDTH),
        "trunk2": _linear_init(ks[2], TRUNK_WIDTH, 3 * NUM_JOINTS),
        "heads_w": heads_w,
        "heads_b": jnp.zeros((NUM_JOINTS, 3)),
    }


def apply(params: Dict, poses) -> Dict:
    """poses: (1, 72) axis-angle SMPL pose (root included; root is dropped).

    Returns {"Rs": (23,3,3) correction rotations, "joint_feat": (23,3)}.
    The Fisher factors (U, S, V) are computed by the loss (ops/fisher.py) from
    Rs directly — see matrix_fisher_nll, which only needs singular values.
    """
    x = poses.reshape(1, -1)[:, 3:]  # (1, 69)
    h = jax.nn.relu(x @ params["trunk0"]["w"] + params["trunk0"]["b"])
    h = jax.nn.relu(h @ params["trunk1"]["w"] + params["trunk1"]["b"])
    joint_feat = (h @ params["trunk2"]["w"] + params["trunk2"]["b"]).reshape(NUM_JOINTS, 3)

    gathered = joint_feat[jnp.asarray(_IDX)] * jnp.asarray(_MASK)[..., None]  # (23, S, 3)
    inputs = gathered.reshape(NUM_JOINTS, 3 * MAX_SLOTS)
    rvecs = jnp.einsum("jok,jk->jo", params["heads_w"], inputs) + params["heads_b"]

    Rs = rodrigues_guarded(rvecs)  # (23, 3, 3)
    return {"Rs": Rs, "joint_feat": joint_feat}
