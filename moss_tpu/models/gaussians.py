"""Gaussian cloud parameters under a static capacity with a validity mask.

TPU-native redesign of the reference GaussianModel parameter store
(/root/reference/scene/gaussian_model.py:55-198): instead of dynamically
growing/shrinking tensors and performing optimizer-state surgery
(_prune_optimizer/cat_tensors_to_optimizer, :377-434), the cloud lives in
fixed-capacity arrays (capacity = the reference's own 45,695-point cap rounded
up to a lane multiple) with a boolean `valid` mask. Densify/clone/split/merge/
prune become masked scatters fully under jit (train/densify.py), optimizer
state rows move with the same scatter, and every shape stays static — XLA
compiles the train step exactly once.

Learnable fields are a plain dataclass pytree (works directly with optax and
jax.grad); activations mirror the reference exactly (exp / sigmoid /
quat-normalize, gaussian_model.py:36-53).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_knn_dist2
from ..ops.sh import rgb_to_sh
from ..ops.transforms import build_covariance, inverse_sigmoid, quat_normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Learnable per-Gaussian parameters (all capacity-padded)."""

    xyz: Any        # (P, 3) canonical (big-pose world) positions
    f_dc: Any       # (P, 1, 3) degree-0 SH
    f_rest: Any     # (P, 15, 3) higher SH
    scaling: Any    # (P, 3) log-scales
    rotation: Any   # (P, 4) unnormalized quaternions (w,x,y,z)
    opacity: Any    # (P, 1) logits

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """Non-learnable bookkeeping that rides along the cloud."""

    valid: Any             # (P,) bool
    max_radii2d: Any       # (P,) float32 — densify pruning stat
    xyz_grad_accum: Any    # (P,) float32 — sum of screen-grad norms
    denom: Any             # (P,) float32 — frames accumulated
    joint_F: Any           # (23, 3, 3) — summed Fisher factors over the window
    lbs_weight_sum: Any    # (P, 24) — summed blend weights over the window

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def get_scaling(p: GaussianParams):
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams):
    return quat_normalize(p.rotation)


def get_opacity(p: GaussianParams):
    return jax.nn.sigmoid(p.opacity)


def get_features(p: GaussianParams):
    return jnp.concatenate([p.f_dc, p.f_rest], axis=1)  # (P, 16, 3)


def get_covariance(p: GaussianParams, transform=None, scaling_modifier: float = 1.0):
    return build_covariance(
        get_scaling(p), p.rotation, transform=transform, scaling_modifier=scaling_modifier
    )


def create_from_points(points, colors, capacity: int, sh_degree: int = 3):
    """Initialize the cloud from a point set (reference create_from_pcd,
    gaussian_model.py:175-198): scales from mean-3NN distance, identity
    rotations, opacity 0.1. Dead capacity slots are masked invalid and pushed
    far away with ~zero opacity for defence in depth.
    """
    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"{n} init points exceed capacity {capacity}")
    n_rest = (sh_degree + 1) ** 2 - 1

    dist2 = jnp.maximum(mean_knn_dist2(points), 1e-7)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    pad = capacity - n

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    params = GaussianParams(
        xyz=padded(points, 0.0).at[n:].set(jnp.array([0.0, 0.0, -1e6])),
        f_dc=padded(rgb_to_sh(colors)[:, None, :]),
        f_rest=jnp.zeros((capacity, n_rest, 3), jnp.float32),
        scaling=padded(log_scale, -10.0),
        rotation=padded(
            jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)), 0.0
        ).at[n:, 0].set(1.0),
        opacity=padded(inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)), -15.0),
    )
    state = GaussianState(
        valid=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        joint_F=jnp.zeros((23, 3, 3), jnp.float32),
        lbs_weight_sum=jnp.zeros((capacity, 24), jnp.float32),
    )
    return params, state


def reset_opacity(p: GaussianParams) -> GaussianParams:
    """Clamp opacity to <= 0.01 (reference reset_opacity, gaussian_model.py:314-317)."""
    new = inverse_sigmoid(jnp.minimum(get_opacity(p), 0.01))
    return dataclasses.replace(p, opacity=new)


def num_sh_coeffs(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2
