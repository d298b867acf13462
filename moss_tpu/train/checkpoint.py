"""Checkpoint save/restore: one npz per step holding the whole train pytree.

Replaces the reference's three artifact families (PLY + MLP ckpt.pth + full
capture()/restore() torch pickles, SURVEY.md §5.4) with a single
path-flattened npz of {params, opt_state, gaussian state, step} — plus the
reference-format PLY export (data/ply.py) for interop. Unlike the reference's
restore path (which crashes on a self.self typo, gaussian_model.py:131), this
one round-trips and is covered by tests.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(tree))


def restore_checkpoint(path: str, template) -> Any:
    """Restore into the same pytree structure as `template`."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        leaves.append(jax.numpy.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


# ---------------------------------------------------------------------------
# Reference artifact layout
# (scene/__init__.py:109-123: point_cloud/iteration_N/point_cloud.ply +
#  mlp_ckpt/iteration_N/ckpt.pth) — written alongside chkpnt{N}.npz so
# external 3DGS tooling that walks the per-iteration directory tree finds
# the cloud, and reference-style outputs can be loaded back for rendering.

def save_reference_layout(model_path: str, iteration: int, ts) -> None:
    """Write the live cloud as point_cloud/iteration_{N}/point_cloud.ply and
    the deformation MLPs (the reference's Autoregression +
    CrossAttention_lbs state dicts) as mlp_ckpt/iteration_{N}/ckpt.npz."""
    from ..data.ply import save_ply

    g = ts.params["gauss"]
    valid = np.asarray(ts.gstate.valid)
    pc_dir = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    os.makedirs(pc_dir, exist_ok=True)
    save_ply(
        os.path.join(pc_dir, "point_cloud.ply"),
        np.asarray(g.xyz)[valid], np.asarray(g.f_dc)[valid],
        np.asarray(g.f_rest)[valid], np.asarray(g.opacity)[valid],
        np.asarray(g.scaling)[valid], np.asarray(g.rotation)[valid],
    )
    mlps = ts.params.get("mlps")
    if mlps is not None:
        mlp_dir = os.path.join(model_path, "mlp_ckpt", f"iteration_{iteration}")
        os.makedirs(mlp_dir, exist_ok=True)
        flat = _flatten(mlps)
        flat["iter"] = np.asarray(iteration)
        np.savez_compressed(os.path.join(mlp_dir, "ckpt.npz"), **flat)


def convert_torch_mlp_state(autoreg_sd, lbs_sd) -> dict:
    """Map the reference's Autoregression / CrossAttention_lbs state dicts
    (the `ckpt.pth` payload written by scene/__init__.py:114-123) into the
    moss-tpu mlps pytree — the same weight-for-weight mapping pinned by
    tests/test_mlps_parity.py. `out_layer`/`gate_proj` keys are ignored
    (defined but never used in the reference forward,
    nets/mlp_delta_weight_lbs.py:26-27)."""
    import jax.numpy as jnp

    from ..models import lbs_field, pose_refine

    def t2n(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def lin(sd, name):
        return {"w": jnp.asarray(t2n(sd[f"{name}.weight"]).T),
                "b": jnp.asarray(t2n(sd[f"{name}.bias"]))}

    def conv_to_lin(sd, name):  # (out, in, 1) conv1d -> (in, out) matmul
        return {"w": jnp.asarray(t2n(sd[f"{name}.weight"])[:, :, 0].T),
                "b": jnp.asarray(t2n(sd[f"{name}.bias"]))}

    pose = dict(pose_refine.init(jax.random.PRNGKey(0)))
    for i, li in enumerate((0, 2, 4)):
        pose[f"trunk{i}"] = lin(autoreg_sd, f"block_mlps.{li}")
    heads_w = np.zeros(
        (pose_refine.NUM_JOINTS, 3, 3 * pose_refine.MAX_SLOTS), np.float32)
    heads_b = np.zeros((pose_refine.NUM_JOINTS, 3), np.float32)
    for j in range(pose_refine.NUM_JOINTS):
        W = t2n(autoreg_sd[f"fc_pose.{j}.0.weight"])  # (3, in_j)
        heads_w[j, :, : W.shape[1]] = W
        heads_b[j] = t2n(autoreg_sd[f"fc_pose.{j}.0.bias"])
    pose["heads_w"] = jnp.asarray(heads_w)
    pose["heads_b"] = jnp.asarray(heads_b)

    lbs = dict(lbs_field.init(jax.random.PRNGKey(0)))
    for i in range(4):
        lbs[f"l{i}"] = conv_to_lin(lbs_sd, f"bw_linears.{i}")
    lbs["fc"] = conv_to_lin(lbs_sd, "bw_fc")
    for name in ("query", "key", "value"):
        lbs[name] = lin(lbs_sd, name)
    return {"pose": pose, "lbs": lbs}


def load_reference_layout(model_path: str, iteration: int, ts) -> Any:
    """Rebuild a TrainState's params/valid-mask from the reference directory
    layout (the inverse of save_reference_layout; also reads clouds written
    by the reference's own save_ply — data/ply.py is format-compatible).

    The PLY holds only live rows: they are padded back into the template's
    static capacity (dead slots parked at z=-1e6 / opacity -15, exactly the
    create_from_points convention). Optimizer state is re-initialized — this
    layout, like the reference's, carries no Adam moments; use chkpnt{N}.npz
    for exact training resume."""
    import dataclasses

    import jax.numpy as jnp

    from ..data.ply import load_ply

    pc = load_ply(os.path.join(model_path, "point_cloud",
                               f"iteration_{iteration}", "point_cloud.ply"))
    g = ts.params["gauss"]
    P = g.capacity
    n = pc["xyz"].shape[0]
    if n > P:
        raise ValueError(f"PLY has {n} points > template capacity {P}")
    k_rest = g.f_rest.shape[1]
    if pc["f_rest"].shape[1] != k_rest:
        raise ValueError(
            f"PLY SH degree mismatch: {pc['f_rest'].shape[1]} rest "
            f"coefficients vs template {k_rest}")

    def pad(x, fill):
        out = np.full((P,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    new_g = dataclasses.replace(
        g,
        xyz=pad(pc["xyz"], 0.0).at[n:].set(jnp.array([0.0, 0.0, -1e6])),
        f_dc=pad(pc["f_dc"], 0.0), f_rest=pad(pc["f_rest"], 0.0),
        opacity=pad(pc["opacity"], -15.0), scaling=pad(pc["scaling"], -10.0),
        rotation=pad(pc["rotation"], 0.0).at[n:, 0].set(1.0),
    )
    params = dict(ts.params)
    params["gauss"] = new_g
    mlp_dir = os.path.join(model_path, "mlp_ckpt", f"iteration_{iteration}")
    mlp_npz = os.path.join(mlp_dir, "ckpt.npz")
    mlp_pth = os.path.join(mlp_dir, "ckpt.pth")
    if params.get("mlps") is not None:
        if os.path.exists(mlp_npz):
            data = np.load(mlp_npz, allow_pickle=False)
            flat, _ = jax.tree_util.tree_flatten_with_path(params["mlps"])
            leaves = [
                jnp.asarray(data[jax.tree_util.keystr(p)],
                            dtype=getattr(leaf, "dtype", None))
                for p, leaf in flat
            ]
            params["mlps"] = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(params["mlps"]), leaves)
        elif os.path.exists(mlp_pth):
            # a genuine reference-produced tree: torch-pickled state dicts
            # (scene/__init__.py:119-123) — convert weight-for-weight
            import torch

            # weights_only: the payload is plain tensor state dicts, and an
            # externally-produced .pth is untrusted pickle otherwise
            ckpt = torch.load(mlp_pth, map_location="cpu", weights_only=True)
            params["mlps"] = convert_torch_mlp_state(
                ckpt["Autoregression"], ckpt["CrossAttention_lbs"])
        else:
            # rendering a deform model through random-init MLPs would emit
            # garbage with no hint why — refuse instead of degrading silently
            raise FileNotFoundError(
                f"model has deformation MLPs but neither {mlp_npz} nor "
                f"ckpt.pth exists — the mlp_ckpt tree is required to render "
                f"a non-static model")
    gstate = dataclasses.replace(
        ts.gstate,
        valid=jnp.arange(P) < n,
        max_radii2d=jnp.zeros((P,), jnp.float32),
        xyz_grad_accum=jnp.zeros((P,), jnp.float32),
        denom=jnp.zeros((P,), jnp.float32),
    )
    return ts._replace(params=params, gstate=gstate,
                       step=jnp.asarray(iteration, jnp.int32))
