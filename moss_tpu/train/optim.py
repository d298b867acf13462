"""Optimizer: per-group AdamW with the reference's learning rates.

Mirrors GaussianModel.training_setup (/root/reference/scene/gaussian_model.py:
200-230): torch.optim.AdamW(eps=1e-15, default weight_decay 0.01) with one LR
per parameter group and an exponential-decay schedule on xyz
(utils/general_utils.py get_expon_lr_func). Built as optax.multi_transform
over leaf labels, so the per-group Adam moments live in one pytree that the
densifier can permute alongside the parameters (train/densify.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig
from ..models.gaussians import GaussianParams


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear interpolated LR (general_utils.py:30-63)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay * log_lerp


def _labels(params: Dict) -> Dict:
    """Leaf labels: gaussian field names + MLP group names."""
    g = params["gauss"]
    gauss_labels = GaussianParams(
        xyz="xyz", f_dc="f_dc", f_rest="f_rest",
        scaling="scaling", rotation="rotation", opacity="opacity",
    )
    labels = {"gauss": gauss_labels}
    if "mlps" in params and params["mlps"] is not None:
        labels["mlps"] = {
            "pose": jax.tree.map(lambda _: "pose", params["mlps"]["pose"]),
            "lbs": jax.tree.map(lambda _: "lbs", params["mlps"]["lbs"]),
        }
    return labels


def make_optimizer(cfg: OptimConfig, spatial_lr_scale: float = 1.0):
    """Returns (optax.GradientTransformation, labels_fn).

    The xyz group follows the exponential schedule; all others are constant.
    """

    def adamw(lr):
        return optax.adamw(
            learning_rate=lr,
            b1=0.9, b2=0.999,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )

    xyz_sched = lambda step: expon_lr(
        step,
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )

    transforms = {
        "xyz": adamw(xyz_sched),
        "f_dc": adamw(cfg.feature_lr),
        "f_rest": adamw(cfg.feature_lr / 20.0),
        "opacity": adamw(cfg.opacity_lr),
        "scaling": adamw(cfg.scaling_lr),
        "rotation": adamw(cfg.rotation_lr),
        "pose": adamw(cfg.pose_refine_lr),
        "lbs": adamw(cfg.lbs_field_lr),
    }
    return optax.multi_transform(transforms, _labels)


_GAUSS_GROUPS = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")


def apply_reference_update_skips(optim_cfg, white_background: bool, it,
                                 old_params, old_state,
                                 new_params, new_state):
    """Reproduce the reference's as-executed optimizer-step skips.

    torch's optimizer.step() silently skips any parameter whose .grad is
    None. In the reference loop (train_ZJU.py:168-190) densify_and_prune and
    reset_opacity REPLACE tensors inside torch.no_grad() BEFORE the step, so
    as executed:

      * densify iterations (densify_from < it < densify_until,
        it % densification_interval == 0): all six Gaussian tensors are
        freshly replaced (_prune_optimizer/cat_tensors_to_optimizer,
        gaussian_model.py:377-434) -> the Gaussian parameter update AND the
        Adam moment/step advance are skipped; the MLPs still step.
      * opacity-reset iterations (it % opacity_reset_interval == 0, or white
        background at it == densify_from_iter, train_ZJU.py:184-185): the
        opacity tensor is replaced (replace_tensor_to_optimizer) -> opacity
        alone skips.
      * the final iteration: no optimizer step at all
        (`if iteration < opt.iterations`, train_ZJU.py:188).

    The fused TPU step computes the update before the host-side densify
    runs, so these skips are applied as traced selects on (params,
    opt_state) — `it` is the 1-based traced iteration (ts.step + 1).
    Returns the corrected (params, opt_state).
    """
    o = optim_cfg
    it = jnp.asarray(it, jnp.int32)
    final = it == o.iterations
    dens = ((it % o.densification_interval == 0)
            & (it > o.densify_from_iter) & (it < o.densify_until_iter))
    # BOTH reset clauses sit INSIDE the reference's densification guard
    # (`if iteration < opt.densify_until_iter:` encloses the reset at
    # train_ZJU.py:171,184-185), so a reset can never fire at or after
    # densify_until_iter — live on vanilla-3DGS-style schedules where
    # opacity_reset_interval < iterations (e.g. reset every 3000 over 30k
    # iters with densify_until 15000).
    reset = (it % o.opacity_reset_interval == 0)
    if white_background:
        reset = reset | (it == o.densify_from_iter)
    reset = reset & (it < o.densify_until_iter)
    pred_gauss = dens | final
    pred_opacity = pred_gauss | reset
    pred_mlp = final

    def sel(pred, new, old):
        return jax.tree.map(lambda n, o_: jnp.where(pred, o_, n), new, old)

    g_new, g_old = new_params["gauss"], old_params["gauss"]
    gauss = GaussianParams(
        xyz=jnp.where(pred_gauss, g_old.xyz, g_new.xyz),
        f_dc=jnp.where(pred_gauss, g_old.f_dc, g_new.f_dc),
        f_rest=jnp.where(pred_gauss, g_old.f_rest, g_new.f_rest),
        scaling=jnp.where(pred_gauss, g_old.scaling, g_new.scaling),
        rotation=jnp.where(pred_gauss, g_old.rotation, g_new.rotation),
        opacity=jnp.where(pred_opacity, g_old.opacity, g_new.opacity),
    )
    params = dict(new_params)
    params["gauss"] = gauss
    if params.get("mlps") is not None:
        params["mlps"] = sel(pred_mlp, new_params["mlps"],
                             old_params["mlps"])

    preds = {g: pred_gauss for g in _GAUSS_GROUPS}
    preds["opacity"] = pred_opacity
    inner = {
        g: sel(preds.get(g, pred_mlp), new_state.inner_states[g],
               old_state.inner_states[g])
        for g in new_state.inner_states
    }
    return params, new_state._replace(inner_states=inner)


def zero_group_moments(opt_state, group: str):
    """Zero the Adam first/second moments of one multi_transform group.

    The optax analog of the reference's `replace_tensor_to_optimizer`
    (/root/reference/scene/gaussian_model.py:362-375): the opacity reset
    swaps the parameter tensor AND zeroes its `exp_avg`/`exp_avg_sq`, so the
    post-reset steps are not immediately pushed back toward the pre-reset
    values by stale first moments, nor rescaled by a stale second moment.
    The bias-correction step counter is kept, matching torch (the reference
    retains `stored_state["step"]`).
    """

    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(
                mu=jax.tree.map(jnp.zeros_like, s.mu),
                nu=jax.tree.map(jnp.zeros_like, s.nu),
            )
        return s

    inner = dict(opt_state.inner_states)
    inner[group] = jax.tree.map(
        fix, inner[group],
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState),
    )
    return opt_state._replace(inner_states=inner)
