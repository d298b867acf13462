"""Multi-chip training: ('data', 'tile') mesh, replicated cloud, sharded pixels.

The reference is strictly single-GPU (SURVEY.md §2.4); this is the TPU-native
scaling design from BASELINE.json / SURVEY §7: the Gaussian cloud (and MLPs)
are replicated, pixels are sharded — each chip rasterizes a horizontal band of
the image (bands align with the 8-row kernel tiles) — and frames are
data-parallel across the 'data' axis. jax.grad differentiates *through*
shard_map, so the transpose of the replicated parameters inserts the
per-Gaussian gradient all-reduce over ICI automatically ("replicate Gaussians,
shard tiles, psum grads").

Perceptual losses (SSIM/LPIPS/S3IM) need the full frame, so each band
all-gathers the rendered image over 'tile' (a few MB over ICI) before the loss
— keeping one loss code path guarantees numerical parity with the single-chip
step (tested on the 8-virtual-device CPU mesh, tests/test_parallel.py).

Works on any jax.sharding.Mesh, including multi-host meshes created after
jax.distributed.initialize() — no code change needed (SURVEY §5.8).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

if hasattr(jax, "shard_map"):
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..config import Config
from ..data.frames import Frame
from ..ops import rasterize_tpu as rt
from ..render.render import SceneContext, render_frame
from ..train.losses import LossWeights, compute_losses
from ..train.optim import make_optimizer
from ..train.train_step import TrainState


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_tile, (
        f"need {n_data * n_tile} devices, have {len(devices)}"
    )
    dev = np.array(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, ("data", "tile"))


def band_rasterize_fn(n_tile: int, axis: str = "tile", slot_budget: int = 0,
                      pair_budget: int = 0, max_tiles: int = 16) -> Callable:
    """A rasterize_fn for render_frame that renders this device's pixel band.

    Must run inside shard_map over `axis`. The band y-origin comes from the
    axis index; mean2d shifts into band-local coordinates (binning/blending
    are translation-equivariant). Band images are reassembled with all_gather
    so downstream full-image losses are exact.
    """

    def fn(proj, bg_color, height: int, width: int):
        assert height % (n_tile * rt.TILE_H) == 0, (
            f"image height {height} must split into {n_tile} tile-aligned bands"
        )
        hb = height // n_tile
        i = jax.lax.axis_index(axis)
        y0 = (i * hb).astype(jnp.float32)
        shift = jnp.stack([jnp.zeros_like(y0), y0])
        proj_local = proj._replace(mean2d=proj.mean2d - shift[None, :])
        out = rt.rasterize_tpu(proj_local, bg_color, hb, width,
                               max_tiles_per_gaussian=max_tiles,
                               pair_budget=pair_budget,
                               slot_budget=slot_budget)
        full = {
            k: jax.lax.all_gather(v, axis, axis=0, tiled=True)
            for k, v in out.items()
            if k != "overflow"
        }
        full["overflow"] = jax.lax.psum(out["overflow"], axis)
        return full

    return fn


def _shard_map_compat(f, mesh, in_specs, out_specs):
    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except TypeError:  # older kwarg name
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)


def make_sharded_train_step(
    scene: SceneContext,
    cfg: Config,
    mesh: Mesh,
    crop_h: int,
    crop_w: int,
    lpips_params=None,
    spatial_lr_scale: float = 1.0,
    slot_budget: int = 0,
    pair_budget: int = 0,
    max_tiles: int = 16,
):
    """Build (init_fn, step_fn) for multi-chip training over a frame batch.

    step_fn(ts, frames_all, idx, sh_degree, gt_lpips_feats) — frames_all is
    the WHOLE stacked train split (leading dim F, replicated; use
    stack_frames) and idx is an (n_data,) int32 vector of the frame each
    'data' shard trains on this step; pixels are sharded over 'tile'; params
    and optimizer replicated. Densify statistics follow the reference
    semantics per frame (grad-norm per frame, then summed over the batch —
    matching its sequential accumulation).
    slot_budget: per-BAND static pair-buffer budget (0 = safe default); the
    sharded trainer probes the densest band and autosizes it like the
    single-chip path.
    """
    optimizer = make_optimizer(cfg.optim, spatial_lr_scale=spatial_lr_scale)
    weights = LossWeights(
        l1=cfg.optim.w_l1, mask=cfg.optim.w_mask, ssim=cfg.optim.w_ssim,
        lpips=cfg.optim.w_lpips, nll=cfg.optim.w_nll, s3im=cfg.optim.w_s3im,
    )
    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
    n_data, n_tile = mesh.shape["data"], mesh.shape["tile"]
    raster = band_rasterize_fn(n_tile, slot_budget=slot_budget,
                               pair_budget=pair_budget, max_tiles=max_tiles)

    def init_fn(params):
        return optimizer.init(params)

    @jax.jit
    def step_fn(ts: TrainState, frames_all: Frame, idx, sh_degree,
                gt_lpips_feats=None):
        """One data-parallel update.

        frames_all: the WHOLE stacked train split (F, ...), replicated — it
        stays device-resident across the run so queued dispatch needs no
        per-step host tensor work (PERF.md 'queued async dispatch').
        idx: (n_data,) int32, the frame each 'data' shard trains on this step.
        gt_lpips_feats: optionally the whole split's stacked gt LPIPS towers
        (list of (F, 1, H', W', C)), indexed by the same idx.
        """
        P_cap = ts.params["gauss"].capacity
        cam0 = jax.tree.map(lambda x: x[0], frames_all.camera)
        sh_deg = jnp.asarray(sh_degree, jnp.int32)
        has_feats = gt_lpips_feats is not None

        def device_forward(params, valid, idx_shard, dummy_shard, sh_deg,
                           frames_rep, *feats_rep):
            i = idx_shard[0]
            frame = jax.tree.map(lambda x: x[i], frames_rep)
            # (1, H', W', C) per stage when the gt LPIPS cache is staged —
            # same hoisted-gt-tower trick as the single-chip step
            feats = [f[i] for f in feats_rep] if has_feats else None
            out = render_frame(
                params["gauss"], valid, params.get("mlps"), scene,
                frame.smpl_params, frame.camera, bg, cfg.model.sh_degree,
                rasterize_fn=raster, mean2d_offset=dummy_shard[0],  # (P, 2)
                motion_offset=cfg.model.motion_offset, active_sh=sh_deg,
                static_scene=cfg.model.static_scene,
            )
            total, logs = compute_losses(
                out, frame.image, frame.bkgd_mask, frame.bound_mask,
                frame.pose_rotmats, frame.crop_y0, frame.crop_x0,
                crop_h, crop_w, lpips_params=lpips_params, weights=weights,
                gt_lpips_feats=feats,
            )
            total = jax.lax.pmean(total, "data")
            logs = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), logs)
            logs["raster_overflow"] = jax.lax.psum(out["overflow"], "data")
            aux = {
                "logs": logs,
                "vis": out["visibility_filter"][None],
                "radii": out["radii"][None],
                "Rs": (out["pose_out"]["Rs"][None]
                       if out["pose_out"] is not None else jnp.zeros((1, 23, 3, 3))),
                # gated on pose_out like the single-chip step: the Fisher
                # splat is defined for the 24-joint SMPL motion-offset path
                "bw": (out["lbs_weights"][None]
                       if out["pose_out"] is not None
                       and out["lbs_weights"] is not None
                       else jnp.zeros((1, P_cap, 24))),
            }
            return total, aux

        n_feats = len(gt_lpips_feats) if has_feats else 0
        fwd = _shard_map_compat(
            device_forward, mesh,
            in_specs=(P(), P(), P("data"), P("data"), P(), P())
            + (P(),) * n_feats,
            out_specs=(P(), {
                "logs": P(),
                "vis": P("data"), "radii": P("data"),
                "Rs": P("data"), "bw": P("data"),
            }),
        )

        def loss_fn(params, dummy):
            total, aux = fwd(
                params, ts.gstate.valid, idx, dummy, sh_deg, frames_all,
                *(gt_lpips_feats if has_feats else ()),
            )
            return total, aux

        dummy = jnp.zeros((n_data, P_cap, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(ts.params, dummy)

        updates, opt_state = optimizer.update(grads[0], ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        # reference as-executed step-skip semantics on densify/reset/final
        # iterations (train/optim.apply_reference_update_skips) — identical
        # to the single-chip step so the parity tests stay exact
        from ..train.optim import apply_reference_update_skips

        params, opt_state = apply_reference_update_skips(
            cfg.optim, cfg.model.white_background, ts.step + 1,
            ts.params, ts.opt_state, params, opt_state,
        )

        # densify stats (reference add_densification_stats per frame)
        gs = ts.gstate
        vis_b = aux["vis"]                       # (n_data, P)
        radii_b = aux["radii"].astype(jnp.float32)
        ndc_scale = jnp.array([cam0.width * 0.5, cam0.height * 0.5], jnp.float32)
        g_dummy = grads[1]                       # (n_data, P, 2)
        # the loss is pmean'd over 'data', so each shard's dummy gradient is
        # 1/n_data of that frame's own gradient; undo the mean so the accum
        # matches the reference's per-frame add_densification_stats semantics
        # (a 4-chip mesh would otherwise under-fire the densify threshold 4x)
        gnorm_b = jnp.linalg.norm(
            g_dummy * ndc_scale[None, None, :], axis=-1) * float(n_data)
        gstate = dataclasses.replace(
            gs,
            xyz_grad_accum=gs.xyz_grad_accum
            + jnp.sum(jnp.where(vis_b, gnorm_b, 0.0), axis=0),
            denom=gs.denom + jnp.sum(vis_b.astype(jnp.float32), axis=0),
            max_radii2d=jnp.maximum(
                gs.max_radii2d,
                jnp.max(jnp.where(vis_b, radii_b, 0.0), axis=0),
            ),
            joint_F=gs.joint_F + jnp.sum(aux["Rs"], axis=0),
            lbs_weight_sum=gs.lbs_weight_sum + jnp.sum(aux["bw"], axis=0),
        )
        logs = dict(aux["logs"])
        logs["num_points"] = gstate.num_valid
        return TrainState(params, opt_state, gstate, ts.step + 1), logs

    return init_fn, step_fn


def stack_frames(frames):
    """Stack Frame pytrees along a new leading axis (camera statics must match)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *frames)
