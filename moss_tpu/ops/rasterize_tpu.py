"""Pallas TPU tile rasterizer: forward + custom-VJP backward.

TPU-native replacement for the reference CUDA rasterizer
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:261-383 render, backward.cu:398-587 render backward,
rasterizer_impl.cu binning) with the same numerical contract as the jnp oracle
(ops/rasterize_ref.py) — both implement the identical masked-cumulative
formulation of the sequential front-to-back blend.

Design (see SURVEY.md §5.7, §7):
  * 32x32-pixel tiles stored in the native f32 vector layout: each tile's 1024
    pixels live in one (8, 128) register tile, linearized as
    pixel i -> (row i // 32, col i % 32). No lane padding waste, near-square
    footprint (minimizes splats-per-tile overlap).
  * Binning on the XLA side (ops/binning.py): global depth sort + stable tile
    sort + 8-aligned per-tile slices. The kernel streams its slice from HBM in
    (CHUNK, 16) row blocks with double-buffered async DMA.
  * The inner blend is MXU + VPU work on (CHUNK, 1024) blocks:
      power  = W6 @ phi           (MXU; quadratic splat form in a 6-dim basis
                                   of tile-local pixel coords — local coords
                                   keep the expansion cancellation-free)
      alpha  = min(0.99, op * exp(power)) with the reference's skip rules
      T      = exp(cumsum log1p(-alpha))   (log-space transmittance; the
                                   termination test T < 1e-4 becomes a
                                   monotone threshold on the cumsum)
      out   += F^T @ (alpha * T)  (MXU; F = [r,g,b,depth,1])
  * Backward is a forward-order *recompute* pass (no stored per-splat state):
    suffix sums S_k = sum_{j>k} w_j dL/dw_j needed by d alpha come from
    Q_tot - prefix_k, where Q_tot is reconstructed from the forward outputs.
    Per-pair gradients are DMA'd to a pair-grad buffer and segment-summed to
    Gaussians outside the kernel — fully deterministic, no atomics
    (the reference's atomicAdd scatter, backward.cu:538-584, is replaced by a
    reduction; this also fixes its nondeterministic float-add ordering).

The public entry rasterize_tpu() matches rasterize_reference()'s signature and
return dict, so the renderer can swap kernels with one config flag.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import align_binning, bin_gaussians
from .projection import Projected

# interpreter mode lets the CPU test suite run the very same kernels
INTERPRET = os.environ.get("MOSS_PALLAS_INTERPRET", "0") == "1"

TILE = 32                 # geometric tile edge (32x32 px = 1024 = 8*128)
PIX = TILE * TILE         # pixels per tile
CHUNK = 128               # splats processed per inner step
LANES = 1024
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_EPS = float(np.log(1e-4))

# The pair buffer is stored TRANSPOSED, (16, NPAIRS), so the kernels can DMA
# (16, CHUNK) column blocks at 128-aligned lane offsets (a Mosaic requirement
# for sliced HBM copies). Row layout (f32):
#  0 mx_local  1 my_local  2 conic_a  3 conic_b  4 conic_c
#  5 opacity   6 r  7 g  8 b  9 depth  10 valid  11..15 unused
GEOM_COLS = 16
# grad rows mirror it:
#  0 dmx  1 dmy  2 da  3 db  4 dc  5 dop  6 dr  7 dg  8 db(lue)  9 ddepth


def _phi():
    """(6, 1024) basis [px^2, py^2, px*py, px, py, 1] of tile-local coords."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    px = jnp.mod(lin, TILE).astype(jnp.float32)
    py = (lin // TILE).astype(jnp.float32)
    one = jnp.ones_like(px)
    return jnp.concatenate([px * px, py * py, px * py, px, py, one], axis=0)


def _w6(g):
    """(CHUNK, 6) splat coefficients so that power = W6 @ phi (cancellation-free
    because mx/my are tile-local)."""
    mx, my = g[:, 0:1], g[:, 1:2]
    a, b, c = g[:, 2:3], g[:, 3:4], g[:, 4:5]
    return jnp.concatenate(
        [
            -0.5 * a,
            -0.5 * c,
            -b,
            a * mx + b * my,
            c * my + b * mx,
            -0.5 * (a * mx * mx + c * my * my) - b * mx * my,
        ],
        axis=1,
    )


def _cumsum_rows(x):
    """Inclusive cumsum along the sublane (row) axis via Hillis-Steele shifts."""
    K = x.shape[0]
    rowid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < K:
        shifted = pltpu.roll(x, s, axis=0)
        x = x + jnp.where(rowid >= s, shifted, 0.0)
        s *= 2
    return x


def _chunk_blend(g, rowmask, T_log, done):
    """Shared forward math for one (CHUNK, 16) geometry block.

    Returns (alpha, lg, cum_incl, contrib, w, T_log_out, done_out) where all
    (CHUNK, LANES) arrays follow the oracle's masked-cumulative contract.
    """
    dn = jnp.float32
    w6 = _w6(g)
    phi = _phi()
    power = jax.lax.dot_general(
        w6, phi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (CHUNK, LANES)
    op = g[:, 5:6]
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    m = (
        rowmask
        & (g[:, 10:11] > 0.5)
        & (power <= 0.0)
        & (alpha >= ALPHA_MIN)
    )
    lg = jnp.where(m, jnp.log1p(-alpha), 0.0)
    cum = T_log + _cumsum_rows(lg)  # inclusive candidate log-transmittance
    fired = (cum < LOG_T_EPS) | (done > 0.5)
    contrib = m & ~fired
    w = jnp.where(contrib, alpha, 0.0) * jnp.exp(cum - lg)  # alpha * T_before
    T_log_out = T_log + jnp.sum(jnp.where(contrib, lg, 0.0), axis=0, keepdims=True)
    done_out = jnp.maximum(done, fired[-1:].astype(dn))
    return alpha, lg, cum, contrib, w, T_log_out, done_out


def _feat5(g):
    """(CHUNK, 5) features [r, g, b, depth, 1]."""
    return jnp.concatenate(
        [g[:, 6:9], g[:, 9:10], jnp.ones_like(g[:, 0:1])], axis=1
    )


def _fwd_kernel(start_ref, count_ref, geom_hbm, out_ref, scratch, sems):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    rowid = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def body(c, carry):
        T_log, done, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        g = jnp.transpose(scratch[slot], (1, 0))  # (CHUNK, 16)
        rowmask = rowid < (count - c * CHUNK)
        _alpha, _lg, _cum, _contrib, w, T_log, done = _chunk_blend(
            g, rowmask, T_log, done
        )
        acc = acc + jax.lax.dot_general(
            _feat5(g), w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5, LANES)
        return T_log, done, acc

    T_log0 = jnp.zeros((1, LANES), jnp.float32)
    done0 = jnp.zeros((1, LANES), jnp.float32)
    acc0 = jnp.zeros((5, LANES), jnp.float32)
    T_log, done, acc = jax.lax.fori_loop(0, n_chunks, body, (T_log0, done0, acc0))

    out_ref[0] = jnp.concatenate(
        [acc, jnp.exp(T_log), done, jnp.zeros((1, LANES), jnp.float32)], axis=0
    )  # rows: r g b depth weight | T_final | done | pad


def _bwd_kernel(
    start_ref, count_ref, geom_hbm, gimg_ref, grad_hbm, scratch, out_scratch, sems, out_sems
):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    n_chunks = (count + CHUNK - 1) // CHUNK

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, c):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            grad_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK)],
            out_sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    rowid = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    gimg = gimg_ref[0]          # (8, LANES)
    g5 = gimg[0:5]              # cotangents for r g b depth weight
    Qtot = gimg[6:7]            # sum_j w_j dL/dw_j reconstructed outside
    tail = gimg[7:8]            # g_Tfinal * T_final

    def body(c, carry):
        T_log, done, prefix = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        g = jnp.transpose(scratch[slot], (1, 0))  # (CHUNK, 16)
        rowmask = rowid < (count - c * CHUNK)
        alpha, lg, cum, contrib, w, T_log_out, done_out = _chunk_blend(
            g, rowmask, T_log, done
        )
        feat = _feat5(g)
        dLdw = jax.lax.dot_general(
            feat, g5, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (CHUNK, LANES)
        q = w * dLdw
        prefix_incl = prefix + _cumsum_rows(q)
        s_after = Qtot - prefix_incl  # sum over j > k of q_j
        one_m_alpha = jnp.maximum(1.0 - alpha, 1e-6)
        T_before = jnp.exp(cum - lg)
        dalpha = jnp.where(
            contrib,
            dLdw * T_before - (s_after + tail) / one_m_alpha,
            0.0,
        )
        notclamp = (alpha < ALPHA_MAX).astype(jnp.float32)
        dpower = dalpha * alpha * notclamp  # (CHUNK, LANES)

        # grads to the 6 basis coefficients, then chain to (mx,my,a,b,c)
        G6 = jax.lax.dot_general(
            dpower, _phi(), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, 6)
        mx, my = g[:, 0:1], g[:, 1:2]
        a, b, cc = g[:, 2:3], g[:, 3:4], g[:, 4:5]
        G0, G1, G2 = G6[:, 0:1], G6[:, 1:2], G6[:, 2:3]
        G3, G4, G5c = G6[:, 3:4], G6[:, 4:5], G6[:, 5:6]
        da = -0.5 * G0 + mx * G3 - 0.5 * mx * mx * G5c
        dc = -0.5 * G1 + my * G4 - 0.5 * my * my * G5c
        db = -G2 + my * G3 + mx * G4 - mx * my * G5c
        dmx = a * G3 + b * G4 - (a * mx + b * my) * G5c
        dmy = b * G3 + cc * G4 - (cc * my + b * mx) * G5c

        op = jnp.maximum(g[:, 5:6], 1e-12)
        dop = jnp.sum(dpower, axis=1, keepdims=True) / op

        dfeat = jax.lax.dot_general(
            w, g5, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (CHUNK, 5): dr dg db ddepth d(one)
        zeros = jnp.zeros_like(dmx)
        grad_rows = jnp.concatenate(
            [dmx, dmy, da, db, dc, dop, dfeat[:, 0:4], zeros, zeros, zeros,
             zeros, zeros, zeros],
            axis=1,
        )  # (CHUNK, 16)
        grad_rows = jnp.where(rowmask, grad_rows, 0.0)

        # double-buffered write-back: wait for the previous use of this slot
        @pl.when(c >= 2)
        def _():
            put_dma(slot, c - 2).wait()

        out_scratch[slot] = jnp.transpose(grad_rows, (1, 0))  # (16, CHUNK)
        put_dma(slot, c).start()

        prefix_out = prefix + jnp.sum(q, axis=0, keepdims=True)
        return T_log_out, done_out, prefix_out

    T_log0 = jnp.zeros((1, LANES), jnp.float32)
    done0 = jnp.zeros((1, LANES), jnp.float32)
    prefix0 = jnp.zeros((1, LANES), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (T_log0, done0, prefix0))

    # drain outstanding writes
    @pl.when(n_chunks >= 2)
    def _():
        put_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        put_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()


def _run_fwd(tile_start, tile_count, geom, num_tiles: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, LANES), lambda t, s0, s1: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(tile_start, tile_count, geom)


def _run_bwd(tile_start, tile_count, geom, gimg, num_tiles: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 8, LANES), lambda t, s0, s1: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_COLS, CHUNK), jnp.float32),
            pltpu.VMEM((2, GEOM_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(geom.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(tile_start, tile_count, geom, gimg)


@functools.lru_cache(maxsize=None)
def _make_rasterize_pairs(num_tiles: int):
    @jax.custom_vjp
    def f(geom, tile_start, tile_count):
        return _run_fwd(tile_start, tile_count, geom, num_tiles)

    def fwd(geom, tile_start, tile_count):
        out = _run_fwd(tile_start, tile_count, geom, num_tiles)
        return out, (geom, tile_start, tile_count, out)

    def bwd(res, g_out):
        geom, tile_start, tile_count, out = res
        # rows of out: 0-4 = r g b depth weight, 5 = T_final
        Qtot = jnp.sum(g_out[:, 0:5] * out[:, 0:5], axis=1, keepdims=True)
        tail = g_out[:, 5:6] * out[:, 5:6]
        gimg = jnp.concatenate(
            [g_out[:, 0:5], jnp.zeros_like(tail), Qtot, tail], axis=1
        )  # (T, 8, L)
        dgeom = _run_bwd(tile_start, tile_count, geom, gimg, num_tiles)
        return (
            dgeom,
            np.zeros(tile_start.shape, jax.dtypes.float0),
            np.zeros(tile_count.shape, jax.dtypes.float0),
        )

    f.defvjp(fwd, bwd)
    return f


class _TileGeometry(NamedTuple):
    geom: jnp.ndarray
    pair_gaussian: jnp.ndarray
    pair_valid: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    overflow: jnp.ndarray


def _build_pairs(proj: Projected, height, width, max_tiles_per_gaussian):
    grid_h = -(-height // TILE)
    grid_w = -(-width // TILE)
    num_tiles = grid_h * grid_w
    b = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, proj.valid,
        height, width, TILE, TILE, max_tiles_per_gaussian,
    )
    ab = align_binning(b, num_tiles)
    NP2 = ab.pair_gaussian.shape[0]

    gid = ab.pair_gaussian
    # tile origin per pair (recover tile id from the aligned layout by
    # searching the start offsets)
    pair_idx = jnp.arange(NP2, dtype=jnp.int32)
    tile_of_pair = (
        jnp.searchsorted(ab.tile_start, pair_idx, side="right").astype(jnp.int32) - 1
    )
    tile_of_pair = jnp.clip(tile_of_pair, 0, num_tiles - 1)
    ox = (tile_of_pair % grid_w) * TILE
    oy = (tile_of_pair // grid_w) * TILE

    mean = proj.mean2d[gid]
    geom = jnp.concatenate(
        [
            (mean[:, 0] - ox.astype(mean.dtype))[None],
            (mean[:, 1] - oy.astype(mean.dtype))[None],
            proj.conic[gid].T,
            proj.opacity[gid][None],
            proj.color[gid].T,
            proj.depth[gid][None],
            ab.pair_valid[None].astype(mean.dtype),
            jnp.zeros((GEOM_COLS - 11, NP2), mean.dtype),
        ],
        axis=0,
    )  # (16, NP2) transposed pair buffer
    # gradient barrier: dead columns (incl. any uninitialized guard-tail grads
    # from the backward kernel) must not back-propagate into Gaussian 0.
    geom = jnp.where(ab.pair_valid[None, :], geom, 0.0)
    return _TileGeometry(
        geom=geom,
        pair_gaussian=gid,
        pair_valid=ab.pair_valid,
        tile_start=ab.tile_start,
        tile_count=ab.tile_count,
        overflow=ab.overflow,
    ), grid_h, grid_w


@functools.lru_cache(maxsize=None)
def _unpack_index(grid_h, grid_w, height, width):
    """Static (H, W) flat indices into the (T*LANES,) tile-linearized buffer."""
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    tile_id = (yy // TILE) * grid_w + (xx // TILE)
    lane = (yy % TILE) * TILE + (xx % TILE)
    return jnp.asarray(tile_id * LANES + lane, jnp.int32)


def _unpack_tiles(x, grid_h, grid_w, height, width):
    """(T, LANES) tile-linearized -> (H, W) via one static gather (a
    reshape/transpose chain here lowers to a pathological elementwise copy)."""
    idx = _unpack_index(grid_h, grid_w, height, width)
    return x.reshape(-1)[idx]


@functools.partial(
    jax.jit, static_argnames=("height", "width", "max_tiles_per_gaussian")
)
def rasterize_tpu(
    proj: Projected,
    bg_color,
    height: int,
    width: int,
    max_tiles_per_gaussian: int = 32,
):
    """Drop-in replacement for rasterize_reference on TPU (same return dict).

    Differentiable w.r.t. proj.{mean2d, conic, color, opacity, depth} and
    bg_color: the kernel's per-pair gradients are segment-summed back to
    Gaussians through the gather's transpose (deterministic scatter-add).
    """
    tg, grid_h, grid_w = _build_pairs(proj, height, width, max_tiles_per_gaussian)
    num_tiles = grid_h * grid_w

    out = _make_rasterize_pairs(num_tiles)(tg.geom, tg.tile_start, tg.tile_count)
    # out rows: r g b depth weight T_final done pad  -> (T, 8, LANES)
    C = proj.color.shape[-1]
    T_final = _unpack_tiles(out[:, 5], grid_h, grid_w, height, width)
    color = jnp.stack(
        [_unpack_tiles(out[:, ch], grid_h, grid_w, height, width) for ch in range(C)],
        axis=-1,
    )
    color = color + T_final[..., None] * bg_color[None, None, :]
    return {
        "color": color,
        "depth": _unpack_tiles(out[:, 3], grid_h, grid_w, height, width),
        "alpha": _unpack_tiles(out[:, 4], grid_h, grid_w, height, width),
        "final_T": T_final,
        "overflow": tg.overflow,
    }
