"""Pallas TPU tile rasterizer: forward + custom-VJP backward.

TPU-native replacement for the reference CUDA rasterizer
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:261-383 render, backward.cu:398-587 render backward,
rasterizer_impl.cu binning) with the same numerical contract as the jnp oracle
(ops/rasterize_ref.py) — both implement the identical masked-cumulative
formulation of the sequential front-to-back blend.

Design (see SURVEY.md §5.7, §7):
  * 8x128-pixel tiles: one tile is exactly one native f32 (sublane, lane)
    register tile, so per-tile accumulators ARE image blocks — the kernel
    writes its (8, 128) output blocks straight into the (H, W) images via the
    BlockSpec index map. (A 32x32 tile needs a tile->image relayout that XLA
    lowers to a pathological elementwise copy: ~350 ms/frame measured.)
  * Binning on the XLA side (ops/binning.py): global depth sort + stable tile
    sort + chunk-aligned per-tile slices of a TRANSPOSED (16, NPAIRS) pair
    buffer; the kernel streams (16, CHUNK) column blocks with double-buffered
    async DMA at 128-aligned lane offsets (a Mosaic requirement).
  * The inner blend is pure-VPU f32 on (CHUNK, 8, 128) blocks:
      power  = -0.5(a dx^2 + c dy^2) - b dx dy   (tile-local deltas; an MXU
               quadratic-form trick runs at bf16 input precision on v5e and
               corrupts power through cancellation — measured 2.5e-3 rel)
      alpha  = min(0.99, op * exp(power)) with the reference's skip rules
      T      = masked cumprod of (1 - alpha)   (the CUDA recurrence
               T *= (1 - alpha); the T < 1e-4 termination is a monotone
               threshold on the inclusive product)
      out   += alpha * T * [r, g, b, depth, 1]
  * Backward is a forward-order *recompute* pass (no stored per-splat state):
    the suffix sums S_k = sum_{j>k} w_j dL/dw_j needed by d alpha come from
    Q_tot - prefix_k, where Q_tot is reconstructed from the forward outputs.
    Per-pair gradients are DMA'd to a pair-grad buffer and segment-summed to
    Gaussians outside the kernel — fully deterministic, no atomics
    (the reference's atomicAdd scatter, backward.cu:538-584, becomes a
    reduction, which also fixes its nondeterministic float-add ordering).

The public entry rasterize_tpu() matches rasterize_reference()'s signature and
return dict, so the renderer swaps kernels with one config flag.
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

from .binning import align_binning, bin_gaussians, build_pair_rows
from .projection import Projected

# interpreter mode lets the CPU test suite run the very same kernels
INTERPRET = os.environ.get("MOSS_PALLAS_INTERPRET", "0") == "1"

TILE_H = 8                # geometric tile = native f32 vreg tile
TILE_W = 128
PIX = TILE_H * TILE_W
CHUNK = 128               # splats processed per inner step
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

# The pair buffer is stored TRANSPOSED, (16, NPAIRS). Row layout (f32):
#  0 mx_local  1 my_local  2 conic_a  3 conic_b  4 conic_c
#  5 opacity   6 r  7 g  8 b  9 depth  10 valid  11..15 unused
GEOM_COLS = 16
# grad rows mirror it:
#  0 dmx  1 dmy  2 da  3 db  4 dc  5 dop  6 dr  7 dg  8 db(lue)  9 ddepth


def _pixel_coords():
    """Tile-local pixel coords as (1, TILE_H, TILE_W) f32."""
    px = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_H, TILE_W), 2).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_H, TILE_W), 1).astype(jnp.float32)
    return px, py


def _col(g, i):
    """Per-splat scalar column i of the (CHUNK, 16) block as (CHUNK, 1, 1).

    Sliced 2D-first — 1-D intermediates crash the Mosaic layout pass."""
    return g[:, i:i + 1][:, :, None]


def _scan_splats(x, op, unit):
    """Inclusive scan along the splat (leading) axis for an associative op.

    Two-level formulation: Hillis-Steele within groups of S splats (log2 S
    full-width roll+combine+select steps), then a scan over the G group
    totals at 1/S width, then one broadcast combine — ~10 full-width ops for
    K=128 vs 21 for the flat log2(K) Hillis-Steele.
    """
    K, H, W = x.shape
    S = 8
    if K % S or K <= S:
        rowid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        s = 1
        while s < K:
            shifted = pltpu.roll(x, s, axis=0)
            x = op(x, jnp.where(rowid >= s, shifted, unit))
            s *= 2
        return x
    G = K // S
    xg = x.reshape(G, S, H, W)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (G, S, H, W), 1)
    s = 1
    while s < S:
        shifted = pltpu.roll(xg, s, axis=1)
        xg = op(xg, jnp.where(rowid >= s, shifted, unit))
        s *= 2
    tot = xg[:, S - 1]  # (G, H, W) inclusive group totals
    gid = jax.lax.broadcasted_iota(jnp.int32, (G, H, W), 0)
    s = 1
    while s < G:
        shifted = pltpu.roll(tot, s, axis=0)
        tot = op(tot, jnp.where(gid >= s, shifted, unit))
        s *= 2
    # exclusive group offsets: shift totals down one group
    off = jnp.where(gid >= 1, pltpu.roll(tot, 1, axis=0), unit)
    return op(xg, off[:, None]).reshape(K, H, W)


def _cumsum_splats(x):
    return _scan_splats(x, jnp.add, 0.0)


def _cumprod_splats(x):
    return _scan_splats(x, jnp.multiply, 1.0)


def _shift_down_splats(x, fill):
    """Shift one step along the splat axis; row 0 <- fill ((1, H, W))."""
    rowid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rowid == 0, fill, pltpu.roll(x, 1, axis=0))


def _chunk_blend(g, rowmask, T_in, done):
    """Shared forward math for one (CHUNK, 16) geometry block.

    rowmask: (CHUNK, 1, 1) live-row mask. T_in/done: (1, TILE_H, TILE_W).
    Returns (alpha, contrib, T_before, w, T_out, done_out); the
    (CHUNK, TILE_H, TILE_W) arrays follow the oracle's masked-cumulative
    contract exactly. Transmittance is tracked multiplicatively — the CUDA
    recurrence T *= (1 - alpha) (forward.cu:351-364) becomes an inclusive
    masked cumprod; T_before is the exclusive product (one shift), and the
    T < 1e-4 termination is a monotone threshold on the inclusive product.
    """
    px, py = _pixel_coords()
    dx = _col(g, 0) - px  # (CHUNK, TILE_H, TILE_W)
    dy = _col(g, 1) - py
    a, b, c = _col(g, 2), _col(g, 3), _col(g, 4)
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    op = _col(g, 5)
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    # no valid-column test: all rows < count are live pairs by construction
    # (build_pair_rows), and zeroed pad rows give alpha = 0 < ALPHA_MIN.
    m = rowmask & (power <= 0.0) & (alpha >= ALPHA_MIN)
    one_m_a = jnp.where(m, 1.0 - alpha, 1.0)
    cumT = T_in * _cumprod_splats(one_m_a)  # inclusive candidate T
    fired = (cumT < T_EPS) | (done > 0.5)
    contrib = m & ~fired
    T_before = _shift_down_splats(cumT, T_in)
    w = jnp.where(contrib, alpha, 0.0) * T_before  # alpha * T_before
    # T after the last contributing splat: cumT is non-increasing, so this is
    # the min of cumT over contrib rows (T_in when none) — reduce_prod is not
    # lowerable in Mosaic, reduce_min is.
    T_out = jnp.min(jnp.where(contrib, cumT, T_in), axis=0, keepdims=True)
    done_out = jnp.maximum(done, fired[-1:].astype(jnp.float32))
    return alpha, contrib, T_before, w, T_out, done_out


def _fwd_kernel(gw: int, start_ref, count_ref, geom_hbm,
                r_ref, g_ref, b_ref, d_ref, a_ref, t_ref,
                scratch, sems):
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

    def make_live(c, slot, K):
        """Forward blend of chunk c at splat width K (static).

        K < CHUNK is the half-width tail path: the last chunk of a tile has
        count % CHUNK live rows; when that remainder is <= CHUNK // 2 the
        whole blend runs on (K, H, W) blocks — half the vregs per op — which
        claws back about half of the 128-granularity padding waste (~13% of
        pairs on the bench scene, PERF.md).
        """
        rowid = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)

        def live(carry):
            T, done, acc_r, acc_g, acc_b, acc_d, acc_a, _ = carry
            g = jnp.transpose(scratch[slot][:, :K], (1, 0))  # (K, 16)
            rowmask = rowid < (count - c * CHUNK)
            _al, _ct, _tb, w, T, done = _chunk_blend(
                g, rowmask, T, done
            )
            acc_r = acc_r + jnp.sum(w * _col(g, 6), axis=0, keepdims=True)
            acc_g = acc_g + jnp.sum(w * _col(g, 7), axis=0, keepdims=True)
            acc_b = acc_b + jnp.sum(w * _col(g, 8), axis=0, keepdims=True)
            acc_d = acc_d + jnp.sum(w * _col(g, 9), axis=0, keepdims=True)
            acc_a = acc_a + jnp.sum(w, axis=0, keepdims=True)
            stop = (jnp.min(done) > 0.5).astype(jnp.int32)
            return T, done, acc_r, acc_g, acc_b, acc_d, acc_a, stop

        return live

    def body(c, carry):
        stop = carry[-1]
        slot = jax.lax.rem(c, 2)

        # DMAs run unconditionally (cheap; ~20 MB/frame total) so the
        # issue/wait pairing stays trivially consistent; only the VPU work is
        # skipped once every pixel in the tile has terminated (the reference
        # kernel's per-thread `done` voting, forward.cu:314-316, becomes this
        # whole-tile early exit — contributions past saturation are exactly 0).
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()

        is_half_tail = (c == n_chunks - 1) & (count - c * CHUNK <= CHUNK // 2)

        def full_or_dead(carry):
            return jax.lax.cond(
                stop == 0, make_live(c, slot, CHUNK), lambda carry: carry, carry
            )

        def half_or_dead(carry):
            return jax.lax.cond(
                stop == 0, make_live(c, slot, CHUNK // 2), lambda carry: carry,
                carry,
            )

        return jax.lax.cond(is_half_tail, half_or_dead, full_or_dead, carry)

    zero = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
    one = jnp.ones((1, TILE_H, TILE_W), jnp.float32)
    T, done, ar, ag, ab_, ad, aa, _stop = jax.lax.fori_loop(
        0, n_chunks, body,
        (one, zero, zero, zero, zero, zero, zero, jnp.int32(0)),
    )
    r_ref[:] = ar[0]
    g_ref[:] = ag[0]
    b_ref[:] = ab_[0]
    d_ref[:] = ad[0]
    a_ref[:] = aa[0]
    t_ref[:] = T[0]


def _bwd_kernel(gw: int, start_ref, count_ref, geom_hbm, gimg_ref, grad_hbm,
                scratch, out_scratch, sems, out_sems):
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

    gimg = gimg_ref[0]           # (8, TILE_H, TILE_W)
    g_r, g_g, g_b = gimg[0:1], gimg[1:2], gimg[2:3]
    g_d, g_a = gimg[3:4], gimg[4:5]
    Qtot = gimg[6:7]             # sum_j w_j dL/dw_j from forward outputs
    tail = gimg[7:8]             # g_Tfinal * T_final

    def make_live(c, slot, K):
        # K < CHUNK: half-width tail path (see _fwd_kernel.make_live) — the
        # produced grad rows are padded back to (CHUNK, 16) with zeros, which
        # is exactly what the full path writes for those dead rows.
        rowid = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)

        def live(carry):
            T, done, prefix, _ = carry
            g = jnp.transpose(scratch[slot][:, :K], (1, 0))  # (K, 16)
            rowmask = rowid < (count - c * CHUNK)
            alpha, contrib, T_before, w, T_out, done_out = _chunk_blend(
                g, rowmask, T, done
            )
            dLdw = (
                _col(g, 6) * g_r + _col(g, 7) * g_g + _col(g, 8) * g_b
                + _col(g, 9) * g_d + g_a
            )  # (CHUNK, TILE_H, TILE_W)
            q = w * dLdw
            prefix_incl = prefix + _cumsum_splats(q)
            s_after = Qtot - prefix_incl
            dalpha = jnp.where(
                contrib, dLdw * T_before - (s_after + tail) / (1.0 - alpha), 0.0
            )
            dpower = dalpha * alpha * (alpha < ALPHA_MAX).astype(jnp.float32)

            px, py = _pixel_coords()
            dx = _col(g, 0) - px
            dy = _col(g, 1) - py
            a2, b2, c2 = g[:, 2:3], g[:, 3:4], g[:, 4:5]  # (CHUNK, 1)

            # Two-stage reductions, sublane axis first: the (CHUNK, TILE_W)
            # intermediates pack 8x denser than (CHUNK, TILE_H, TILE_W), so
            # the lane-reduction tree runs on 16 vregs instead of 128.
            # dx is constant over sublanes, so the dx-weighted moments (da, db)
            # drop to the cheap (CHUNK, W) lane stage: sum_hw f*dx*g =
            # sum_w dx_w * (sum_h f*g) — exact reassociation, no extra
            # full-block multiplies.
            def ssum(x):  # (CHUNK, H, W) -> (CHUNK, W)
                return jnp.sum(x, axis=1)

            def ls(x2):   # (CHUNK, W) -> (CHUNK, 1)
                return jnp.sum(x2, axis=1, keepdims=True)

            fdx = dpower * dx
            fdy = dpower * dy
            A0 = ssum(fdx)            # (CHUNK, W)
            B0 = ssum(fdy)
            pxw = jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_W), 1
            ).astype(jnp.float32)
            dxw = g[:, 0:1] - pxw     # (CHUNK, W): dx per lane
            sfx = ls(A0)
            sfy = ls(B0)
            da = -0.5 * ls(A0 * dxw)
            dc = -0.5 * ls(ssum(fdy * dy))
            db = -ls(B0 * dxw)
            dmx = -(a2 * sfx + b2 * sfy)
            dmy = -(c2 * sfy + b2 * sfx)
            op = jnp.maximum(g[:, 5:6], 1e-12)
            dop = ls(ssum(dpower)) / op
            dr = ls(ssum(w * g_r))
            dg = ls(ssum(w * g_g))
            dbl = ls(ssum(w * g_b))
            dd = ls(ssum(w * g_d))
            zeros = jnp.zeros_like(da)
            grad_rows = jnp.concatenate(
                [dmx, dmy, da, db, dc, dop, dr, dg, dbl, dd,
                 zeros, zeros, zeros, zeros, zeros, zeros],
                axis=1,
            )  # (K, 16)
            rm2 = rowid.reshape(K, 1) < (count - c * CHUNK)
            grad_rows = jnp.where(rm2, grad_rows, 0.0)
            if K < CHUNK:
                grad_rows = jnp.concatenate(
                    [grad_rows, jnp.zeros((CHUNK - K, GEOM_COLS), jnp.float32)],
                    axis=0,
                )
            prefix_out = prefix + jnp.sum(q, axis=0, keepdims=True)
            stop = (jnp.min(done_out) > 0.5).astype(jnp.int32)
            return (T_out, done_out, prefix_out, stop), grad_rows

        return live

    def body(c, carry):
        stop0 = carry[-1]
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()

        def dead(carry):
            return carry, jnp.zeros((CHUNK, GEOM_COLS), jnp.float32)

        is_half_tail = (c == n_chunks - 1) & (count - c * CHUNK <= CHUNK // 2)

        def full_or_dead(carry):
            return jax.lax.cond(stop0 == 0, make_live(c, slot, CHUNK), dead, carry)

        def half_or_dead(carry):
            return jax.lax.cond(
                stop0 == 0, make_live(c, slot, CHUNK // 2), dead, carry
            )

        carry, grad_rows = jax.lax.cond(
            is_half_tail, half_or_dead, full_or_dead, carry
        )

        @pl.when(c >= 2)
        def _():
            put_dma(slot, c - 2).wait()

        out_scratch[slot] = jnp.transpose(grad_rows, (1, 0))  # (16, CHUNK)
        put_dma(slot, c).start()
        return carry

    zero = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
    one = jnp.ones((1, TILE_H, TILE_W), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (one, zero, zero, jnp.int32(0)))

    @pl.when(n_chunks >= 2)
    def _():
        put_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        put_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()


def _run_fwd(tile_start, tile_count, geom, grid_h: int, grid_w: int):
    num_tiles = grid_h * grid_w
    Hp, Wp = grid_h * TILE_H, grid_w * TILE_W
    img_spec = pl.BlockSpec(
        (TILE_H, TILE_W),
        lambda t, s0, s1: (t // grid_w, t % grid_w),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[img_spec] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w),
        out_shape=[img] * 6,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(tile_start, tile_count, geom)


def _run_bwd(tile_start, tile_count, geom, gimg, grid_h: int, grid_w: int):
    num_tiles = grid_h * grid_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 8, TILE_H, TILE_W),
                lambda t, s0, s1: (0, 0, t // grid_w, t % grid_w),
                memory_space=pltpu.VMEM,
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
        functools.partial(_bwd_kernel, grid_w),
        out_shape=jax.ShapeDtypeStruct(geom.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(tile_start, tile_count, geom, gimg)


@functools.lru_cache(maxsize=None)
def _make_rasterize_pairs(grid_h: int, grid_w: int):
    @jax.custom_vjp
    def f(geom, tile_start, tile_count):
        return _run_fwd(tile_start, tile_count, geom, grid_h, grid_w)

    def fwd(geom, tile_start, tile_count):
        out = _run_fwd(tile_start, tile_count, geom, grid_h, grid_w)
        return out, (geom, tile_start, tile_count, out)

    def bwd(res, g_out):
        geom, tile_start, tile_count, out = res
        r, g, b, d, a, T = out
        gr, gg, gb, gd, ga, gT = g_out
        Qtot = gr * r + gg * g + gb * b + gd * d + ga * a
        tail = gT * T
        zeros = jnp.zeros_like(Qtot)
        gimg = jnp.stack([gr, gg, gb, gd, ga, zeros, Qtot, tail], axis=0)[None]
        # (1, 8, Hp, Wp)
        dgeom = _run_bwd(tile_start, tile_count, geom, gimg, grid_h, grid_w)
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


def _build_pairs(proj: Projected, height, width, max_tiles_per_gaussian,
                 pair_budget: int = 0):
    grid_h = -(-height // TILE_H)
    grid_w = -(-width // TILE_W)
    pl_ = build_pair_rows(
        proj.mean2d, proj.conic, proj.opacity, proj.color, proj.depth,
        proj.radius, proj.valid,
        height, width, TILE_H, TILE_W, max_tiles_per_gaussian,
        pair_budget=pair_budget, align=CHUNK,
        radius_xy=proj.radius_xy,
    )
    # build_pair_rows returns the (16, NP2) TRANSPOSED pair buffer directly:
    # the kernels DMA (16, CHUNK) column blocks at 128-aligned lane offsets
    # (a Mosaic requirement; row-major (CHUNK, 16) VMEM slices violate the
    # 128-lane tiling). Local coords, validity column, and the dead-column
    # gradient barrier are already applied.
    geom = pl_.rows
    return _TileGeometry(
        geom=geom,
        pair_gaussian=None,
        pair_valid=pl_.pair_valid,
        tile_start=pl_.tile_start,
        tile_count=pl_.tile_count,
        overflow=pl_.overflow,
    ), grid_h, grid_w


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tiles_per_gaussian", "pair_budget"),
)
def rasterize_tpu(
    proj: Projected,
    bg_color,
    height: int,
    width: int,
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
):
    """Drop-in replacement for rasterize_reference on TPU (same return dict).

    Differentiable w.r.t. proj.{mean2d, conic, color, opacity, depth} and
    bg_color: the kernel's per-pair gradients flow back to Gaussians through
    the gather's transpose (a deterministic scatter-add).
    """
    tg, grid_h, grid_w = _build_pairs(
        proj, height, width, max_tiles_per_gaussian, pair_budget
    )

    r, g, b, d, a, T = _make_rasterize_pairs(grid_h, grid_w)(
        tg.geom, tg.tile_start, tg.tile_count
    )

    def crop(x):
        return x[:height, :width]

    T_final = crop(T)
    color = jnp.stack([crop(r), crop(g), crop(b)], axis=-1)
    color = color + T_final[..., None] * bg_color[None, None, :]
    return {
        "color": color,
        "depth": crop(d),
        "alpha": crop(a),
        "final_T": T_final,
        "overflow": tg.overflow,
    }
