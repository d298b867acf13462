"""Pallas TPU tile rasterizer: forward + custom-VJP backward.

TPU-native replacement for the reference CUDA rasterizer
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:261-383 render, backward.cu:398-587 render backward,
rasterizer_impl.cu binning) with the same numerical contract as the jnp oracle
(ops/rasterize_ref.py) — both implement the identical masked-cumulative
formulation of the sequential front-to-back blend.

Design (see SURVEY.md §5.7, §7):
  * 8x128-pixel SUPERTILES: one supertile is exactly one native f32
    (sublane, lane) register tile, so per-tile accumulators ARE image blocks —
    the kernel writes its (8, 128) output blocks straight into the (H, W)
    images via the BlockSpec index map. (A 32x32 tile needs a tile->image
    relayout that XLA lowers to a pathological elementwise copy: ~350 ms/frame
    measured.)
  * LANE-PACKED SUBTILES (groups G in {1, 2, 4}): splats are narrow relative
    to 128 lanes, so binning runs at (8, 128/G)-pixel subtiles and each chunk
    row carries G independent pairs — one per 128/G-lane group. Per-pair
    scalars become lane-composite planes (G broadcasts + G-1 selects at 1/8
    the cost of a full-block op); every lane then blends exactly its own
    subtile's depth-ordered stream, so the per-pixel math is identical to
    G=1. G=4 halves the chunk count on the bench scene
    (tools/subtile_stats.py).
  * Binning on the XLA side (ops/binning.py): global depth sort + stable tile
    sort + chunk-aligned supertile-interleaved slices of a TRANSPOSED
    (16, NPAIRS) pair buffer; the kernel streams (16, G*CHUNK) column blocks
    with double-buffered async DMA at 128-aligned lane offsets (a Mosaic
    requirement).
  * The inner blend is pure-VPU f32 on (CHUNK, 8, 128) blocks:
      power  = u0 + (u1 + u2 dy) dy  with u0 = -a dx^2 / 2, u1 = -b dx,
               u2 = -c / 2 precomputed as (CHUNK, 1, 128) lane planes (dx
               varies only along lanes) — fewer full-width ops than the
               direct quadratic, and the lane-composite form for G > 1 falls
               out for free. (An MXU quadratic-form trick runs at bf16 input
               precision on v5e and corrupts power through cancellation —
               measured 2.5e-3 rel.)
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

TILE_H = 8                # geometric supertile = native f32 vreg tile
TILE_W = 128
PIX = TILE_H * TILE_W
CHUNK = 128               # splats per group per inner step
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

# Default lane-group count: how many subtile streams share the 128 lanes.
# Overridable per call; MOSS_RASTER_GROUPS sets the process default.
# G=2 measured best end-to-end on the bench scene (G=4 has the fastest
# kernels but its fatter pair buffer costs more in the build backward).
DEFAULT_GROUPS = int(os.environ.get("MOSS_RASTER_GROUPS", "2"))

# The pair buffer is stored TRANSPOSED, (16, NPAIRS). Row layout (f32):
#  0 mx_local  1 my_local  2 conic_a  3 conic_b  4 conic_c
#  5 opacity   6 r  7 g  8 b  9 depth  10 valid  11..15 unused
GEOM_COLS = 16
# grad rows mirror it:
#  0 dmx  1 dmy  2 da  3 db  4 dc  5 dop  6 dr  7 dg  8 db(lue)  9 ddepth


def _col(g, i):
    """Per-splat scalar column i of the (K, 16) block as (K, 1, 1).

    Sliced 2D-first — 1-D intermediates crash the Mosaic layout pass."""
    return g[:, i:i + 1][:, :, None]


def _composite2(cols, G):
    """Merge per-group (K, 1) scalar columns into one (K, TILE_W) lane plane.

    Lane l carries group (l // (TILE_W // G))'s value. 2-D (K, W) shapes pack
    8 rows per vreg (16 vregs at K=128) — the 3-D (K, 1, W) form does NOT
    pack (one sublane per row, 8x the vregs), which made a first lane-plane
    formulation SLOWER than the full-width math it replaced (measured 16.6M
    -> 11.3M rays/s). Cost here: G broadcasts + G-1 selects at ~1/8 of a
    full-block op."""
    K = cols[0].shape[0]
    out = jnp.broadcast_to(cols[0], (K, TILE_W))
    sub_w = TILE_W // G
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
    for g in range(1, G):
        out = jnp.where(
            lane >= g * sub_w, jnp.broadcast_to(cols[g], (K, TILE_W)), out
        )
    return out


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


def _group_lane_sums(x, G):
    """(K, W) -> list of G (K, 1) per-lane-group sums.

    Direct masked native lane reductions — a log-tree of masked rolls was
    ~3x slower (the native cross-lane reduce is far cheaper than its
    log2(W) roll+select emulation)."""
    if G == 1:
        return [jnp.sum(x, axis=1, keepdims=True)]
    W = x.shape[-1]
    sub_w = W // G
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    return [
        jnp.sum(
            jnp.where((lane >= g * sub_w) & (lane < (g + 1) * sub_w), x, 0.0),
            axis=1, keepdims=True,
        )
        for g in range(G)
    ]


class _Blend(NamedTuple):
    alpha: jnp.ndarray      # (K, H, W)
    contrib: jnp.ndarray    # (K, H, W) bool
    T_before: jnp.ndarray   # (K, H, W)
    w: jnp.ndarray          # (K, H, W)
    T_out: jnp.ndarray      # (1, H, W)
    done_out: jnp.ndarray   # (1, H, W)
    dy: jnp.ndarray         # (K, H, W)
    dxw: jnp.ndarray        # (K, W) packed per-lane dx for the moment stage


def _pixel_coords():
    """Supertile-local pixel coords as (1, TILE_H, TILE_W) f32."""
    px = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_H, TILE_W), 2).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_H, TILE_W), 1).astype(jnp.float32)
    return px, py


def _chunk_blend(gs, rels, T_in, done, G):
    """Shared forward math for one chunk of G group streams.

    gs: list of G (K, 16) geometry blocks; rels: list of G () int32 live-row
    counts (count_g - c*CHUNK). T_in/done: (1, TILE_H, TILE_W).
    Each lane blends its own group's pair stream — the per-pixel math is the
    oracle's masked-cumulative contract exactly; for G == 1 the dataflow is
    byte-identical to the single-stream kernel (no composites). Transmittance
    is tracked multiplicatively — the CUDA recurrence T *= (1 - alpha)
    (forward.cu:351-364) becomes an inclusive masked cumprod; T_before is the
    exclusive product (one shift), and the T < 1e-4 termination is a monotone
    threshold on the inclusive product.
    """
    K = gs[0].shape[0]
    px, py = _pixel_coords()
    rowid = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    pxw = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1).astype(jnp.float32)

    if G == 1:
        g = gs[0]

        def comp(i):   # (K, 1, 1) per-splat scalar, broadcast in use
            return _col(g, i)

        def comp2(i):  # (K, 1) packed per-splat scalar
            return g[:, i:i + 1]

        dxw = g[:, 0:1] - pxw            # (K, W) packed
        rm = rowid < rels[0]
    else:
        def comp(i):   # (K, 1, W) lane-composite, packed 2-D then expanded
            return _composite2([g_[:, i:i + 1] for g_ in gs], G)[:, None, :]

        def comp2(i):  # (K, W) packed lane-composite
            return _composite2([g_[:, i:i + 1] for g_ in gs], G)

        dxw = _composite2([g_[:, 0:1] for g_ in gs], G) - pxw  # (K, W)
        # f32 composite — i1-vector selects hit an unsupported-bitwidth
        # truncation in Mosaic.
        rm = _composite2(
            [jnp.where(rowid[:, :, 0] < r, 1.0, 0.0) for r in rels], G
        )[:, None, :] > 0.5

    dy = comp(1) - py
    # lane-plane Horner quadratic (module docstring): dx varies only along
    # lanes, so u0 = -a dx^2/2 and u1 = -b dx stay (K, W) packed (16 vregs)
    # and the full-width expansion is 4 ops vs ~8 for the direct quadratic.
    u0 = -0.5 * (comp2(2) * dxw) * dxw   # (K, W)
    u1 = -(comp2(3) * dxw)               # (K, W)
    u2 = -0.5 * comp2(4)                 # (K, 1) or (K, W)
    power = u0[:, None, :] + (u1[:, None, :] + u2[:, None, :] * dy) * dy
    alpha = jnp.minimum(ALPHA_MAX, comp(5) * jnp.exp(power))
    # no valid-column test: all rows < count are live pairs by construction
    # (build_pair_rows), and zeroed pad rows give alpha = 0 < ALPHA_MIN.
    m = rm & (power <= 0.0) & (alpha >= ALPHA_MIN)
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
    return _Blend(alpha, contrib, T_before, w, T_out, done_out, dy, dxw), comp


def _group_geoms(scratch_block, G, K):
    """Slice the (16, G*CHUNK) chunk block into G (K, 16) group geometries."""
    return [
        jnp.transpose(scratch_block[:, g * CHUNK:g * CHUNK + K], (1, 0))
        for g in range(G)
    ]


def _fwd_kernel(gw: int, G: int, start_ref, count_ref, geom_hbm,
                r_ref, g_ref, b_ref, d_ref, a_ref, t_ref,
                scratch, sems):
    t = pl.program_id(0)
    base = start_ref[t]
    counts = [count_ref[t * G + g] for g in range(G)]
    maxc = counts[0]
    for g in range(1, G):
        maxc = jnp.maximum(maxc, counts[g])
    n_chunks = (maxc + CHUNK - 1) // CHUNK

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(
                pl.multiple_of(base + c * (G * CHUNK), CHUNK), G * CHUNK
            )],
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

        def live(carry):
            T, done, acc_r, acc_g, acc_b, acc_d, acc_a, _ = carry
            gs = _group_geoms(scratch[slot], G, K)
            rels = [cg - c * CHUNK for cg in counts]
            bl, comp = _chunk_blend(gs, rels, T, done, G)
            w = bl.w
            acc_r = acc_r + jnp.sum(w * comp(6), axis=0, keepdims=True)
            acc_g = acc_g + jnp.sum(w * comp(7), axis=0, keepdims=True)
            acc_b = acc_b + jnp.sum(w * comp(8), axis=0, keepdims=True)
            acc_d = acc_d + jnp.sum(w * comp(9), axis=0, keepdims=True)
            acc_a = acc_a + jnp.sum(w, axis=0, keepdims=True)
            stop = (jnp.min(bl.done_out) > 0.5).astype(jnp.int32)
            return (bl.T_out, bl.done_out, acc_r, acc_g, acc_b, acc_d, acc_a,
                    stop)

        return live

    def body(c, carry):
        stop = carry[-1]
        slot = jax.lax.rem(c, 2)

        # DMAs run unconditionally (cheap; ~30 MB/frame total) so the
        # issue/wait pairing stays trivially consistent; only the VPU work is
        # skipped once every pixel in the tile has terminated (the reference
        # kernel's per-thread `done` voting, forward.cu:314-316, becomes this
        # whole-tile early exit — contributions past saturation are exactly 0).
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()

        is_half_tail = (c == n_chunks - 1) & (maxc - c * CHUNK <= CHUNK // 2)

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


def _bwd_kernel(gw: int, G: int, start_ref, count_ref, geom_hbm, gimg_ref,
                grad_hbm, scratch, out_scratch, sems, out_sems):
    t = pl.program_id(0)
    base = start_ref[t]
    counts = [count_ref[t * G + g] for g in range(G)]
    maxc = counts[0]
    for g in range(1, G):
        maxc = jnp.maximum(maxc, counts[g])
    n_chunks = (maxc + CHUNK - 1) // CHUNK

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(
                pl.multiple_of(base + c * (G * CHUNK), CHUNK), G * CHUNK
            )],
            scratch.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, c):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            grad_hbm.at[:, pl.ds(
                pl.multiple_of(base + c * (G * CHUNK), CHUNK), G * CHUNK
            )],
            out_sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    gimg = gimg_ref[0]           # (8, TILE_H, TILE_W)
    g_r, g_g, g_b = gimg[0:1], gimg[1:2], gimg[2:3]
    g_d, g_a = gimg[3:4], gimg[4:5]
    # row 6 = Qtot + g_Tfinal*T_final, folded OUTSIDE the kernel (bwd()): the
    # suffix term the d-alpha formula needs is (s_after + tail) and
    # s_after = Qtot - prefix, so pre-adding tail to Qtot deletes one
    # full-width add per chunk from the inner loop
    Qtail = gimg[6:7]

    def make_live(c, slot, K):
        # K < CHUNK: half-width tail path (see _fwd_kernel.make_live) — the
        # produced grad rows are padded back to (CHUNK, 16) with zeros, which
        # is exactly what the full path writes for those dead rows.
        rowid2 = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

        def live(carry):
            T, done, prefix, _ = carry
            gs = _group_geoms(scratch[slot], G, K)
            rels = [cg - c * CHUNK for cg in counts]
            bl, comp = _chunk_blend(gs, rels, T, done, G)
            alpha, contrib, T_before, w = bl.alpha, bl.contrib, bl.T_before, bl.w
            dLdw = (
                comp(6) * g_r + comp(7) * g_g + comp(8) * g_b
                + comp(9) * g_d + g_a
            )  # (K, TILE_H, TILE_W)
            q = w * dLdw
            prefix_incl = prefix + _cumsum_splats(q)
            s_after = Qtail - prefix_incl   # (Qtot - prefix) + tail, prefolded
            # dalpha feeds ONLY dpower; fusing the clamp predicate into the
            # contrib select drops a separate select + mask-multiply pair
            live_g = contrib & (alpha < ALPHA_MAX)
            dpower = jnp.where(
                live_g,
                (dLdw * T_before - s_after / (1.0 - alpha)) * alpha,
                0.0,
            )

            # Two-stage reductions, sublane axis first: the (K, TILE_W)
            # intermediates pack 8x denser than (K, TILE_H, TILE_W), so the
            # lane-reduction stage runs on 16 vregs instead of 128. dx is
            # constant over sublanes, so EVERY dx-weighted moment (sfx, da,
            # db) drops to the cheap (K, W) lane stage: sum_hw f*dx*g =
            # sum_w dx_w * (sum_h f*g) — exact reassociation; the full-width
            # dpower*dx product and its sublane reduce disappear entirely.
            # The lane stage is SEGMENTED per group (G independent sums per
            # row, _group_lane_sums).
            def ssum(x):  # (K, H, W) -> (K, W)
                return jnp.sum(x, axis=1)

            dxw = bl.dxw              # (K, W) packed per-lane dx
            fdy = dpower * bl.dy
            s_dp = ssum(dpower)       # (K, W)
            A0 = s_dp * dxw           # == ssum(dpower * dx)
            B0 = ssum(fdy)
            reds = [
                A0,                   # -> sfx
                B0,                   # -> sfy
                A0 * dxw,             # -> -2 da
                B0 * dxw,             # -> -db
                ssum(fdy * bl.dy),    # -> -2 dc
                s_dp,                 # -> dop * op
                ssum(w * g_r),        # -> dr
                ssum(w * g_g),        # -> dg
                ssum(w * g_b),        # -> dblue
                ssum(w * g_d),        # -> ddepth
            ]
            reds = [_group_lane_sums(x, G) for x in reds]

            grad_blocks = []
            for g in range(G):
                def gl(r, g=g):  # group-g lane sum as (K, 1)
                    return r[g]

                sfx, sfy = gl(reds[0]), gl(reds[1])
                da = -0.5 * gl(reds[2])
                db = -gl(reds[3])
                dc = -0.5 * gl(reds[4])
                gg_ = gs[g]
                a2, b2, c2 = gg_[:, 2:3], gg_[:, 3:4], gg_[:, 4:5]
                dmx = -(a2 * sfx + b2 * sfy)
                dmy = -(c2 * sfy + b2 * sfx)
                op = jnp.maximum(gg_[:, 5:6], 1e-12)
                dop = gl(reds[5]) / op
                dr, dg, dbl, dd = (gl(reds[6]), gl(reds[7]), gl(reds[8]),
                                   gl(reds[9]))
                zeros = jnp.zeros_like(da)
                grad_rows = jnp.concatenate(
                    [dmx, dmy, da, db, dc, dop, dr, dg, dbl, dd,
                     zeros, zeros, zeros, zeros, zeros, zeros],
                    axis=1,
                )  # (K, 16)
                rm2 = rowid2 < (counts[g] - c * CHUNK)
                grad_rows = jnp.where(rm2, grad_rows, 0.0)
                if K < CHUNK:
                    grad_rows = jnp.concatenate(
                        [grad_rows,
                         jnp.zeros((CHUNK - K, GEOM_COLS), jnp.float32)],
                        axis=0,
                    )
                grad_blocks.append(jnp.transpose(grad_rows, (1, 0)))
            out_block = (grad_blocks[0] if G == 1
                         else jnp.concatenate(grad_blocks, axis=1))
            prefix_out = prefix + jnp.sum(q, axis=0, keepdims=True)
            stop = (jnp.min(bl.done_out) > 0.5).astype(jnp.int32)
            return (bl.T_out, bl.done_out, prefix_out, stop), out_block

        return live

    def body(c, carry):
        stop0 = carry[-1]
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()

        def dead(carry):
            return carry, jnp.zeros((GEOM_COLS, G * CHUNK), jnp.float32)

        is_half_tail = (c == n_chunks - 1) & (maxc - c * CHUNK <= CHUNK // 2)

        def full_or_dead(carry):
            return jax.lax.cond(stop0 == 0, make_live(c, slot, CHUNK), dead, carry)

        def half_or_dead(carry):
            return jax.lax.cond(
                stop0 == 0, make_live(c, slot, CHUNK // 2), dead, carry
            )

        carry, out_block = jax.lax.cond(
            is_half_tail, half_or_dead, full_or_dead, carry
        )

        @pl.when(c >= 2)
        def _():
            put_dma(slot, c - 2).wait()

        out_scratch[slot] = out_block   # (16, G*CHUNK)
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


def _run_fwd(tile_start, tile_count, geom, grid_h: int, grid_w: int, G: int):
    num_tiles = grid_h * grid_w   # supertiles
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
            pltpu.VMEM((2, GEOM_COLS, G * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w, G),
        out_shape=[img] * 6,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(tile_start, tile_count, geom)


def _run_bwd(tile_start, tile_count, geom, gimg, grid_h: int, grid_w: int,
             G: int):
    num_tiles = grid_h * grid_w   # supertiles
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
            pltpu.VMEM((2, GEOM_COLS, G * CHUNK), jnp.float32),
            pltpu.VMEM((2, GEOM_COLS, G * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w, G),
        out_shape=jax.ShapeDtypeStruct(geom.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(tile_start, tile_count, geom, gimg)


@functools.lru_cache(maxsize=None)
def _make_rasterize_pairs(grid_h: int, grid_w: int, G: int):
    @jax.custom_vjp
    def f(geom, tile_start, tile_count):
        return _run_fwd(tile_start, tile_count, geom, grid_h, grid_w, G)

    def fwd(geom, tile_start, tile_count):
        out = _run_fwd(tile_start, tile_count, geom, grid_h, grid_w, G)
        return out, (geom, tile_start, tile_count, out)

    def bwd(res, g_out):
        geom, tile_start, tile_count, out = res
        r, g, b, d, a, T = out
        gr, gg, gb, gd, ga, gT = g_out
        # Qtot + tail prefolded (see _bwd_kernel): the kernel's d-alpha path
        # only ever uses their sum
        Qtail = gr * r + gg * g + gb * b + gd * d + ga * a + gT * T
        zeros = jnp.zeros_like(Qtail)
        gimg = jnp.stack([gr, gg, gb, gd, ga, zeros, Qtail, zeros], axis=0)[None]
        # (1, 8, Hp, Wp)
        dgeom = _run_bwd(tile_start, tile_count, geom, gimg, grid_h, grid_w, G)
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
                 pair_budget: int = 0, groups: int = 1,
                 slot_budget: int = 0):
    grid_h = -(-height // TILE_H)
    grid_w = -(-width // TILE_W)
    pl_ = build_pair_rows(
        proj.mean2d, proj.conic, proj.opacity, proj.color, proj.depth,
        proj.radius, proj.valid,
        height, width, TILE_H, TILE_W, max_tiles_per_gaussian,
        pair_budget=pair_budget, align=CHUNK,
        radius_xy=proj.radius_xy, groups=groups, slot_budget=slot_budget,
    )
    # build_pair_rows returns the (16, NP2) TRANSPOSED pair buffer directly:
    # the kernels DMA (16, G*CHUNK) column blocks at 128-aligned lane offsets
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
    static_argnames=("height", "width", "max_tiles_per_gaussian",
                     "pair_budget", "groups", "slot_budget"),
)
def rasterize_tpu(
    proj: Projected,
    bg_color,
    height: int,
    width: int,
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    groups: int = 0,
    slot_budget: int = 0,
):
    """Drop-in replacement for rasterize_reference on TPU (same return dict).

    Differentiable w.r.t. proj.{mean2d, conic, color, opacity, depth} and
    bg_color: the kernel's per-pair gradients flow back to Gaussians through
    the gather's transpose (a deterministic scatter-add).

    groups selects the lane-packed subtile factor (see module docstring);
    0 = module default (DEFAULT_GROUPS / MOSS_RASTER_GROUPS). slot_budget
    statically sizes the aligned pair buffer (0 = safe heuristic); size it
    from binning.measure_slot_need for a representative frame — the TPU
    analog of the reference's per-frame arena resizing — since every
    downstream cost (row gather, backward scatter-add) scales with it. The per-pixel
    blend math is group-independent; only the binning granularity (and thus
    which rect-boundary pixels a splat's tiles cover — the same semantic
    freedom the reference exercises with its 16x16 tile choice) varies.
    """
    G = groups or DEFAULT_GROUPS
    tg, grid_h, grid_w = _build_pairs(
        proj, height, width, max_tiles_per_gaussian, pair_budget, G,
        slot_budget,
    )

    r, g, b, d, a, T = _make_rasterize_pairs(grid_h, grid_w, G)(
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
