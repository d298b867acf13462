"""Tile binning for the splatting rasterizer.

TPU-native replacement for the reference's CUB-based binning pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:70-138,250-338): instead of prefix-sum + 64-bit
(tile|depth)-key radix sort + per-tile range identification, we

  1. depth-sort all Gaussians once (jnp.argsort; invalid -> +inf),
  2. expand each Gaussian into its covered tile rect with a *static*
     per-Gaussian tile budget (MAX_TILES_PER_GAUSSIAN; overflow is counted and
     reported, never silently wrong: overflowing Gaussians keep their first
     rows of tiles — overflow count is returned for logging),
  3. sort the (tile, depth-rank) pairs by tile id with jax.lax.sort (stable, so
     depth order is preserved within a tile),
  4. compute per-tile [start, count) via searchsorted.

Everything is static-shape and jit-safe. The pair list is the input to the
Pallas render kernel (ops/rasterize_tpu.py); per-pair gradients are
segment-summed back to Gaussians, which keeps the backward deterministic
(no atomics — see SURVEY.md §5.2).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows(table, idx, nsplit: int):
    """table[idx] with a CHUNKED scatter-add VJP.

    XLA's scatter-add is superlinear in update count (PERF.md: 1.5 ms at 159k
    rows, 4.8 ms at 317k); splitting the one big scatter into `nsplit`
    sequential scatters into the same accumulator sits back on the linear part
    of the curve (measured 3.5 -> 2.2 ms at 233k rows, tools/scatter_micro.py).
    Bit-exactness: float summation order per table row changes (per-chunk
    partial sums), which is within the same reassociation freedom the single
    scatter already exercises.
    """
    return table[idx]


def _gather_rows_fwd(table, idx, nsplit: int):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(nsplit: int, res, g):
    idx, P = res
    N = idx.shape[0]
    out = jnp.zeros((P, g.shape[1]), g.dtype)
    step = -(-N // nsplit)
    for k in range(nsplit):
        out = out.at[idx[k * step:(k + 1) * step]].add(
            g[k * step:(k + 1) * step], mode="promise_in_bounds"
        )
    return out, np.zeros(idx.shape, jax.dtypes.float0)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def tile_rect(mean2d, radius, grid_h: int, grid_w: int, tile_h: int, tile_w: int):
    """Covered tile rectangle per Gaussian (reference auxiliary.h getRect).

    Returns (min_y, min_x, max_y, max_x) int32 arrays; max is exclusive.
    Gaussians with radius 0 get an empty rect. Note the reference's max
    formula floor((x + r + tile - 1)/tile) under-covers fractional x + r that
    lands inside the first pixel of a tile — that truncation is part of the
    reference's semantics (the oracle's in_rect mask reproduces it), so it is
    kept verbatim here.
    """
    x = mean2d[..., 0]
    y = mean2d[..., 1]
    r = radius.astype(mean2d.dtype)
    min_x = jnp.clip(jnp.floor((x - r) / tile_w), 0, grid_w).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((x + r + tile_w - 1) / tile_w), 0, grid_w).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((y - r) / tile_h), 0, grid_h).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((y + r + tile_h - 1) / tile_h), 0, grid_h).astype(jnp.int32)
    empty = radius <= 0
    max_x = jnp.where(empty, min_x, max_x)
    max_y = jnp.where(empty, min_y, max_y)
    return min_y, min_x, max_y, max_x


def tile_rect_aabb(mean2d, radius, radius_xy, grid_h: int, grid_w: int,
                   tile_h: int, tile_w: int):
    """Reference rect INTERSECTED with the exact-cover per-axis AABB.

    The AABB rect uses the exact-cover max formula floor((x + r)/tile) + 1
    (the reference's integer-oriented formula under-covers fractional
    boundaries). Every pixel the intersection drops relative to the reference
    rect lies > rx (or > ry) from the mean on that axis, where alpha < 1/255
    by construction of radius_xy (projection.py) — so the blend would skip it
    anyway and the output is bit-identical to reference-rect binning, with
    fewer dead pairs for anisotropic splats.
    """
    x = mean2d[..., 0]
    y = mean2d[..., 1]
    rn_y, rn_x, rx_y, rx_x = tile_rect(mean2d, radius, grid_h, grid_w, tile_h, tile_w)
    rxf = radius_xy[..., 0].astype(mean2d.dtype)
    ryf = radius_xy[..., 1].astype(mean2d.dtype)
    a_min_x = jnp.clip(jnp.floor((x - rxf) / tile_w), 0, grid_w).astype(jnp.int32)
    a_max_x = jnp.clip(jnp.floor((x + rxf) / tile_w) + 1, 0, grid_w).astype(jnp.int32)
    a_min_y = jnp.clip(jnp.floor((y - ryf) / tile_h), 0, grid_h).astype(jnp.int32)
    a_max_y = jnp.clip(jnp.floor((y + ryf) / tile_h) + 1, 0, grid_h).astype(jnp.int32)
    min_y = jnp.maximum(rn_y, a_min_y)
    min_x = jnp.maximum(rn_x, a_min_x)
    max_y = jnp.maximum(jnp.minimum(rx_y, a_max_y), min_y)
    max_x = jnp.maximum(jnp.minimum(rx_x, a_max_x), min_x)
    empty = (radius <= 0) | (radius_xy[..., 0] <= 0) | (radius_xy[..., 1] <= 0)
    max_x = jnp.where(empty, min_x, max_x)
    max_y = jnp.where(empty, min_y, max_y)
    return min_y, min_x, max_y, max_x


class TileBinning(NamedTuple):
    """Static-shape binning result.

    pair_gaussian: (NPAIRS,) int32 — index into the *original* Gaussian arrays
      for each (tile, gaussian) pair, depth-sorted within each tile;
      NPAIRS = P * max_tiles_per_gaussian. Dead pairs keep their source
      Gaussian's index (NOT zeroed — align_binning is what zeroes dead
      entries); always mask with pair_valid before gathering.
    pair_tile: (NPAIRS,) int32 tile id (= ty * grid_w + tx), dead pairs get
      num_tiles (sorted to the end).
    pair_valid: (NPAIRS,) bool.
    tile_start: (num_tiles,) int32 offset of each tile's slice in the pair list.
    tile_count: (num_tiles,) int32 number of pairs in each tile.
    overflow: () int32 — total tiles dropped due to the per-Gaussian budget.
    """

    pair_gaussian: jnp.ndarray
    pair_tile: jnp.ndarray
    pair_valid: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    overflow: jnp.ndarray


def bin_gaussians(
    mean2d,
    depth,
    radius,
    valid,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    max_tiles_per_gaussian: int = 32,
) -> TileBinning:
    """Build the depth-ordered per-tile pair list (see module docstring)."""
    P = mean2d.shape[0]
    grid_h = -(-height // tile_h)
    grid_w = -(-width // tile_w)
    num_tiles = grid_h * grid_w
    B = max_tiles_per_gaussian

    # 1. Global depth order (stable; invalid last).
    sort_depth = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_depth)  # (P,)

    min_y, min_x, max_y, max_x = tile_rect(mean2d, radius, grid_h, grid_w, tile_h, tile_w)
    min_y, min_x = min_y[order], min_x[order]
    max_y, max_x = max_y[order], max_x[order]
    v_sorted = valid[order]

    n_x = max_x - min_x
    n_y = max_y - min_y
    n_tiles = n_x * n_y
    overflow = jnp.sum(jnp.where(v_sorted, jnp.maximum(n_tiles - B, 0), 0))

    # 2. Expand: slot b of Gaussian k covers tile (min_y + b // n_x, min_x + b % n_x).
    slot = jnp.arange(B, dtype=jnp.int32)[None, :]  # (1, B)
    n_x_safe = jnp.maximum(n_x, 1)[:, None]
    ty = min_y[:, None] + slot // n_x_safe
    tx = min_x[:, None] + slot % n_x_safe
    pair_live = v_sorted[:, None] & (slot < jnp.minimum(n_tiles, B)[:, None])
    tile_id = jnp.where(pair_live, ty * grid_w + tx, num_tiles).astype(jnp.int32)

    # 3. Stable sort pairs by tile id; values carry (depth-rank -> gaussian id).
    gauss_id = jnp.broadcast_to(order[:, None], (P, B)).astype(jnp.int32)
    tile_flat = tile_id.reshape(-1)
    gauss_flat = gauss_id.reshape(-1)
    live_flat = pair_live.reshape(-1)
    # jax.lax.sort is stable: within a tile, pairs keep global depth order
    # because the pair list is built in depth-rank-major order.
    tile_sorted, gauss_sorted, live_sorted = jax.lax.sort(
        (tile_flat, gauss_flat, live_flat.astype(jnp.int32)), num_keys=1
    )

    # 4. Per-tile ranges.
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)

    return TileBinning(
        pair_gaussian=gauss_sorted,
        pair_tile=tile_sorted,
        pair_valid=live_sorted.astype(bool),
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        overflow=overflow,
    )


class AlignedBinning(NamedTuple):
    """Pair list re-laid-out so every tile's slice starts `align`-aligned.

    The Pallas kernels DMA (16, chunk) column-blocks of the transposed pair
    buffer at dynamic lane offsets; Mosaic requires 128-aligned lane slices,
    and with align == chunk each tile's chunked range exactly covers its own
    padded slice — backward chunk writes can never touch another tile's rows.

    pair_gaussian: (NP2,) int32 (dead rows -> 0, excluded via pair_valid)
    pair_valid: (NP2,) bool
    tile_start: (num_tiles,) int32, each a multiple of 8
    tile_count: (num_tiles,) int32 true (unpadded) counts
    num_pairs: () int32 total live pairs (for stats/logging)
    overflow: () int32 dropped tiles (per-Gaussian budget)
    """

    pair_gaussian: jnp.ndarray
    pair_valid: jnp.ndarray
    pair_tile: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray


class PairLayout(NamedTuple):
    """Kernel-ready aligned pair layout from the fused fast path.

    rows: (16, NP2) f32 — TRANSPOSED geometry buffer in aligned order (the
      layout the Pallas kernels DMA directly), tile-LOCAL means in rows 0:2,
      kernel column layout (see rasterize_tpu GEOM_COLS); dead columns zeroed
      (gradient barrier included).
    pair_valid: (NP2,) bool; tile_start/tile_count as in AlignedBinning.
    num_pairs / overflow: live-pair count and dropped-pair count for logging.
    """

    rows: jnp.ndarray
    pair_valid: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray



def _default_slot_budget(NPb: int, G: int, align: int, num_tiles: int,
                         num_super: int) -> int:
    """Conservative slot budget when the caller gives none.

    G == 1: exact no-drop bound (each tile wastes < align slots). G > 1:
    pairs + per-supertile ceil padding + a skew allowance, min'd with the
    exact bound (which wins for small scenes, so tests never drop). The
    default must stay conservative — a too-small budget drops pairs (counted
    in `overflow`, but output-visible); callers that know their workload size
    it exactly via measure_slot_need (the bench scene needs 220k at G=2 vs
    this default's 310k, and the row gather + backward scatter-add scale with
    the buffer).
    """
    if G == 1:
        return NPb + align * num_tiles
    return min(
        G * NPb + G * align * num_super,
        NPb + NPb // 8 + G * align * num_super,
    )


def _npb(P: int, pair_budget: int, num_tiles: int,
         max_tiles_per_gaussian: int, align: int) -> int:
    """The ONE NPb rule (_pair_keys step 4): caller budget or the
    4P + 64*num_subtiles default, align-rounded, capped at the full P*B
    table. Every public budget helper and the runtime path call this — the
    formula must never be duplicated again (a drifted copy silently breaks
    the trainer's default-comparison decisions)."""
    if pair_budget == 0:
        pair_budget = 4 * P + 64 * num_tiles
    return min(((pair_budget + align - 1) // align) * align,
               P * max_tiles_per_gaussian)


def default_slot_budget(P: int, height: int, width: int, tile_h: int,
                        tile_w: int, groups: int = 1,
                        max_tiles_per_gaussian: int = 16,
                        pair_budget: int = 0, align: int = 128) -> int:
    """Public form of the default used by build_pair_rows (for callers that
    compare a measured need against the default before overriding it)."""
    G = groups
    grid_h = -(-height // tile_h)
    grid_w_sup = -(-width // tile_w)
    num_tiles = grid_h * grid_w_sup * G
    num_super = grid_h * grid_w_sup
    NPb = _npb(P, pair_budget, num_tiles, max_tiles_per_gaussian, align)
    return _default_slot_budget(NPb, G, align, num_tiles, num_super)


def default_pair_budget(P: int, height: int, width: int, tile_h: int,
                        tile_w: int, groups: int = 1,
                        max_tiles_per_gaussian: int = 16,
                        align: int = 128) -> int:
    """The NPb _pair_keys picks when pair_budget=0 (4P + 64·num_subtiles,
    align-rounded, capped at P·B) — public so callers can compare a measured
    live-pair count against the default before overriding it (the pair-table
    analog of default_slot_budget; keep in sync with _pair_keys step 4)."""
    grid_h = -(-height // tile_h)
    num_tiles = grid_h * (-(-width // tile_w)) * groups
    return _npb(P, 0, num_tiles, max_tiles_per_gaussian, align)


def worst_case_slot_budget(P: int, height: int, width: int, tile_h: int,
                           tile_w: int, groups: int = 1,
                           max_tiles_per_gaussian: int = 16,
                           pair_budget: int = 0, align: int = 128) -> int:
    """A TRUE upper bound on the aligned slot need under the given budgets:
    every supertile's per-group chunk count is ceil(max_group_count/align),
    so the total padded layout can never exceed G·NPb + G·align·num_super
    (each of the NPb pairs contributes at most G slots through its group's
    shared chunk rounding, plus one align-block of padding per (super,
    group)). Beyond this there is nothing for a slot-budget grower to gain —
    remaining overflow must come from the rect cap or the NPb cut."""
    G = groups
    grid_h = -(-height // tile_h)
    grid_w_sup = -(-width // tile_w)
    num_super = grid_h * grid_w_sup
    NPb = _npb(P, pair_budget, num_super * G, max_tiles_per_gaussian, align)
    return G * NPb + G * align * num_super



class _PairKeys(NamedTuple):
    """Steps 1-5 of the pair build: tile-sorted packed keys + per-tile counts."""

    order: jnp.ndarray            # (P,) depth order
    keys_b: jnp.ndarray           # (NPb,) tile-sorted (tile << KB | rank) keys
    t_start: jnp.ndarray          # (num_tiles,) per-SUBtile start in keys_b
    tile_count: jnp.ndarray       # (num_tiles,) live pairs per subtile
    total_live: jnp.ndarray       # () live pairs before the NPb budget cut
    budget_overflow: jnp.ndarray  # () pairs dropped by the NPb cut
    rect_overflow: jnp.ndarray    # () tiles dropped by the per-Gaussian budget
    max_rect: jnp.ndarray         # () max tiles touched by one Gaussian (pre-cap)


def _pair_keys(mean2d, conic, opacity, depth, radius, valid,
               height: int, width: int, tile_h: int, tile_w: int,
               max_tiles_per_gaussian: int, pair_budget: int, align: int,
               groups: int, radius_xy):
    """Shared front half of the binning pipeline (see build_pair_rows)."""
    P = mean2d.shape[0]
    G = groups
    assert tile_w % G == 0 and align % 8 == 0
    sub_w = tile_w // G
    grid_h = -(-height // tile_h)
    grid_w_sup = -(-width // tile_w)       # geometric supertile columns
    grid_w = grid_w_sup * G                # binning runs at subtile granularity
    num_tiles = grid_h * grid_w            # number of SUBtiles
    num_super = grid_h * grid_w_sup
    tile_w = sub_w
    B = max_tiles_per_gaussian

    # rank bits: depth rank < P
    KB = max(int(np.ceil(np.log2(max(P, 2)))), 1)
    assert (num_tiles + 1) < (1 << (31 - KB)), (
        f"packed key overflow: {num_tiles} tiles with {KB} rank bits"
    )

    # 1. depth order + inverse ranks. Keys are built on the ORIGINAL index
    # space with rank = inv_order[i] — per-element int gathers cost a flat
    # ~7.5 ns/elem on TPU, so one P-sized inverse beats five P-sized
    # gather-by-order's.
    sort_depth = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_depth).astype(jnp.int32)  # (P,)
    inv_order = jnp.argsort(order).astype(jnp.int32)   # depth rank of each i

    # 2. tile rects (AABB-tightened when extents are given)
    if radius_xy is not None:
        min_y, min_x, max_y, max_x = tile_rect_aabb(
            mean2d, radius, radius_xy, grid_h, grid_w, tile_h, tile_w
        )
    else:
        min_y, min_x, max_y, max_x = tile_rect(
            mean2d, radius, grid_h, grid_w, tile_h, tile_w
        )
    n_x = max_x - min_x
    n_tiles = n_x * (max_y - min_y)
    rect_overflow = jnp.sum(jnp.where(valid, jnp.maximum(n_tiles - B, 0), 0))
    max_rect = jnp.max(jnp.where(valid, n_tiles, 0))

    # 3. packed keys, one sort — all pair-table math in the TRANSPOSED (B, P)
    # layout: (P, B=16) arrays lower to minor-dim-16 vectors (7/8 of every
    # vreg idle, PERF.md); the same ops at (B, P) are fully lane-parallel.
    # The flattening order feeding the sort is irrelevant (single-key sort).
    slot = jnp.arange(B, dtype=jnp.int32)[:, None]           # (B, 1)
    n_x_safe = jnp.maximum(n_x, 1)[None, :]                  # (1, P)
    ty = min_y[None, :] + slot // n_x_safe                   # (B, P)
    tx = min_x[None, :] + slot % n_x_safe
    pair_live = valid[None, :] & (slot < jnp.minimum(n_tiles, B)[None, :])

    # 3b. exact peak-alpha tile cull: drop (splat, tile) pairs whose max
    # alpha over the tile's pixel grid is < 1/255 — the blend kernel's
    # ALPHA_MIN skip (forward.cu:341-349 semantics) zeroes those pairs'
    # contributions AND gradients, so dropping them is output-bit-identical
    # while every downstream cost (sort, gathers, kernel chunks, backward
    # scatter) scales with live pairs. The max of alpha = op*exp(-q) over the
    # tile rect is found by minimizing the positive-definite quadratic
    # q = 0.5(a dx^2 + c dy^2) + b dx dy over the rect of pixel centers:
    # at the mean if inside, else on one of the 4 edges (per-edge 1-D
    # minimizer, clamped). A small margin keeps the test conservative
    # against fp differences vs the kernel's per-pixel evaluation.
    if conic is not None:
        f32 = mean2d.dtype
        ca = conic[:, 0][None, :]
        cb = conic[:, 1][None, :]
        cc = conic[:, 2][None, :]
        mx = mean2d[:, 0][None, :]
        my = mean2d[:, 1][None, :]
        dx0 = tx.astype(f32) * tile_w - mx
        dx1 = dx0 + (tile_w - 1)
        dy0 = ty.astype(f32) * tile_h - my
        dy1 = dy0 + (tile_h - 1)

        def q(dx_, dy_):
            return 0.5 * (ca * dx_ * dx_ + cc * dy_ * dy_) + cb * dx_ * dy_

        a_safe = jnp.maximum(ca, 1e-12)
        c_safe = jnp.maximum(cc, 1e-12)

        def edge_x(dxe):  # vertical edge: dx fixed, dy in [dy0, dy1]
            dye = jnp.clip(-cb * dxe / c_safe, dy0, dy1)
            return q(dxe, dye)

        def edge_y(dye):  # horizontal edge: dy fixed, dx in [dx0, dx1]
            dxe = jnp.clip(-cb * dye / a_safe, dx0, dx1)
            return q(dxe, dye)

        inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)
        qmin = jnp.minimum(
            jnp.minimum(edge_x(dx0), edge_x(dx1)),
            jnp.minimum(edge_y(dy0), edge_y(dy1)),
        )
        qmin = jnp.where(inside, 0.0, qmin)
        qcap = jnp.log(jnp.maximum(opacity[None, :], 1e-12) * 255.0) + 1e-3
        pair_live = pair_live & (qmin <= qcap)

    tile_id = jnp.where(pair_live, ty * grid_w + tx, num_tiles)
    key = (tile_id.astype(jnp.int32) << KB) | inv_order[None, :]
    key_sorted = jax.lax.sort(key.reshape(-1))  # (P*B,)
    total_live = jnp.searchsorted(
        key_sorted, jnp.int32(num_tiles << KB), side="left"
    ).astype(jnp.int32)

    # 4. budget truncation (static shape NPb). Live pairs run ~3.3P on the
    # target workloads; 4P + per-tile slack keeps ~20% headroom while the
    # downstream gather/scatter/kernel costs all scale with NPb (the backward
    # scatter-add in particular is superlinear in N — 1.5 ms at 159k vs
    # 4.8 ms at 317k rows measured). Drops are counted in `overflow`.
    NPb = _npb(P, pair_budget, num_tiles, B, align)
    keys_b = key_sorted[:NPb]

    # 5. per-tile ranges on packed keys directly
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = jnp.searchsorted(keys_b, tiles << KB, side="left").astype(jnp.int32)
    t_end = jnp.searchsorted(keys_b, (tiles + 1) << KB, side="left").astype(jnp.int32)
    tile_count = t_end - t_start                      # (num_tiles,) per SUBtile
    budget_overflow = total_live - jnp.sum(tile_count)

    dims = (grid_h, grid_w_sup, grid_w, num_tiles, num_super, tile_w, KB,
            NPb, B)
    return _PairKeys(order, keys_b, t_start, tile_count, total_live,
                     budget_overflow, rect_overflow, max_rect), dims


def measure_slot_need(mean2d, conic, opacity, depth, radius, valid,
                      height: int, width: int, tile_h: int, tile_w: int,
                      max_tiles_per_gaussian: int = 16, pair_budget: int = 0,
                      align: int = 128, groups: int = 1, radius_xy=None):
    """Exact aligned-slot need of a frame: the TPU analog of the reference's
    dynamic arena resizing (rasterize_points.cu:27-33 resizeFunctional).

    Static shapes mean the slot budget must be fixed at trace time; this
    measures, for a representative frame, how many slots the supertile-
    interleaved layout actually requires (live pairs + per-supertile chunk
    padding + max-over-group skew). Callers size `slot_budget` from it —
    e.g. once per scene, re-measuring (and recompiling, like the reference
    re-allocates) if `overflow` ever reports drops.

    Returns a dict of () int32 scalars:
      need         aligned slot need of the supertile-interleaved layout
      live         live (non-padding) slots in that layout
      npb          the NPb the probe ran under
      total_live   live PAIR count before the NPb truncation — what the
                   trainer sizes pair_budget from; exact only when the
                   probe's pair_budget >= P * max_tiles_per_gaussian
                   (nothing truncated), which is how _resize_pair_buffer
                   and bench.py call it
      max_rect     max subtile-rect area over valid Gaussians, PRE-cap
                   (exact regardless of max_tiles) — sizes the rect cap
      rect_overflow  tiles dropped by the max_tiles rect cap
    """
    keys, dims = _pair_keys(
        mean2d, conic, opacity, depth, radius, valid, height, width,
        tile_h, tile_w, max_tiles_per_gaussian, pair_budget, align, groups,
        radius_xy,
    )
    (_, _, _, _, num_super, _, _, NPb, _) = dims
    counts_sg = keys.tile_count.reshape(num_super, groups)
    n_chunks_s = (jnp.max(counts_sg, axis=1) + align - 1) // align
    need = jnp.sum(n_chunks_s) * groups * align
    return {
        "need": need,
        "live": jnp.sum(keys.tile_count),
        "npb": NPb,
        # exact pre-truncation stats for sizing the OTHER two static budgets
        # (probe with pair_budget = P * max_tiles to make `need`/`total_live`
        # themselves exact): total_live sizes pair_budget (NPb); max_rect is
        # the max tiles one Gaussian touches and sizes max_tiles_per_gaussian
        "total_live": keys.total_live,
        "max_rect": keys.max_rect,
        "rect_overflow": keys.rect_overflow,
    }


def build_pair_rows(
    mean2d,
    conic,
    opacity,
    color,
    depth,
    radius,
    valid,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    align: int = 128,
    radius_xy=None,
    groups: int = 1,
    slot_budget: int = 0,
) -> PairLayout:
    """Fused binning + aligned geometry-row build (the fast path).

    Replaces bin_gaussians + align_binning + the row gather with the same
    semantics but a TPU-friendlier dataflow (measured 11.5 ms -> ~3 ms at
    512x512/46k):

      * ONE single-operand int32 sort of packed (tile << KB | depth-rank) keys
        instead of a 3-operand sort (2x faster; the reference's 64-bit
        tile|depth radix key, rasterizer_impl.cu:70-111, packs the same way);
      * geometry gathered as 64-byte-aligned (P, 16) rows — row gathers at
        this width vectorize ~10x better than (P, 10);
      * the aligned re-layout is a *sliced* gather: every aligned block of
        `align` pairs is one contiguous run of the tile-sorted pair list, so
        a vmapped dynamic_slice moves whole blocks (no per-element gather).

    groups > 1 is the LANE-PACKED SUBTILE layout: binning runs at
    (tile_h, tile_w // groups) subtiles and the output interleaves the
    `groups` subtile streams of each geometric supertile at chunk
    granularity — slot(s, c, g, lane) = base_s + (c*G + g)*align + lane —
    so the blend kernels DMA one (16, G*align) block per chunk and each
    chunk row carries G independent pairs, one per 128/G-lane group. Splats
    are narrow relative to 128 lanes, so narrower subtiles cut the number
    of (pair, tile) chunks ~2x at G=4 (tools/subtile_stats.py) at the cost
    of more pairs and per-supertile max-of-group padding. `tile_start`
    becomes the per-SUPERTILE slot offset and `tile_count` the per-SUBTILE
    live counts (subtile raster order == (supertile, group) order).

    All downstream semantics (depth order within tile, budget drop + overflow
    count, gradient barrier on dead rows) match the slow path exactly.
    """
    keys, dims = _pair_keys(
        mean2d, conic, opacity, depth, radius, valid,
        height, width, tile_h, tile_w, max_tiles_per_gaussian,
        pair_budget, align, groups, radius_xy,
    )
    P = mean2d.shape[0]
    G = groups
    grid_h, grid_w_sup, grid_w, num_tiles, num_super, tile_w, KB, NPb, B = dims
    order = keys.order
    keys_b = keys.keys_b
    t_start = keys.t_start
    tile_count = keys.tile_count
    total_live = keys.total_live
    budget_overflow = keys.budget_overflow
    rect_overflow = keys.rect_overflow

    # 6. aligned supertile-interleaved layout: every aligned block of `align`
    # pairs is one contiguous run of the tile-sorted pair list, so per-pair
    # source indices are pure block-granular dense math (no scatter, no big
    # searchsorted — both lower pathologically on TPU, PERF.md). Supertile s
    # gets n_eff_s * G chunk-blocks, group streams interleaved at chunk
    # granularity; each group's stream is padded to the supertile MAX so the
    # kernels advance all G streams in lockstep with one DMA per chunk.
    counts_sg = tile_count.reshape(num_super, G)
    n_chunks_s = (jnp.max(counts_sg, axis=1) + align - 1) // align  # (num_super,)
    if slot_budget == 0:
        slot_budget = _default_slot_budget(NPb, G, align, num_tiles, num_super)
    NP2 = ((slot_budget + G * align - 1) // (G * align)) * (G * align)
    nb = NP2 // align
    bstart0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_chunks_s * G).astype(jnp.int32)]
    )  # block offsets before the slot clamp
    # slot clamp: only a suffix of supertiles can exceed the static NP2 and at
    # most one is partially clamped, so this single pass with the PRE-clamp
    # offsets is exact.
    n_eff = jnp.clip((nb - bstart0[:num_super]) // G, 0, n_chunks_s)
    bstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_eff * G).astype(jnp.int32)]
    )
    count_eff = jnp.minimum(counts_sg, (n_eff * align)[:, None]).reshape(-1)
    slot_overflow = jnp.sum(tile_count) - jnp.sum(count_eff)

    blocks = jnp.arange(nb, dtype=jnp.int32)
    sob = jnp.clip(
        jnp.searchsorted(bstart[1:], blocks, side="right").astype(jnp.int32),
        0, num_super - 1,
    )  # supertile of block
    in_tail_b = blocks >= bstart[num_super]
    rel = blocks - bstart[sob]
    if G > 1:
        g_of_b = rel % G
        c_of_b = rel // G
    else:
        g_of_b = jnp.zeros_like(rel)
        c_of_b = rel
    tob = sob * G + g_of_b                            # SUBtile of block
    block_off = c_of_b * align                        # offset in its stream
    lane = jnp.arange(align, dtype=jnp.int32)[None, :]
    off = block_off[:, None] + lane                   # (nb, align)
    in_range = (~in_tail_b[:, None]) & (off < count_eff[tob][:, None])
    in_range = in_range.reshape(NP2)

    # 7. geometry: depth ranks at aligned positions, then ONE 64-byte row
    # gather from the (P, 16) table. The row gather's VJP is a deterministic
    # scatter-add into the small (P, 16) table.
    #
    # Each aligned block's ranks are ONE contiguous 128-run of the tile-sorted
    # key list ([s_d, s_d + 128) with s_d = t_start[tile] + block_off), so
    # instead of a per-element int gather (~7.5 ns/elem, 1.4 ms at this size)
    # we fetch the runs as 64-byte KEY-ROWS — each run is covered by 9
    # consecutive rows of the (NPb/16, 16) key table (~16k row gather, ~0.2 ms)
    # — and realign each block with a 16-way static-shift select (s_d mod 16).
    k_rank = keys_b & ((1 << KB) - 1)  # depth rank of each tile-sorted pair
    s_d = jnp.clip(t_start[tob] + block_off, 0, NPb - 1)      # (nb,)
    KR = 16
    kr_rows = k_rank.reshape(NPb // KR, KR)
    base = s_d // KR                                          # (nb,)
    nrow = align // KR + 1                                    # rows per run
    row_idx = jnp.clip(
        base[:, None] + jnp.arange(nrow, dtype=jnp.int32)[None, :],
        0, NPb // KR - 1,
    )                                                         # (nb, nrow)
    cand = kr_rows[row_idx.reshape(-1)].reshape(nb, (nrow) * KR)
    r = (s_d - base * KR)[:, None]                            # (nb, 1)
    out = jnp.zeros((nb, align), jnp.int32)
    for r0 in range(KR):
        out = out + jnp.where(r == r0, cand[:, r0:r0 + align], 0)
    k_aligned = jnp.minimum(out.reshape(NP2), P - 1)
    zeros6 = jnp.zeros((P, 16 - 10), mean2d.dtype)
    src16 = jnp.concatenate(
        [mean2d, conic, opacity[:, None], color, depth[:, None], zeros6], axis=1
    )
    src_depth = src16[order]          # (P, 16) rows in depth order
    rows = _gather_rows(src_depth, k_aligned, 4)  # (NP2, 16)

    # 8. tile-local means + validity column + gradient barrier, applied in
    # the TRANSPOSED (16, NP2) layout the kernels consume: with NP2 on the
    # lane (minor) axis every op here is fully lane-parallel, whereas the
    # same math on (NP2, 16) rows lowers to minor-dim-2/16 vectors + a
    # mixed-width concat (~1.8 ms/frame measured; this form is ~0.1 ms).
    geomT = rows.T                                    # (16, NP2)
    # local means are SUPERTILE-relative: in-kernel pixel x = x0_super + lane,
    # so group g's pairs (lanes [g*sub_w, (g+1)*sub_w)) see their subtile's
    # pixels automatically.
    ox = ((sob % grid_w_sup) * (tile_w * G)).astype(geomT.dtype)   # (nb,)
    oy = ((sob // grid_w_sup) * tile_h).astype(geomT.dtype)
    oxe = jnp.broadcast_to(ox[:, None], (nb, align)).reshape(1, NP2)
    oye = jnp.broadcast_to(oy[:, None], (nb, align)).reshape(1, NP2)
    live = in_range.astype(geomT.dtype)[None, :]      # (1, NP2)
    geomT = jnp.concatenate(
        [geomT[0:1] - oxe, geomT[1:2] - oye, geomT[2:10], live, geomT[11:16]],
        axis=0,
    )
    # dead-column zero doubles as the gradient barrier (the VJP zeroes dead
    # grads before the scatter back to Gaussians). Must be a select, not a
    # multiply: dead columns gathered from invalid Gaussians can hold inf/nan
    # (preprocess division by z~0) and 0 * inf = nan.
    geomT = jnp.where(live > 0, geomT, 0.0)

    return PairLayout(
        rows=geomT,
        pair_valid=in_range,
        tile_start=bstart[:num_super] * align,   # slot offset per SUPERTILE
        tile_count=count_eff,                    # live pairs per SUBTILE
        num_pairs=total_live - budget_overflow - slot_overflow,
        overflow=rect_overflow + budget_overflow + slot_overflow,
    )


def align_binning(
    b: TileBinning,
    num_tiles: int,
    align: int = 128,
    guard: int = 0,
    pair_budget: int = 0,
) -> AlignedBinning:
    """Re-lay the tile-sorted pair list into the `align`-aligned layout.

    pair_budget (static, 0 = no budget) caps the number of live pairs the
    aligned layout covers: the tile sort pushes dead pairs to the end, so live
    pairs occupy a prefix whose true length is typically a small fraction of
    the worst-case P*max_tiles budget — the align/gather/kernel/backward costs
    all scale with the aligned size, so capping it is a large constant-factor
    win. Pairs beyond the budget (late tiles of a pathological frame) are
    dropped and counted in `overflow` — never silently (SURVEY §7: no silent
    caps).

    Output size is static: min(NPAIRS, budget) + align*num_tiles + guard.
    """
    NP = b.pair_gaussian.shape[0]
    tile_count = b.tile_count
    tile_start_src = b.tile_start
    budget_overflow = jnp.zeros((), jnp.int32)
    if pair_budget:
        pair_budget = ((pair_budget + align - 1) // align) * align
    if pair_budget and pair_budget < NP:
        end = jnp.minimum(tile_start_src + tile_count, pair_budget)
        start_c = jnp.minimum(tile_start_src, pair_budget)
        new_count = jnp.maximum(end - start_c, 0)
        budget_overflow = jnp.sum(tile_count - new_count)
        tile_count = new_count
        tile_start_src = start_c
        NP = pair_budget
    padded_counts = ((tile_count + align - 1) // align) * align
    astart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )  # (num_tiles+1,): astart[t] start, astart[-1] = start of dead tail
    NP2 = NP + align * num_tiles + guard
    NP2 = ((NP2 + align - 1) // align) * align

    # GATHER formulation (a scatter over NPAIRS serializes on TPU): for each
    # aligned destination d, its source in the tile-sorted list is
    #   tile_start[tile_of(d)] + (d - astart[tile_of(d)]).
    # Every astart is a multiple of `align`, so tile_of(d) and all per-tile
    # quantities are computed at BLOCK granularity (NP2/align values, a tiny
    # searchsorted + broadcast) — per-element scatters/cummax/searchsorted
    # over NP2 all lower pathologically on TPU (~10 ms/frame measured).
    assert NP2 % align == 0, "pair budget and guard must be align-multiples"
    nb = NP2 // align
    blocks = jnp.arange(nb, dtype=jnp.int32)
    astart_b = astart // align  # (num_tiles+1,), sorted
    tile_of_block = jnp.clip(
        jnp.searchsorted(astart_b[1:], blocks, side="right").astype(jnp.int32),
        0, num_tiles - 1,
    )
    in_tail_b = blocks >= astart_b[num_tiles]

    def bcast(x_b):
        return jnp.broadcast_to(x_b[:, None], (nb, align)).reshape(-1)

    lane = jnp.broadcast_to(
        jnp.arange(align, dtype=jnp.int32)[None, :], (nb, align)
    ).reshape(-1)
    tile_of_d = bcast(tile_of_block)
    off = bcast(blocks * align - astart[tile_of_block]) + lane
    src = jnp.clip(
        bcast(tile_start_src[tile_of_block]) + off, 0, b.pair_gaussian.shape[0] - 1
    )
    in_range = (~bcast(in_tail_b.astype(jnp.int32)).astype(bool)) & (
        off < bcast(tile_count[tile_of_block])
    )

    pair_gaussian = jnp.where(in_range, b.pair_gaussian[src], 0)
    return AlignedBinning(
        pair_gaussian=pair_gaussian,
        pair_valid=in_range,
        pair_tile=tile_of_d,
        tile_start=astart[:num_tiles],
        tile_count=tile_count,
        # post-drop live count, consistent with build_pair_rows (line ~638):
        # pairs cut by the slot budget are in overflow, not num_pairs
        num_pairs=jnp.sum(b.pair_valid.astype(jnp.int32)) - budget_overflow,
        overflow=b.overflow + budget_overflow,
    )
