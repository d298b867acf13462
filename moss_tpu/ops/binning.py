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

from typing import NamedTuple

import jax
import jax.numpy as jnp


def tile_rect(mean2d, radius, grid_h: int, grid_w: int, tile_h: int, tile_w: int):
    """Covered tile rectangle per Gaussian (reference auxiliary.h getRect).

    Returns (min_y, min_x, max_y, max_x) int32 arrays; max is exclusive.
    Gaussians with radius 0 get an empty rect.
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


class TileBinning(NamedTuple):
    """Static-shape binning result.

    pair_gaussian: (NPAIRS,) int32 — index into the *original* Gaussian arrays
      for each (tile, gaussian) pair, depth-sorted within each tile;
      NPAIRS = P * max_tiles_per_gaussian. Dead pairs point at index 0 but are
      excluded by pair_valid.
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
        num_pairs=jnp.sum(b.pair_valid.astype(jnp.int32)),
        overflow=b.overflow + budget_overflow,
    )
