"""Backward blend kernel cost accounting by stage ablation (VERDICT r4 next 8).

The r4 speed-of-light table shows the backward blend kernel at 3.99 ms vs a
~3.3 ms pencil floor (sum of microbenched VPU op costs) — the largest
absolute gap left in the pipeline. This tool decides whether that delta is
removable work or inherent chunk-loop/DMA overhead the pencil floor omitted,
by timing the REAL kernel with stages ablated:

  dma        loop structure + double-buffered geometry DMA in + grad DMA out,
             zero math (the pencil floor counts zero of this)
  recompute  + the forward-chain recompute (_chunk_blend: power/exp/alpha/
             cumprod/T bookkeeping) — shared with the forward kernel
  suffix     + dLdw, q, the two-level cumsum, s_after, dpower (the d-alpha
             suffix-scan stage)
  full       + moment reductions + grad-row assembly (== production kernel)
  fullT      assembly EXPERIMENT: per-quantity (K,1)->(1,K) vector
             transposes + sublane concat instead of the (K,16) lane concat +
             (K,16)->(16,K) block transpose. NEGATIVE RESULT on TPU
             (2026-08-21): Mosaic compiles it but the grads are GARBAGE
             (max|diff| ~7e2 vs production) and the resulting kernel times
             at 0.46 ms only because the broken dataflow let the whole math
             chain be eliminated — in-kernel (K,1)->(1,K) vector transposes
             silently miscompile. The correctness check below exists because
             this fake win initially looked like a 10x assembly speedup.

Measured on the real chip (2026-08-21, 512^2/46k/G=2, 310k-pair buffer):
  dma 0.15-0.25 | recompute +1.60 | suffix +0.82 | moments/assembly +1.63
  => 'full' variant 4.20 ms; PRODUCTION kernel 3.71-3.78 ms (its half-width
  tail path + whole-tile early exit reclaim ~0.45 ms the variants omit).
  Conclusion (PERF.md r5): the r4 "~3.3 ms pencil floor" omitted loop/DMA
  overhead and the assembly relayouts; every stage is now individually
  measured and the one structural idea for the biggest stage (transpose-free
  assembly) miscompiles. Closed by measurement.

Stage cost = successive differences. Run on the real chip:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/bwd_kernel_floor.py
"""
from __future__ import annotations

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import moss_tpu
    from moss_tpu.ops import rasterize_tpu as rt
    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.render.camera import Camera

    moss_tpu.enable_compilation_cache()
    if jax.devices()[0].platform == "cpu":
        rt.INTERPRET = True

    import os

    H = W = int(os.environ.get("MOSS_FLOOR_SHAPE", "512"))
    P = int(os.environ.get("MOSS_FLOOR_P", "46080"))
    rng = np.random.default_rng(0)
    K = np.array([[550.0, 0, W / 2], [0, 550.0, H / 2], [0, 0, 1.0]])
    cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
    means = np.stack(
        [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P),
         rng.uniform(1.5, 2.5, P)], -1).astype(np.float32)
    cov3d = tf.build_covariance(
        jnp.asarray(rng.uniform(0.004, 0.012, (P, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)))
    colors = jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32))
    opacity = jnp.asarray(rng.uniform(0.3, 0.95, P).astype(np.float32))
    proj = preprocess(jnp.asarray(means), cov3d, colors, opacity, cam)

    G = rt.DEFAULT_GROUPS
    tg, grid_h, grid_w = rt._build_pairs(proj, H, W, 16, 0, G, 0)
    geom, tile_start, tile_count = tg.geom, tg.tile_start, tg.tile_count
    print(f"pairs buffer {geom.shape}, grid {grid_h}x{grid_w}, G={G}")

    # a realistic gimg (cotangents of ones, like bench's loss)
    out = rt._run_fwd(tile_start, tile_count, geom, grid_h, grid_w, G)
    r, g, b, d, a, T = out
    ones = jnp.ones_like(r)
    Qtail = r + g + b + 0.01 * d + a  # d(loss)/d each = 1,1,1,0.01,1, gT=0
    gimg = jnp.stack([ones, ones, ones, 0.01 * ones, ones,
                      jnp.zeros_like(r), Qtail, jnp.zeros_like(r)],
                     axis=0)[None]

    CHUNK, GEOM_COLS = rt.CHUNK, rt.GEOM_COLS
    TILE_H, TILE_W = rt.TILE_H, rt.TILE_W

    def make_kernel(stage: str):
        def kern(gw, Gk, start_ref, count_ref, geom_hbm, gimg_ref,
                 grad_hbm, scratch, out_scratch, sems, out_sems):
            t = pl.program_id(0)
            base = start_ref[t]
            counts = [count_ref[t * Gk + g_] for g_ in range(Gk)]
            maxc = counts[0]
            for g_ in range(1, Gk):
                maxc = jnp.maximum(maxc, counts[g_])
            n_chunks = (maxc + CHUNK - 1) // CHUNK

            def get_dma(slot, c):
                return pltpu.make_async_copy(
                    geom_hbm.at[:, pl.ds(
                        pl.multiple_of(base + c * (Gk * CHUNK), CHUNK),
                        Gk * CHUNK)],
                    scratch.at[slot], sems.at[slot])

            def put_dma(slot, c):
                return pltpu.make_async_copy(
                    out_scratch.at[slot],
                    grad_hbm.at[:, pl.ds(
                        pl.multiple_of(base + c * (Gk * CHUNK), CHUNK),
                        Gk * CHUNK)],
                    out_sems.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            gm = gimg_ref[0]
            g_r, g_g, g_b = gm[0:1], gm[1:2], gm[2:3]
            g_d, g_a = gm[3:4], gm[4:5]
            Qtail_ = gm[6:7]

            def body(c, carry):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    get_dma(1 - slot, c + 1).start()

                get_dma(slot, c).wait()
                T, done, prefix = carry
                out_block = jnp.zeros((GEOM_COLS, Gk * CHUNK), jnp.float32)
                # each ablated stage must write an observable function of its
                # last tensor or Mosaic dead-code-eliminates the whole stage
                # (first tool version measured 'recompute' == 'dma')

                def observe(x):
                    return out_block + 1e-30 * jnp.sum(x)

                if stage != "dma":
                    gs = rt._group_geoms(scratch[slot], Gk, CHUNK)
                    rels = [cg - c * CHUNK for cg in counts]
                    bl, comp = rt._chunk_blend(gs, rels, T, done, Gk)
                    T, done = bl.T_out, bl.done_out
                    if stage == "recompute":
                        out_block = observe(bl.w)
                    if stage in ("suffix", "full"):
                        alpha, contrib = bl.alpha, bl.contrib
                        T_before, w = bl.T_before, bl.w
                        dLdw = (comp(6) * g_r + comp(7) * g_g + comp(8) * g_b
                                + comp(9) * g_d + g_a)
                        q = w * dLdw
                        prefix_incl = prefix + rt._cumsum_splats(q)
                        s_after = Qtail_ - prefix_incl
                        live_g = contrib & (alpha < rt.ALPHA_MAX)
                        dpower = jnp.where(
                            live_g,
                            (dLdw * T_before - s_after / (1.0 - alpha)) * alpha,
                            0.0)
                        prefix = prefix + jnp.sum(q, axis=0, keepdims=True)
                        if stage == "suffix":
                            out_block = observe(dpower)
                        if stage in ("full", "fullT"):
                            def ssum(x):
                                return jnp.sum(x, axis=1)

                            dxw = bl.dxw
                            fdy = dpower * bl.dy
                            s_dp = ssum(dpower)
                            A0 = s_dp * dxw
                            B0 = ssum(fdy)
                            reds = [A0, B0, A0 * dxw, B0 * dxw,
                                    ssum(fdy * bl.dy), s_dp,
                                    ssum(w * g_r), ssum(w * g_g),
                                    ssum(w * g_b), ssum(w * g_d)]
                            reds = [rt._group_lane_sums(x, Gk) for x in reds]
                            rowid2 = jax.lax.broadcasted_iota(
                                jnp.int32, (CHUNK, 1), 0)
                            laneid = jax.lax.broadcasted_iota(
                                jnp.int32, (1, CHUNK), 1)
                            blocks = []
                            for g_ in range(Gk):
                                sfx, sfy = reds[0][g_], reds[1][g_]
                                da = -0.5 * reds[2][g_]
                                db = -reds[3][g_]
                                dc = -0.5 * reds[4][g_]
                                gg_ = gs[g_]
                                a2, b2, c2 = (gg_[:, 2:3], gg_[:, 3:4],
                                              gg_[:, 4:5])
                                dmx = -(a2 * sfx + b2 * sfy)
                                dmy = -(c2 * sfy + b2 * sfx)
                                op = jnp.maximum(gg_[:, 5:6], 1e-12)
                                dop = reds[5][g_] / op
                                zeros = jnp.zeros_like(da)
                                vals = [dmx, dmy, da, db, dc, dop,
                                        reds[6][g_], reds[7][g_],
                                        reds[8][g_], reds[9][g_]]
                                if stage == "fullT":
                                    # transpose-free assembly experiment:
                                    # 10 (K,1)->(1,K) vector transposes +
                                    # sublane concat + one cheap (16,K) mask
                                    # instead of a (K,16) lane concat, a
                                    # (K,16) mask and a (K,16)->(16,K) block
                                    # transpose
                                    rowsT = [jnp.transpose(v, (1, 0))
                                             for v in vals]
                                    blk = jnp.concatenate(
                                        rowsT + [jnp.zeros(
                                            (6, CHUNK), jnp.float32)],
                                        axis=0)  # (16, K)
                                    blk = jnp.where(
                                        laneid < (counts[g_] - c * CHUNK),
                                        blk, 0.0)
                                    blocks.append(blk)
                                else:
                                    rows = jnp.concatenate(
                                        vals + [zeros] * 6, axis=1)
                                    rows = jnp.where(
                                        rowid2 < (counts[g_] - c * CHUNK),
                                        rows, 0.0)
                                    blocks.append(jnp.transpose(rows, (1, 0)))
                            out_block = (blocks[0] if Gk == 1
                                         else jnp.concatenate(blocks, axis=1))

                @pl.when(c >= 2)
                def _():
                    put_dma(slot, c - 2).wait()

                out_scratch[slot] = out_block
                put_dma(slot, c).start()
                return (T, done, prefix)

            zero = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
            one = jnp.ones((1, TILE_H, TILE_W), jnp.float32)
            jax.lax.fori_loop(0, n_chunks, body, (one, zero, zero))

            @pl.when(n_chunks >= 2)
            def _():
                put_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

            @pl.when(n_chunks >= 1)
            def _():
                put_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()

        return kern

    def run_variant(stage):
        num_tiles = grid_h * grid_w
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, TILE_H, TILE_W),
                             lambda t, s0, s1: (0, 0, t // grid_w,
                                                t % grid_w),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, GEOM_COLS, G * CHUNK), jnp.float32),
                pltpu.VMEM((2, GEOM_COLS, G * CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ])
        call = pl.pallas_call(
            functools.partial(make_kernel(stage), grid_w, G),
            out_shape=jax.ShapeDtypeStruct(geom.shape, jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=rt.INTERPRET)

        @jax.jit
        def f(geom, tile_start, tile_count, gimg):
            return jnp.sum(jnp.abs(
                call(tile_start, tile_count, geom, gimg)))

        @jax.jit
        def raw(geom, tile_start, tile_count, gimg):
            return call(tile_start, tile_count, geom, gimg)

        f.raw = raw
        return f

    def timed(f, n=20):
        v = f(geom, tile_start, tile_count, gimg)
        _ = float(v)
        t0 = time.time()
        for _ in range(n):
            v = f(geom, tile_start, tile_count, gimg)
        _ = float(v)
        t1 = time.time()
        for _ in range(2 * n):
            v = f(geom, tile_start, tile_count, gimg)
        _ = float(v)
        t2 = time.time()
        return max((t2 - t1) - (t1 - t0), 1e-9) / n * 1e3

    # correctness first: the 'full' variant must reproduce the production
    # grads, and any faster assembly experiment must match 'full' EXACTLY —
    # a silently miscompiled/DCE'd variant times as a fake win
    ref = np.asarray(rt._run_bwd(tile_start, tile_count, geom, gimg,
                                 grid_h, grid_w, G))
    for stage in ("full", "fullT"):
        got = np.asarray(run_variant(stage).raw(
            geom, tile_start, tile_count, gimg))
        d = float(np.abs(got - ref).max())
        print(f"{stage:10s} max|grad - production| = {d:.3e}"
              + ("  (MISMATCH — timing below is meaningless)"
                 if d > 1e-4 else ""))

    results = {}
    for stage in ("dma", "recompute", "suffix", "full", "fullT"):
        results[stage] = timed(run_variant(stage))
        print(f"{stage:10s} {results[stage]:7.3f} ms")
    print("\nstage deltas:")
    print(f"  loop+DMA overhead      {results['dma']:7.3f} ms")
    print(f"  forward recompute      {results['recompute'] - results['dma']:7.3f} ms")
    print(f"  suffix/d-alpha stage   {results['suffix'] - results['recompute']:7.3f} ms")
    print(f"  moments + assembly     {results['full'] - results['suffix']:7.3f} ms")
    # sanity: the production kernel (which adds the half-width tail path and
    # the whole-tile early-exit conds the variants omit) vs the 'full' variant
    @jax.jit
    def prod_f(ge, ts, tc, gi):
        return jnp.sum(jnp.abs(rt._run_bwd(ts, tc, ge, gi, grid_h, grid_w, G)))

    prod = timed(prod_f)
    print(f"\nproduction _run_bwd      {prod:7.3f} ms "
          f"(= full + tail-path/early-exit struct)")


if __name__ == "__main__":
    main()
