"""Measure the in-VMEM bitonic sort's per-pass cost vs jax.lax.sort.

PERF.md's speed-of-light section closes the "Pallas bitonic key sort" lever
by vreg arithmetic (133 lane-stride passes x ~6 full-width ops + 78
row-stride passes x ~3 over 512 vregs ~= 0.5-0.6 ms for 2^19 keys == what
lax.sort already measures). This tool turns that paper argument into a
measurement: it times ONE real Pallas lane-stride compare-exchange pass and
ONE row-stride pass over a (4096, 128) i32 VMEM block (repeated in-kernel to
amortize launch), extrapolates a full 19-stage bitonic network, and prints
it next to lax.sort at the binning pipeline's actual key counts
(ops/binning.py step 3: 46080 splats x rect-cap B keys).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/sort_micro.py
"""
from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("MOSS_PALLAS_INTERPRET", "0") == "1"
ROWS, LANES = 4096, 128  # 2^19 i32 = 2 MB in VMEM
R = 64  # in-kernel pass repeats (amortizes launch + HBM in/out)


def queued_time(fn, *args, n: int = 20):
    v = fn(*args)
    _ = np.asarray(v).sum()
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    _ = np.asarray(v).sum()
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    _ = np.asarray(v).sum()
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def _lane_pass_kernel(x_ref, o_ref, *, stride: int):
    """One bitonic compare-exchange at lane stride < 128, repeated R times.

    XOR-partner via two circular rolls + select: for lanes with (l & s) == 0
    the partner is l + s (roll by -s), else l - s (roll by +s); the wrapped
    lanes of each roll are exactly the ones the select discards."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    up = (lane & stride) == 0

    def body(_, x):
        # pltpu.roll requires a non-negative shift; roll by LANES - s is the
        # same circular shift as -s
        hi = pltpu.roll(x, LANES - stride, 1)
        lo = pltpu.roll(x, stride, 1)
        partner = jnp.where(up, hi, lo)
        return jnp.where(up, jnp.minimum(x, partner),
                         jnp.maximum(x, partner))

    o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])


def _row_pass_kernel(x_ref, o_ref, *, stride_rows: int):
    """One compare-exchange at row stride >= 1 vreg row-block, repeated R
    times: partner rows differ only in the row index, so the exchange is
    plain block min/max — no lane shuffles."""
    S = stride_rows

    def body(_, x):
        # process in 2S-row groups: rows [g, g+S) pair with [g+S, g+2S)
        y = x.reshape(ROWS // (2 * S), 2, S, LANES)
        a = y[:, 0]
        b = y[:, 1]
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        return jnp.stack([lo, hi], axis=1).reshape(ROWS, LANES)

    o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])


def _run_pass(kernel, **kw):
    f = pl.pallas_call(
        functools.partial(kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
        interpret=INTERPRET,
    )
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (ROWS, LANES), np.int32)
    )
    g = jax.jit(f)
    dt = queued_time(g, x)
    return dt / R  # seconds per single pass


def main():
    n_total = ROWS * LANES  # 2^19
    # the real network: stage k has k passes; lane passes are the 7 with
    # stride < 128, the rest are row passes
    n_stages = int(np.log2(n_total))
    lane_passes = sum(min(k, 7) for k in range(1, n_stages + 1))
    row_passes = sum(max(k - 7, 0) for k in range(1, n_stages + 1))

    t_lane = _run_pass(_lane_pass_kernel, stride=64)
    t_row = _run_pass(_row_pass_kernel, stride_rows=64)
    est = lane_passes * t_lane + row_passes * t_row
    print(f"lane-stride pass (s=64):  {t_lane * 1e6:7.2f} us "
          f"x {lane_passes} passes")
    print(f"row-stride pass (S=64):   {t_row * 1e6:7.2f} us "
          f"x {row_passes} passes")
    print(f"=> full bitonic estimate for {n_total} keys: {est * 1e3:.3f} ms")

    for n in (46080 * 10, 46080 * 16, n_total):
        x = jnp.asarray(
            np.random.default_rng(1).integers(0, 1 << 30, n, np.int32))
        dt = queued_time(jax.jit(jax.lax.sort), x)
        print(f"jax.lax.sort {n:>7d} keys:  {dt * 1e3:.3f} ms "
              f"({dt / n * 1e9:.2f} ns/key)")


if __name__ == "__main__":
    main()
