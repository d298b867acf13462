"""Prototype: Pallas fused 3x3 SAME conv (+bias+relu) vs im2col / XLA conv.

Correctness vs jax.lax.conv_general_dilated on CPU (interpret mode), then
per-layer timing on TPU for the VGG16/LPIPS layer shapes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/conv_pallas_proto.py
     JAX_PLATFORMS=cpu ... for the correctness half only.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.devices()[0].platform == "cpu"


def _conv_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, rows_ref, *, bh, W, cin,
                 cout, relu):
    rows_ref[: bh, :, :] = x0_ref[:]
    rows_ref[bh:, :, :] = x1_ref[:2]

    def band_taps(dy, acc):
        band = rows_ref[pl.ds(dy, bh), :, :]  # (bh, W+2, cin)
        for dx in range(3):  # static: sublane offsets must be static
            sl = band[:, dx:dx + W, :].reshape(bh * W, cin)
            wt = w_ref[dy * 3 + dx]  # (cin, cout), dynamic major-dim index
            acc = acc + jnp.dot(sl, wt, preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, 3, band_taps,
                            jnp.zeros((bh * W, cout), jnp.float32))
    y = acc + b_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bh, W, cout).astype(out_ref.dtype)


def conv3x3_fused(x, w, b, *, relu=True, bh=None, out_dtype=None):
    """x (H, W, Cin), w (3,3,Cin,Cout), b (Cout,) -> (H, W, Cout)."""
    H, W, cin = x.shape
    cout = w.shape[3]
    if bh is None:
        bh = max(8, min(64, (1 << 19) // max(W * cin * 2, 1)))
        while H % bh:
            bh //= 2
        bh = max(bh, 1)
    assert H % bh == 0, (H, bh)
    grid = H // bh
    # pad: row 0 = top zero pad, rows 1..H = x, tail rows = bottom pad + block overrun
    xp = jnp.zeros((H + bh + 2 - (H + 2) % bh if (H + 2) % bh else H + 2, W + 2, cin), x.dtype)
    xp = xp.at[1:H + 1, 1:W + 1, :].set(x)
    n_rows = (grid + 1) * bh
    if xp.shape[0] < n_rows:
        xp = jnp.pad(xp, ((0, n_rows - xp.shape[0]), (0, 0), (0, 0)))
    wm = w.reshape(9, cin, cout).astype(x.dtype)
    out_dtype = out_dtype or x.dtype
    kern = functools.partial(_conv_kernel, bh=bh, W=W, cin=cin, cout=cout, relu=relu)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, W, cout), out_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bh, W + 2, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, W + 2, cin), lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, W, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bh + 2, W + 2, cin), x.dtype)],
        interpret=INTERPRET,
    )(xp, xp, wm, b.astype(x.dtype))


def ref_conv(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b
    return jnp.maximum(y, 0.0) if relu else y


def check():
    rng = np.random.default_rng(0)
    for (H, W, cin, cout) in [(16, 128, 8, 16), (8, 256, 64, 64), (32, 128, 16, 8)]:
        x = jnp.asarray(rng.normal(size=(H, W, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
        y = conv3x3_fused(x, w, b, bh=8)
        yr = ref_conv(x, w, b)
        err = float(jnp.max(jnp.abs(y - yr)))
        print(f"H{H} W{W} {cin}->{cout}: max abs err {err:.2e}")
        assert err < 1e-4, err


def qt(fn, *args, n=100):
    v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def bench():
    from moss_tpu.ops import lpips_jax as L
    rng = np.random.default_rng(0)
    layers = [(512, 64, 64), (256, 64, 128), (256, 128, 128), (128, 128, 256),
              (128, 256, 256), (64, 256, 512), (64, 512, 512), (32, 512, 512)]
    for (H, cin, cout) in layers:
        x = jnp.asarray(rng.normal(size=(H, H, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = np.random.default_rng(1).normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
        b = np.zeros(cout, np.float32)
        f_pal = jax.jit(lambda x: jnp.sum(conv3x3_fused(
            x, jnp.asarray(w, jnp.bfloat16), jnp.asarray(b), relu=True).astype(jnp.float32)))
        f_im2 = jax.jit(lambda x: jnp.sum(jax.nn.relu(
            L._conv_p(w, b, x[None], "bfloat16"))[0].astype(jnp.float32)))
        dt_p = qt(f_pal, x)
        dt_i = qt(f_im2, x)
        flops = 2 * H * H * cout * 9 * cin
        print(f"{H:4d}^2 {cin:3d}->{cout:3d}: pallas {dt_p*1e3:6.3f} ms ({flops/dt_p/1e12:5.1f} TF/s)"
              f"   im2col {dt_i*1e3:6.3f} ms ({flops/dt_i/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    check()
    if not INTERPRET:
        bench()
