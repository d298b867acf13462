"""Microbench: MXU matmul reductions vs VPU two-stage reductions in Pallas.

Decides whether the rasterizer kernels should move their reductions to the
MXU (see PERF.md "Known levers"):
  A. backward moments: sum_p f[k,p] * basis[p,j]  (pixel-axis contraction)
     - current: full-width muls + sublane-first two-stage reductions
     - candidate: reshape (K,8,128)->(K,1024), matmul vs (1024,8) basis
  B. forward accumulators: sum_k w[k,p] * s[j,k]  (splat-axis contraction)
     - current: 5x (mul + axis-0 tree reduce)
     - candidate: matmul (8,K)@(K,1024)
Also measures the reshape alone and numeric error of HIGHEST vs f32 VPU.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/mxu_micro.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128      # CHUNK
H, W = 8, 128
PIX = H * W
REPS = 16    # inner amplification per program
TILES = 256


def queued_time(fn, *args, n: int = 10):
    v = fn(*args)
    v = np.asarray(v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    v = np.asarray(v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    v = np.asarray(v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def _basis():
    # (PIX, 8): [1, px, py, px^2, px*py, py^2, 0, 0]
    px = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0) % W
    py = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0) // W
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    z = jnp.zeros_like(px)
    return jnp.concatenate([px * 0 + 1, px, py, px * px, px * py, py * py, z, z], 1)


def kern_moments_vpu(x_ref, o_ref):
    f = x_ref[:]  # (K, 8, 128)
    acc = jnp.zeros((K, 8), jnp.float32)
    pxw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    pyh = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1).astype(jnp.float32)
    for i in range(REPS):
        g = f + float(i)
        s0h = jnp.sum(g, axis=1)            # (K, W)
        s1h = jnp.sum(g * pyh, axis=1)      # (K, W) f*py
        s2h = jnp.sum(g * pyh * pyh, axis=1)

        def ls(a):
            return jnp.sum(a, axis=1, keepdims=True)
        S0 = ls(s0h)
        Sx = ls(s0h * pxw)
        Sy = ls(s1h)
        Sxx = ls(s0h * pxw * pxw)
        Sxy = ls(s1h * pxw)
        Syy = ls(s2h)
        acc = acc + jnp.concatenate([S0, Sx, Sy, Sxx, Sxy, Syy, S0, Sx], 1)
    o_ref[:] = acc


def kern_moments_mxu(prec, x_ref, b_ref, o_ref):
    f = x_ref[:]
    basis = b_ref[:]  # (PIX, 8)
    acc = jnp.zeros((K, 8), jnp.float32)
    for i in range(REPS):
        g = (f + float(i)).reshape(K, PIX)
        acc = acc + jax.lax.dot_general(
            g, basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    o_ref[:] = acc


def kern_reshape_only(x_ref, o_ref):
    f = x_ref[:]
    acc = jnp.zeros((K, PIX), jnp.float32)
    for i in range(REPS):
        acc = acc + (f + float(i)).reshape(K, PIX)
    o_ref[:] = jnp.sum(acc.reshape(K, H, W), axis=1)


def kern_acc_vpu(x_ref, s_ref, o_ref):
    w = x_ref[:]          # (K, 8, 128)
    st = jnp.transpose(s_ref[:], (1, 0))  # (K, 8)
    acc = jnp.zeros((8, H, W), jnp.float32)
    for i in range(REPS):
        wi = w + float(i)
        parts = [
            jnp.sum(wi * st[:, j:j + 1][:, :, None], axis=0, keepdims=True)
            for j in range(5)
        ]
        acc = acc + jnp.concatenate(parts + parts[:3], axis=0)
    o_ref[:] = acc


def kern_acc_mxu(prec, x_ref, s_ref, o_ref):
    w = x_ref[:]
    s = s_ref[:]          # (8, K)
    acc = jnp.zeros((8, PIX), jnp.float32)
    for i in range(REPS):
        w2 = (w + float(i)).reshape(K, PIX)
        acc = acc + jax.lax.dot_general(
            s, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    o_ref[:] = acc.reshape(8, H, W)


def _scan_splats(x, op, unit):
    """Copy of rasterize_tpu._scan_splats (two-level Hillis-Steele)."""
    from jax.experimental.pallas import tpu as _pt
    Kk, Hh, Ww = x.shape
    S = 8
    G = Kk // S
    xg = x.reshape(G, S, Hh, Ww)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (G, S, Hh, Ww), 1)
    s = 1
    while s < S:
        shifted = _pt.roll(xg, s, axis=1)
        xg = op(xg, jnp.where(rowid >= s, shifted, unit))
        s *= 2
    tot = xg[:, S - 1]
    gid = jax.lax.broadcasted_iota(jnp.int32, (G, Hh, Ww), 0)
    s = 1
    while s < G:
        shifted = _pt.roll(tot, s, axis=0)
        tot = op(tot, jnp.where(gid >= s, shifted, unit))
        s *= 2
    off = jnp.where(gid >= 1, _pt.roll(tot, 1, axis=0), unit)
    return op(xg, off[:, None]).reshape(Kk, Hh, Ww)


def kern_cumsum_vpu(x_ref, o_ref):
    f = x_ref[:]
    acc = jnp.zeros((K, H, W), jnp.float32)
    for i in range(REPS):
        acc = acc + _scan_splats(f + float(i), jnp.add, 0.0)
    o_ref[:] = acc


def _tri():
    # (K, K) lower-triangular ones (inclusive cumsum operator)
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (c <= r).astype(jnp.float32)


def _mm(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def kern_cumsum_mxu(split: bool, x_ref, l_ref, o_ref):
    f = x_ref[:]
    L = l_ref[:]
    acc = jnp.zeros((K, H, W), jnp.float32)
    for i in range(REPS):
        g = (f + float(i)).reshape(K, PIX)
        if split:
            hi = g.astype(jnp.bfloat16).astype(jnp.float32)
            lo = g - hi
            cs = (_mm(L, hi, jax.lax.Precision.DEFAULT)
                  + _mm(L, lo, jax.lax.Precision.DEFAULT))
        else:
            cs = _mm(L, g, jax.lax.Precision.DEFAULT)
        acc = acc + cs.reshape(K, H, W)
    o_ref[:] = acc


def kern_cumprod_vpu(x_ref, o_ref):
    # masked cumprod of (1 - alpha) as in _chunk_blend
    f = x_ref[:]
    acc = jnp.zeros((K, H, W), jnp.float32)
    for i in range(REPS):
        a = jnp.clip(f * (0.01 * (i + 1)), 0.0, 0.9)
        one_m_a = jnp.where(a > 0.003, 1.0 - a, 1.0)
        acc = acc + _scan_splats(one_m_a, jnp.multiply, 1.0)
    o_ref[:] = acc


def kern_cumprod_logmxu(x_ref, l_ref, o_ref):
    # log-space: cumsum(log(1-a)) via split-bf16 matmul, then exp
    f = x_ref[:]
    L = l_ref[:]
    acc = jnp.zeros((K, H, W), jnp.float32)
    for i in range(REPS):
        a = jnp.clip(f * (0.01 * (i + 1)), 0.0, 0.9)
        lg = jnp.where(a > 0.003, jnp.log1p(-a), 0.0).reshape(K, PIX)
        hi = lg.astype(jnp.bfloat16).astype(jnp.float32)
        lo = lg - hi
        cs = (_mm(L, hi, jax.lax.Precision.DEFAULT)
              + _mm(L, lo, jax.lax.Precision.DEFAULT))
        acc = acc + jnp.exp(cs).reshape(K, H, W)
    o_ref[:] = acc


def run(name, kernel, out_shape, *operands):
    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec(op.shape, lambda t, n=op.ndim: (0,) * n, memory_space=pltpu.VMEM)
            for op in operands
        ],
        out_specs=pl.BlockSpec(
            out_shape, lambda t: (0,) * len(out_shape), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    dt = queued_time(g, *operands)
    per_chunk_ns = dt / (TILES * REPS) * 1e9
    print(f"{name:24s} {dt*1e3:8.3f} ms total  {per_chunk_ns:8.1f} ns/chunk-op")
    return f


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(K, H, W)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    b = _basis()

    print("# A. moments (pixel-axis contraction), per-chunk amplified x16 x256")
    fv = run("moments VPU", kern_moments_vpu, (K, 8), x)
    fh = run("moments MXU HIGHEST",
             functools.partial(kern_moments_mxu, jax.lax.Precision.HIGHEST),
             (K, 8), x, b)
    fd = run("moments MXU DEFAULT",
             functools.partial(kern_moments_mxu, jax.lax.Precision.DEFAULT),
             (K, 8), x, b)
    run("reshape only", kern_reshape_only, (K, W), x)

    print("# B. fwd accumulators (splat-axis contraction)")
    av = run("acc VPU", kern_acc_vpu, (8, H, W), x, s)
    ah = run("acc MXU HIGHEST",
             functools.partial(kern_acc_mxu, jax.lax.Precision.HIGHEST),
             (8, H, W), x, s)
    run("acc MXU DEFAULT",
        functools.partial(kern_acc_mxu, jax.lax.Precision.DEFAULT),
        (8, H, W), x, s)

    print("# C. splat-axis scans (cumsum / masked cumprod over K=128)")
    Lt = jnp.asarray(np.tril(np.ones((K, K), np.float32)))
    cv = run("cumsum VPU 2-level", kern_cumsum_vpu, (K, H, W), x)
    run("cumsum MXU bf16", functools.partial(kern_cumsum_mxu, False),
        (K, H, W), x, Lt)
    cs2 = run("cumsum MXU split2", functools.partial(kern_cumsum_mxu, True),
              (K, H, W), x, Lt)
    pv = run("cumprod VPU 2-level", kern_cumprod_vpu, (K, H, W), x)
    pm = run("cumprod log+MXU split2", kern_cumprod_logmxu, (K, H, W), x, Lt)
    c_ref = np.cumsum(
        sum(np.asarray(x, np.float64) + i for i in range(REPS))
        * 0  # placeholder; per-rep cumsum differs — compare jit outputs instead
        , axis=0)
    cv_ = np.asarray(jax.jit(cv)(x))
    cs_ = np.asarray(jax.jit(cs2)(x, Lt))
    print(f"cumsum  |MXUsplit2 - VPU| rel: "
          f"{float(np.max(np.abs(cs_-cv_)/(np.abs(cv_)+1e-3))):.2e}")
    pv_ = np.asarray(jax.jit(pv)(x))
    pm_ = np.asarray(jax.jit(pm)(x, Lt))
    print(f"cumprod |logMXU - VPU| rel: "
          f"{float(np.max(np.abs(pm_-pv_)/(np.abs(pv_)+1e-3))):.2e}")

    # numeric check
    mv = np.asarray(jax.jit(fv)(x))[:, :6]
    mh = np.asarray(jax.jit(fh)(x, b))[:, :6]
    md = np.asarray(jax.jit(fd)(x, b))[:, :6]
    ref = None
    xs = np.asarray(x).reshape(K, PIX).astype(np.float64)
    bs = np.asarray(b).astype(np.float64)
    ref = sum((xs + i) @ bs for i in range(REPS))[:, :6]
    def err(a):
        return float(np.max(np.abs(a - ref) / (np.abs(ref) + 1e-3)))
    print(f"moments rel err: VPU {err(mv):.2e}  HIGHEST {err(mh):.2e}  DEFAULT {err(md):.2e}")
    av_ = np.asarray(jax.jit(av)(x, s))
    ah_ = np.asarray(jax.jit(ah)(x, s))
    print(f"acc  max |HIGHEST - VPU| rel: "
          f"{float(np.max(np.abs(ah_-av_)/(np.abs(av_)+1e-3))):.2e}")


if __name__ == "__main__":
    main()
