"""Matrix-Fisher negative log-likelihood over SMPL joint rotations.

TPU-native re-derivation of the reference loss stack
(/root/reference/utils/loss_utils.py:89-317):

  * bessel0_exp_scaled: polynomial approximation of the exponentially scaled
    modified Bessel function I_0(x)/exp(|x|) (loss_utils.py:118-133) — here
    branch-free with jnp.where.
  * log_mf_norm_constant: log normalising constant log c(S) of the
    matrix-Fisher distribution via 512-trapezoid quadrature with a custom VJP
    (mirrors LogMFNormConstant, loss_utils.py:222-280); the backward evaluates
    the dc_bar/ds_k integrals for the three cyclic shifts.
  * proper_singular_values: S with s3 flipped by sign(det(U V^T)), custom VJP
    dS_i/dF = u_i v_i^T — analytically exact and *stable* (no 1/(s_i^2-s_j^2)
    terms), unlike differentiating through a general SVD. The reference relies
    on torch.svd's full backward but only ever uses the singular-value path
    (loss_utils.py:310-317), so this formulation is both faster and safer for
    the near-degenerate S at MLP init.
  * matrix_fisher_nll: NLL = -tr(F^T R_target) + overreg * log c(S_proper)
    (loss_utils.py:283-317, overreg=1.005).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_TRAPS = 512  # loss_utils.py:245

# Abramowitz-Stegun / omlc.org polynomial coefficients (loss_utils.py:98-99),
# listed lowest-order first (the reference reverses them for Horner).
_COEFFS_A = (1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.360768e-1, 0.45813e-2)
_COEFFS_B = (
    0.39894228, 0.1328592e-1, 0.225319e-2, -0.157565e-2, 0.916281e-2,
    -0.2057706e-1, 0.2635537e-1, -0.1647633e-1, 0.392377e-2,
)


def _horner(coeffs, x):
    z = jnp.full_like(x, coeffs[-1])
    for c in coeffs[-2::-1]:
        z = z * x + c
    return z


def bessel0_exp_scaled(x):
    """I_0(x) / exp(|x|), elementwise and branch-free."""
    ax = jnp.abs(x)
    small = _horner(_COEFFS_A, (ax / 3.75) ** 2) * jnp.exp(-ax)
    # guard ax=0 in the large branch (unused there, but NaNs poison jnp.where grads)
    ax_safe = jnp.maximum(ax, 1e-20)
    large = _horner(_COEFFS_B, 3.75 / ax_safe) / jnp.sqrt(ax_safe)
    return jnp.where(ax <= 3.75, small, large)


def _trapezoid(func, s, num_traps: int = NUM_TRAPS):
    """Integrate func(u, s) over u in [-1, 1] (loss_utils.py:136-158)."""
    u = jnp.linspace(-1.0, 1.0, num_traps, dtype=s.dtype)[None, :]  # (1, T)
    w = jnp.ones((num_traps,), s.dtype).at[0].set(0.5).at[-1].set(0.5)
    y = func(u, s)  # (B, T)
    return jnp.sum(y * w[None, :], axis=1) * (2.0 / (num_traps - 1))


def _integrand_cbar(u, s):
    """(loss_utils.py:161-184); s sorted descending."""
    f1 = bessel0_exp_scaled((s[:, 1:2] - s[:, 2:3]) * 0.5 * (1 - u))
    f2 = bessel0_exp_scaled((s[:, 1:2] + s[:, 2:3]) * 0.5 * (1 + u))
    f3 = jnp.exp((s[:, 2:3] + s[:, 0:1]) * (u - 1))
    return f1 * f2 * f3


def _integrand_dcbar(u, s):
    """(loss_utils.py:187-219); s is a cyclic shift (s_k first)."""
    s_i = jnp.max(s[:, 1:], axis=1, keepdims=True)
    s_j = jnp.min(s[:, 1:], axis=1, keepdims=True)
    s_k = s[:, 0:1]
    f1 = bessel0_exp_scaled((s_i - s_j) * 0.5 * (1 - u))
    f2 = bessel0_exp_scaled((s_i + s_j) * 0.5 * (1 + u))
    f3 = jnp.exp((s_j + s_k) * (u - 1))
    return f1 * f2 * f3 * u


@jax.custom_vjp
def log_mf_norm_constant(S):
    """log c(S) = log c_bar(S) + tr(S) for proper singular values S (B, 3)."""
    c_bar = 0.5 * _trapezoid(_integrand_cbar, S)
    return jnp.log(c_bar) + jnp.sum(S, axis=1)


def _lognorm_fwd(S):
    c_bar = 0.5 * _trapezoid(_integrand_cbar, S)
    return jnp.log(c_bar) + jnp.sum(S, axis=1), (S, c_bar)


def _lognorm_bwd(res, g):
    S, c_bar = res
    parts = []
    for i in range(3):
        S_shift = jnp.concatenate([S[:, i:], S[:, :i]], axis=1)
        parts.append(0.5 * _trapezoid(_integrand_dcbar, S_shift))
    dc = jnp.stack(parts, axis=1)  # (B, 3) = dc_bar/ds_k + c_bar
    dlogc = dc / c_bar[:, None]
    return (dlogc * g[:, None],)


log_mf_norm_constant.defvjp(_lognorm_fwd, _lognorm_bwd)


def _svd3(F):
    U, S, Vh = jnp.linalg.svd(F, full_matrices=False)
    V = jnp.swapaxes(Vh, -1, -2)
    return U, S, V


@jax.custom_vjp
def proper_singular_values(F):
    """Proper (det-corrected) singular values of (B, 3, 3) matrices.

    s3 is multiplied by sign(det(U V^T)) so diag(S) R' with proper rotations
    reconstructs F. Gradient: dS_i/dF = u_i v_i^T (exact, stable).
    """
    U, S, V = _svd3(F)
    sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(V))
    return S.at[..., 2].multiply(sign)


def _psv_fwd(F):
    U, S, V = _svd3(F)
    sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(V))
    return S.at[..., 2].multiply(sign), (U, V, sign)


def _psv_bwd(res, g):
    U, V, sign = res
    g = g.at[..., 2].multiply(sign)
    # dF = sum_i g_i u_i v_i^T  =  U diag(g) V^T
    dF = jnp.einsum("...ik,...k,...jk->...ij", U, g, V)
    return (dF,)


proper_singular_values.defvjp(_psv_fwd, _psv_bwd)


def proper_svd3(F):
    """(U, S, V, S_proper) with U/V/S stop-gradiented; grads flow via S_proper."""
    U, S, V = _svd3(jax.lax.stop_gradient(F))
    S_proper = proper_singular_values(F)
    return U, S, V, S_proper


@partial(jax.jit, static_argnames=("overreg",))
def matrix_fisher_nll(pred_F, target_R, overreg: float = 1.005):
    """NLL of target rotations under MF(pred_F) (loss_utils.py:283-317).

    pred_F, target_R: (..., 3, 3). Returns (...,) per-matrix NLL.
    """
    shape = pred_F.shape[:-2]
    F = pred_F.reshape(-1, 3, 3)
    R = target_R.reshape(-1, 3, 3)
    S_proper = proper_singular_values(F)
    log_c = log_mf_norm_constant(S_proper)
    log_exponent = -jnp.einsum("bij,bij->b", F, R)
    return (log_exponent + overreg * log_c).reshape(shape)
