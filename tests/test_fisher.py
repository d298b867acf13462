"""Matrix-Fisher NLL parity vs the reference torch implementation (CPU)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.ops.fisher import (
    bessel0_exp_scaled, log_mf_norm_constant, matrix_fisher_nll, proper_singular_values,
)

sys.path.insert(0, "/root/reference")


def _torch_reference_nll(F_np, R_np):
    import torch
    from utils.loss_utils import matrix_fisher_nll as ref_nll

    F = torch.tensor(F_np, requires_grad=True)
    U, S, V = torch.svd(F)
    R = torch.tensor(R_np)
    nll = ref_nll(F, U, S, V, R)
    nll.sum().backward()
    return nll.detach().numpy(), F.grad.numpy()


class TestBessel:
    def test_matches_reference_small_and_large(self):
        import torch
        from utils.loss_utils import bessel0_exp_scaled as ref_bessel

        x = np.concatenate([np.linspace(0.01, 3.7, 50), np.linspace(3.8, 60, 50)]).astype(
            np.float32
        )
        ours = np.asarray(bessel0_exp_scaled(jnp.asarray(x)))
        ref = ref_bessel(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestProperSV:
    def test_values(self, rng):
        F = rng.normal(size=(10, 3, 3)).astype(np.float32)
        S = np.asarray(proper_singular_values(jnp.asarray(F)))
        for i in range(10):
            u, s, vt = np.linalg.svd(F[i])
            sign = np.sign(np.linalg.det(u) * np.linalg.det(vt.T))
            s = s.copy()
            s[2] *= sign
            np.testing.assert_allclose(S[i], s, rtol=1e-4, atol=1e-5)

    def test_grad_is_uvt(self, rng):
        F = rng.normal(size=(4, 3, 3)).astype(np.float32) * 2
        g = jax.grad(lambda f: jnp.sum(proper_singular_values(f) * jnp.array([1.0, 2.0, 3.0])))(
            jnp.asarray(F)
        )
        # finite-difference check on one entry
        eps = 1e-3

        def f(Fm):
            return float(
                jnp.sum(proper_singular_values(jnp.asarray(Fm)) * jnp.array([1.0, 2.0, 3.0]))
            )

        Fp = F.copy(); Fp[1, 0, 2] += eps
        Fm = F.copy(); Fm[1, 0, 2] -= eps
        fd = (f(Fp) - f(Fm)) / (2 * eps)
        np.testing.assert_allclose(g[1, 0, 2], fd, rtol=2e-2, atol=1e-4)


class TestNLLParity:
    def test_value_parity(self, rng):
        F = (rng.normal(size=(23, 3, 3)) * 1.5).astype(np.float32)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(23, random_state=1).as_matrix().astype(np.float32)
        ref_val, _ = _torch_reference_nll(F, R)
        ours = np.asarray(matrix_fisher_nll(jnp.asarray(F), jnp.asarray(R)))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-4, atol=1e-4)

    def test_grad_parity(self, rng):
        F = (rng.normal(size=(8, 3, 3)) * 1.2).astype(np.float32)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(8, random_state=2).as_matrix().astype(np.float32)
        _, ref_grad = _torch_reference_nll(F, R)
        ours = np.asarray(
            jax.grad(lambda f: jnp.sum(matrix_fisher_nll(f, jnp.asarray(R))))(jnp.asarray(F))
        )
        np.testing.assert_allclose(ours, ref_grad, rtol=2e-3, atol=2e-3)

    def test_near_identity_rotations_stable(self):
        """At MLP init, F ~ rotation matrices (degenerate S) — grads must be finite."""
        from scipy.spatial.transform import Rotation
        F = Rotation.random(23, random_state=3).as_matrix().astype(np.float32)
        R = Rotation.random(23, random_state=4).as_matrix().astype(np.float32)
        g = jax.grad(lambda f: jnp.sum(matrix_fisher_nll(f, jnp.asarray(R))))(jnp.asarray(F))
        assert np.all(np.isfinite(np.asarray(g)))
