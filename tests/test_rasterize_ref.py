"""Oracle rasterizer vs a literal sequential (numpy) compositor + grad checks."""
import numpy as np
import jax
import jax.numpy as jnp

from moss_tpu.ops import transforms as tf
from moss_tpu.ops.binning import tile_rect
from moss_tpu.ops.projection import preprocess
from moss_tpu.ops.rasterize_ref import (
    ALPHA_MAX, ALPHA_MIN, T_EPS, rasterize_reference, render_reference,
)
from moss_tpu.render.camera import Camera


def make_camera(H=32, W=32, fx=60.0):
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    return Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)


def random_scene(rng, n=40, z0=2.0):
    means = np.stack(
        [rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n), rng.uniform(z0, z0 + 1.0, n)],
        axis=-1,
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.1, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    return means, scales, quats, colors, opacity


def sequential_compositor(proj, H, W, bg, tile_h, tile_w):
    """Direct numpy transcription of the per-pixel loop semantics
    (reference forward.cu:330-382) — the ground truth for the vectorized oracle."""
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    color = np.asarray(proj.color)
    depth = np.asarray(proj.depth)
    opacity = np.asarray(proj.opacity)
    radius = np.asarray(proj.radius)
    valid = np.asarray(proj.valid)

    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    gh, gw = -(-H // tile_h), -(-W // tile_w)
    r0, c0, r1, c1 = [np.asarray(a) for a in tile_rect(
        jnp.asarray(mean2d), jnp.asarray(radius), gh, gw, tile_h, tile_w)]

    out = np.zeros((H, W, 3))
    out_d = np.zeros((H, W))
    out_a = np.zeros((H, W))
    out_T = np.ones((H, W))
    for py in range(H):
        for px in range(W):
            ty, tx = py // tile_h, px // tile_w
            T = 1.0
            C = np.zeros(3)
            D = 0.0
            wsum = 0.0
            for k in order:
                if not valid[k]:
                    continue
                if not (r0[k] <= ty < r1[k] and c0[k] <= tx < c1[k]):
                    continue
                dx = mean2d[k, 0] - px
                dy = mean2d[k, 1] - py
                a, b, c = conic[k]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(ALPHA_MAX, opacity[k] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                test_T = T * (1 - alpha)
                if test_T < T_EPS:
                    break
                C += color[k] * alpha * T
                D += depth[k] * alpha * T
                wsum += alpha * T
                T = test_T
            out[py, px] = C + T * bg
            out_d[py, px] = D
            out_a[py, px] = wsum
            out_T[py, px] = T
    return out, out_d, out_a, out_T


class TestOracleVsSequential:
    def test_matches_sequential(self, rng):
        H = W = 32
        cam = make_camera(H, W)
        means, scales, quats, colors, opacity = random_scene(rng, n=40)
        cov3d = tf.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
        proj = preprocess(
            jnp.asarray(means), cov3d, jnp.asarray(colors), jnp.asarray(opacity), cam
        )
        bg = jnp.array([1.0, 0.5, 0.25])
        out = rasterize_reference(proj, bg, H, W, tile_h=16, tile_w=16, chunk=16)
        ref_c, ref_d, ref_a, ref_T = sequential_compositor(proj, H, W, np.asarray(bg), 16, 16)
        np.testing.assert_allclose(out["color"], ref_c, atol=2e-5)
        np.testing.assert_allclose(out["depth"], ref_d, atol=1e-4)
        np.testing.assert_allclose(out["alpha"], ref_a, atol=2e-5)
        np.testing.assert_allclose(out["final_T"], ref_T, atol=2e-5)

    def test_chunk_size_invariance(self, rng):
        """Early termination must behave identically across chunk boundaries."""
        H = W = 24
        cam = make_camera(H, W)
        # lots of opaque overlapping splats to force T < 1e-4 termination
        means, scales, quats, colors, _ = random_scene(rng, n=64)
        means[:, :2] *= 0.1
        opacity = np.full((64,), 0.98, np.float32)
        cov3d = tf.build_covariance(jnp.asarray(scales) * 2, jnp.asarray(quats))
        proj = preprocess(
            jnp.asarray(means), cov3d, jnp.asarray(colors), jnp.asarray(opacity), cam
        )
        bg = jnp.zeros(3)
        a = rasterize_reference(proj, bg, H, W, chunk=8)
        b = rasterize_reference(proj, bg, H, W, chunk=64)
        assert float(jnp.min(a["final_T"])) < T_EPS * 10  # termination exercised
        np.testing.assert_allclose(a["color"], b["color"], atol=1e-5)
        np.testing.assert_allclose(a["final_T"], b["final_T"], atol=1e-6)

    def test_empty_scene_is_background(self):
        H = W = 16
        cam = make_camera(H, W)
        proj = preprocess(
            jnp.zeros((4, 3)) + jnp.array([0.0, 0.0, -5.0]),  # behind camera
            tf.build_covariance(jnp.full((4, 3), 0.1), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1))),
            jnp.ones((4, 3)), jnp.full((4,), 0.9), cam,
        )
        bg = jnp.array([0.2, 0.4, 0.6])
        out = rasterize_reference(proj, bg, H, W)
        np.testing.assert_allclose(out["color"], np.broadcast_to(bg, (H, W, 3)), atol=1e-6)


class TestOracleGradients:
    def test_grads_finite_and_nonzero(self, rng):
        H = W = 24
        cam = make_camera(H, W)
        means, scales, quats, colors, opacity = random_scene(rng, n=16)

        def loss_fn(means, log_scales, quats, colors, raw_op):
            cov3d = tf.build_covariance(jnp.exp(log_scales), quats)
            out, _ = render_reference(
                means, cov3d, colors, jax.nn.sigmoid(raw_op), cam, jnp.zeros(3)
            )
            return jnp.sum(out["color"] ** 2) + jnp.sum(out["alpha"]) * 0.1

        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(means), jnp.log(jnp.asarray(scales)), jnp.asarray(quats),
            jnp.asarray(colors), jnp.asarray(opacity),
        )
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
        assert any(float(jnp.abs(g).max()) > 1e-6 for g in grads)

    def test_grad_matches_finite_difference(self, rng):
        H = W = 16
        cam = make_camera(H, W)
        means, scales, quats, colors, opacity = random_scene(rng, n=6)
        target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

        def loss_fn(op):
            cov3d = tf.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
            out, _ = render_reference(
                jnp.asarray(means), cov3d, jnp.asarray(colors), op, cam, jnp.zeros(3)
            )
            return jnp.mean((out["color"] - target) ** 2)

        op = jnp.asarray(opacity)
        g = jax.grad(loss_fn)(op)
        eps = 1e-3
        for i in [0, 3]:
            e = jnp.zeros_like(op).at[i].set(eps)
            fd = (loss_fn(op + e) - loss_fn(op - e)) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-5)
