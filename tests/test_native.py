"""Native C++ host library vs the jnp oracle / numpy brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from moss_tpu import native
from moss_tpu.ops import transforms as tf
from moss_tpu.ops.projection import preprocess
from moss_tpu.ops.rasterize_ref import rasterize_reference
from moss_tpu.render.camera import Camera

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


class TestNativeRasterizer:
    def test_matches_jnp_oracle(self, rng):
        H = W = 48
        K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
        n = 50
        means = np.stack(
            [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n), rng.uniform(2, 3, n)], -1
        ).astype(np.float32)
        cov3d = tf.build_covariance(
            jnp.asarray(rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        )
        proj = preprocess(
            jnp.asarray(means), cov3d,
            jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)), cam,
        )
        bg = np.array([0.7, 0.2, 0.4], np.float32)
        ref = rasterize_reference(proj, jnp.asarray(bg), H, W, tile_h=16, tile_w=16)
        out = native.rasterize_cpu(
            np.asarray(proj.mean2d), np.asarray(proj.conic), np.asarray(proj.color),
            np.asarray(proj.opacity), np.asarray(proj.depth), np.asarray(proj.radius),
            np.asarray(proj.valid), H, W, 16, 16, bg,
        )
        np.testing.assert_allclose(out["color"], np.asarray(ref["color"]), atol=3e-5)
        np.testing.assert_allclose(out["final_T"], np.asarray(ref["final_T"]), atol=3e-5)
        np.testing.assert_allclose(out["alpha"], np.asarray(ref["alpha"]), atol=3e-5)


class TestNativeKNN:
    def test_matches_bruteforce(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        out = native.mean_knn3_dist2(pts)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-7)

    def test_clustered_points(self, rng):
        # clusters stress the ring-expansion termination
        centers = rng.normal(0, 5, (10, 3))
        pts = (centers[rng.integers(0, 10, 300)] + rng.normal(0, 0.01, (300, 3))).astype(
            np.float32
        )
        out = native.mean_knn3_dist2(pts)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-9)
