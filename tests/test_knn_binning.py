"""KNN (MXU-blocked) and tile binning tests."""
import numpy as np
import jax.numpy as jnp

from moss_tpu.ops.binning import align_binning, bin_gaussians
from moss_tpu.ops.knn import knn, mean_knn_dist2


class TestKNN:
    def test_matches_bruteforce(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        r = rng.normal(size=(50, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=3, chunk=32)
        full = ((q[:, None] - r[None]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=1)[:, :3]
        ref_d2 = np.take_along_axis(full, ref_idx, axis=1)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-4, atol=1e-5)
        assert (np.asarray(idx) == ref_idx).mean() > 0.99  # ties may reorder

    def test_ref_valid_mask(self, rng):
        q = rng.normal(size=(10, 3)).astype(np.float32)
        r = np.concatenate([q, np.zeros((5, 3), np.float32)])
        valid = jnp.asarray(np.array([True] * 10 + [False] * 5))
        d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=1, ref_valid=valid)
        np.testing.assert_allclose(np.asarray(d2[:, 0]), 0.0, atol=1e-5)
        assert np.all(np.asarray(idx[:, 0]) == np.arange(10))

    def test_mean_knn_dist2(self, rng):
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        out = mean_knn_dist2(jnp.asarray(pts))
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        ref = np.sort(full, axis=1)[:, :3].mean(-1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-6)


class TestBinning:
    def _scene(self, rng, n=30, H=96, W=128):
        mean2d = jnp.asarray(
            np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)], -1).astype(np.float32)
        )
        depth = jnp.asarray(rng.uniform(1, 5, n).astype(np.float32))
        radius = jnp.asarray(rng.integers(1, 20, n).astype(np.int32))
        valid = jnp.asarray(rng.uniform(size=n) > 0.2)
        return mean2d, depth, radius, valid

    def test_pairs_cover_rects_depth_sorted(self, rng):
        H, W, T = 96, 128, 32
        mean2d, depth, radius, valid = self._scene(rng)
        b = bin_gaussians(mean2d, depth, radius, valid, H, W, T, T, 16)
        gh, gw = H // T, W // T
        # reconstruct expected pairs
        from moss_tpu.ops.binning import tile_rect
        r0, c0, r1, c1 = tile_rect(mean2d, radius, gh, gw, T, T)
        for t in range(gh * gw):
            ty, tx = t // gw, t % gw
            expect = [
                g for g in np.argsort(np.where(np.asarray(valid), np.asarray(depth), np.inf))
                if bool(valid[g])
                and int(r0[g]) <= ty < int(r1[g]) and int(c0[g]) <= tx < int(c1[g])
            ]
            s, c = int(b.tile_start[t]), int(b.tile_count[t])
            got = list(np.asarray(b.pair_gaussian[s:s + c]))
            assert got == expect, f"tile {t}"

    def test_aligned_layout_consistency(self, rng):
        H, W, T = 96, 128, 32
        gh, gw = H // T, W // T
        mean2d, depth, radius, valid = self._scene(rng, n=60)
        b = bin_gaussians(mean2d, depth, radius, valid, H, W, T, T, 16)
        ab = align_binning(b, gh * gw, align=128)
        for t in range(gh * gw):
            s0, c = int(b.tile_start[t]), int(b.tile_count[t])
            s1 = int(ab.tile_start[t])
            assert s1 % 128 == 0
            assert int(ab.tile_count[t]) == c
            np.testing.assert_array_equal(
                np.asarray(ab.pair_gaussian[s1:s1 + c]),
                np.asarray(b.pair_gaussian[s0:s0 + c]),
            )
            assert bool(ab.pair_valid[s1:s1 + c].all())
            # padding rows are dead
            pad_end = s1 + ((c + 127) // 128) * 128
            assert not bool(ab.pair_valid[s1 + c:pad_end].any())

    def test_overflow_counted(self, rng):
        H = W = 64
        mean2d = jnp.array([[32.0, 32.0]])
        depth = jnp.array([1.0])
        radius = jnp.array([64], jnp.int32)  # covers all 4 tiles
        valid = jnp.array([True])
        b = bin_gaussians(mean2d, depth, radius, valid, H, W, 32, 32, max_tiles_per_gaussian=2)
        assert int(b.overflow) == 2  # 4 tiles - budget 2
