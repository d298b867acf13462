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


class TestAABBCulling:
    """AABB-tightened binning (tile_rect_aabb) must be output-exact: every
    pair it drops relative to the reference rect is sub-threshold
    (alpha < 1/255) at every pixel of the dropped tile."""

    def test_aabb_drops_only_subthreshold_pairs(self):
        import jax.numpy as jnp
        from moss_tpu.ops.binning import tile_rect, tile_rect_aabb

        rng = np.random.default_rng(11)
        P, H, W, th, tw = 400, 64, 256, 8, 128
        gh, gw = H // th, W // tw
        mean2d = jnp.asarray(rng.uniform(-30, 280, (P, 2)).astype(np.float32))
        # anisotropic covariances (sigma_x != sigma_y), conic consistent
        sx = rng.uniform(1.0, 8.0, P).astype(np.float32)
        sy = rng.uniform(1.0, 8.0, P).astype(np.float32)
        rho = rng.uniform(-0.6, 0.6, P).astype(np.float32)
        cxx, cyy = sx * sx, sy * sy
        cxy = rho * sx * sy
        det = cxx * cyy - cxy * cxy
        conic = np.stack([cyy / det, -cxy / det, cxx / det], -1)
        lam_max = 0.5 * (cxx + cyy) + np.sqrt(0.25 * (cxx - cyy) ** 2 + cxy**2)
        radius = jnp.asarray(np.ceil(3.0 * np.sqrt(lam_max)).astype(np.int32))
        rxy = jnp.asarray(
            np.minimum(np.ceil(3.4 * np.sqrt(np.stack([cxx, cyy], -1))),
                       np.asarray(radius)[:, None]).astype(np.int32)
        )
        r_ref = tile_rect(mean2d, radius, gh, gw, th, tw)
        r_ab = tile_rect_aabb(mean2d, radius, rxy, gh, gw, th, tw)
        m2 = np.asarray(mean2d)
        for i in range(P):
            ry0, rx0, ry1, rx1 = (int(a[i]) for a in r_ref)
            ay0, ax0, ay1, ax1 = (int(a[i]) for a in r_ab)
            # AABB rect is a subset of the reference rect
            assert ay0 >= ry0 and ax0 >= rx0 and ay1 <= ry1 and ax1 <= rx1
            # every dropped tile: max alpha over its pixels < 1/255 at op=1
            a, b, c = conic[i]
            for ty in range(ry0, ry1):
                for tx in range(rx0, rx1):
                    if ay0 <= ty < ay1 and ax0 <= tx < ax1:
                        continue
                    ys = np.arange(ty * th, ty * th + th)
                    xs = np.arange(tx * tw, tx * tw + tw)
                    dxg, dyg = np.meshgrid(m2[i, 0] - xs, m2[i, 1] - ys)
                    power = -0.5 * (a * dxg**2 + c * dyg**2) - b * dxg * dyg
                    amax = np.exp(power.max())
                    assert amax < 1.0 / 255.0, (i, ty, tx, amax)

    def test_build_pair_rows_aabb_matches_reference_rect_output(self):
        """Rendered output with AABB binning == reference-rect binning."""
        import jax.numpy as jnp
        from moss_tpu.ops import transforms as tf
        from moss_tpu.ops.projection import preprocess
        from moss_tpu.ops.rasterize_tpu import rasterize_tpu
        from moss_tpu.render.camera import Camera

        rng = np.random.default_rng(3)
        H = W = 64
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
        n = 200
        means = np.stack(
            [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n), rng.uniform(2, 3, n)],
            -1,
        ).astype(np.float32)
        # extreme anisotropy: one axis 20x the other
        s_maj = rng.uniform(0.08, 0.15, (n, 1)).astype(np.float32)
        s_min = s_maj * rng.uniform(0.03, 0.1, (n, 1)).astype(np.float32)
        scales = np.concatenate([s_maj, s_min, s_min], 1)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        cov3d = tf.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
        proj = preprocess(
            jnp.asarray(means), cov3d,
            jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
            # spans the opacity-adaptive extent regime: near-invisible splats
            # (extent ~0), low, and high opacity
            jnp.asarray(np.concatenate([
                rng.uniform(0.002, 0.02, n // 4),
                rng.uniform(0.02, 0.3, n // 4),
                rng.uniform(0.3, 0.95, n - 2 * (n // 4)),
            ]).astype(np.float32)), cam,
        )
        bg = jnp.zeros(3)
        out_ab = rasterize_tpu(proj, bg, H, W)
        out_ref = rasterize_tpu(proj._replace(radius_xy=None), bg, H, W)
        for f in ("color", "depth", "alpha", "final_T"):
            np.testing.assert_allclose(
                np.asarray(out_ab[f]), np.asarray(out_ref[f]), atol=1e-6,
                err_msg=f,
            )

    def test_opacity_adaptive_extent_is_exact_and_tighter(self):
        """preprocess's opacity-adaptive radius_xy (sqrt(2 ln(255 op)) sigma,
        VERDICT r2 next-step 8): every pixel OUTSIDE the per-axis box has
        alpha = op*exp(-q) < 1/255 (so the blend would skip it — dropping is
        exact), and low-opacity splats get strictly smaller boxes than the
        opacity-blind 3.4 sigma bound."""
        import jax.numpy as jnp
        from moss_tpu.ops import transforms as tf
        from moss_tpu.ops.projection import preprocess
        from moss_tpu.render.camera import Camera

        rng = np.random.default_rng(7)
        H = W = 128
        K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
        n = 64
        means = np.stack(
            [rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
             rng.uniform(2, 3, n)], -1).astype(np.float32)
        scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        ops = rng.uniform(0.005, 1.0, n).astype(np.float32)
        cov3d = tf.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
        proj = preprocess(jnp.asarray(means), cov3d,
                          jnp.zeros((n, 3), jnp.float32), jnp.asarray(ops),
                          cam)
        m2 = np.asarray(proj.mean2d)
        conic = np.asarray(proj.conic)
        rxy = np.asarray(proj.radius_xy)
        radius = np.asarray(proj.radius)
        valid = np.asarray(proj.valid)
        saw_tighter = False
        for i in range(n):
            if not valid[i]:
                continue
            a, b, c = conic[i]
            # brute-force alpha on a grid just OUTSIDE the box on each axis
            rx, ry = int(rxy[i, 0]), int(rxy[i, 1])
            xs = np.arange(-radius[i], radius[i] + 1)
            ys = np.arange(-radius[i], radius[i] + 1)
            dxg, dyg = np.meshgrid(xs.astype(np.float64), ys.astype(np.float64))
            # pixel centers relative to the mean, worst case alignment: the
            # box is centered on the mean in CONTINUOUS coords, so test the
            # continuous complement directly
            outside = (np.abs(dxg) > rx) | (np.abs(dyg) > ry)
            alpha = ops[i] * np.exp(
                -0.5 * (a * dxg**2 + c * dyg**2) - b * dxg * dyg)
            if outside.any():
                assert alpha[outside].max() < 1.0 / 255.0, i
            # the opacity-blind bound for this splat
            blind = np.ceil(3.4 * np.sqrt(np.maximum(
                np.array([c, a]) / max(a * c - b * b, 1e-12), 0)))
            if ops[i] < 0.05 and (rx < blind[0] or ry < blind[1]):
                saw_tighter = True
        assert saw_tighter, "no low-opacity splat got a tighter box"


class TestSlotBudget1024:
    """Budget validation at the MonoCap full-res shape (1024x1024, 46k splats
    — dataset_readers.py:299 trains MonoCap at image_scaling=1.0; VERDICT r1
    missing #4): measure_slot_need must size a pair buffer that build_pair_rows
    fills with ZERO overflow, and the default heuristic must bound it."""

    def test_measured_need_covers_build(self):
        import jax
        import jax.numpy as jnp

        from moss_tpu.ops import rasterize_tpu as rt
        from moss_tpu.ops import transforms as tf
        from moss_tpu.ops.binning import (
            build_pair_rows, default_slot_budget, measure_slot_need,
        )
        from moss_tpu.ops.projection import preprocess
        from moss_tpu.render.camera import Camera

        H = W = 1024
        P = 46080
        rng = np.random.default_rng(0)
        f = 550.0 * H / 512.0
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
        means = np.stack(
            [rng.uniform(-0.4, 0.4, P), rng.uniform(-0.7, 0.7, P),
             rng.uniform(1.5, 2.5, P)], -1).astype(np.float32)
        cov3d = tf.build_covariance(
            jnp.asarray(rng.uniform(0.004, 0.012, (P, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)))
        proj = preprocess(
            jnp.asarray(means), cov3d,
            jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.3, 0.95, P).astype(np.float32)), cam)

        G = rt.DEFAULT_GROUPS
        m = jax.jit(lambda p: measure_slot_need(
            p.mean2d, p.conic, p.opacity, p.depth, p.radius, p.valid,
            H, W, rt.TILE_H, rt.TILE_W, groups=G, radius_xy=p.radius_xy,
        ))(proj)
        need, live = int(m["need"]), int(m["live"])
        cap = default_slot_budget(P, H, W, rt.TILE_H, rt.TILE_W, groups=G)
        assert 0 < live <= need <= cap, (live, need, cap)

        budget = -(-int(need * 1.06) // 16384) * 16384  # bench.py's bucketing
        layout = jax.jit(lambda p: build_pair_rows(
            p.mean2d, p.conic, p.opacity, p.color, p.depth, p.radius, p.valid,
            H, W, rt.TILE_H, rt.TILE_W, groups=G, radius_xy=p.radius_xy,
            slot_budget=budget,
        ))(proj)
        assert int(layout.overflow) == 0
        assert int(layout.num_pairs) == live
        # the sized buffer really is tighter than the safe default
        assert budget < cap


class TestMeasureSlotNeedStats:
    """The probe outputs that size the OTHER two static budgets
    (trainer._resize_pair_buffer): `total_live` must equal the brute-force
    count of pairs surviving the rect cap + peak-alpha cull (pre-NPb
    truncation), and `max_rect` the largest pre-cap tile rect of any valid
    Gaussian."""

    def test_total_live_and_max_rect_exact(self):
        import jax
        import jax.numpy as jnp
        from moss_tpu.ops import rasterize_tpu as rt
        from moss_tpu.ops import transforms as tf
        from moss_tpu.ops.binning import measure_slot_need, tile_rect_aabb
        from moss_tpu.ops.projection import preprocess
        from moss_tpu.render.camera import Camera

        rng = np.random.default_rng(23)
        H, W = 64, 256
        K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.zeros(3), H, W)
        n = 150
        means = np.stack(
            [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.4, 0.4, n),
             rng.uniform(1.5, 3, n)], -1).astype(np.float32)
        cov3d = tf.build_covariance(
            jnp.asarray(rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
        ops = rng.uniform(0.01, 1.0, n).astype(np.float32)
        proj = preprocess(jnp.asarray(means), cov3d,
                          jnp.zeros((n, 3), jnp.float32), jnp.asarray(ops),
                          cam)
        B = 16
        G = rt.DEFAULT_GROUPS
        m = jax.jit(lambda p: measure_slot_need(
            p.mean2d, p.conic, p.opacity, p.depth, p.radius, p.valid,
            H, W, rt.TILE_H, rt.TILE_W, max_tiles_per_gaussian=B,
            pair_budget=n * B, groups=G, radius_xy=p.radius_xy,
        ))(proj)

        # brute force in the binning's SUBtile grid
        th, tw_geo = rt.TILE_H, rt.TILE_W
        tw = tw_geo // G
        gh, gw = -(-H // th), (-(-W // tw_geo)) * G
        r = tile_rect_aabb(proj.mean2d, proj.radius, proj.radius_xy,
                           gh, gw, th, tw)
        min_y, min_x, max_y, max_x = (np.asarray(a) for a in r)
        m2 = np.asarray(proj.mean2d)
        conic = np.asarray(proj.conic)
        valid = np.asarray(proj.valid)
        total = 0
        max_rect = 0
        for i in range(n):
            if not valid[i]:
                continue
            n_x = max_x[i] - min_x[i]
            n_tiles = n_x * (max_y[i] - min_y[i])
            max_rect = max(max_rect, int(n_tiles))
            a, b, c = conic[i]
            # first B tiles in the binning's slot order (slot//n_x, slot%n_x)
            for slot in range(min(int(n_tiles), B)):
                ty = min_y[i] + slot // max(n_x, 1)
                tx = min_x[i] + slot % max(n_x, 1)
                dx0 = tx * tw - m2[i, 0]
                dy0 = ty * th - m2[i, 1]
                xs = dx0 + np.arange(tw)
                ys = dy0 + np.arange(th)
                dxg, dyg = np.meshgrid(xs, ys)
                q = 0.5 * (a * dxg**2 + c * dyg**2) + b * dxg * dyg
                qcap = np.log(max(ops[i], 1e-12) * 255.0) + 1e-3
                # the cull minimizes q over the CONTINUOUS rect of pixel
                # coords; the discrete-grid min can only be >= that, so a
                # pair the discrete test keeps must be kept by the cull too
                if q.min() <= qcap:
                    total += 1
        assert int(m["max_rect"]) == max_rect
        # the continuous-minimum cull keeps every discretely-live pair and
        # may keep a few boundary pairs the pixel grid just misses
        assert int(m["total_live"]) >= total
        assert int(m["total_live"]) <= total + n  # margin pairs are rare
        assert int(m["rect_overflow"]) == 0  # nothing exceeds B here
