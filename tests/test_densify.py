"""Densifier unit tests: KL closed form, append/prune mechanics, Fisher fields."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.config import OptimConfig
from moss_tpu.models.gaussians import (
    GaussianParams, GaussianState, create_from_points, get_scaling,
)
from moss_tpu.train.densify import (
    _append_rows, angle_change_mask, densify_and_prune, kl_div_gaussians, pca_normals,
)


def numpy_kl(mu0, q0, s0, mu1, q1, s1):
    """Independent transcription of the reference kl_div (gaussian_model.py:776-814)."""
    from scipy.spatial.transform import Rotation

    def rot(q):
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        return Rotation.from_quat([x, y, z, w]).as_matrix()

    R0, R1 = rot(q0), rot(q1)
    cov0 = R0 @ np.diag(s0**2) @ R0.T
    cov1_inv = R1 @ np.diag(1.0 / s1**2) @ R1.T
    tr = np.trace(cov1_inv @ cov0)
    d = mu1 - mu0
    maha = d @ cov1_inv @ d
    logdet = np.log(np.prod((s1 / s0) ** 2))
    return 0.5 * (tr + maha + logdet - 3)


class TestKL:
    def test_matches_numpy(self, rng):
        n = 20
        mu0 = rng.normal(size=(n, 3)).astype(np.float32)
        mu1 = mu0 + rng.normal(0, 0.1, (n, 3)).astype(np.float32)
        q0 = rng.normal(size=(n, 4)).astype(np.float32)
        q1 = rng.normal(size=(n, 4)).astype(np.float32)
        s0 = rng.uniform(0.5, 2, (n, 3)).astype(np.float32)
        s1 = rng.uniform(0.5, 2, (n, 3)).astype(np.float32)
        out = kl_div_gaussians(
            jnp.asarray(mu0), jnp.asarray(q0), jnp.asarray(s0),
            jnp.asarray(mu1), jnp.asarray(q1), jnp.asarray(s1),
        )
        for i in range(n):
            ref = numpy_kl(mu0[i], q0[i], s0[i], mu1[i], q1[i], s1[i])
            np.testing.assert_allclose(float(out[i]), ref, rtol=1e-3, atol=1e-4)

    def test_identical_gaussians_zero(self, rng):
        mu = rng.normal(size=(5, 3)).astype(np.float32)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        s = rng.uniform(0.5, 2, (5, 3)).astype(np.float32)
        out = kl_div_gaussians(*(jnp.asarray(x) for x in (mu, q, s, mu, q, s)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


class TestAppend:
    def test_fills_free_slots_and_drops_overflow(self, rng):
        P = 16
        params = GaussianParams(
            xyz=jnp.zeros((P, 3)), f_dc=jnp.zeros((P, 1, 3)),
            f_rest=jnp.zeros((P, 15, 3)), scaling=jnp.zeros((P, 3)),
            rotation=jnp.zeros((P, 4)), opacity=jnp.zeros((P, 1)),
        )
        valid = jnp.asarray(np.array([True] * 12 + [False] * 4))
        cand = {
            "xyz": jnp.ones((P, 3)) * jnp.arange(P)[:, None],
            "f_dc": jnp.ones((P, 1, 3)), "f_rest": jnp.ones((P, 15, 3)),
            "scaling": jnp.ones((P, 3)), "rotation": jnp.ones((P, 4)),
            "opacity": jnp.ones((P, 1)),
        }
        # 6 candidates for 4 free slots -> 2 dropped
        cand_mask = jnp.asarray(np.array([True] * 6 + [False] * 10))
        new_params, new_valid, dest, ok, dropped = _append_rows(
            params, valid, cand, cand_mask
        )
        assert int(dropped) == 2
        assert int(new_valid.sum()) == 16
        # the four appended rows carry candidate xyz values (0..3)
        appended = np.asarray(new_params.xyz[12:])
        assert sorted(appended[:, 0].tolist()) == [0.0, 1.0, 2.0, 3.0]


class TestNormals:
    def test_plane_normals(self, rng):
        # points on z=0 plane -> normals ~ +-z
        pts = np.concatenate(
            [rng.uniform(-1, 1, (100, 2)), np.zeros((100, 1))], axis=1
        ).astype(np.float32)
        from moss_tpu.ops.knn import knn

        _, idx = knn(jnp.asarray(pts), jnp.asarray(pts), k=5)
        normals = pca_normals(jnp.asarray(pts), idx)
        nz = np.abs(np.asarray(normals)[:, 2])
        assert (nz > 0.99).mean() > 0.95

    def test_angle_mask_flat_vs_curved(self, rng):
        from moss_tpu.ops.knn import knn

        flat = np.concatenate(
            [rng.uniform(-1, 1, (200, 2)), np.zeros((200, 1))], axis=1
        ).astype(np.float32)
        _, idx = knn(jnp.asarray(flat), jnp.asarray(flat), k=5)
        normals = pca_normals(jnp.asarray(flat), idx)
        mask_flat = angle_change_mask(jnp.asarray(flat), normals, idx)
        # a flat sheet has ~zero angle-change rate
        assert float(mask_flat.mean()) < 0.2


class TestSMPLPruneShell:
    def test_euclidean_5cm_shell(self, rng):
        """Pin the SMPL-distance prune convention: the reference thresholds
        KNN_CUDA's raw (euclidean, sqrt'ed — Garcia kNN-CUDA convention)
        distance at 0.05 (gaussian_model.py:657-661), i.e. a 5 cm shell.
        Points 4 cm from the surface must survive; 6 cm must be pruned."""
        import dataclasses

        import optax

        P = 64
        # t-pose "surface": a line of vertices along x at y=z=0
        t_verts = np.stack(
            [np.linspace(-1, 1, 50), np.zeros(50), np.zeros(50)], axis=1
        ).astype(np.float32)
        # gaussians at controlled euclidean offsets from the surface
        offsets = np.array([0.00, 0.02, 0.04, 0.049, 0.051, 0.06, 0.10, 0.22])
        pts = np.zeros((len(offsets), 3), np.float32)
        # sit each point exactly above a vertex so the z offset IS the distance
        vidx = np.linspace(5, 44, len(offsets)).round().astype(int)
        pts[:, 0] = t_verts[vidx, 0]
        pts[:, 2] = offsets
        colors = rng.uniform(size=(len(offsets), 3)).astype(np.float32)
        params, gstate = create_from_points(pts, colors, capacity=P)
        opt = optax.adam(1e-3)
        cfg = OptimConfig(densify_grad_threshold=1e9)  # no clone/split/merge
        out_params, out_state, _, _ = densify_and_prune(
            params, gstate, opt.init(params), jax.random.PRNGKey(0), cfg,
            extent=1.0, t_vertices=jnp.asarray(t_verts), use_size_threshold=False,
        )
        survived = np.asarray(out_state.valid[: len(offsets)])
        np.testing.assert_array_equal(survived, offsets <= 0.05)
        # the squared-distance misreading (threshold on d2) would instead
        # retain everything out to 0.22 m — assert that reading is dead
        assert not survived[offsets > 0.05].any()


class TestDensifyIntegration:
    def test_runs_and_respects_capacity(self, rng):
        P = 256
        pts = rng.normal(0, 0.3, (200, 3)).astype(np.float32)
        colors = rng.uniform(size=(200, 3)).astype(np.float32)
        params, gstate = create_from_points(pts, colors, capacity=P)
        # fake stats: everyone has high grads, mark half visible
        import dataclasses

        gstate = dataclasses.replace(
            gstate,
            xyz_grad_accum=jnp.full((P,), 10.0),
            denom=jnp.full((P,), 10.0),
            joint_F=jnp.tile(jnp.eye(3)[None], (23, 1, 1)) * 5.0,
            lbs_weight_sum=jnp.ones((P, 24)) * 10.0,
        )
        import optax

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        cfg = OptimConfig(smpl_dist_threshold=10.0)  # disable SMPL pruning here
        out_params, out_state, out_opt, stats = densify_and_prune(
            params, gstate, opt_state, jax.random.PRNGKey(0), cfg,
            extent=1.0, t_vertices=jnp.asarray(pts), use_size_threshold=False,
        )
        assert int(out_state.num_valid) <= P
        assert bool(jnp.isfinite(out_params.xyz).all())
        # stats were reset
        assert float(out_state.xyz_grad_accum.sum()) == 0.0
        assert float(out_state.denom.sum()) == 0.0


class TestSplitCapacitySafety:
    def test_split_parents_survive_full_arena(self, rng):
        """When the arena has no free slots, split children are dropped — the
        parents must NOT be pruned (pruning them would annihilate Gaussians
        instead of splitting; the reference never loses points here because
        its tensors grow dynamically)."""
        import dataclasses

        import optax

        P = 64
        pts = rng.normal(0, 0.3, (P, 3)).astype(np.float32)  # arena FULL
        colors = rng.uniform(size=(P, 3)).astype(np.float32)
        params, gstate = create_from_points(pts, colors, capacity=P)
        # huge scales -> everyone is a split candidate (large & grad hit)
        params = dataclasses.replace(
            params, scaling=jnp.full((P, 3), jnp.log(10.0)))
        gstate = dataclasses.replace(
            gstate,
            xyz_grad_accum=jnp.full((P,), 10.0),
            denom=jnp.full((P,), 10.0),
            joint_F=jnp.tile(jnp.eye(3)[None], (23, 1, 1)) * 5.0,
            lbs_weight_sum=jnp.ones((P, 24)) * 10.0,
        )
        opt = optax.adam(1e-3)
        cfg = OptimConfig(smpl_dist_threshold=1e9, kl_threshold=-1.0,
                          kl_merge_threshold=-2.0)  # all split, none merge
        out_params, out_state, _, stats = densify_and_prune(
            params, gstate, opt.init(params), jax.random.PRNGKey(0), cfg,
            extent=100.0, t_vertices=jnp.asarray(pts),
            use_size_threshold=False,
        )
        # zero free slots: no children landed, so no parent may be pruned
        # (and nothing else prunes: opacity init > min, size prune off)
        assert int(stats["split"]) == 0
        assert int(stats["dropped_capacity"]) > 0
        assert int(out_state.num_valid) == P
