"""SMPL body model + deformation chain tests.

The real SMPL asset is proprietary and absent, so parity is established two
ways: (a) an independent numpy transcription of the LBS algorithm
(smpl_numpy.py:46-98 semantics) run on the synthetic model, and (b) the
round-trip property the deformation is built on: deforming the big-pose SMPL
vertices themselves to a target pose must reproduce direct LBS of that pose.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from moss_tpu.models import smpl as S
from moss_tpu.models.deform import apply_cached_transform, coarse_deform_c2source


def numpy_lbs(model, pose, beta):
    """Independent numpy LBS (same algorithm family as the reference reader path)."""
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    J_reg = np.asarray(model.J_regressor)
    weights = np.asarray(model.weights)
    parents = model.parents
    V = v_template.shape[0]

    v_shaped = v_template + shapedirs.reshape(-1, shapedirs.shape[-1]).dot(beta).reshape(V, 3)
    J = J_reg.dot(v_shaped)
    R = Rotation.from_rotvec(pose.reshape(24, 3) + 1e-8).as_matrix()
    lrotmin = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + posedirs.reshape(-1, 207).dot(lrotmin).reshape(V, 3)

    G_local = np.zeros((24, 4, 4))
    for j in range(24):
        G_local[j, :3, :3] = R[j]
        G_local[j, :3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
        G_local[j, 3, 3] = 1
    G = np.zeros_like(G_local)
    G[0] = G_local[0]
    for j in range(1, 24):
        G[j] = G[parents[j]] @ G_local[j]
    joints_posed = G[:, :3, 3].copy()
    for j in range(24):
        G[j, :3, 3] -= G[j, :3, :3] @ J[j]
    T = np.einsum("vj,jxy->vxy", weights, G)
    v_h = np.concatenate([v_posed, np.ones((V, 1))], -1)
    v = np.einsum("vxy,vy->vx", T, v_h)[:, :3]
    return v, joints_posed


@pytest.fixture(scope="module")
def model():
    return S.synthetic_smpl(n_verts=500)


class TestSMPL:
    def test_zero_pose_zero_shape_is_template(self, model):
        v, _ = S.lbs_vertices(model, jnp.zeros(72), jnp.zeros(10))
        np.testing.assert_allclose(v, model.v_template, atol=1e-4)

    def test_matches_numpy_lbs(self, model, rng):
        pose = rng.normal(0, 0.4, 72).astype(np.float32)
        beta = rng.normal(0, 1.0, 10).astype(np.float32)
        v, j = S.lbs_vertices(model, jnp.asarray(pose), jnp.asarray(beta))
        v_ref, j_ref = numpy_lbs(model, pose, beta)
        np.testing.assert_allclose(np.asarray(v), v_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(j), j_ref, atol=2e-4)

    def test_transform_params_consistent_with_lbs(self, model, rng):
        """LBS via transform_params' A must equal lbs_vertices."""
        pose = rng.normal(0, 0.3, 72).astype(np.float32)
        params = {
            "poses": jnp.asarray(pose)[None],
            "shapes": jnp.zeros((1, 10)),
            "R": jnp.eye(3),
            "Th": jnp.zeros((1, 3)),
        }
        A, R, Th, joints, rot_mats = S.transform_params(model, params)
        # apply to pose-blendshaped verts
        v_shaped = S.shaped_vertices(model, params["shapes"])[0]
        ident = jnp.eye(3)
        pose_feat = (rot_mats[0, 1:] - ident).reshape(-1)
        V = v_shaped.shape[0]
        v_posed = v_shaped + (model.posedirs.reshape(V * 3, -1) @ pose_feat).reshape(V, 3)
        T = jnp.einsum("vj,jxy->vxy", model.weights, A[0])
        v_h = jnp.concatenate([v_posed, jnp.ones((V, 1))], -1)
        v = jnp.einsum("vxy,vy->vx", T, v_h)[:, :3]
        v_direct, _ = S.lbs_vertices(model, jnp.asarray(pose), jnp.zeros(10))
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_direct), atol=1e-5)


class TestDeform:
    def _world(self, v, Rw, Th):
        return np.asarray(v) @ np.asarray(Rw).T + np.asarray(Th)

    def test_big_to_target_roundtrip_on_vertices(self, model, rng):
        """Deforming big-pose vertices to a target pose == direct LBS of target."""
        big = S.big_pose_params()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        # big pose world == smpl space (R=I, Th=0)
        Rw = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix().astype(np.float32)
        Th = np.array([[0.2, 0.1, -0.3]], np.float32)
        pose_t = rng.normal(0, 0.3, 72).astype(np.float32)
        shapes_t = rng.normal(0, 0.5, 10).astype(np.float32)
        target = {
            "poses": jnp.asarray(pose_t)[None],
            "shapes": jnp.asarray(shapes_t)[None],
            "R": jnp.asarray(Rw),
            "Th": jnp.asarray(Th),
        }
        out = coarse_deform_c2source(model, v_big, target, big, v_big)
        v_target, _ = S.lbs_vertices(model, jnp.asarray(pose_t), jnp.asarray(shapes_t))
        # world transform of the reference readers: x @ R^-T? the deform uses
        # world = smpl @ R^-1 + Th (gaussian_model.py:916)
        expect_world = np.asarray(v_target) @ np.linalg.inv(np.asarray(Rw)) + Th
        np.testing.assert_allclose(np.asarray(out.smpl_pts), np.asarray(v_target), atol=3e-3)
        np.testing.assert_allclose(np.asarray(out.world_pts), expect_world, atol=3e-3)

    def test_cached_transform_matches_full_deform(self, model, rng):
        big = S.big_pose_params()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        pts = v_big[:100] + jnp.asarray(rng.normal(0, 0.01, (100, 3)).astype(np.float32))
        target = {
            "poses": jnp.asarray(rng.normal(0, 0.3, 72).astype(np.float32))[None],
            "shapes": jnp.zeros((1, 10)),
            "R": jnp.eye(3),
            "Th": jnp.zeros((1, 3)),
        }
        out = coarse_deform_c2source(model, pts, target, big, v_big)
        re_applied = apply_cached_transform(pts, out.transforms, out.translation)
        np.testing.assert_allclose(np.asarray(re_applied), np.asarray(out.world_pts), atol=1e-4)

    def test_lbs_delta_changes_weights(self, model, rng):
        big = S.big_pose_params()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        pts = v_big[:50]
        target = {
            "poses": jnp.zeros((1, 72)), "shapes": jnp.zeros((1, 10)),
            "R": jnp.eye(3), "Th": jnp.zeros((1, 3)),
        }
        delta = jnp.asarray(rng.normal(0, 1.0, (50, 24)).astype(np.float32))
        out0 = coarse_deform_c2source(model, pts, target, big, v_big)
        out1 = coarse_deform_c2source(model, pts, target, big, v_big, lbs_weight_delta=delta)
        assert not np.allclose(np.asarray(out0.bweights), np.asarray(out1.bweights))
        np.testing.assert_allclose(np.asarray(out1.bweights.sum(-1)), 1.0, atol=1e-5)

    def test_gradients_flow_to_pose_corrections(self, model, rng):
        big = S.big_pose_params()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        pts = v_big[:50]
        target = {
            "poses": jnp.asarray(rng.normal(0, 0.2, 72).astype(np.float32))[None],
            "shapes": jnp.zeros((1, 10)), "R": jnp.eye(3), "Th": jnp.zeros((1, 3)),
        }

        def loss(correct_Rs):
            out = coarse_deform_c2source(
                model, pts, target, big, v_big, correct_Rs=correct_Rs
            )
            return jnp.sum(out.world_pts**2)

        eye = jnp.broadcast_to(jnp.eye(3), (23, 3, 3))
        g = jax.grad(loss)(eye)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 1e-6
