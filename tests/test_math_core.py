"""Golden-value and property tests for the math core (SH, transforms, projection)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.ops import sh
from moss_tpu.ops import transforms as tf
from moss_tpu.ops.projection import conic_and_radius, ewa_cov2d, preprocess, project_points
from moss_tpu.render.camera import Camera


def make_camera(H=64, W=64, fx=100.0, fy=110.0, cx=None, cy=None):
    cx = W / 2 if cx is None else cx
    cy = H / 2 if cy is None else cy
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # camera at origin looking down +z in world coords
    R = np.eye(3)
    T = np.zeros(3)
    return Camera.from_KRT(K, R, T, H, W)


class TestSH:
    def test_deg0_is_constant(self, rng):
        coeffs = rng.normal(size=(5, 16, 3)).astype(np.float32)
        dirs = rng.normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs))
        np.testing.assert_allclose(out, sh.SH_C0 * coeffs[:, 0, :], rtol=1e-6)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = rng.uniform(size=(7, 3)).astype(np.float32)
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-5, atol=1e-6)

    def test_deg1_changes_with_direction(self, rng):
        coeffs = rng.normal(size=(1, 16, 3)).astype(np.float32)
        d1 = jnp.array([[0.0, 0.0, 1.0]])
        d2 = jnp.array([[1.0, 0.0, 0.0]])
        o1 = sh.eval_sh(1, coeffs, d1)
        o2 = sh.eval_sh(1, coeffs, d2)
        assert not np.allclose(o1, o2)

    def test_degree_coeff_mask_equals_low_degree_eval(self, rng):
        # masking coefficients at a traced degree == evaluating at that degree
        coeffs = rng.normal(size=(6, 16, 3)).astype(np.float32)
        dirs = rng.normal(size=(6, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        coeffs, dirs = jnp.asarray(coeffs), jnp.asarray(dirs)
        for deg in range(4):
            masked = coeffs * sh.degree_coeff_mask(jnp.int32(deg), 16)
            np.testing.assert_allclose(
                sh.eval_sh(3, masked, dirs), sh.eval_sh(deg, coeffs, dirs),
                rtol=1e-5, atol=1e-6,
            )

    def test_golden_deg1_z(self):
        # dir = +z: result = C0*sh0 + C1*sh2
        coeffs = np.zeros((1, 4, 3), np.float32)
        coeffs[0, 0] = [1, 2, 3]
        coeffs[0, 2] = [4, 5, 6]
        out = sh.eval_sh(1, jnp.asarray(coeffs), jnp.array([[0.0, 0.0, 1.0]]))
        expect = sh.SH_C0 * coeffs[0, 0] + sh.SH_C1 * coeffs[0, 2]
        np.testing.assert_allclose(out[0], expect, rtol=1e-6)

    def test_golden_deg4_zonal_z(self):
        # dir = +z: only zonal terms survive. Y_40(theta=0) =
        # (3/16)sqrt(1/pi)*(35-30+3) = C4[4]*8; lower zonals: C0, C1 (sh2),
        # C2[2]*2 (sh6), C3[3]*2 (sh12).
        coeffs = np.zeros((1, 25, 1), np.float32)
        coeffs[0, 20, 0] = 1.0
        out = sh.eval_sh(4, jnp.asarray(coeffs), jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(
            float(out[0, 0]), 8.0 * sh.SH_C4[4], rtol=1e-6
        )
        # degree-4 eval on coeffs zeroed above index 16 == degree-3 eval
        rng = np.random.default_rng(0)
        c = rng.normal(size=(5, 25, 3)).astype(np.float32)
        c[:, 16:] = 0.0
        d = rng.normal(size=(5, 3))
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        np.testing.assert_allclose(
            sh.eval_sh(4, jnp.asarray(c), jnp.asarray(d)),
            sh.eval_sh(3, jnp.asarray(c[:, :16]), jnp.asarray(d)),
            rtol=1e-5, atol=1e-6,
        )


class TestTransforms:
    def test_quat_identity(self):
        R = tf.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)

    def test_quat_90z(self):
        q = jnp.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
        R = tf.quat_to_rotmat(q)
        expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R[0], expect, atol=1e-6)

    def test_quat_rotmat_roundtrip(self, rng):
        q = rng.normal(size=(50, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.where(q[:, :1] < 0, -1.0, 1.0)
        R = tf.quat_to_rotmat(jnp.asarray(q))
        q2 = tf.rotmat_to_quat(R)
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_rodrigues_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation
        v = rng.normal(size=(20, 3)).astype(np.float32)
        R = tf.rodrigues(jnp.asarray(v))
        R_ref = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-4)

    def test_rodrigues_guarded_small_angle_smooth(self):
        g = jax.grad(lambda v: tf.rodrigues_guarded(v)[0, 1].sum())(jnp.zeros(3))
        assert np.all(np.isfinite(g))

    def test_build_covariance_isotropic(self):
        s = jnp.array([[2.0, 2.0, 2.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = tf.build_covariance(s, q)
        np.testing.assert_allclose(cov[0], [4, 0, 0, 4, 0, 4], atol=1e-5)

    def test_build_covariance_rotation_invariance_of_eigs(self, rng):
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(10, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
        cov = tf.unpack_cov3d(tf.build_covariance(s, q))
        eigs = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
        np.testing.assert_allclose(eigs, np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-4)

    def test_covariance_transform_foldin(self, rng):
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        A = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
        cov_t = tf.unpack_cov3d(tf.build_covariance(s, q, transform=A))
        cov = tf.unpack_cov3d(tf.build_covariance(s, q))
        expect = A @ cov @ jnp.swapaxes(A, -1, -2)
        np.testing.assert_allclose(cov_t, expect, rtol=1e-4, atol=1e-5)


class TestProjection:
    def test_center_point_projects_to_principal_point(self):
        cam = make_camera()
        pts = jnp.array([[0.0, 0.0, 2.0]])
        depth, p_proj = project_points(pts, cam.world_view, cam.full_proj)
        np.testing.assert_allclose(depth[0], 2.0, rtol=1e-5)
        # ndc (0,0) -> pixel ((W-1)/2, (H-1)/2)
        px = (p_proj[0, 0] + 1) * cam.width / 2 - 0.5
        np.testing.assert_allclose(px, (cam.width - 1) / 2, atol=1e-4)

    def test_pixel_shift_matches_focal(self):
        cam = make_camera(fx=100.0)
        # point offset x by z/fx => 1 pixel
        d, p = project_points(jnp.array([[2.0 / 100.0, 0.0, 2.0]]), cam.world_view, cam.full_proj)
        px = ((p[0, 0] + 1) * cam.width - 1) * 0.5
        np.testing.assert_allclose(px, (cam.width - 1) / 2 + 1.0, atol=1e-3)

    def test_ewa_isotropic_small_gaussian(self):
        """A tiny isotropic Gaussian at depth z: cov2d ~ (f*s/z)^2 I + 0.3 I."""
        cam = make_camera(fx=100.0, fy=100.0)
        s = 0.01
        cov3d = tf.build_covariance(jnp.array([[s, s, s]]), jnp.array([[1.0, 0, 0, 0]]))
        cov2d = ewa_cov2d(
            jnp.array([[0.0, 0.0, 2.0]]), cov3d, cam.world_view,
            cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy,
        )
        expect = (100.0 * s / 2.0) ** 2
        np.testing.assert_allclose(cov2d[0, 0], expect + 0.3, rtol=1e-4)
        np.testing.assert_allclose(cov2d[0, 2], expect + 0.3, rtol=1e-4)
        np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-6)

    def test_conic_radius(self):
        cov2d = jnp.array([[4.0, 0.0, 1.0]])
        conic, radius, det = conic_and_radius(cov2d)
        np.testing.assert_allclose(det[0], 4.0, rtol=1e-6)
        np.testing.assert_allclose(conic[0], [0.25, 0.0, 1.0], rtol=1e-6)
        np.testing.assert_allclose(radius[0], np.ceil(3 * 2.0), rtol=1e-6)

    def test_near_cull(self):
        cam = make_camera()
        pts = jnp.array([[0.0, 0.0, 0.1], [0.0, 0.0, 2.0]])
        cov3d = tf.build_covariance(
            jnp.full((2, 3), 0.05), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
        )
        proj = preprocess(
            pts, cov3d, jnp.ones((2, 3)), jnp.full((2,), 0.9), cam
        )
        assert not bool(proj.valid[0])  # z=0.1 <= 0.2 near plane
        assert bool(proj.valid[1])


class TestCameraJSON:
    def test_camera_to_json_roundtrip(self):
        from moss_tpu.render.camera import camera_to_json, world_to_view

        rng = np.random.default_rng(3)
        # random proper rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        R = q * np.sign(np.linalg.det(q))
        T = rng.normal(size=3)
        K = np.array([[120.0, 0, 32], [0, 130.0, 24], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, R, T, 48, 64)
        entry = camera_to_json(7, cam, "frame_0007")

        assert entry["id"] == 7 and entry["img_name"] == "frame_0007"
        assert entry["width"] == 64 and entry["height"] == 48
        np.testing.assert_allclose(entry["fx"], 120.0, rtol=1e-6)
        np.testing.assert_allclose(entry["fy"], 130.0, rtol=1e-6)
        # position must equal the camera center the renderer uses
        np.testing.assert_allclose(
            entry["position"], np.asarray(cam.cam_center), rtol=1e-4, atol=1e-5
        )
        # rotation/position invert back to the W2V the camera was built from
        c2w = np.eye(4)
        c2w[:3, :3] = np.asarray(entry["rotation"])
        c2w[:3, 3] = entry["position"]
        np.testing.assert_allclose(
            np.linalg.inv(c2w), world_to_view(R, T), rtol=1e-5, atol=1e-6
        )

    def test_dump_cameras_json(self, tmp_path):
        import json

        from moss_tpu.render.camera import dump_cameras_json

        cams = [make_camera(), make_camera(fx=90.0)]
        path = str(tmp_path / "cameras.json")
        dump_cameras_json(path, cams, img_names=["a", "b"])
        data = json.load(open(path))
        assert [e["img_name"] for e in data] == ["a", "b"]
        assert [e["id"] for e in data] == [0, 1]
