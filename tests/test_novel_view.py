"""Novel-view (free-viewpoint) orbit camera parity — the REFERENCE'S OWN
CODE as oracle.

Pins `moss_tpu.render.novel_view` against the genuine
`get_camera_extrinsics_zju_mocap_refine`
(/root/reference/scene/dataset_readers.py:509-538) and
`get_camera_extrinsics_monocap` (:268-297), imported with CUDA-only deps
stubbed (the test_deform_parity.py / test_mlps_parity.py pattern — public
untrusted content: we execute its *camera math*, nothing else), plus the
OpenGL->COLMAP axis flip the readers pre-multiply (diag(1,-1,-1,1), :628 ZJU
/ :375 MonoCap). Executing the reference rather than transcribing it means a
shared misreading cannot self-verify.
"""
import dataclasses
import sys
import types

import numpy as np
import pytest

from moss_tpu.render.novel_view import (
    novel_view_specs,
    orbit_w2c_monocap,
    orbit_w2c_zju,
)


def _import_reference_dataset_readers():
    for name in [
        "open3d", "knn_cuda", "pytorch3d", "pytorch3d.transforms",
        "simple_knn", "simple_knn._C", "plyfile",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["knn_cuda"].KNN = lambda k=1, transpose_mode=True: None
    sys.modules["pytorch3d.transforms"].matrix_to_quaternion = None
    sys.modules["pytorch3d"].transforms = sys.modules["pytorch3d.transforms"]
    sys.modules["simple_knn._C"].distCUDA2 = None
    sys.modules["simple_knn"]._C = sys.modules["simple_knn._C"]
    if not hasattr(sys.modules["plyfile"], "PlyData"):
        sys.modules["plyfile"].PlyData = None
        sys.modules["plyfile"].PlyElement = None
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import scene.dataset_readers as dr
    return dr


_dr = _import_reference_dataset_readers()

# the flip both readers pre-multiply onto the val extrinsics
# (dataset_readers.py:628 ZJU, :375 MonoCap)
_FLIP = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]],
                 np.float64)


def _ref_zju_w2c(view_index, camera_view_num=36):
    ext = _dr.get_camera_extrinsics_zju_mocap_refine(
        view_index, val=True, camera_view_num=camera_view_num)
    return np.matmul(_FLIP, ext)


def _ref_monocap_w2c(view_index, camera_view_num=36):
    ext = _dr.get_camera_extrinsics_monocap(
        view_index, val=True, camera_view_num=camera_view_num)
    return np.matmul(_FLIP, ext)


# --- parity -----------------------------------------------------------------

@pytest.mark.parametrize("idx", [0, 1, 7, 17, 35])
def test_zju_orbit_matches_reference(idx):
    np.testing.assert_allclose(
        orbit_w2c_zju(idx), _ref_zju_w2c(idx), atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1, 9, 20, 35])
def test_monocap_orbit_matches_reference(idx):
    np.testing.assert_allclose(
        orbit_w2c_monocap(idx), _ref_monocap_w2c(idx), atol=1e-6)


@pytest.mark.parametrize("name,fn", [("zju", orbit_w2c_zju),
                                     ("monocap", orbit_w2c_monocap)])
def test_orbit_is_rigid_and_fixed_radius(name, fn):
    """Every w2c is a valid rigid transform and the eye stays on the orbit
    circle (radius 2 about (0,0,-0.8) ZJU / radius 3 about (0,0.8,0) MonoCap
    — dataset_readers.py:527,283)."""
    center = {"zju": np.array([0, 0, -0.8]), "monocap": np.array([0, 0.8, 0])}
    radius = {"zju": 2.0, "monocap": 3.0}
    for idx in range(0, 36, 5):
        w2c = fn(idx)
        R, t = w2c[:3, :3], w2c[:3, 3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5
        eye = -R.T @ t  # camera center in world coords
        assert abs(np.linalg.norm(eye - center[name]) - radius[name]) < 1e-4


def test_distinct_views_distinct_cameras():
    views = [orbit_w2c_zju(i) for i in range(8)]
    for i in range(len(views) - 1):
        assert np.abs(views[i] - views[i + 1]).max() > 1e-3


# --- spec grafting ----------------------------------------------------------

def _dummy_spec(pose_id):
    from moss_tpu.data.readers import FrameSpec

    return FrameSpec(
        image_path=f"img_{pose_id}.jpg", mask_path=f"msk_{pose_id}.png",
        K=np.diag([500.0, 500.0, 1.0]), D=np.zeros(5),
        R_w2c=np.eye(3), T_w2c=np.zeros((3, 1)),
        smpl_param={"poses": np.zeros((1, 72)), "shapes": np.zeros((1, 10)),
                    "R": np.eye(3, dtype=np.float32),
                    "Th": np.zeros((1, 3), np.float32)},
        world_bound=np.array([[-1, -1, -1], [1, 1, 1]], np.float32),
        pose_id=pose_id, image_scaling=0.5, white_background=False,
    )


def test_novel_view_specs_grafting():
    """One spec per (pose, orbit view); per the reference (view_index=0
    substitution, dataset_readers.py:606-636) each orbit frame keeps the
    pose's K/SMPL/paths, replaces R|T with the orbit extrinsics, and skips
    undistortion (D=None)."""
    specs = [_dummy_spec(0), _dummy_spec(0), _dummy_spec(3)]
    out = novel_view_specs(specs, dataset="zju", n_views=4)
    assert len(out) == 2 * 4  # 2 distinct poses x 4 views
    for i, s in enumerate(out):
        v = i % 4
        expect = orbit_w2c_zju(v)
        np.testing.assert_allclose(s.R_w2c, expect[:3, :3], atol=1e-6)
        np.testing.assert_allclose(s.T_w2c, expect[:3, 3:4], atol=1e-6)
        assert s.D is None
        assert s.K[0, 0] == 500.0
    assert [s.pose_id for s in out] == [0] * 4 + [3] * 4
    # the first spec of each pose supplies the base (reference reuses view 0)
    assert out[0].image_path == "img_0.jpg"
    assert out[4].image_path == "img_3.jpg"


def test_orbit_cameras_see_the_subject():
    """Render a blob of Gaussians parked at each dataset's orbit center
    through cameras built from the orbit extrinsics: every view must put the
    subject in frame (nonzero alpha, roughly centered) — catches any
    axis-flip/translation misreading that the pure matrix parity cannot."""
    import jax.numpy as jnp

    from moss_tpu.ops import transforms as tf
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops.rasterize_ref import rasterize_reference
    from moss_tpu.render.camera import Camera

    rng = np.random.default_rng(2)
    H = W = 64
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1.0]])
    n = 80
    for name, fn, center in [
        ("zju", orbit_w2c_zju, np.array([0, 0, -0.8])),
        ("monocap", orbit_w2c_monocap, np.array([0, 0.8, 0])),
    ]:
        pts = (rng.normal(0, 0.12, (n, 3)) + center).astype(np.float32)
        cov3d = tf.build_covariance(
            jnp.full((n, 3), 0.05, jnp.float32),
            jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
        for idx in (0, 9, 23):
            w2c = fn(idx)
            # FrameSpec stores R_w2c/T_w2c and builds Camera.from_KRT with
            # R.T (readers.py:200 — reference stores R transposed); mirror it
            cam = Camera.from_KRT(K, w2c[:3, :3].T, w2c[:3, 3], H, W)
            proj = preprocess(
                jnp.asarray(pts), cov3d, jnp.zeros((n, 3), jnp.float32),
                jnp.full((n,), 0.9, jnp.float32), cam)
            out = rasterize_reference(proj, jnp.zeros(3), H, W)
            alpha = np.asarray(out["alpha"])
            assert alpha.max() > 0.5, (name, idx, "subject not visible")
            ys, xs = np.nonzero(alpha > 0.1)
            cy, cx = ys.mean(), xs.mean()
            assert abs(cy - H / 2) < H * 0.25 and abs(cx - W / 2) < W * 0.25, (
                name, idx, "subject far off-center", cy, cx)


def test_full_orbit_spacing_with_matching_divisor():
    """r3 review finding: the render drivers pass camera_view_num = n_views
    so --novel_view N means N views EVENLY SPACED OVER THE FULL ORBIT.
    With the divisor left at the reference's fixed 36, N > 36 wraps mod 2pi
    into bit-identical duplicate views and N < 36 covers only a partial arc.
    Pin both properties at the specs level."""
    specs = [_dummy_spec(0)]
    # matching divisor: 4 views, consecutive pairs 90 degrees apart, all
    # distinct, and view v of 4 equals view 9v of the 36-circle (same angle)
    out = novel_view_specs(specs, dataset="zju", n_views=4, camera_view_num=4)
    assert len(out) == 4
    for v in range(4):
        np.testing.assert_allclose(
            out[v].R_w2c, orbit_w2c_zju(9 * v, 36)[:3, :3], atol=1e-5)
    for v in range(1, 4):
        assert np.abs(out[v].R_w2c - out[0].R_w2c).max() > 1e-3
    # the bug shape: divisor fixed at 36 with n_views=40 duplicates view 36+k
    dup = novel_view_specs(specs, dataset="zju", n_views=40,
                           camera_view_num=36)
    np.testing.assert_allclose(dup[36].R_w2c, dup[0].R_w2c, atol=1e-6)
    # full-orbit semantics: 40 views over the whole circle, none duplicated
    full = novel_view_specs(specs, dataset="zju", n_views=40,
                            camera_view_num=40)
    for v in range(1, 40):
        assert np.abs(full[v].R_w2c - full[0].R_w2c).max() > 1e-4
