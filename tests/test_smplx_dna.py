"""SMPL-X (J=55) deform-chain tests + DNA-Rendering SMC fixture tests.

The reference's third dataset path (readCamerasDNARendering,
/root/reference/scene/dataset_readers.py:744-994) drives SMPL-X bodies
(smplx/body_models.py:1118: 55 joints, 165-dim full_pose, betas++expression
shapes) from .smc HDF5 captures. These tests exercise that path end-to-end on
synthetic fixtures, the same way ZJU/MonoCap are covered in test_readers.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from moss_tpu.models import smpl as S
from moss_tpu.models.deform import apply_cached_transform, coarse_deform_c2source


@pytest.fixture(scope="module")
def model():
    return S.synthetic_smplx(n_verts=500)


class TestSMPLX55:
    def test_rig_shape(self, model):
        assert model.num_joints == 55
        assert len(S.SMPLX_PARENTS) == 55
        # a valid forward-ordered tree rooted at 0
        assert S.SMPLX_PARENTS[0] == -1
        assert all(0 <= S.SMPLX_PARENTS[j] < j for j in range(1, 55))
        assert model.posedirs.shape[-1] == 9 * 54
        assert model.shapedirs.shape[-1] == 20

    def test_zero_pose_zero_shape_is_template(self, model):
        v, _ = S.lbs_vertices(model, jnp.zeros(165), jnp.zeros(20))
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(model.v_template), atol=1e-5
        )

    def test_big_pose_smplx_layout(self):
        big = S.big_pose_params_smplx()
        assert big["poses"].shape == (1, 165)
        assert big["shapes"].shape == (1, 20)
        p = np.asarray(big["poses"])[0]
        # same four body angles as SMPL's big pose (dataset_readers.py:769-785)
        np.testing.assert_allclose(p[5], np.deg2rad(45.0))
        np.testing.assert_allclose(p[8], np.deg2rad(-45.0))
        np.testing.assert_allclose(p[23], np.deg2rad(-30.0))
        np.testing.assert_allclose(p[26], np.deg2rad(30.0))
        assert np.count_nonzero(p) == 4

    def test_hand_pose_moves_hand_vertices_only(self, model, rng):
        """A right-hand finger rotation must move only vertices skinned to the
        right-hand subtree — the J=55 chain is really articulated, not a
        24-joint chain with padding."""
        v0, _ = S.lbs_vertices(model, jnp.zeros(165), jnp.zeros(20))
        pose = np.zeros(165, np.float32)
        pose[3 * 40: 3 * 40 + 3] = [0.0, 0.0, 1.2]  # right_index1 (joint 40)
        v1, _ = S.lbs_vertices(model, jnp.asarray(pose), jnp.zeros(20))
        moved = np.linalg.norm(np.asarray(v1) - np.asarray(v0), axis=-1)
        w = np.asarray(model.weights)
        # subtree of joint 40: 40 and its descendants (41, 42 by parents)
        sub = [j for j in range(55) if j in (40,) or S.SMPLX_PARENTS[j] in (40, 41)]
        w_sub = w[:, sub].sum(-1)
        i_hand, i_far = int(w_sub.argmax()), int(w_sub.argmin())
        assert moved[i_hand] > 1e-3
        assert moved[i_far] < 0.2 * moved[i_hand]

    def test_big_to_target_roundtrip_on_vertices(self, model, rng):
        """J=55 deform chain golden: deforming big-pose vertices to a target
        165-dim pose == direct LBS of that pose (the same invariant the J=24
        chain is pinned by in test_smpl_deform)."""
        from scipy.spatial.transform import Rotation

        big = S.big_pose_params_smplx()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        Rw = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix().astype(np.float32)
        Th = np.array([[0.2, 0.1, -0.3]], np.float32)
        pose_t = rng.normal(0, 0.2, 165).astype(np.float32)
        shapes_t = rng.normal(0, 0.5, 20).astype(np.float32)
        target = {
            "poses": jnp.asarray(pose_t)[None],
            "shapes": jnp.asarray(shapes_t)[None],
            "R": jnp.asarray(Rw),
            "Th": jnp.asarray(Th),
        }
        out = coarse_deform_c2source(model, v_big, target, big, v_big)
        v_target, _ = S.lbs_vertices(model, jnp.asarray(pose_t), jnp.asarray(shapes_t))
        expect_world = np.asarray(v_target) @ np.linalg.inv(np.asarray(Rw)) + Th
        np.testing.assert_allclose(np.asarray(out.smpl_pts), np.asarray(v_target), atol=3e-3)
        np.testing.assert_allclose(np.asarray(out.world_pts), expect_world, atol=3e-3)
        # cached-transform eval path at J=55
        re_applied = apply_cached_transform(v_big, out.transforms, out.translation)
        np.testing.assert_allclose(
            np.asarray(re_applied), np.asarray(out.world_pts), atol=1e-4
        )

    def test_render_frame_smplx_end_to_end(self, model, rng):
        """Full render through the J=55 scene (motion_offset=False — the
        correction MLPs are 23-joint SMPL modules, matching the reference
        where only SMPL datasets train them)."""
        from moss_tpu.models.gaussians import create_from_points
        from moss_tpu.render.camera import Camera
        from moss_tpu.render.render import SceneContext, render_frame

        big = S.big_pose_params_smplx()
        v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
        scene = SceneContext(smpl=model, big_pose_params=big,
                             big_pose_vertices=v_big)
        pts = np.asarray(v_big)[::2]
        params, gstate = create_from_points(
            pts, rng.uniform(size=(pts.shape[0], 3)).astype(np.float32),
            capacity=256, sh_degree=1,
        )
        K = np.array([[60.0, 0, 32], [0, 60.0, 16], [0, 0, 1.0]])
        cam = Camera.from_KRT(K, np.eye(3), np.array([0, 0, 2.0]), 32, 64)
        sp = {
            "poses": jnp.asarray(rng.normal(0, 0.2, 165).astype(np.float32))[None],
            "shapes": jnp.zeros((1, 20)),
            "R": jnp.eye(3),
            "Th": jnp.zeros((1, 3)),
        }
        out = render_frame(params, gstate.valid, None, scene, sp, cam,
                           jnp.zeros(3), sh_degree=1, motion_offset=False)
        assert out["render"].shape == (32, 64, 3)
        assert bool(jnp.isfinite(out["render"]).all())
        assert out["pose_out"] is None            # no 23-joint SMPL MLPs
        assert out["lbs_weights"].shape == (256, 55)  # J=55 blend weights


# ---------------------------------------------------------------------------
def _write_smc_fixture(root, n_frames=100, H=64, W=64,
                       views=(24, 25, 26, 27, 28)):
    """Minimal DNA-Rendering capture pair: <x>_main.smc with JPEG color
    frames + <x>_annotations_annots.smc with calibration, masks and the
    per-frame SMPL-X block (the exact groups data/smc.py reads)."""
    rng = np.random.default_rng(7)
    main_path = os.path.join(root, "0007_01_main.smc")
    annot_path = os.path.join(root, "0007_01_annotations_annots.smc")

    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    msk = np.zeros((H, W, 3), np.uint8)
    msk[8:56, 8:56] = 255
    ok, png = cv2.imencode(".png", msk)
    assert ok

    with h5py.File(main_path, "w") as f:
        for v in views:
            g = f.create_group(f"Camera_5mp/{v}/color")
            g.create_dataset("0", data=np.frombuffer(jpg.tobytes(), np.uint8))

    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1.0]])
    c2w = np.eye(4)
    c2w[2, 3] = -2.0  # camera 2m in front, looking +z at the body at origin
    with h5py.File(annot_path, "w") as f:
        for v in views:
            g = f.create_group(f"Camera_Parameter/{v:02d}")
            g.create_dataset("K", data=K)
            g.create_dataset("D", data=np.zeros(5))
            g.create_dataset("RT", data=c2w)
            g.create_dataset("Color_Calibration", data=np.eye(3))
            m = f.create_group(f"Mask/{v}/mask")
            m.create_dataset("0", data=np.frombuffer(png.tobytes(), np.uint8))
        sx = f.create_group("SMPLx")
        sx.create_dataset("betas", data=rng.normal(0, 0.3, (n_frames, 10)).astype(np.float32))
        sx.create_dataset("expression", data=rng.normal(0, 0.1, (n_frames, 10)).astype(np.float32))
        sx.create_dataset("fullpose", data=rng.normal(0, 0.15, (n_frames, 165)).astype(np.float32))
        sx.create_dataset("transl", data=rng.normal(0, 0.05, (n_frames, 3)).astype(np.float32))
        sx.create_dataset("scale", data=np.float32(1.0))
    return main_path


class TestDNAReader:
    def test_smc_reader_contract(self, tmp_path):
        from moss_tpu.data.smc import SMCReader

        main = _write_smc_fixture(str(tmp_path), n_frames=4)
        annot = main.replace("main", "annotations").split(".")[0] + "_annots.smc"
        r = SMCReader(annot)
        cal = r.get_Calibration(26)
        assert cal["K"].shape == (3, 3) and cal["RT"].shape == (4, 4)
        sp = r.get_SMPLx(2)
        assert sp["fullpose"].shape == (165,)
        assert sp["betas"].shape == (10,) and sp["expression"].shape == (10,)
        mask = r.get_mask(26, 0)
        assert mask.shape == (64, 64) and mask.max() == 255
        r.release()
        m = SMCReader(main)
        img = m.get_img("Camera_5mp", 26, "color", 0)
        assert img.shape == (64, 64, 3)
        m.release()

    def test_read_dna_rendering_splits_and_frame(self, tmp_path):
        from moss_tpu.data.dna import read_dna_rendering

        main = _write_smc_fixture(str(tmp_path), n_frames=100)
        scene, specs = read_dna_rendering(main, split="train")
        assert len(specs) == 100          # 100 poses x train view [26]
        assert scene.smpl.num_joints == 55
        assert scene.big_pose_params["poses"].shape == (1, 165)

        _, specs_t = read_dna_rendering(main, split="test")
        assert len(specs_t) == 20 * 4     # 20 poses x views [24,25,27,28]

        frame = specs[0].load((32, 32))
        assert frame.image.shape == (32, 32, 3)  # 0.5x of the 64px capture
        assert frame.poses.shape == (1, 165)
        assert frame.shapes.shape == (1, 20)     # betas ++ expression
        assert frame.pose_rotmats.shape == (164 // 3, 3, 3)  # 54 non-root
        assert float(frame.bound_mask.sum()) > 0
        assert frame.camera.height == 32 and frame.camera.width == 32

    def test_dna_frame_trains_one_step(self, tmp_path):
        """The DNA frame contract feeds the trainer: one step on a J=55 scene
        (motion_offset off) runs and produces finite loss/grads."""
        from moss_tpu.config import Config, ModelConfig
        from moss_tpu.data.dna import read_dna_rendering
        from moss_tpu.ops.rasterize_tpu import rasterize_tpu
        from moss_tpu.train.train_step import TrainState, make_train_step
        from moss_tpu.train.trainer import init_gaussians_and_mlps

        main = _write_smc_fixture(str(tmp_path), n_frames=2)
        scene, specs = read_dna_rendering(main, split="train")
        frame = specs[0].load((32, 32))
        cfg = Config(model=ModelConfig(
            sh_degree=1, capacity=256, n_init_points=200,
            smpl_type="smplx", motion_offset=False,
        ))
        params, gstate, mlps = init_gaussians_and_mlps(
            scene, cfg, jax.random.PRNGKey(0))
        assert mlps is None
        p = {"gauss": params}
        init_fn, step_fn = make_train_step(scene, cfg, rasterize_tpu, None, 32, 32)
        ts = TrainState(p, init_fn(p), gstate, jnp.asarray(0, jnp.int32))
        ts1, logs = step_fn(ts, frame, 1)
        assert np.isfinite(float(logs["loss"]))
        assert bool(jnp.isfinite(ts1.params["gauss"].xyz).all())
