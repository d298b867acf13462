"""COLMAP reader tests: binary/text format parity, scene assembly, extent.

Covers the reference's colmap_loader.py (binary readers :15-243, text readers
:83-124,156-178,244-270) and getNerfppNorm (dataset_readers.py:54-75).
"""
import os

import numpy as np
import pytest

from moss_tpu.data import colmap as C


def _make_model(tmp_path, binary=True):
    rng = np.random.default_rng(7)
    cams = {
        1: C.ColmapCamera(1, "PINHOLE", 64, 48,
                          np.array([70.0, 72.0, 32.0, 24.0])),
    }
    images = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = C.ColmapImage(i, q, rng.normal(size=3), 1, f"im_{i}.png")
    xyz = rng.normal(size=(5, 3)).astype(np.float32)
    rgb_u8 = rng.integers(0, 256, size=(5, 3)).astype(np.uint8)

    sparse = os.path.join(tmp_path, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    if binary:
        C.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
        C.write_images_binary(os.path.join(sparse, "images.bin"), images)
        C.write_points3d_binary(os.path.join(sparse, "points3D.bin"), xyz, rgb_u8)
    else:
        with open(os.path.join(sparse, "cameras.txt"), "w") as f:
            f.write("# Camera list\n")
            for c in cams.values():
                p = " ".join(str(x) for x in c.params)
                f.write(f"{c.id} {c.model} {c.width} {c.height} {p}\n")
        with open(os.path.join(sparse, "images.txt"), "w") as f:
            f.write("# Image list: two lines per image\n")
            for im in images.values():
                q = " ".join(f"{x:.17g}" for x in im.qvec)
                t = " ".join(f"{x:.17g}" for x in im.tvec)
                f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
                f.write("0.0 0.0 -1\n")  # 2D points line (skipped)
        with open(os.path.join(sparse, "points3D.txt"), "w") as f:
            f.write("# 3D point list\n")
            for j in range(len(xyz)):
                x, y, z = (f"{v:.9g}" for v in xyz[j])
                r, g, b = (int(v) for v in rgb_u8[j])
                f.write(f"{j} {x} {y} {z} {r} {g} {b} 0.5 1 2\n")
    return cams, images, xyz, rgb_u8


def test_text_binary_parity(tmp_path):
    """The text model parses to the same scene as the binary model."""
    bdir = tmp_path / "bin"
    tdir = tmp_path / "txt"
    _make_model(str(bdir), binary=True)
    _make_model(str(tdir), binary=False)
    spec_b, xyz_b, rgb_b = C.read_colmap_scene(str(bdir))
    spec_t, xyz_t, rgb_t = C.read_colmap_scene(str(tdir))
    np.testing.assert_allclose(xyz_b, xyz_t, atol=1e-6)
    np.testing.assert_allclose(rgb_b, rgb_t, atol=1e-6)
    assert len(spec_b) == len(spec_t) == 3
    for sb, st in zip(spec_b, spec_t):
        np.testing.assert_allclose(sb["K"], st["K"], atol=1e-9)
        np.testing.assert_allclose(sb["R_w2c"], st["R_w2c"], atol=1e-12)
        np.testing.assert_allclose(sb["T_w2c"], st["T_w2c"], atol=1e-12)
        assert sb["name"] == st["name"]
        assert (sb["width"], sb["height"]) == (st["width"], st["height"])


def test_points3d_text_empty(tmp_path):
    p = tmp_path / "points3D.txt"
    p.write_text("# only comments\n")
    xyz, rgb = C.read_points3d_text(str(p))
    assert xyz.shape == (0, 3) and rgb.shape == (0, 3)


def test_nerfpp_norm_golden():
    """getNerfppNorm semantics: radius = 1.1 * max ||center - mean||,
    translate = -mean, with centers = -R^T T (hand-computed golden)."""
    R = np.eye(3)
    specs = [
        {"R_w2c": R, "T_w2c": np.array([1.0, 0, 0]).reshape(3, 1)},
        {"R_w2c": R, "T_w2c": np.array([-1.0, 0, 0]).reshape(3, 1)},
        {"R_w2c": R, "T_w2c": np.array([0, 2.0, 0]).reshape(3, 1)},
    ]
    # centers: (-1,0,0), (1,0,0), (0,-2,0); mean = (0,-2/3,0)
    out = C.nerfpp_norm(specs)
    mean = np.array([0, -2.0 / 3.0, 0])
    np.testing.assert_allclose(out["translate"], -mean, atol=1e-12)
    dists = [np.linalg.norm(c - mean) for c in
             [np.array([-1.0, 0, 0]), np.array([1.0, 0, 0]), np.array([0, -2.0, 0])]]
    np.testing.assert_allclose(out["radius"], 1.1 * max(dists), rtol=1e-12)


def test_nerfpp_norm_nontrivial_rotation():
    """Center recovery through a non-identity w2c rotation."""
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    c_true = np.array([3.0, -1.0, 2.0])
    T = (-R @ c_true).reshape(3, 1)
    out = C.nerfpp_norm([{"R_w2c": R, "T_w2c": T},
                         {"R_w2c": np.eye(3), "T_w2c": np.zeros((3, 1))}])
    mean = (c_true + 0.0) / 2.0
    np.testing.assert_allclose(out["translate"], -mean, atol=1e-9)


def test_blender_reader(tmp_path):
    import json

    c2w = np.eye(4)
    c2w[:3, 3] = [0, 0, 3.0]
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "./train/r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    specs = C.read_blender_scene(str(tmp_path), "train")
    assert len(specs) == 1
    s = specs[0]
    assert s["fovx"] == 0.8
    # OpenGL->COLMAP flip then invert: R_w2c = diag(1,-1,-1), T = R @ -c
    np.testing.assert_allclose(s["R_w2c"], np.diag([1.0, -1.0, -1.0]), atol=1e-12)
    np.testing.assert_allclose(s["T_w2c"].reshape(3),
                               np.diag([1.0, -1.0, -1.0]) @ np.array([0, 0, -3.0]),
                               atol=1e-12)
