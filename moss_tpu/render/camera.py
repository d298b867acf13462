"""Camera model as a JAX pytree.

Mirrors the semantics of the reference Camera
(/root/reference/scene/cameras.py:17-72) and its projection-matrix builder
getProjectionMatrix_refine (/root/reference/utils/graphics_utils.py:83-103),
but holds plain jnp arrays with static image dims so the whole struct can be
passed through jit. Row-vector convention throughout, matching the reference:

    x_view_h = [x, 1] @ world_view          (world_view = W2V^T)
    x_clip_h = [x, 1] @ full_proj           (full_proj  = world_view @ proj)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def projection_matrix_from_K(K, H, W, znear=0.001, zfar=1000.0):
    """Intrinsics K -> OpenGL-style projection (math convention, not transposed).

    Same element layout as the reference getProjectionMatrix_refine
    (graphics_utils.py:83-103): NDC x = (2 fx X + 2 s Y)/(W Z) + (2 cx/W - 1) etc.
    """
    K = np.asarray(K, np.float64)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    P = np.zeros((4, 4), np.float64)
    P[0, 0] = 2 * fx / W
    P[0, 1] = 2 * s / W
    P[0, 2] = -1 + 2 * (cx / W)
    P[1, 1] = 2 * fy / H
    P[1, 2] = -1 + 2 * (cy / H)
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -2 * zfar * znear / (zfar - znear)
    P[3, 2] = 1.0
    return P


def world_to_view(R, T):
    """Rotation R (3,3, world->cam as in dataset extrinsics, stored transposed like
    the reference) and translation T (3,) -> 4x4 W2V in math convention.

    The reference stores R already transposed in CameraInfo and does
    Rt[:3,:3] = R.T (graphics_utils.py:32-37); we accept the same inputs.
    """
    Rt = np.zeros((4, 4), np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(T)
    Rt[3, 3] = 1.0
    return Rt


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Differentiable-render camera. H/W are static (part of the jit cache key)."""

    world_view: Any  # (4,4) = W2V^T   (row-vector convention)
    full_proj: Any   # (4,4) = world_view @ proj^T
    cam_center: Any  # (3,)
    tan_fovx: Any    # scalar
    tan_fovy: Any    # scalar
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_KRT(K, R, T, H: int, W: int, znear=0.001, zfar=1000.0) -> "Camera":
        K = np.asarray(K, np.float64)
        W2V = world_to_view(R, T)
        proj = projection_matrix_from_K(K, H, W, znear, zfar)
        world_view = W2V.T
        full_proj = world_view @ proj.T
        cam_center = np.linalg.inv(world_view)[3, :3]
        tan_fovx = W / (2.0 * K[0, 0])
        tan_fovy = H / (2.0 * K[1, 1])
        return Camera(
            world_view=jnp.asarray(world_view, jnp.float32),
            full_proj=jnp.asarray(full_proj, jnp.float32),
            cam_center=jnp.asarray(cam_center, jnp.float32),
            tan_fovx=jnp.asarray(tan_fovx, jnp.float32),
            tan_fovy=jnp.asarray(tan_fovy, jnp.float32),
            height=int(H),
            width=int(W),
        )

    @staticmethod
    def from_viewer_spec(spec: dict) -> "Camera":
        """Build a Camera from a SIBR remote-viewer message
        (train/network_gui.NetworkGUI.receive): the viewer ships the
        row-vector world_view and full_proj matrices directly, matching the
        reference's MiniCam construction (its network_gui.py:70-84)."""
        wv = np.asarray(spec["world_view_transform"], np.float64).reshape(4, 4)
        fp = np.asarray(spec["full_proj_transform"], np.float64).reshape(4, 4)
        cam_center = np.linalg.inv(wv)[3, :3]
        return Camera(
            world_view=jnp.asarray(wv, jnp.float32),
            full_proj=jnp.asarray(fp, jnp.float32),
            cam_center=jnp.asarray(cam_center, jnp.float32),
            tan_fovx=jnp.asarray(np.tan(spec["fovx"] * 0.5), jnp.float32),
            tan_fovy=jnp.asarray(np.tan(spec["fovy"] * 0.5), jnp.float32),
            height=int(spec["height"]),
            width=int(spec["width"]),
        )

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def camera_to_json(cam_id: int, cam: "Camera", img_name: str = "") -> dict:
    """Serialize a camera in the SIBR-viewer cameras.json entry format
    (reference utils/camera_utils.py:77-99): camera-to-world position and
    rotation rows plus pixel focal lengths."""
    w2v = np.asarray(cam.world_view, np.float64).T
    c2w = np.linalg.inv(w2v)
    return {
        "id": int(cam_id),
        "img_name": str(img_name),
        "width": int(cam.width),
        "height": int(cam.height),
        "position": c2w[:3, 3].tolist(),
        "rotation": [row.tolist() for row in c2w[:3, :3]],
        "fy": float(cam.focal_y),
        "fx": float(cam.focal_x),
    }


def dump_cameras_json(path: str, cameras, img_names=None) -> None:
    """Write the cameras.json dump the reference Scene produces on a fresh
    run (scene/__init__.py:62-71) for external viewers."""
    import json
    import os

    names = img_names if img_names is not None else ["" for _ in cameras]
    entries = [
        camera_to_json(i, c, n) for i, (c, n) in enumerate(zip(cameras, names))
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(entries, f)
