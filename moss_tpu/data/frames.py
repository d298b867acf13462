"""Frame pytree: everything the train step needs for one camera view.

The TPU-native counterpart of the reference Camera object
(/root/reference/scene/cameras.py:17-72), which carries the image, masks and
SMPL params to the GPU per view. Here a Frame is a flat pytree of arrays with
a static-shape camera, so frames can be stacked, prefetched, and fed through
jit — replacing the reference's eager, GPU-resident list of Camera modules
(SURVEY.md §3.5).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax

from ..render.camera import Camera


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    camera: Camera
    image: Any          # (H, W, 3) float32 in [0, 1]
    bkgd_mask: Any      # (H, W) float32 soft foreground mask
    bound_mask: Any     # (H, W) float32 0/1 bound region
    poses: Any          # (1, 72) axis-angle SMPL pose
    shapes: Any         # (1, 10)
    R: Any              # (3, 3) global rotation
    Th: Any             # (1, 3) global translation
    pose_rotmats: Any   # (23, 3, 3) target rotations for the Fisher NLL
    crop_y0: Any        # () int32 — static-size crop window top-left
    crop_x0: Any        # () int32
    pose_id: Any        # () int32

    @property
    def smpl_params(self):
        return {"poses": self.poses, "shapes": self.shapes, "R": self.R, "Th": self.Th}
