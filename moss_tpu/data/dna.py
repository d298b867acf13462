"""DNA-Rendering reader (SMPL-X path).

Re-implementation of readCamerasDNARendering / readDNARenderingInfo
(/root/reference/scene/dataset_readers.py:744-994): frames come from .smc
HDF5 captures (data/smc.py), bodies are SMPL-X (55 joints, full_pose 165,
shapes = betas ++ expression — models/smpl.py load_smplx_npz), train view
[26], test views [24,25,27,28], 100 poses stride 1 (train) / 20 poses
stride 5 (test) at 0.5x resolution.

Note on the world transform: DNA stores camera-to-world RT; the reader
inverts to world-to-camera (reference :851-858) and keeps the SMPL-X body in
world coordinates with R=I, Th=transl — the vertices used for the canonical
cloud and bounds are produced by the body model itself.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from ..models import smpl as S
from ..render.camera import Camera
from ..render.render import SceneContext
from .frames import Frame
from .readers import get_bound_2d_mask, pose_rotmats_np
from .smc import SMCReader

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass
class DNAFrameSpec:
    main_smc_path: str
    annot_smc_path: str
    camera_id: int
    frame_id: int
    image_scaling: float
    white_background: bool
    smpl_param: dict          # poses (1,165) / shapes (1,20) / R / Th
    world_bound: np.ndarray

    def load(self, crop_hw: Optional[Tuple[int, int]] = None) -> Frame:
        import jax.numpy as jnp

        main = SMCReader(self.main_smc_path)
        annots = SMCReader(self.annot_smc_path)
        try:
            image = main.get_img("Camera_5mp", self.camera_id, "color", self.frame_id)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            msk = annots.get_mask(self.camera_id, self.frame_id)
            msk = (np.asarray(msk) != 0).astype(np.float32)

            cal = annots.get_Calibration(self.camera_id)
            K = np.asarray(cal["K"], np.float64)
            D = np.asarray(cal["D"], np.float64)
            RT = np.asarray(cal["RT"], np.float64)  # camera-to-world
            image = cv2.undistort(image, K, D)
            msk = cv2.undistort(msk, K, D)
            image[msk == 0] = 1.0 if self.white_background else 0.0

            w2c = np.linalg.inv(
                np.vstack([RT[:3], [0, 0, 0, 1]]) if RT.shape[0] == 3 else RT
            )
            R_w2c = w2c[:3, :3]
            T_w2c = w2c[:3, 3:4]

            if self.image_scaling != 1.0:
                H = int(image.shape[0] * self.image_scaling)
                W = int(image.shape[1] * self.image_scaling)
                image = cv2.resize(image, (W, H), interpolation=cv2.INTER_AREA)
                msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
                K = K.copy()
                K[:2] = K[:2] * self.image_scaling
            H, W = image.shape[:2]

            w2c34 = np.concatenate([R_w2c, T_w2c], axis=1)
            bound_mask = get_bound_2d_mask(
                self.world_bound, K, w2c34, H, W
            ).astype(np.float32)

            ys, xs = np.nonzero(bound_mask)
            ch, cw = crop_hw if crop_hw else (H, W)
            if len(ys):
                y0 = int(np.clip((ys.min() + ys.max()) // 2 - ch // 2, 0, max(H - ch, 0)))
                x0 = int(np.clip((xs.min() + xs.max()) // 2 - cw // 2, 0, max(W - cw, 0)))
            else:
                y0 = x0 = 0

            camera = Camera.from_KRT(K, R_w2c.T, T_w2c[:, 0], H, W)
            sp = self.smpl_param
            # NLL targets: non-root rotations of the full pose
            from scipy.spatial.transform import Rotation

            rots = Rotation.from_rotvec(
                sp["poses"].reshape(-1, 3)[1:] + 1e-8
            ).as_matrix().astype(np.float32)
            return Frame(
                camera=camera,
                image=jnp.asarray(image),
                bkgd_mask=jnp.asarray(msk),
                bound_mask=jnp.asarray(bound_mask),
                poses=jnp.asarray(sp["poses"].reshape(1, -1)),
                shapes=jnp.asarray(sp["shapes"].reshape(1, -1)),
                R=jnp.asarray(sp["R"]),
                Th=jnp.asarray(sp["Th"].reshape(1, 3)),
                pose_rotmats=jnp.asarray(rots),
                crop_y0=jnp.asarray(y0, jnp.int32),
                crop_x0=jnp.asarray(x0, jnp.int32),
                pose_id=jnp.asarray(self.frame_id, jnp.int32),
            )
        finally:
            main.release()
            annots.release()


def read_dna_rendering(
    path: str,
    split: str = "train",
    white_background: bool = False,
    image_scaling: float = 0.5,
    smplx_path: Optional[str] = None,
) -> Tuple[SceneContext, List[DNAFrameSpec]]:
    """path: the *_main.smc capture file (reference passes the main smc)."""
    if split == "train":
        views, pose_start, pose_interval, pose_num = [26], 0, 1, 100
    else:
        views, pose_start, pose_interval, pose_num = [24, 25, 27, 28], 0, 5, 20

    annot_path = path.replace("main", "annotations").split(".")[0] + "_annots.smc"
    if smplx_path and os.path.exists(smplx_path):
        model = S.load_smplx_npz(smplx_path)
    else:
        # structurally-correct J=55 stand-in: the capture's fullpose is
        # 165-dim, so the fallback must be SMPL-X-shaped (a J=24 model would
        # shape-error in rodrigues/rigid_transform_chain)
        model = S.synthetic_smplx()
    big = S.big_pose_params_smplx()
    v_big, _ = S.lbs_vertices(model, big["poses"][0], big["shapes"][0])
    import jax.numpy as jnp

    scene = SceneContext(smpl=model, big_pose_params=big, big_pose_vertices=jnp.asarray(v_big))

    annots = SMCReader(annot_path)
    specs: List[DNAFrameSpec] = []
    try:
        # clamp to the capture's actual length so short captures load
        n_avail = int(annots.smc["SMPLx"]["fullpose"].shape[0])
        stop = min(pose_start + pose_num * pose_interval, n_avail)
        for frame_id in range(pose_start, stop, pose_interval):
            sd = annots.get_SMPLx(frame_id)
            poses = np.asarray(sd["fullpose"], np.float32).reshape(1, -1)
            shapes = np.concatenate(
                [np.asarray(sd["betas"], np.float32).reshape(1, -1),
                 np.asarray(sd["expression"], np.float32).reshape(1, -1)],
                axis=-1,
            )
            sp = {
                "poses": poses,
                "shapes": shapes,
                "R": np.eye(3, dtype=np.float32),
                "Th": np.asarray(sd["transl"], np.float32).reshape(1, 3),
            }
            v, _ = S.lbs_vertices(model, jnp.asarray(poses[0]), jnp.asarray(shapes[0]))
            xyz = np.asarray(v) + sp["Th"]
            bound = np.stack([xyz.min(0) - 0.05, xyz.max(0) + 0.05], axis=0)
            for view in views:
                specs.append(DNAFrameSpec(
                    main_smc_path=path, annot_smc_path=annot_path,
                    camera_id=view, frame_id=frame_id,
                    image_scaling=image_scaling,
                    white_background=white_background,
                    smpl_param=sp, world_bound=bound,
                ))
    finally:
        annots.release()
    return scene, specs
