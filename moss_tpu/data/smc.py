"""Minimal SMC (.smc HDF5) reader for DNA-Rendering captures.

Re-implementation of the dataset's SMCReader
(/root/reference/data/dna_rendering/dna_rendering_sample_code/SMCReader.py)
covering exactly what the training reader touches: actor info, RGB camera
calibration (K/D/RT), JPEG-encoded color frames, masks, and the per-frame
SMPL-X parameter block.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class SMCReader:
    def __init__(self, path: str):
        import h5py

        self.smc = h5py.File(path, "r")
        self.actor_info = None
        if "actor" in self.smc.attrs:
            pass
        try:
            self.actor_info = dict(
                id=self.smc.attrs.get("actor_id"),
                perf_id=self.smc.attrs.get("performance_id"),
                age=self.smc.attrs.get("age"),
                gender=self.smc.attrs.get("gender"),
                height=self.smc.attrs.get("height"),
                weight=self.smc.attrs.get("weight"),
            )
        except Exception:
            self.actor_info = None

    # -- calibration ---------------------------------------------------
    def get_Calibration(self, camera_id) -> Dict[str, np.ndarray]:
        g = self.smc["Camera_Parameter"][f"{int(camera_id):02d}"]
        return {k: g[k][()] for k in ("D", "K", "RT", "Color_Calibration")}

    # -- images --------------------------------------------------------
    @staticmethod
    def _decode(buf) -> np.ndarray:
        return cv2.imdecode(buf, cv2.IMREAD_COLOR)

    def get_img(self, camera_group: str, camera_id, image_type: str = "color",
                frame_id=0) -> np.ndarray:
        g = self.smc[camera_group][str(int(camera_id))][image_type]
        data = g[str(int(frame_id))][()]
        if image_type == "color":
            return self._decode(data)
        return data

    def get_mask(self, camera_id, frame_id=0) -> Optional[np.ndarray]:
        if "Mask" not in self.smc:
            return None
        buf = self.smc["Mask"][str(int(camera_id))]["mask"][str(int(frame_id))][()]
        return np.max(self._decode(buf), axis=2)

    # -- SMPL-X --------------------------------------------------------
    def get_SMPLx(self, frame_id=None) -> Dict[str, np.ndarray]:
        g = self.smc["SMPLx"]
        out = {}
        for key in ("betas", "expression", "fullpose", "transl"):
            arr = g[key][()]
            out[key] = arr if frame_id is None else arr[int(frame_id)]
        out["scale"] = g["scale"][()]
        return out

    def release(self):
        self.smc.close()
