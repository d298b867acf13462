"""Gaussian-cloud PLY export/import, reference-compatible (no plyfile dep).

Writes/reads the exact binary-little-endian attribute layout of the reference
GaussianModel.save_ply/load_ply (/root/reference/scene/gaussian_model.py:
271-303,319-360): x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_* — so
clouds trained here can be viewed in standard 3DGS viewers and reference
checkpoints can be imported for parity tests.
"""
from __future__ import annotations

import io
from typing import Tuple

import numpy as np


def _attribute_names(n_rest: int) -> list:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(path, xyz, f_dc, f_rest, opacity, scaling, rotation):
    """All inputs raw (pre-activation) numpy/jax arrays; f_dc (P,1,3),
    f_rest (P,K,3). Matches save_ply's channel-major flattening
    (transpose(1,2).flatten, gaussian_model.py:291-292)."""
    xyz = np.asarray(xyz, np.float32)
    P = xyz.shape[0]
    f_dc = np.asarray(f_dc, np.float32).transpose(0, 2, 1).reshape(P, -1)
    f_rest = np.asarray(f_rest, np.float32).transpose(0, 2, 1).reshape(P, -1)
    opacity = np.asarray(opacity, np.float32).reshape(P, -1)
    scaling = np.asarray(scaling, np.float32)
    rotation = np.asarray(rotation, np.float32)
    normals = np.zeros_like(xyz)

    attrs = np.concatenate([xyz, normals, f_dc, f_rest, opacity, scaling, rotation], axis=1)
    names = _attribute_names(f_rest.shape[1] // 3)
    assert attrs.shape[1] == len(names)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {P}"]
    header += [f"property float {n}" for n in names]
    header += ["end_header", ""]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(attrs.astype("<f4").tobytes())


def load_ply(path) -> dict:
    """Returns dict with xyz, f_dc (P,1,3), f_rest (P,K,3), opacity (P,1),
    scaling (P,3), rotation (P,4) as numpy arrays."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    names = []
    P = 0
    for line in header:
        if line.startswith("element vertex"):
            P = int(line.split()[-1])
        elif line.startswith("property float"):
            names.append(line.split()[-1])
        elif line.startswith("property"):
            raise ValueError(f"only float properties supported, got: {line}")
    arr = np.frombuffer(data[head_end:], dtype="<f4").reshape(P, len(names))
    col = {n: i for i, n in enumerate(names)}

    xyz = arr[:, [col["x"], col["y"], col["z"]]]
    opacity = arr[:, [col["opacity"]]]
    f_dc = np.stack([arr[:, col[f"f_dc_{i}"]] for i in range(3)], axis=1)[:, None, :]
    rest_names = sorted(
        [n for n in names if n.startswith("f_rest_")], key=lambda s: int(s.split("_")[-1])
    )
    n_rest = len(rest_names) // 3
    rest = np.stack([arr[:, col[n]] for n in rest_names], axis=1)  # (P, 3*K) ch-major
    f_rest = rest.reshape(P, 3, n_rest).transpose(0, 2, 1)
    scaling = np.stack([arr[:, col[f"scale_{i}"]] for i in range(3)], axis=1)
    rotation = np.stack([arr[:, col[f"rot_{i}"]] for i in range(4)], axis=1)
    return {
        "xyz": xyz, "f_dc": f_dc, "f_rest": f_rest,
        "opacity": opacity, "scaling": scaling, "rotation": rotation,
    }
