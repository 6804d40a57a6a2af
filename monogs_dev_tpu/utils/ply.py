"""PLY checkpoint I/O in the standard 3DGS attribute layout.

Binary little-endian PLY with per-vertex attributes
x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,rot_* — the exact layout of
the reference's save_ply/load_ply
(/root/reference/gaussian_splatting/scene/gaussian_model.py:312-466), so
checkpoints interoperate with stock 3DGS viewers. Implemented with numpy
structured arrays (the `plyfile` package is not available here).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..models.gaussians import GaussianParams


def _field_names(n_rest: int):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(params: GaussianParams, active, path: str) -> int:
    """Write active Gaussians; returns the number written."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    mask = np.asarray(active)
    xyz = np.asarray(params.xyz)[mask]
    n = xyz.shape[0]
    f_dc = np.asarray(params.f_dc)[mask]  # (n, 1, 3)
    f_rest = np.asarray(params.f_rest)[mask]  # (n, R, 3)
    n_rest = f_rest.shape[1]
    opacity = np.asarray(params.opacity_logit)[mask]
    scales = np.asarray(params.log_scales)[mask]
    rots = np.asarray(params.quats)[mask]

    names = _field_names(n_rest)
    dtype = np.dtype([(name, "<f4") for name in names])
    data = np.zeros(n, dtype=dtype)
    data["x"], data["y"], data["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    # 3DGS stores features channel-major: f_dc_(c) then f_rest_(c*R + r)
    dc = f_dc.transpose(0, 2, 1).reshape(n, -1)  # (n, 3)
    for i in range(3):
        data[f"f_dc_{i}"] = dc[:, i]
    rest = f_rest.transpose(0, 2, 1).reshape(n, -1)  # (n, 3*R), channel-major
    for i in range(3 * n_rest):
        data[f"f_rest_{i}"] = rest[:, i]
    data["opacity"] = opacity
    for i in range(3):
        data[f"scale_{i}"] = scales[:, i]
    for i in range(4):
        data[f"rot_{i}"] = rots[:, i]

    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {name}" for name in names]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        data.tofile(f)
    return n


def load_ply(path: str) -> Tuple[GaussianParams, np.ndarray]:
    """Read a 3DGS PLY back into a (params, active) pair (exact capacity)."""
    with open(path, "rb") as f:
        # parse header
        names = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                names.append(line.split()[-1])
            elif line == "end_header":
                break
        dtype = np.dtype([(name, "<f4") for name in names])
        data = np.fromfile(f, dtype=dtype, count=n)

    n_rest = sum(1 for name in names if name.startswith("f_rest_")) // 3
    xyz = np.stack([data["x"], data["y"], data["z"]], axis=-1)
    dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=-1)[:, None, :]
    if n_rest > 0:
        rest = np.stack(
            [data[f"f_rest_{i}"] for i in range(3 * n_rest)], axis=-1
        ).reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    params = GaussianParams(
        xyz=xyz.astype(np.float32),
        f_dc=dc.astype(np.float32),
        f_rest=rest.astype(np.float32),
        log_scales=np.stack([data[f"scale_{i}"] for i in range(3)], -1).astype(
            np.float32
        ),
        quats=np.stack([data[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
        opacity_logit=data["opacity"].astype(np.float32),
    )
    return params, np.ones((n,), bool)
