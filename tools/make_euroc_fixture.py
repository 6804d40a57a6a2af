#!/usr/bin/env python
"""Render the synthetic surface scene into a EuRoC-MAV-format stereo
directory — the only loader with zero end-to-end evidence (VERDICT r3
Next #6): rectified pair -> SGBM disparity -> depth via the loader's
hardcoded baseline*fx (data/datasets.py StereoDataset.BASELINE_FX,
reference utils/dataset.py:376-383).

Layout produced (matching data/datasets.py EuRoCParser expectations):
    mav0/cam0/data/<ts>.png        left eye (rendered, rectified pinhole)
    mav0/cam1/data/<ts>.png        right eye (left pose shifted +baseline x)
    mav0/state_groundtruth_estimate0/data.csv   ts, p_WI, q_WI (wxyz)

The pair is generated ALREADY rectified (identical pinhole intrinsics, no
distortion, pure x-baseline), so the loader's rectification maps are
identity warps and SGBM sees epipolar-aligned rows. The baseline is chosen
as BASELINE_FX / fx so the loader's hardcoded 47.906 disparity->depth
constant is exact for this rig. GT body poses are written as
T_WI = T_WC0 @ inv(T_I_C0) so the parser's hardcoded EuRoC body-to-cam0
extrinsic round-trips.

Usage: python tools/make_euroc_fixture.py [out_dir] [n_frames] [WxH]
Also importable: generate(out_dir, n_frames, w, h) -> config dict.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _quat_wxyz(R: np.ndarray) -> np.ndarray:
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def generate(out_dir: str, n_frames: int = 12, w: int = 160, h: int = 120):
    """Write the fixture; return a ready-to-run stereo config dict."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from monogs_dev_tpu.data.datasets import _EUROC_T_I_C0, StereoDataset
    from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
    from monogs_dev_tpu.models.camera import Intrinsics
    from monogs_dev_tpu.ops import RasterConfig
    from monogs_dev_tpu.ops.rasterize import render_tiled

    fx = 0.9 * w
    baseline = StereoDataset.BASELINE_FX / fx  # loader constant exact
    params, active = make_surface_scene(jax.random.PRNGKey(0), n=6000, scale=0.06)
    intr = Intrinsics(fx=fx, fy=fx, cx=w / 2.0, cy=h / 2.0, width=w, height=h)
    # XLA blend path: fixture generation runs on CPU (tests), where the
    # Pallas kernel would run in slow interpret mode
    rcfg = RasterConfig(max_per_tile=512, k_dup=16, use_pallas=False)

    cam0 = os.path.join(out_dir, "mav0", "cam0", "data")
    cam1 = os.path.join(out_dir, "mav0", "cam1", "data")
    gt_dir = os.path.join(out_dir, "mav0", "state_groundtruth_estimate0")
    for d in (cam0, cam1, gt_dir):
        os.makedirs(d, exist_ok=True)

    # right eye: camera frame shifted +baseline along camera x.
    # T_w2c_right = T_shift @ T_w2c_left with T_shift = [I | -b*e_x]
    T_shift = np.eye(4, dtype=np.float32)
    T_shift[0, 3] = -baseline

    rows = ["#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z"]
    inv_tic = np.linalg.inv(_EUROC_T_I_C0)
    for i in range(n_frames):
        T_l = orbit_pose(i, max(n_frames, 40), sweep=0.45).astype(np.float32)
        T_r = T_shift @ T_l
        ts = str(10_000_000_000 + i * 50_000_000)  # ns, EuRoC-style ints
        for T, d in ((T_l, cam0), (T_r, cam1)):
            out = render_tiled(
                params, active, jnp.asarray(T), intr, 0, config=rcfg,
                need_touched=False,
            )
            img = np.clip(np.asarray(out.color), 0.0, 1.0)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(d, f"{ts}.png")
            )
        T_wc0 = np.linalg.inv(T_l)
        T_wi = T_wc0 @ inv_tic
        q = _quat_wxyz(T_wi[:3, :3])
        p = T_wi[:3, 3]
        # parser reads cols: 0 ts, 1:4 pos, 4:8 quat(wxyz)
        rows.append(
            f"{ts},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},"
            f"{q[0]:.9f},{q[1]:.9f},{q[2]:.9f},{q[3]:.9f}"
        )
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")

    eye = {
        "fx": fx, "fy": fx, "cx": w / 2.0, "cy": h / 2.0,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
    }
    calib = {
        "width": w, "height": h, "depth_scale": 1.0,
        "cam0": {"raw": dict(eye), "opt": dict(eye),
                 "R": {"data": [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]}},
        "cam1": {"raw": dict(eye), "opt": dict(eye),
                 "R": {"data": [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]}},
    }
    return {"dataset_path": out_dir, "Calibration": calib, "baseline": baseline}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/euroc_surface"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    w, h = (
        [int(v) for v in sys.argv[3].split("x")] if len(sys.argv) > 3
        else (160, 120)
    )
    info = generate(out, n, w, h)
    print(f"wrote {n} stereo pairs to {out} (baseline {info['baseline']:.4f} m)")
