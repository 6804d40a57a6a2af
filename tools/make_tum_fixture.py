#!/usr/bin/env python
"""Render the synthetic surface scene into a TUM-RGBD-format directory.

Real TUM/Replica data cannot be downloaded in this offline container
(BASELINE.md configs 1-3), so this generates a sequence in the exact
TUM fr-style layout — rgb/*.png + depth/*.png (16-bit, depth_scale 5000),
rgb.txt / depth.txt / groundtruth.txt (timestamp tx ty tz qx qy qz qw,
C2W) — from the 2.5D surface scene, so the real TUMDataset parser
(timestamp association, quaternion poses, depth scaling; data/datasets.py
TUMParser vs reference dataset.py:48-190) and the full SLAM + eval stack
run end to end against ground truth.

Usage: python tools/make_tum_fixture.py [out_dir] [n_frames] [WxH]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled

OUT = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/tum_surface"
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
W, H = (
    [int(v) for v in sys.argv[3].split("x")] if len(sys.argv) > 3 else (160, 120)
)

DEPTH_SCALE = 5000.0  # TUM convention: 16-bit png, 5000 units per meter
FX = 0.9 * W  # ~58 deg horizontal FoV, fr-like

import jax

params, active = make_surface_scene(jax.random.PRNGKey(0), n=6000, scale=0.06)
intr = Intrinsics(fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0, width=W, height=H)
cfg = RasterConfig(max_per_tile=512, k_dup=16)

os.makedirs(os.path.join(OUT, "rgb"), exist_ok=True)
os.makedirs(os.path.join(OUT, "depth"), exist_ok=True)
rgb_lines, depth_lines, gt_lines = [], [], ["# ts tx ty tz qx qy qz qw"]


def _quat_wxyz(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (w, x, y, z), Shepperd's branch-stable method."""
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


SWEEP = float(os.environ.get("MONOGS_FIXTURE_SWEEP", "0.45"))
# "median" (default): per-pixel median depth — an actual surface sample,
# like the sensor depth real TUM provides. "expected": alpha-normalized
# expected depth, which blends across silhouettes and plants bogus points
# at insertion (the 10x ATE gap of BASELINE.md; A/B in
# tools/probe_fixture_depth.py).
DEPTH_MODE = os.environ.get("MONOGS_FIXTURE_DEPTH", "median")

for i in range(N_FRAMES):
    # constant cruise at the bench-calibrated keyframe cadence (~0.006
    # rad/frame at 80 frames): the original 0.7-over-40 sweep moved so fast
    # that a keyframe fired at EVERY kf_interval-th frame, which collides
    # exactly with eval_rendering's every-5th-frame sampling (all sampled
    # frames were keyframes -> NaN PSNR) and overflowed an 8192 map
    T_w2c = orbit_pose(i, N_FRAMES, sweep=SWEEP)
    out = render_tiled(
        params, active, jnp.asarray(T_w2c, jnp.float32), intr, 0,
        config=cfg, need_touched=False,
    )
    color = np.clip(np.asarray(out.color), 0.0, 1.0)
    alpha = np.asarray(out.alpha)
    if DEPTH_MODE == "median":
        from monogs_dev_tpu.ops.rasterize import render_median_depth

        depth = np.array(  # copy: np.asarray of a jax array is read-only
            render_median_depth(
                params, active, jnp.asarray(T_w2c, jnp.float32), intr, cfg
            )
        )
    else:
        depth = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
    depth[alpha < 0.5] = 0.0

    ts = f"{i / 30.0:.6f}"
    Image.fromarray((color * 255).astype(np.uint8)).save(
        os.path.join(OUT, "rgb", f"{ts}.png")
    )
    d16 = np.clip(depth * DEPTH_SCALE, 0, 65535).astype(np.uint16)
    Image.fromarray(d16, mode="I;16").save(
        os.path.join(OUT, "depth", f"{ts}.png")
    )
    rgb_lines.append(f"{ts} rgb/{ts}.png")
    depth_lines.append(f"{ts} depth/{ts}.png")

    T_c2w = np.linalg.inv(T_w2c)
    q = _quat_wxyz(T_c2w[:3, :3])
    tx, ty, tz = T_c2w[:3, 3]
    gt_lines.append(
        f"{ts} {tx:.6f} {ty:.6f} {tz:.6f} "
        f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
    )

for name, lines in [
    ("rgb.txt", rgb_lines),
    ("depth.txt", depth_lines),
    ("groundtruth.txt", gt_lines),
]:
    with open(os.path.join(OUT, name), "w") as f:
        f.write("\n".join(lines) + "\n")

print(f"wrote {N_FRAMES} frames to {OUT} ({W}x{H}, fx={FX})")
