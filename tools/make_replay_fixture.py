#!/usr/bin/env python
"""Render the synthetic surface scene into a Realsense-replay directory —
end-to-end evidence for BASELINE config #5 (live Realsense-style streaming
replayed from recorded frames; reference utils/dataset.py:429-519).

Layout produced (matching data/datasets.py RealsenseReplayDataset):
    <out>/color/<idx>.png            VGA color frames along the orbit sweep

Like live capture, the fixture carries NO ground-truth poses (the loader
returns identity, dataset.py:492), so a SLAM run over it is evaluated on
rendering metrics + keyframe/tracking health, not ATE — the same evidence
the reference's live mode can produce. The companion ground truth is saved
separately in <out>/gt_poses.npy for DIAGNOSTIC use only (never read by
the loader).

Usage: python tools/make_replay_fixture.py [out_dir] [n_frames]
Importable: generate(out_dir, n_frames, w, h) -> config Dataset dict.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate(out_dir: str, n_frames: int = 120, w: int = 640, h: int = 480):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
    from monogs_dev_tpu.models.camera import Intrinsics
    from monogs_dev_tpu.ops import RasterConfig
    from monogs_dev_tpu.ops.rasterize import render_tiled

    fx = 0.9 * w
    params, active = make_surface_scene(
        jax.random.PRNGKey(2), n=12000, scale=0.03
    )
    intr = Intrinsics(fx=fx, fy=fx, cx=w / 2.0, cy=h / 2.0, width=w, height=h)
    rcfg = RasterConfig(max_per_tile=512, k_dup=8)

    color_dir = os.path.join(out_dir, "color")
    os.makedirs(color_dir, exist_ok=True)

    poses = []
    for i in range(n_frames):
        T = orbit_pose(i, n_frames, sweep=0.4, profile="ease_in")
        poses.append(T)
        out = render_tiled(
            params, active, jnp.asarray(T, jnp.float32), intr, 0, config=rcfg
        )
        img = np.clip(np.asarray(out.color) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(color_dir, f"{i:06d}.png"))
        if i % 20 == 19:
            print(f"replay fixture: {i + 1}/{n_frames}", flush=True)
    np.save(os.path.join(out_dir, "gt_poses.npy"), np.stack(poses))

    return {
        "type": "realsense_replay",
        "sensor_type": "monocular",
        "dataset_path": out_dir,
        "Calibration": {
            "fx": fx, "fy": fx, "cx": w / 2.0, "cy": h / 2.0,
            "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
            "width": w, "height": h, "distorted": False,
        },
    }


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/replay_fixture"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    cfg = generate(out, n)
    print("fixture at", cfg["dataset_path"])
