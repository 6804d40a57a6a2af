#!/usr/bin/env python
"""Background-mapping cadence ablation (VERDICT r1 task 8).

The reference backend maps continuously on a dedicated process
(slam_backend.py:369-383); this TPU port time-slices the single chip, so
background mapping runs `idle_iters` Adam iterations every `idle_every`-th
pumped frame (core/backend.py:550, 635-640). This sweep measures how
ATE / PSNR / fps respond to the cadence on the surface-scene config so
defaults can be picked that recover continuous-backend quality within the
fps budget.

Usage: python tools/ablate_cadence.py [config] [out.json]
One process at a time on the TPU chip.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import time

import numpy as np

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.utils.config import load_config

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "configs/synthetic/surface_160.yaml"
OUT = sys.argv[2] if len(sys.argv) > 2 else "results/cadence_ablation.json"

# (idle_iters, idle_every): iterations per round / rounds per pumped frame
GRID = [(0, 1), (1, 1), (2, 2), (5, 3), (10, 1)]

rows = []
for idle_iters, idle_every in GRID:
    cfg = load_config(CONFIG)
    cfg["Results"]["save_results"] = False
    cfg["Training"]["single_thread"] = False  # threaded pump path
    cfg["Dataset"]["single_thread"] = False  # backend flag (non-serialized)
    cfg["TPU"]["idle_iters"] = idle_iters
    cfg["TPU"]["idle_every"] = idle_every
    slam = SLAM(cfg, save_dir=None)
    t0 = time.time()
    slam.run()
    wall = time.time() - t0
    res = slam.evaluate(eval_rendering_flag=True)
    slam.stop()
    row = {
        "idle_iters": idle_iters,
        "idle_every": idle_every,
        "ate_m": float(res["ate"]),
        "psnr_after": float(res["after_opt"]["mean_psnr"]),
        "ssim_after": float(res["after_opt"]["mean_ssim"]),
        "fps": float(res["fps"]),
        "wall_s": round(wall, 1),
        "n_gaussians": int(res["n_gaussians"]),
    }
    rows.append(row)
    print("ABLATE " + json.dumps(row), flush=True)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(rows, f, indent=2)
best = min(rows, key=lambda r: r["ate_m"])
print(f"best ATE: {best}", flush=True)
