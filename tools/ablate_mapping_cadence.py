#!/usr/bin/env python
"""A/B the documented mapping-cadence deviations (VERDICT r2 next-round #6).

The TPU mapping path deviates from the reference cadence
(/root/reference/utils/slam_backend.py:168-240) in three coupled ways,
all governed by the chunked dispatch: binning reuse across a chunk
(vs per-iteration rebinning), random-pair resampling per chunk (vs per
iteration), and visibility harvest per round (vs per iteration). Setting
`TPU.map_chunk: 1` (+ idle_iters 1) restores the reference cadence for
all three at once — every iteration is its own dispatch with a fresh
binning and a fresh random pair.

This script runs the synthetic surface quality scene both ways and
writes an ATE/PSNR delta table. Usage:

  python tools/ablate_mapping_cadence.py [config] [out.json]

Defaults: configs/synthetic/surface_160.yaml -> results/cadence_ab.json.
Run on the TPU (a CPU run of the full scene takes hours on this host).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.eval.ate import eval_ate
from monogs_dev_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "configs/synthetic/surface_160.yaml"
)
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, "results/cadence_ab.json"
)

MODES = {
    # reference cadence: one dispatch per iteration -> per-iteration
    # binning, per-iteration random-pair resample
    "reference_cadence": {"map_chunk": 1},
    # production cadence: chunked dispatch with binning reuse
    "tpu_chunked": {},
}

rows = []
for name, tpu_overrides in MODES.items():
    cfg = load_config(CONFIG)
    cfg["Results"]["save_results"] = False
    cfg.setdefault("TPU", {}).update(tpu_overrides)
    t0 = time.time()
    slam = SLAM(cfg, save_dir=None)
    slam.run()
    wall = time.time() - t0
    fe = slam.frontend
    ate = float(
        eval_ate(fe.cameras, fe.kf_indices, None, 0, final=True,
                 monocular=slam.monocular)
    )
    rend = slam.evaluate(eval_rendering_flag=True)
    slam.stop()
    rows.append(
        {
            "mode": name,
            "tpu_overrides": tpu_overrides,
            "ate_m": ate,
            "psnr_before": rend["before_opt"]["mean_psnr"],
            "psnr_after": rend["after_opt"]["mean_psnr"],
            "ssim_after": rend["after_opt"]["mean_ssim"],
            "n_keyframes": rend["n_keyframes"],
            "n_gaussians": rend["n_gaussians"],
            "wall_s": round(wall, 1),
            "map_chunks": rend["telemetry"].get("map_chunks"),
            "map_iters": rend["telemetry"].get("map_iters"),
        }
    )
    print(json.dumps(rows[-1]), flush=True)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w", encoding="utf-8") as f:
    json.dump(rows, f, indent=2)
print(f"wrote {OUT}", flush=True)
if len(rows) == 2:
    d_ate = rows[1]["ate_m"] - rows[0]["ate_m"]
    d_psnr = rows[1]["psnr_after"] - rows[0]["psnr_after"]
    print(
        f"delta (chunked - reference): ATE {d_ate * 100:+.2f} cm, "
        f"PSNR {d_psnr:+.2f} dB",
        flush=True,
    )
