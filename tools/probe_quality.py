#!/usr/bin/env python
"""Quality probe: run SLAM on a synthetic config and print per-frame
camera-center error vs GT, keyframe/reset events, and final ATE.

Usage:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/probe_quality.py \
        --config configs/synthetic/surface_160.yaml [--mono] [--frames N] \
        [--set Training.tracking_itr_num=100 ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def cam_center(T_w2c: np.ndarray) -> np.ndarray:
    R, t = T_w2c[:3, :3], T_w2c[:3, 3]
    return -R.T @ t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/surface_160.yaml")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--set", nargs="*", default=[], metavar="G.k=v")
    args = ap.parse_args()

    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.eval.ate import eval_ate
    from monogs_dev_tpu.utils.config import load_config

    config = load_config(args.config)
    config["Results"]["save_results"] = False
    if args.mono:
        config["Dataset"]["sensor_type"] = "monocular"
    for kv in args.set:
        key, value = kv.split("=", 1)
        group, name = key.split(".", 1)
        try:
            value = eval(value, {}, {})
        except Exception:
            pass
        config[group][name] = value

    slam = SLAM(config, save_dir=None)
    slam.run(max_frames=args.frames)

    fe = slam.engine, slam.frontend
    fe = slam.frontend
    errs = []
    for idx in sorted(fe.cameras):
        cam = fe.cameras[idx]
        err = float(np.linalg.norm(cam_center(cam.T_est) - cam_center(cam.T_gt)))
        errs.append(err)
        mark = "KF" if cam.is_keyframe else "  "
        print(f"frame {idx:4d} {mark} cam-center err {err*100:7.2f} cm")
    errs = np.array(errs)
    print(
        f"\nmean err {errs.mean()*100:.2f} cm  median {np.median(errs)*100:.2f} cm"
        f"  max {errs.max()*100:.2f} cm over {len(errs)} frames"
    )
    print(f"keyframes: {len(fe.kf_indices)}  window: {fe.current_window}")
    ate = eval_ate(fe.cameras, fe.kf_indices, None, 0, final=True,
                   monocular=slam.monocular)
    print(f"ATE RMSE (aligned): {ate*100:.2f} cm")
    print(f"telemetry: {slam.engine.telemetry}")
    slam.stop()


if __name__ == "__main__":
    main()
