#!/usr/bin/env python
"""Quality rows for BASELINE configs #4 (EuRoC stereo) and #5 (Realsense
replay) on the in-container fixtures (VERDICT r4 #5).

  stereo: EuRoC-format rendered stereo fixture -> EuRoCParser ->
          rectification -> SGBM metric depth -> full SLAM --eval
          (ATE + PSNR/SSIM row)
  replay: Realsense-replay fixture (color only, identity GT like live
          capture) -> monocular SLAM -> rendering metrics row (no GT, so
          no ATE — the same evidence the reference's live mode can give)

Usage: python tools/run_fixture_evals.py [stereo|replay|both]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _base_config(path):
    from monogs_dev_tpu.utils.config import load_config

    return load_config(path)


def run_stereo(n_frames=100, w=320, h=240):
    from make_euroc_fixture import generate

    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.utils.logging import Log

    fix_dir = f"/tmp/euroc_fixture_{w}x{h}_n{n_frames}"
    marker = os.path.join(fix_dir, ".done")
    if os.path.exists(marker):
        # Calibration dict is a pure function of (w, h) — rebuild it
        # without re-rendering the fixture (make_euroc_fixture.generate)
        fx = 0.9 * w
        eye = {"fx": fx, "fy": fx, "cx": w / 2.0, "cy": h / 2.0,
               "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0}
        ds_cfg = {
            "dataset_path": fix_dir,
            "Calibration": {
                "width": w, "height": h, "depth_scale": 1.0,
                "cam0": {"raw": dict(eye), "opt": dict(eye),
                         "R": {"data": [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]}},
                "cam1": {"raw": dict(eye), "opt": dict(eye),
                         "R": {"data": [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]}},
            },
        }
    else:
        ds_cfg = generate(fix_dir, n_frames=n_frames, w=w, h=h)
        open(marker, "w").write("ok")

    config = _base_config("configs/stereo/euroc/base_config.yaml")
    config["Dataset"].update(ds_cfg)
    config["Results"]["save_results"] = True
    config["Results"]["eval_rendering"] = True
    config["Training"]["refinement_itr_num"] = 500
    config.setdefault("TPU", {})
    config["TPU"].update({"capacity": 32768, "max_per_tile": 512, "k_dup": 8})

    save_dir = "results/euroc_fixture_eval"
    os.makedirs(save_dir, exist_ok=True)
    slam = SLAM(config, save_dir=save_dir)
    slam.run()
    results = slam.evaluate(eval_rendering_flag=True)
    slam.stop()
    Log("STEREO ROW " + json.dumps(
        {
            "ate_cm": results["ate"] * 100 if results["ate"] is not None else None,
            "psnr_before": results["before_opt"]["mean_psnr"],
            "psnr_after": results["after_opt"]["mean_psnr"],
            "ssim": results["after_opt"]["mean_ssim"],
            "n_keyframes": results["n_keyframes"],
            "n_gaussians": results["n_gaussians"],
            "fps": results["fps"],
        }
    ), tag="Eval")
    return results


def run_replay(n_frames=120):
    from make_replay_fixture import generate

    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.utils.logging import Log

    fix_dir = "/tmp/replay_fixture"
    marker = os.path.join(fix_dir, ".done")
    if not os.path.exists(marker):
        generate(fix_dir, n_frames=n_frames)
        open(marker, "w").write("ok")

    config = _base_config("configs/live/realsense_replay.yaml")
    config["Dataset"]["dataset_path"] = fix_dir
    # fixture rig: fx = 0.9 * w (make_replay_fixture.generate)
    config["Dataset"]["Calibration"].update(
        {"fx": 576.0, "fy": 576.0, "cx": 320.0, "cy": 240.0}
    )
    config["Results"]["save_results"] = True
    config["Results"]["eval_rendering"] = True
    config["Training"]["refinement_itr_num"] = 500
    config.setdefault("TPU", {})
    # in-program rebinning is mandatory here: the live config inherits the
    # reference's 10x position_lr_init (0.0016), so the map moves ~20 px
    # per reuse chunk during init-BA and stale binnings truncate exactly
    # the gradients that build the bootstrap map (first attempt: n_vis 0,
    # endless mono resets)
    config["TPU"].update({
        "capacity": 65536, "max_per_tile": 512, "k_dup": 8,
        "mapping_rebin_every": 4, "map_chunk": 25,
        "mapping_rebin_dilation": 6.0,
    })

    save_dir = "results/replay_fixture_eval"
    os.makedirs(save_dir, exist_ok=True)
    slam = SLAM(config, save_dir=save_dir)
    slam.run()
    # identity GT: rendering metrics only (ATE is meaningless vs identity)
    results = slam.evaluate(eval_rendering_flag=True)
    slam.stop()
    Log("REPLAY ROW " + json.dumps(
        {
            "psnr_before": results["before_opt"]["mean_psnr"],
            "psnr_after": results["after_opt"]["mean_psnr"],
            "ssim": results["after_opt"]["mean_ssim"],
            "n_keyframes": results["n_keyframes"],
            "n_gaussians": results["n_gaussians"],
            "fps": results["fps"],
        }
    ), tag="Eval")
    return results


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("stereo", "both"):
        run_stereo()
    if which in ("replay", "both"):
        run_replay()
