"""Mono surface-scene diagnostic: where does tracked visibility collapse?

Runs the bench pipeline (monocular, surface scene, ease sweep 0.7,
window 6) at 320x240 on CPU, logging per-frame tracking stats and the
policy-relevant overlap of *estimated* visibility (the geometric GT probe,
tools/probe_policy_geometry.py, shows no reset should occur — so any reset
here is tracking/mapping quality, the thing to fix for the VGA bench)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.eval.ate import eval_ate
from monogs_dev_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(REPO, "configs/synthetic/mono.yaml"))
cfg["Results"]["save_results"] = False
cfg["Dataset"]["scene"] = "surface"
cfg["Dataset"]["sweep"] = float(os.environ.get("SWEEP", "0.7"))
cfg["Dataset"]["ease"] = True
if os.environ.get("QUARTER", "1") == "1":
    # quarter resolution so the whole run fits ~20 min on the 1-core CPU
    cal = cfg["Dataset"]["Calibration"]
    for k in ("fx", "fy", "cx", "cy"):
        cal[k] = cal[k] / 2.0
    cal["width"], cal["height"] = cal["width"] // 2, cal["height"] // 2
t = cfg["Training"]
t["window_size"] = 6
# bench_vga TPU-mode tracking knobs
t["const_velocity_init"] = True
t["tracking_pyramid_levels"] = 2
t["tracking_pyramid_coarse_iters"] = 25
t["tracking_plateau_iters"] = 8
t["tracking_plateau_rel_tol"] = 0.0003

slam = SLAM(cfg, save_dir=None)
fe = slam.frontend
resets = [0]
orig_init = fe.initialize


def counting_init(*a, **kw):
    resets[0] += 1
    print(f"RESET #{resets[0] - 1} at frame {fe.cur_frame_idx}", flush=True)
    return orig_init(*a, **kw)


fe.initialize = counting_init
slam.run()
ate = float("nan")
try:
    ate = eval_ate(fe.cameras, fe.kf_indices, None, 0, final=True, monocular=True)
except Exception as e:  # noqa: BLE001
    print("ate failed:", e, flush=True)
print(
    f"RESULT resets={resets[0] - 1} n_kf={len(fe.kf_indices)} "
    f"initialized={fe.initialized} ate_m={ate:.4f}",
    flush=True,
)
slam.stop()
