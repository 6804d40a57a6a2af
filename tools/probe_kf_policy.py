"""Log every keyframe-policy decision of the bench run (mono, VGA).

Wraps frontend.is_keyframe_check to print its inputs — dist vs thresholds,
visibility IoU, median_depth — so a too-hot keyframe cadence can be
attributed: monocular scale drift (median_depth shrinks -> thresholds
shrink), visibility-set flicker (IoU noise), or genuine motion.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.core import frontend as fe_mod
from monogs_dev_tpu.utils.config import load_config

config = load_config("configs/synthetic/bench_vga.yaml")
config["Dataset"]["sensor_type"] = "monocular"
config["Results"]["save_results"] = False

orig = fe_mod.is_keyframe_check


HOLDER = {}


def wrapped(T_cur, T_last_kf, median_depth, cur_vis, last_kf_vis,
            kf_translation, kf_min_translation, kf_overlap):
    dist = np.linalg.norm((T_cur @ np.linalg.inv(T_last_kf))[0:3, 3])
    union = np.count_nonzero(cur_vis | last_kf_vis)
    inter = np.count_nonzero(cur_vis & last_kf_vis)
    ratio = inter / max(union, 1)
    r = orig(T_cur, T_last_kf, median_depth, cur_vis, last_kf_vis,
             kf_translation, kf_min_translation, kf_overlap)
    print(f"KFCHK f={len(HOLDER['slam'].frontend.cameras)} dist={dist:.4f} med={median_depth:.3f} "
          f"th={kf_translation * median_depth:.4f}/{kf_min_translation * median_depth:.4f} "
          f"iou={ratio:.3f} |cur|={np.count_nonzero(cur_vis)} "
          f"|last|={np.count_nonzero(last_kf_vis)} -> {r}", flush=True)
    return r


fe_mod.is_keyframe_check = wrapped

slam = SLAM(config, save_dir=None)
HOLDER["slam"] = slam
for i in range(len(slam.dataset)):
    slam.dataset.render_frame(i)
slam.prewarm()
print("prewarm done", flush=True)
slam.frontend.run(max_frames=186)
