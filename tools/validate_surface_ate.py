"""Run exactly the TestSurfaceSceneAccuracy body with visible progress.

Validates the committed slow regression (tests/test_system.py) outside
pytest so the ~1h CPU run can be monitored and resumed independently."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.eval.ate import eval_ate
from monogs_dev_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(REPO, "configs/synthetic/surface_160.yaml"))
cfg["Results"]["save_results"] = False
slam = SLAM(cfg, save_dir=None)
slam.run()
fe = slam.frontend
print("kf_indices:", fe.kf_indices, flush=True)
ate = eval_ate(
    fe.cameras, fe.kf_indices, None, 0, final=True, monocular=slam.monocular
)
slam.stop()
print(f"SURFACE_ATE_M {ate:.5f}  ({ate * 100:.2f} cm)  n_kf={len(fe.kf_indices)}", flush=True)
sys.exit(0 if ate < 0.03 else 1)
