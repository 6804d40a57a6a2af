"""Mono bootstrap policy probe: does the monocular pipeline survive the
synthetic sweep without resetting, and how does the keyframe/window pattern
respond to the sweep rate?

Runs the 320x240 mono surface config at several sweep rates on CPU and
reports, per run: resets, keyframes, window sizes at each keyframe, whether
`initialized` was reached, and final ATE. The bench (bench_vga) is this
pipeline at VGA; a reset inside its measured window re-runs the 1050-iter
init BA and destroys the fps number, so the bench scene must be provably
reset-free.

Usage: python tools/probe_mono_bootstrap.py [sweep ...]  (default 0.7 0.4)
"""

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
sweeps = [float(s) for s in sys.argv[1:]] or [0.7, 0.4]

for sweep in sweeps:
    cfg = load_config(os.path.join(REPO, "configs/synthetic/mono.yaml"))
    cfg["Results"]["save_results"] = False
    cfg["Dataset"]["scene"] = "surface"
    cfg["Dataset"]["sweep"] = sweep
    cfg["Dataset"]["ease"] = True
    cfg["Training"]["window_size"] = 6
    print(f"=== sweep={sweep} ===", flush=True)
    slam = SLAM(cfg, save_dir=None)
    fe = slam.frontend
    resets = [0]
    orig_init = fe.initialize

    def counting_init(*a, _orig=orig_init, _r=resets, **kw):
        _r[0] += 1
        return _orig(*a, **kw)

    fe.initialize = counting_init
    slam.run()
    ate = float("nan")
    try:
        ate = eval_ate(
            fe.cameras, fe.kf_indices, None, 0, final=True, monocular=True
        )
    except Exception as e:  # noqa: BLE001 - diagnostic probe
        print("ate failed:", e, flush=True)
    print(
        f"RESULT sweep={sweep} resets={resets[0] - 1} "
        f"n_kf={len(fe.kf_indices)} initialized={fe.initialized} "
        f"ate_m={ate:.4f}",
        flush=True,
    )
    slam.stop()
