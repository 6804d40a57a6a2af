#!/usr/bin/env python
"""Controlled A/B for the 10x fixture-vs-analytic ATE gap (VERDICT r3 #4).

BASELINE.md attributes the TUM-fixture's 12.87 cm ATE (vs 1.2 cm for the
same scene consumed directly as a synthetic dataset) to the fixture's
GENERATED depth maps: alpha-normalized EXPECTED depth blends depths across
silhouettes, so keyframe insertion back-projects points into free space.
This probe tests exactly that hypothesis: generate the same 80-frame
TUM-format sequence twice — once with expected depth, once with per-pixel
MEDIAN depth (an actual surface sample, ops/rasterize.render_median_depth)
— and run the identical fixture_surface SLAM config over both.

Usage: python tools/probe_fixture_depth.py [n_frames]
Prints one RESULT line per arm.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_arm(mode: str, n_frames: int) -> float:
    out_dir = f"/tmp/fixture_depth_{mode}"
    env = dict(os.environ)
    env["MONOGS_FIXTURE_DEPTH"] = mode
    env["MONOGS_FIXTURE_SWEEP"] = "0.45"
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_tum_fixture.py"),
         out_dir, str(n_frames), "160x120"],
        env=env, check=True, cwd=REPO,
    )
    print(f"[{mode}] fixture generated in {time.time() - t0:.1f}s", flush=True)

    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.eval.ate import eval_ate
    from monogs_dev_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "configs/rgbd/tum/fixture_surface.yaml"))
    cfg["Dataset"]["dataset_path"] = out_dir
    cfg["Results"]["save_results"] = False
    t0 = time.time()
    slam = SLAM(cfg, save_dir=None)
    slam.run()
    fe = slam.frontend
    ate = eval_ate(
        fe.cameras, fe.kf_indices, None, 0, final=True, monocular=False
    )
    slam.stop()
    print(
        f"RESULT arm={mode} ate_cm={ate * 100:.2f} "
        f"n_kf={len(fe.kf_indices)} wall_s={time.time() - t0:.1f}",
        flush=True,
    )
    return ate


def main() -> None:
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    ate_exp = run_arm("expected", n_frames)
    ate_med = run_arm("median", n_frames)
    print(
        f"SUMMARY expected={ate_exp * 100:.2f}cm median={ate_med * 100:.2f}cm "
        f"ratio={ate_exp / max(ate_med, 1e-9):.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
