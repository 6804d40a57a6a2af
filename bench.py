#!/usr/bin/env python
"""Benchmark: end-to-end synthetic monocular SLAM fps on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline "up to 10 fps" mono TUM fr3_office on an
RTX 4090 (/root/reference/README.md:45; BASELINE.md). Real TUM data is not
bundled in this container, so the bench runs the full SLAM pipeline
(tracking loop, keyframing, mapping, densify/prune) on a synthetic
VGA-resolution sequence with TUM-like budgets and measures steady-state
frames/sec after a warmup segment that absorbs compilation.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.utils.config import load_config

    config = load_config("configs/synthetic/bench_vga.yaml")
    config["Dataset"]["sensor_type"] = "monocular"
    config["Results"]["save_results"] = False

    n_warm, n_meas = 8, 15
    slam = SLAM(config, save_dir=None)

    # pre-render the synthetic GT frames so dataset synthesis is not timed
    for i in range(n_warm + n_meas):
        slam.dataset.render_frame(i)

    # warmup segment absorbs compilation of every program variant
    slam.frontend.run(max_frames=n_warm)
    t0 = time.time()
    slam.frontend.run(max_frames=n_warm + n_meas)
    dt = time.time() - t0

    fps = n_meas / dt
    baseline_fps = 10.0
    print(
        json.dumps(
            {
                "metric": "synthetic_vga_mono_slam_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
