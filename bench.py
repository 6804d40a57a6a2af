#!/usr/bin/env python
"""Benchmark: end-to-end synthetic monocular SLAM fps on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline "up to 10 fps" mono TUM fr3_office on an
RTX 4090 (/root/reference/README.md:45; BASELINE.md). Real TUM data is not
bundled in this container, so the bench runs the full SLAM pipeline
(tracking loop, keyframing, mapping, densify/prune) on a synthetic
VGA-resolution surface sequence with TUM-like budgets and measures
steady-state frames/sec after a warmup segment that absorbs compilation.

Process layout: the measurement runs in a supervised child process
(monogs_dev_tpu/utils/watchdog.py) because the remote-attached TPU relay in
this environment intermittently wedges an RPC; the supervisor kills a
stalled child and retries (the persistent compile cache makes that cheap).
The parent imports no JAX.
"""

from __future__ import annotations

import json
import os
import sys
import time


def child() -> None:
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.utils.config import load_config

    config = load_config(
        os.path.join(os.path.dirname(__file__), "configs/synthetic/bench_vga.yaml")
    )
    config["Dataset"]["sensor_type"] = "monocular"
    config["Results"]["save_results"] = False

    n_warm, n_meas = 16, 25
    slam = SLAM(config, save_dir=None)
    print("bench: slam constructed", flush=True)

    # pre-render the synthetic GT frames so dataset synthesis is not timed
    for i in range(n_warm + n_meas):
        slam.dataset.render_frame(i)
        print(f"bench: frame {i} prerendered", flush=True)

    # warmup segment absorbs compilation of every program variant
    slam.frontend.run(max_frames=n_warm)
    print("bench: warmup done", flush=True)
    t0 = time.time()
    slam.frontend.run(max_frames=n_warm + n_meas)
    dt = time.time() - t0

    fps = n_meas / dt
    baseline_fps = 10.0
    print(
        "RESULT "
        + json.dumps(
            {
                "metric": "synthetic_vga_mono_slam_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("MONOGS_BENCH_CHILD") == "1":
        child()
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from monogs_dev_tpu.utils.watchdog import run_supervised

    lines = run_supervised(
        [sys.executable, os.path.abspath(__file__)],
        stall_s=420.0,
        max_attempts=4,
        env={"MONOGS_BENCH_CHILD": "1"},
    )
    for ln in lines:
        if ln.startswith("RESULT "):
            print(ln[len("RESULT "):])
            return
    raise RuntimeError("bench child produced no RESULT line")


if __name__ == "__main__":
    main()
