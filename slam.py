#!/usr/bin/env python
"""CLI entry point — `python slam.py --config <yaml> [--eval]`.

Same interface as the reference (/root/reference/slam.py:201-258). `--eval`
applies the reference's overrides: save_results, no GUI, rendering eval on.
"""

from __future__ import annotations

import argparse
import json
import sys

from monogs_dev_tpu.core.system import SLAM, make_save_dir
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.logging import Log


def main() -> int:
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument(
        "--max-frames", type=int, default=None, help="limit sequence length"
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--resume", type=str, default=None,
        help="full-state checkpoint.npz to resume from (utils/checkpoint.py)",
    )
    parser.add_argument(
        "--save-checkpoint", action="store_true",
        help="write checkpoint.npz into the results dir after the run",
    )
    args = parser.parse_args()

    config = load_config(args.config)

    if args.eval:
        Log("Running MonoGS-TPU in Evaluation Mode")
        Log("Following config will be overriden")
        Log("\tsave_results=True")
        config["Results"]["save_results"] = True
        Log("\tuse_gui=False")
        config["Results"]["use_gui"] = False
        Log("\teval_rendering=True")
        config["Results"]["eval_rendering"] = True

    save_dir = make_save_dir(config, args.config)
    slam = SLAM(config, save_dir=save_dir, seed=args.seed)
    gui_thread = None
    if slam.viz_channel is not None:
        import os
        import threading

        if os.environ.get("DISPLAY"):
            from monogs_dev_tpu.viz.gui import run_gui

            gui_thread = threading.Thread(
                target=run_gui,
                args=(slam.viz_channel, slam.intr, slam.raster_cfg),
                daemon=True,
            )
            gui_thread.start()
        else:
            Log("use_gui=True but no $DISPLAY; GUI disabled "
                "(use viz.OfflineViewer / export_turntable headless)")
    try:
        if args.resume:
            slam.resume(args.resume)
        slam.run(max_frames=args.max_frames)
        if args.save_checkpoint:
            # without a results dir (save_results=False), still honor the
            # explicit flag instead of silently dropping the checkpoint
            path = slam.save_checkpoint() or slam.save_checkpoint(
                "checkpoint.npz"
            )
            Log(f"checkpoint at {path}")
        if args.eval or config["Results"].get("eval_rendering", False):
            results = slam.evaluate(
                eval_rendering_flag=config["Results"].get("eval_rendering", True)
            )
            Log(json.dumps(results, indent=2), tag="Eval")
    finally:
        slam.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
