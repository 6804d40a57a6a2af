"""SLAM orchestrator — the reference's `SLAM` class (slam.py:25-198) rebuilt.

Wires config -> dataset -> map -> frontend/backend, runs the sequence, and
drives the eval tail (ATE, rendering metrics, color refinement, PLY export).
FPS accounting matches the reference: total frames / total wall time around
the whole frontend run (slam.py:27-30,113-119).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..data import load_dataset
from ..eval.ate import eval_ate
from ..eval.rendering import eval_rendering, save_gaussians
from ..models.camera import Intrinsics
from ..ops.raster_types import RasterConfig
from ..utils.logging import Log
from ..utils.profiling import MetricsLogger, PhaseTimers
from .backend import BackendEngine, BackendThread, InlineBackendScheduler
from .frontend import FrontEnd
from .params import MapOptConfig, StepConfig


def raster_config_from(config) -> RasterConfig:
    tpu = config.get("TPU", {}) or {}
    return RasterConfig(
        tile=int(tpu.get("tile", 16)),
        max_per_tile=int(tpu.get("max_per_tile", 1024)),
        k_dup=int(tpu.get("k_dup", 16)),
        tile_group=int(tpu.get("tile_group", 60)),
        use_pallas=bool(tpu.get("use_pallas", True)),
        tight_cull=bool(tpu.get("tight_cull", True)),
    )


class SLAM:
    def __init__(self, config, save_dir: Optional[str] = None, seed: int = 0):
        self.config = config
        self.save_dir = save_dir

        self.monocular = config["Dataset"]["sensor_type"] == "monocular"
        self.live_mode = config["Dataset"]["type"] == "realsense"
        # spherical harmonics flag -> sh degree 3 or 0 (slam.py:47-51)
        self.step_cfg = StepConfig.from_config(config)
        self.opt_cfg = MapOptConfig.from_config(config)

        self.dataset = load_dataset(config)
        self.intr = Intrinsics(
            fx=self.dataset.fx,
            fy=self.dataset.fy,
            cx=self.dataset.cx,
            cy=self.dataset.cy,
            width=self.dataset.width,
            height=self.dataset.height,
        )
        self.raster_cfg = raster_config_from(config)
        tpu = config.get("TPU", {}) or {}
        self.capacity = int(tpu.get("capacity", 65536))

        self.single_thread = bool(config["Training"].get("single_thread", False))
        self.engine = BackendEngine(
            config,
            self.step_cfg,
            self.opt_cfg,
            self.intr,
            self.raster_cfg,
            capacity=self.capacity,
            seed=seed,
            live_mode=self.live_mode,
        )
        # scheduler: "inline" (default; one host thread, one device command
        # stream) or "thread" (reference-style worker thread — wedges on
        # relay-attached TPUs, fine on CPU/directly-attached chips)
        scheduler = str(tpu.get("scheduler", "inline"))
        if self.single_thread:
            self.backend_thread = None
        elif scheduler == "thread":
            self.backend_thread = BackendThread(self.engine)
        else:
            self.backend_thread = InlineBackendScheduler(self.engine)
        self.viz_channel = None
        if config["Results"].get("use_gui", False):
            from ..viz.snapshot import VizChannel

            self.viz_channel = VizChannel()
        self.frontend = FrontEnd(
            config,
            self.dataset,
            self.engine,
            self.step_cfg,
            self.intr,
            self.raster_cfg,
            backend_thread=self.backend_thread,
            seed=seed + 1,
            save_dir=save_dir,
            throttle=self.live_mode,
            viz_channel=self.viz_channel,
        )
        self.fps: float = 0.0
        self.timers = PhaseTimers()
        self.metrics = MetricsLogger(save_dir)
        self.frontend.metrics = self.metrics

    def run(self, max_frames: Optional[int] = None) -> None:
        if self.backend_thread is not None:
            self.backend_thread.start()
        t0 = time.time()
        self.frontend.run(max_frames=max_frames)
        t1 = time.time()
        n = len(self.dataset) if max_frames is None else min(
            max_frames, len(self.dataset)
        )
        self.fps = n / max(t1 - t0, 1e-9)
        Log(f"Total FPS: {self.fps:.3f}")
        self.metrics.log({"fps": self.fps, "n_frames": n})

    def stop(self) -> None:
        if self.backend_thread is not None:
            self.backend_thread.backend_queue.put(["stop"])
            self.backend_thread.join(timeout=30)

    # ------------------------------------------------------------------ eval

    def evaluate(self, eval_rendering_flag: bool = True) -> dict:
        """Post-run evaluation tail (slam.py:121-190)."""
        from ..utils.device_lock import DEVICE_LOCK

        results = {"fps": self.fps}
        fe, e = self.frontend, self.engine
        results["n_keyframes"] = len(fe.kf_indices)
        with DEVICE_LOCK:
            results["n_gaussians"] = int(np.asarray(e.gmap.aux.active).sum())
        results["telemetry"] = dict(e.telemetry)

        results["ate"] = eval_ate(
            fe.cameras,
            fe.kf_indices,
            self.save_dir,
            0,
            final=True,
            monocular=self.monocular,
        )

        if eval_rendering_flag:
            params, active = e.gmap.params, e.gmap.aux.active
            results["before_opt"] = eval_rendering(
                fe.cameras,
                self.dataset,
                params,
                active,
                self.intr,
                self.raster_cfg,
                self.step_cfg.sh_degree,
                self.save_dir,
                fe.kf_indices,
                iteration="before_opt",
            )
            # color refinement + re-eval (slam.py:154-185)
            if self.backend_thread is not None:
                self.backend_thread.backend_queue.put(["color_refinement"])
                if hasattr(self.backend_thread, "pump"):
                    self.backend_thread.pump(idle_budget=0)
                    fe._drain_frontend_queue()
                else:
                    fe._drain_frontend_queue(block=True)
            else:
                e.color_refinement()
            params, active = e.gmap.params, e.gmap.aux.active
            results["after_opt"] = eval_rendering(
                fe.cameras,
                self.dataset,
                params,
                active,
                self.intr,
                self.raster_cfg,
                self.step_cfg.sh_degree,
                self.save_dir,
                fe.kf_indices,
                iteration="after_opt",
            )
            with DEVICE_LOCK:
                save_gaussians(params, active, self.save_dir, "final", final=True)
        self.metrics.log(results)
        return results

    def save_checkpoint(self, path: Optional[str] = None) -> Optional[str]:
        """Full-state checkpoint (map + moments + poses); see
        utils/checkpoint.py. The reference is save-only PLY; this resumes."""
        from ..utils.checkpoint import save_checkpoint
        from ..utils.device_lock import DEVICE_LOCK

        if path is None:
            if self.save_dir is None:
                return None
            path = os.path.join(self.save_dir, "checkpoint.npz")
        with DEVICE_LOCK:  # fetches the map while the backend may be live
            save_checkpoint(path, self.engine, self.frontend)
        Log(f"checkpoint saved to {path}")
        return path


def make_save_dir(config, config_path: str) -> Optional[str]:
    """results/<dataset>_<scene>/<datetime>/ layout (slam.py:229-242)."""
    if not config["Results"].get("save_results", False):
        return None
    import datetime
    import shutil

    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    path = config["Dataset"].get("dataset_path", "synthetic").rstrip("/")
    tail = os.path.basename(path)
    save_dir = os.path.join(
        config["Results"].get("save_dir", "results"), f"{tail}_{stamp}"
    )
    os.makedirs(save_dir, exist_ok=True)
    try:
        shutil.copy(config_path, os.path.join(save_dir, "config.yml"))
    except Exception:
        pass
    Log(f"saving results in {save_dir}")
    return save_dir
