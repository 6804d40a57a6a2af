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


def resolve_thread_flags(config) -> tuple:
    """(frontend_single_thread, backend_single_thread).

    The reference reads two SAME-NAMED but distinct flags:
    `Training.single_thread` in the frontend (slam_frontend.py:55) and
    `Dataset.single_thread` in the backend (slam_backend.py:61-65). The
    `_sp` Replica configs set ONLY the Dataset one — serialized mapping at
    mapping_itr_num iters/kf — on top of a Replica base that always sets
    the Training one (frontend backpressure)."""
    return (
        bool(config["Training"].get("single_thread", False)),
        bool((config.get("Dataset") or {}).get("single_thread", False)),
    )


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
        from ..utils.precision import enable_f32_matmuls

        enable_f32_matmuls()  # measured 17.6 -> 1.0 cm ATE on v5e (see module)
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

        # Reference quirk (SURVEY.md §2.14): TWO distinct flags share the
        # name "single_thread". `Training.single_thread` is the FRONTEND
        # flag (keyframe backpressure + create_kf gating,
        # /root/reference/utils/slam_frontend.py:55,366,433);
        # `Dataset.single_thread` is the BACKEND flag — serialized mapping
        # at mapping_itr_num iters/kf with no background rounds
        # (/root/reference/utils/slam_backend.py:61-65,377,421). The latter
        # is the only content of the nine `_sp` Replica configs and selects
        # the direct (schedulerless) mode here.
        self.single_thread, self.backend_single_thread = resolve_thread_flags(
            config
        )
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
        if self.backend_single_thread:
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
        self.metrics = MetricsLogger(
            save_dir,
            use_wandb=bool(config["Results"].get("use_wandb", False)),
            wandb_kwargs={
                "project": config["Dataset"].get("type", "monogs_tpu"),
                "config": config,
            },
        )
        self.frontend.metrics = self.metrics
        self.frontend.timers = self.timers

    def prewarm(self) -> None:
        """Compile every device-program variant the SLAM run will dispatch,
        against throwaway inputs, so no compile ever lands inside a timed
        segment (bench hygiene; VERDICT r1 task 1a).

        Variants enumerated from BackendEngine/FrontEnd dispatch sites:
        track_frame (one shape), mapping_iterations x {init-mode at the
        small slot tier, normal mode at each slot tier}, harvest_visibility
        per tier, visibility_prune, new_points_from_frame + insert_points
        per insertion budget, and the monocular depth-synthesis programs."""
        import jax
        import jax.random as jrandom

        from ..models.gaussians import (
            compact_map,
            create_map,
            insert_points_evict,
            resize_map,
        )
        from ..utils.device_lock import DEVICE_LOCK
        from .backend import _next_pow2
        from .insertion import mono_bootstrap_depth, new_points_from_frame, pseudo_depth_map
        from .mapping import (
            KeyframeBatch,
            harvest_visibility,
            make_keyframe_opt_state,
            mapping_iterations,
            visibility_prune,
        )
        from .tracking import track_frame

        e = self.engine
        cfg, intr, rcfg = self.step_cfg, self.intr, self.raster_cfg
        h, w = intr.height, intr.width
        ws = cfg.window_slots
        t0_tier = min(4, ws) if ws >= 4 else ws
        tiers = sorted({t0_tier, ws})
        rng = jrandom.PRNGKey(7)
        t_start = time.time()

        with DEVICE_LOCK:
            gmap = create_map(e.capacity, cfg.sh_degree)
            # seed a few active gaussians so programs exercise real paths.
            # Budget/downsample pairs mirror add_next_kf exactly: the INIT
            # insert (frame 0) and the normal keyframe insert are separate
            # compiled shapes, and production always dispatches the jitted
            # insert_points_evict variant (backend.py:337) — prewarm that
            # one, at full capacity, for both budgets
            pairs = [
                (e.pcd_downsample_init, True),
                (e.pcd_downsample, False),
            ]
            image = jnp.zeros((h, w, 3)) + 0.5
            depth = jnp.full((h, w), 2.0, jnp.float32)
            new_params = valid = None
            seen_variants = set()
            for downsample, _is_init in pairs:
                budget = _next_pow2(max(int(2 * h * w / downsample), 256))
                # dedupe on (budget, downsample): `downsample` is a static
                # jit arg of _new_points_from_frame_jit, so two downsamples
                # that round to the same pow2 budget are still two compiles
                # (and the last pair must leave `new_params` holding the
                # production keyframe-insert shape for the tier-small evict
                # prewarm below)
                if (budget, downsample) in seen_variants:
                    continue
                seen_variants.add((budget, downsample))
                new_params, valid = new_points_from_frame(
                    rng, image, depth, jnp.zeros(2), jnp.eye(4), intr,
                    cfg.sh_degree, budget, downsample, e.point_size,
                    e.adaptive_pointsize,
                )
                gmap, _, _ = insert_points_evict(gmap, new_params, valid, 0)
                jax.block_until_ready(gmap.params.xyz)
                Log(
                    f"prewarm: insert budget={budget} compiled "
                    f"({time.time() - t_start:.1f}s)"
                )
            # `new_params` is left holding the NORMAL-keyframe budget shape
            # (last pair) — the tier-small evict prewarm below must match
            # the production keyframe-insert shape, not the init one

            # tracking program (grad mask computed in-program), one compile
            # per (capacity tier x working-set compaction m) pair the
            # frontend can dispatch. m=0 (full tier) always; adaptive mode
            # adds the ladder rungs for tiers at/below the backend's steady
            # tier (frontend._choose_compact's gate).
            import dataclasses as _dc

            if cfg.tracking_solver == "gn":
                from .tracking_gn import track_frame_gn as track_fn
            else:
                track_fn = track_frame
            fe = self.frontend
            for tier in fe.track_tiers:
                ms = [0]
                if fe.track_compact_mode < 0 and tier <= e.tier_small:
                    ms += [m for m in fe._compact_ladder(tier) if 0 < m < tier]
                elif 0 < fe.track_compact_mode < tier:
                    ms.append(fe.track_compact_mode)
                p_t = jax.tree.map(lambda x: x[:tier], gmap.params)
                a_t = gmap.aux.active[:tier]
                for m in ms:
                    track = track_fn(
                        p_t, a_t, jnp.eye(4), jnp.zeros(2),
                        image, depth, None, jnp.zeros(3),
                        _dc.replace(cfg, track_compact=m), intr,
                        fe.track_raster_cfg,
                        use_depth=not cfg.monocular,
                    )
                    jax.block_until_ready(track.T_w2c)
                    Log(
                        f"prewarm: tracking tier {tier} m={m} compiled "
                        f"({time.time() - t_start:.1f}s)"
                    )

            # mapping program variants
            def dummy_batch(b):
                flags = jnp.arange(b) >= 0
                return KeyframeBatch(
                    images=jnp.zeros((b, h, w, 3)),
                    depths=jnp.full((b, h, w), 2.0, jnp.float32),
                    T_w2c=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
                    exposure=jnp.zeros((b, 2)),
                    valid=flags,
                    optimize_pose=jnp.arange(b) > 0,
                    optimize_exposure=jnp.arange(b) > 0,
                    apply_exposure=flags,
                    harvest_visibility=flags,
                )

            variants = [
                (
                    t0_tier, e.init_gaussian_update, 1, e.init_gaussian_reset,
                    0.0, True,
                ),
            ] + [
                (
                    t, e.gaussian_update_every, e.gaussian_update_offset,
                    e.gaussian_reset, e.size_threshold, False,
                )
                for t in tiers
            ]
            for b, upd, off, rst, sz, init_mode in variants:
                out = mapping_iterations(
                    gmap, dummy_batch(b), make_keyframe_opt_state(b),
                    jnp.zeros((), jnp.int32), rng, self.engine.bg_color,
                    jnp.float32(e.gaussian_th), jnp.float32(e.gaussian_extent),
                    cfg, self.opt_cfg, intr, rcfg, iters=jnp.asarray(1, jnp.int32),
                    update_every=upd, update_offset=off, reset_interval=rst,
                    size_threshold=sz, use_depth=e.use_depth,
                    init_mode=init_mode,
                )
                jax.block_until_ready(out.gmap.params.xyz)
                Log(
                    f"prewarm: mapping variant b={b} init={init_mode} "
                    f"compiled ({time.time() - t_start:.1f}s)"
                )

            # remaining small programs a run dispatches (zero-compile
            # warmup): rng split internals, the batch-slot update, and the
            # tracking-tier high-water reduction at full capacity
            _ka, _kb = jrandom.split(rng)  # unpack: compiles _unstack too
            jax.block_until_ready(_ka)
            from .backend import _set_batch_slot, _swap_random_slots
            from .frontend import _high_water as _hw

            for b in tiers:
                imgs = jnp.zeros((b, h, w, 3))
                deps = jnp.zeros((b, h, w))
                out_slot = _set_batch_slot(
                    imgs, deps, image, depth, jnp.asarray(0, jnp.int32)
                )
                jax.block_until_ready(out_slot[0])
                swapped = _swap_random_slots(
                    imgs, deps,
                    jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
                    jnp.zeros((b, 2)),
                    jnp.zeros((2, h, w, 3)), jnp.zeros((2, h, w)),
                    jnp.tile(jnp.eye(4)[None], (2, 1, 1)),
                    jnp.zeros((2, 2)),
                    jnp.asarray(0, jnp.int32),
                )
                jax.block_until_ready(swapped[0])
            jax.block_until_ready(_hw(gmap.aux.active))
            # 4x4 pose conversion (np float64 -> device f32): the frontend
            # does this on every frame reset/init; a cheap but counted
            # compile if first seen inside the warmup window
            jax.block_until_ready(
                jnp.asarray(np.eye(4, dtype=np.float64), jnp.float32)
            )
            jax.block_until_ready(
                jnp.asarray(jnp.full((4, 4), 1.0), jnp.float32)  # weak f32
            )

            for b in tiers:
                vis = harvest_visibility(
                    gmap, dummy_batch(b), self.engine.bg_color, cfg, intr, rcfg
                )
                jax.block_until_ready(vis)
                # every compile gets its own line: the bench watchdog's
                # stall detector is fed by output, and several silent
                # multi-minute compiles in a row would kill a healthy child
                Log(f"prewarm: harvest b={b} compiled ({time.time() - t_start:.1f}s)")

            pruned = visibility_prune(
                gmap,
                jnp.zeros((ws, e.capacity), bool),
                jnp.zeros((ws,), bool),
                jnp.full((ws,), -1, jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.asarray(True),
                e.prune_mode,
                cfg.monocular,
            )
            jax.block_until_ready(pruned.params.xyz)
            Log(f"prewarm: prune compiled ({time.time() - t_start:.1f}s)")

            # tier-small variants (backend.py _maybe_compact): steady state
            # runs mapping/harvest/prune at the compacted row count with the
            # full slot tier (the window is full once compaction can fire)
            if e.tier_small < e.capacity:
                gmap_small, _ = compact_map(gmap, e.tier_small)
                jax.block_until_ready(gmap_small.params.xyz)
                out = mapping_iterations(
                    gmap_small, dummy_batch(ws), make_keyframe_opt_state(ws),
                    jnp.zeros((), jnp.int32), rng, self.engine.bg_color,
                    jnp.float32(e.gaussian_th), jnp.float32(e.gaussian_extent),
                    cfg, self.opt_cfg, intr, rcfg,
                    iters=jnp.asarray(1, jnp.int32),
                    update_every=e.gaussian_update_every,
                    update_offset=e.gaussian_update_offset,
                    reset_interval=e.gaussian_reset,
                    size_threshold=e.size_threshold,
                    use_depth=e.use_depth, init_mode=False,
                )
                jax.block_until_ready(out.gmap.params.xyz)
                Log(
                    f"prewarm: mapping tier {e.tier_small} compiled "
                    f"({time.time() - t_start:.1f}s)"
                )
                vis = harvest_visibility(
                    gmap_small, dummy_batch(ws), self.engine.bg_color, cfg,
                    intr, rcfg,
                )
                jax.block_until_ready(vis)
                Log(f"prewarm: tier-small harvest compiled ({time.time() - t_start:.1f}s)")
                pruned = visibility_prune(
                    gmap_small,
                    jnp.zeros((ws, e.tier_small), bool),
                    jnp.zeros((ws,), bool),
                    jnp.full((ws,), -1, jnp.int32),
                    jnp.zeros((), jnp.int32),
                    jnp.asarray(True),
                    e.prune_mode,
                    cfg.monocular,
                )
                jax.block_until_ready(pruned.params.xyz)
                Log(f"prewarm: tier-small prune compiled ({time.time() - t_start:.1f}s)")
                # grow-back program (insert/densify pressure path)
                regrown = resize_map(gmap_small, e.capacity)
                jax.block_until_ready(regrown.params.xyz)
                # keyframe insertion at the small tier (first post-compaction
                # keyframe otherwise compiles inside the measured window)
                gm2, _, _ = insert_points_evict(
                    gmap_small, new_params, valid, 1
                )
                jax.block_until_ready(gm2.params.xyz)
                Log(f"prewarm: tier-small insert compiled ({time.time() - t_start:.1f}s)")
                jax.block_until_ready(
                    jnp.asarray((~gmap_small.aux.active).sum())
                )
                from .frontend import _high_water

                jax.block_until_ready(_high_water(gmap_small.aux.active))
                # tracking against a tier-small snapshot: the frontend's
                # _slice_tier program compiles per (snapshot rows, tier)
                # pair, and the first tier-small snapshot appears right at
                # the end of warmup — compile the slice combos now. The
                # track programs themselves are shape-keyed on the tier and
                # already compiled above.
                from .frontend import _slice_tier

                for t in self.frontend.track_tiers:
                    if t < e.tier_small:
                        _, a_t = _slice_tier(
                            gmap_small.params, gmap_small.aux.active, t
                        )
                        jax.block_until_ready(a_t)

            if cfg.monocular:
                jax.block_until_ready(
                    mono_bootstrap_depth(rng, h, w, init=True)
                )
                jax.block_until_ready(
                    pseudo_depth_map(rng, depth, jnp.ones((h, w)), image,
                                     jnp.asarray(4.0, jnp.float32),
                                     cfg.rgb_boundary_threshold)
                )
        Log(f"prewarm: all program variants compiled in {time.time() - t_start:.1f}s")

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
        e.flush_standing()  # any deferred idle round's poses
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
            # Before/After table artifact + wandb mirror (slam.py:143-186)
            self.metrics.log_table(
                "Metrics",
                ["tag", "psnr", "ssim", "lpips", "RMSE ATE", "FPS"],
                [
                    [tag, r["mean_psnr"], r["mean_ssim"], r["mean_lpips"],
                     results["ate"], self.fps]
                    for tag, r in (
                        ("Before", results["before_opt"]),
                        ("After", results["after_opt"]),
                    )
                ],
            )
        self.metrics.log(results)
        self.metrics.finish()
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
        self.engine.flush_standing()
        with DEVICE_LOCK:  # fetches the map while the backend may be live
            save_checkpoint(path, self.engine, self.frontend)
        Log(f"checkpoint saved to {path}")
        return path

    def resume(self, path: str) -> int:
        """Restore a full-state checkpoint and position the frontend at the
        next unprocessed frame; a following `run()` continues the sequence.
        Must be called before `run()` (the backend protocol is quiescent)."""
        from ..utils.checkpoint import restore_checkpoint
        from ..utils.device_lock import DEVICE_LOCK

        with DEVICE_LOCK:
            next_frame = restore_checkpoint(path, self.engine, self.frontend)
        Log(
            f"resumed from {path}: {len(self.engine.viewpoints)} keyframes, "
            f"continuing at frame {next_frame}"
        )
        return next_frame


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
