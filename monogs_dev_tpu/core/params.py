"""Static (hashable) parameter bundles that participate in jit cache keys.

Field values mirror the reference YAML schema (configs/**, SURVEY.md §2.14);
construction from a loaded config happens in `from_config` helpers so the
YAML tree stays the single source of truth.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Knobs consumed inside jitted tracking/mapping steps."""

    monocular: bool = False
    sh_degree: int = 0
    isotropic: bool = False  # reference pipeline isotropic flag (unused by SLAM cfgs)
    alpha: float = 0.95
    rgb_boundary_threshold: float = 0.01
    # tracking (slam_frontend.py:132-193)
    tracking_max_iters: int = 100
    cam_trans_lr: float = 0.001
    cam_rot_lr: float = 0.003
    exposure_lr: float = 0.01
    convergence_threshold: float = 1e-4  # pose_utils.py:88
    # mapping (slam_backend.py:142-318)
    window_slots: int = 10  # window_size + 2 random frames
    pose_window: int = 3
    pose_lr_scale: float = 0.5  # backend pose lr x0.5 (slam_backend.py:431-446)
    # TPU binning reuse during tracking: rebin every `rebin_every` iterations
    # with tile boxes dilated by `rebin_dilation` pixels (pose drift margin).
    # rebin_every=1 reproduces CUDA per-iteration binning exactly. The margin
    # is essential with tight_cull: entries are trimmed exactly to the
    # alpha_min ellipse, so un-margined reuse loses contributions at tile
    # borders as the pose moves (was tolerable with loose radius boxes).
    rebin_every: int = 8
    rebin_dilation: float = 4.0
    # TPU tracking working-set compaction: once per rebin, gather the <=
    # track_compact Gaussians that actually have tile entries and run every
    # iteration of the reuse window on those rows only (projection + VJP +
    # props gather shrink from the capacity tier to the visible set).
    # Bit-exact when nothing is dropped (ops/rasterize.py compact_binning);
    # drops are surfaced via TrackResult.compact_dropped and a loud log.
    # TPU.track_compact: 0 = off, > 0 = fixed cap, -1 = ADAPTIVE (the
    # frontend replaces this field per dispatch with a ladder rung sized
    # 1.35x over the measured TrackResult.n_binned, full tier on any
    # shortfall — core/frontend.py _choose_compact). The fixed-cap history:
    # on the VGA mono bench the bootstrap map bins ~53k gaussians (first
    # keyframe + init-BA densification), so a fixed 16384 working set
    # dropped 37k of them and tracking lost lock instantly (n_vis 0,
    # resets every window) — that is exactly what the adaptive gate
    # (bootstrap runs full tier) exists to avoid.
    track_compact: int = 0
    # mapping reuses per-slot binnings for a whole chunk dispatch
    # (core/mapping.py); same drift-margin idea
    mapping_rebin_dilation: float = 4.0
    # densify top-k budgets per densify event (models/gaussians.py
    # densify_and_prune): requests beyond the budget are dropped (counted
    # in densify_dropped). Reference growth is unbounded
    # (gaussian_model.py:523-555); scale-pressure configs raise these so
    # drops stay <10% of requests (TPU.densify_clone_budget/_split_budget)
    densify_clone_budget: int = 4096
    densify_split_budget: int = 2048
    # TPU.map_slots_per_iter (> 0): each mapping iteration renders only a
    # random rotating subset of this many LIVE slots (the newest window
    # keyframe always included) instead of every slot — the per-iteration
    # pump cost scales with rendered slots while gradients still cycle the
    # whole window across iterations (the reference's 2-random-keyframe
    # spirit, slam_backend.py:168-227). 0 = reference semantics (all
    # slots). Quality-gated A/B in BASELINE.md before any config enables
    # it. Steady-state rounds only: init-BA and pre-window-fill rounds
    # always render every slot (core/mapping.py).
    map_slots_per_iter: int = 0
    # IN-PROGRAM mapping rebinning: > 0 rebuilds the per-slot binnings
    # inside the jitted mapping loop every `mapping_rebin_every`
    # iterations AND immediately after every densify/opacity-reset, so
    # the host chunk length is decoupled from binning drift entirely
    # (the fixed ~130 ms per-dispatch relay cost no longer scales with
    # drift; split/clone children start rendering at the next in-loop
    # rebin instead of the next host dispatch). 0 = off: binnings are
    # built once per dispatch and the adaptive chunk controller
    # (core/backend.py next_chunk) bounds drift by shortening chunks.
    mapping_rebin_every: int = 0
    # TPU coarse-to-fine tracking (off by default for reference parity):
    # `pyramid_levels` extra half-resolution levels run before the full-res
    # loop (each costs ~1/4 per halving), capped at `pyramid_coarse_iters`
    # iterations per coarse level.
    pyramid_levels: int = 0
    pyramid_coarse_iters: int = 60
    # TPU loss-plateau tracking exit: stop after `plateau_iters` iterations
    # without a `plateau_rel_tol` relative loss improvement. Defaults OFF (0)
    # so the reference's ||tau||-only stopping criterion
    # (pose_utils.py:76-93) holds in every parity config; benches/configs
    # opt in via Training.tracking_plateau_iters.
    plateau_iters: int = 0
    plateau_rel_tol: float = 1e-4
    # tracking-loss edge mask (camera_utils.py:114-143), computed inside the
    # tracking program when the caller passes grad_mask=None
    edge_threshold: float = 1.1
    per_block_mask: bool = False
    # pose solver: "adam" = the reference's first-order loop
    # (core/tracking.py); "gn" = damped Gauss-Newton on the image-space
    # linearization (core/tracking_gn.py) — ~3x fewer render passes per
    # frame on a 6-DoF problem (Training.tracking_solver)
    tracking_solver: str = "adam"
    # initial Levenberg damping for the GN solver (relative, scales
    # diag(H)); raised 4x on uphill steps, halved on accepted ones
    gn_lm_init: float = 1e-3

    @staticmethod
    def from_config(config) -> "StepConfig":
        training = config["Training"]
        monocular = config["Dataset"]["sensor_type"] == "monocular"
        return StepConfig(
            monocular=monocular,
            sh_degree=3 if training.get("spherical_harmonics", False) else 0,
            alpha=float(training.get("alpha", 0.95)),
            rgb_boundary_threshold=float(training.get("rgb_boundary_threshold", 0.01)),
            tracking_max_iters=int(training.get("tracking_itr_num", 100)),
            cam_trans_lr=float(training["lr"]["cam_trans_delta"]),
            cam_rot_lr=float(training["lr"]["cam_rot_delta"]),
            exposure_lr=float(training["lr"].get("exposure", 0.01)),
            window_slots=int(training.get("window_size", 8)) + 2,
            pose_window=int(training.get("pose_window", 3)),
            pyramid_levels=int(training.get("tracking_pyramid_levels", 0)),
            pyramid_coarse_iters=int(
                training.get("tracking_pyramid_coarse_iters", 60)
            ),
            plateau_iters=int(training.get("tracking_plateau_iters", 0)),
            plateau_rel_tol=float(training.get("tracking_plateau_rel_tol", 1e-4)),
            tracking_solver=str(training.get("tracking_solver", "adam")),
            gn_lm_init=float(training.get("tracking_gn_lm_init", 1e-3)),
            track_compact=int(
                (config.get("TPU", {}) or {}).get("track_compact", 0)
            ),
            rebin_every=int(
                (config.get("TPU", {}) or {}).get("rebin_every", 8)
            ),
            rebin_dilation=float(
                (config.get("TPU", {}) or {}).get("rebin_dilation", 4.0)
            ),
            mapping_rebin_dilation=float(
                (config.get("TPU", {}) or {}).get("mapping_rebin_dilation", 4.0)
            ),
            mapping_rebin_every=int(
                (config.get("TPU", {}) or {}).get("mapping_rebin_every", 0)
            ),
            map_slots_per_iter=int(
                (config.get("TPU", {}) or {}).get("map_slots_per_iter", 0)
            ),
            densify_clone_budget=int(
                (config.get("TPU", {}) or {}).get("densify_clone_budget", 4096)
            ),
            densify_split_budget=int(
                (config.get("TPU", {}) or {}).get("densify_split_budget", 2048)
            ),
            edge_threshold=float(training.get("edge_threshold", 1.1)),
            per_block_mask=config["Dataset"].get("type") == "replica",
        )


@dataclasses.dataclass(frozen=True)
class MapOptConfig:
    """3DGS optimizer hyperparameters (opt_params group; base_config.yaml)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densify_grad_threshold: float = 0.0002
    spatial_lr_scale: float = 6.0  # reference init_lr(6.0) at slam.py:54

    @staticmethod
    def from_config(config) -> "MapOptConfig":
        opt = config["opt_params"]
        return MapOptConfig(
            position_lr_init=float(opt["position_lr_init"]),
            position_lr_final=float(opt["position_lr_final"]),
            position_lr_delay_mult=float(opt["position_lr_delay_mult"]),
            position_lr_max_steps=int(opt["position_lr_max_steps"]),
            feature_lr=float(opt["feature_lr"]),
            opacity_lr=float(opt["opacity_lr"]),
            scaling_lr=float(opt["scaling_lr"]),
            rotation_lr=float(opt["rotation_lr"]),
            percent_dense=float(opt["percent_dense"]),
            lambda_dssim=float(opt["lambda_dssim"]),
            densify_grad_threshold=float(opt["densify_grad_threshold"]),
        )
