"""Mapping backend: host orchestration around the jitted mapping engine.

Plays the role of the reference's BackEnd process
(/root/reference/utils/slam_backend.py): owns the authoritative map, the
keyframe store, the occ-aware visibility, and the window optimizer state.
Where the reference loops render/backward in Python, this engine dispatches
chunked `mapping_iterations` device programs (core/mapping.py).

Concurrency model (SURVEY.md §2 "Parallelism & communication"): instead of a
second OS process + CUDA-IPC queues, the backend runs either inline
(single_thread semantics) or as a host thread (`BackendThread`) that
time-slices mapping programs onto the same chip between the frontend's
tracking programs — XLA serializes device execution, matching the
reference's interleaving. The message protocol
(init/keyframe/pause/unpause/color_refinement/stop) is preserved verbatim.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Intrinsics
from ..models.gaussians import (
    GaussianMap,
    compact_map,
    create_map,
    insert_points_evict,
    resize_map,
)
from ..ops.raster_types import RasterConfig
from ..utils.device_lock import DEVICE_LOCK
from ..utils.logging import Log
from .insertion import new_points_from_frame
from .keyframe import Keyframe
from .mapping import (
    KeyframeBatch,
    KeyframeOptState,
    harvest_visibility,
    make_keyframe_opt_state,
    mapping_iterations,
    visibility_prune,
)
from .params import MapOptConfig, StepConfig

CAMERAS_EXTENT = 6.0  # reference slam.py:86 (backend.cameras_extent = 6.0)


@jax.jit
def _set_batch_slot(images, depths, image, depth, s):
    """Overwrite one keyframe slot of the cached (B,H,W,·) batch stacks in
    ONE device program (dynamic slot index -> a single compiled variant)."""
    return (
        jax.lax.dynamic_update_index_in_dim(images, image, s, 0),
        jax.lax.dynamic_update_index_in_dim(depths, depth, s, 0),
    )


@jax.jit
def _swap_random_slots(images, depths, T, exposure, img2, dep2, T2, exp2, start):
    """Replace the 2 random-keyframe slots of a device-resident batch in ONE
    program (dynamic start index). Used between chunks of a mapping round so
    the optimized window poses never leave the device (the per-chunk
    host writeback + rebuild was a full transport roundtrip per chunk on the
    remote-relay device)."""
    return (
        jax.lax.dynamic_update_slice(images, img2, (start, 0, 0, 0)),
        jax.lax.dynamic_update_slice(depths, dep2, (start, 0, 0)),
        jax.lax.dynamic_update_slice(T, T2, (start, 0, 0)),
        jax.lax.dynamic_update_slice(exposure, exp2, (start, 0)),
    )


def next_chunk(
    chunk: int, drift: float, dilation: float, current: int, map_chunk: int
) -> int:
    """PROPORTIONAL feedback control on the binning-reuse chunk length.

    Mapping reuses per-slot tile binnings for a whole chunk of Adam
    iterations; drift beyond the dilation margin silently truncates
    gradients near tile borders, so the controller targets ~60% margin
    utilization: estimate the per-iteration bulk drift from the chunk
    just measured and jump straight to the chunk length that fills 60%
    of the dilation. Growth is damped to 2x per decision (the measurement
    is one chunk old — BackendEngine._consume_chunk_telemetry); shrink
    takes effect immediately.

    The previous incremental form (halve on >0.8*dilation, +1 only when
    drift < 0.2*dilation) pinned the chunk at 1 after init-BA: the p99.5
    drift of ~100 young gaussians in cruise sits between the two gates
    forever, and the round-4 bench window paid 81 dispatches for 96 map
    iterations (~130 ms fixed cost each — the dominant pump term)."""
    per_iter = drift / max(chunk, 1)
    if per_iter <= 0.05 * dilation / max(map_chunk, 1):
        target = map_chunk  # effectively stationary
    else:
        target = int(0.6 * dilation / per_iter)
    if target > current:
        target = min(target, max(current, 1) * 2)
    return max(1, min(map_chunk, target))


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class BackendEngine:
    """Owns the map; executes init/keyframe/mapping/refinement commands."""

    def __init__(
        self,
        config,
        step_cfg: StepConfig,
        opt_cfg: MapOptConfig,
        intr: Intrinsics,
        raster_cfg: RasterConfig,
        capacity: int,
        seed: int = 0,
        live_mode: bool = False,
    ):
        from ..utils.precision import enable_f32_matmuls

        enable_f32_matmuls()  # quality-critical on TPU (utils/precision.py)
        self.config = config
        self.cfg = step_cfg
        self.opt_cfg = opt_cfg
        self.intr = intr
        self.raster_cfg = raster_cfg
        self.capacity = capacity
        self.live_mode = live_mode

        training = config["Training"]
        self.init_itr_num = int(training["init_itr_num"])
        self.init_gaussian_update = int(training["init_gaussian_update"])
        self.init_gaussian_reset = int(training["init_gaussian_reset"])
        self.init_gaussian_th = float(training["init_gaussian_th"])
        self.init_gaussian_extent = CAMERAS_EXTENT * float(
            training["init_gaussian_extent"]
        )
        self.mapping_itr_num = int(training["mapping_itr_num"])
        self.gaussian_update_every = int(training["gaussian_update_every"])
        self.gaussian_update_offset = int(training["gaussian_update_offset"])
        self.gaussian_th = float(training["gaussian_th"])
        self.gaussian_extent = CAMERAS_EXTENT * float(training["gaussian_extent"])
        self.gaussian_reset = int(training["gaussian_reset"])
        self.size_threshold = float(training["size_threshold"])
        self.window_size = int(training["window_size"])
        self.pose_window = int(training["pose_window"])
        self.prune_mode = training.get("prune_mode", "slam")
        self.refinement_itr_num = int(training.get("refinement_itr_num", 26000))
        self.lambda_dssim = float(config["opt_params"]["lambda_dssim"])

        ds = config["Dataset"]
        self.pcd_downsample = int(ds.get("pcd_downsample", 64))
        self.pcd_downsample_init = int(ds.get("pcd_downsample_init", 32))
        self.point_size = float(ds.get("point_size", 0.01))
        self.adaptive_pointsize = bool(ds.get("adaptive_pointsize", True))

        self.use_depth = not self.cfg.monocular
        self.bg_color = jnp.zeros(3)
        tpu_grp = config.get("TPU", {}) or {}
        self.map_chunk = int(tpu_grp.get("map_chunk", 10))  # iters per dispatch
        # background mapping iterations per idle round (reference: 1 per
        # idle loop pass, but it loops continuously on a dedicated GPU
        # process — time-sliced on one chip this is a budget knob)
        self.idle_iters = int(tpu_grp.get("idle_iters", 1))
        self.idle_every = int(tpu_grp.get("idle_every", 1))  # frames/round
        # data-parallel mapping over a device mesh (TPU.mesh_devices > 1):
        # map replicated, window+random keyframe slots sharded, map grads
        # psum over ICI (parallel/mesh.py). Steady-state rounds dispatch the
        # DP step; bootstrap (init BA, uninitialized) stays single-device.
        self.mesh_devices = int(tpu_grp.get("mesh_devices", 0))
        self._dp_step = None
        self._dp_state = None
        if self.mesh_devices > 1:
            self._init_dp()

        # Mapping capacity tier (round-3 perf): the map's static row count.
        # Every per-iteration mapping cost that scales with the STATIC row
        # count (projection, binning sort keys, Adam, densify top-k) runs at
        # the tier, not the worst-case capacity. Bootstrap runs at full
        # capacity (mono inserts ~2*H*W/downsample points per keyframe and
        # peaks well above the steady-state alive count before the init
        # prune); at full-window prune syncs the map is compacted down to
        # `tier_small` when the alive count fits with densify headroom, and
        # grows back to capacity under insert/densify pressure. Two tiers
        # only — each (tier x slot-tier x mode) is a separate mapping
        # compile.
        self.tier_small = int(tpu_grp.get("map_tier_small", 0)) or max(
            capacity // 2, min(capacity, 8192)
        )
        self.tier_small = min(_next_pow2(self.tier_small), capacity)

        self.rng = jax.random.PRNGKey(seed)
        self.np_rng = np.random.default_rng(seed)
        # adaptive chunk: shrinks while measured binning drift approaches
        # the dilation margin (fast map/pose motion, e.g. during init BA),
        # regrows toward map_chunk when drift is small — keeps gradients
        # exact near tile borders without paying per-iteration rebinning
        self._adaptive_chunk = self.map_chunk
        self.reset()

    # ------------------------------------------------------------------ state

    def reset(self) -> None:
        """Full map reset (slam_backend.py:72-84)."""
        self.gmap: GaussianMap = create_map(self.capacity, self.cfg.sh_degree)
        self._grow_pending = False
        self.iteration_count = 0
        # start cautious after every reset: the first init-BA iterations
        # move means tens of pixels per chunk (drift telemetry), so long
        # binning-reuse chunks silently truncate gradients exactly when map
        # quality matters most; the controller regrows the chunk once drift
        # calms down
        self._adaptive_chunk = min(2, int(getattr(self, "map_chunk", 2)))
        self.viewpoints: Dict[int, Keyframe] = {}
        self.current_window: List[int] = []
        self.occ_aware_visibility: Dict[int, jnp.ndarray] = {}
        self.initialized = not self.cfg.monocular
        self.kf_state: Optional[KeyframeOptState] = None
        self._batch_cache = None  # (images, depths, slot kf ids) device stacks
        # deferred idle-round state (batch, slot_ids, pending, n_win): idle
        # mapping rounds are enqueue-only — telemetry fetch and pose
        # writeback are postponed to the next sync point so the host never
        # drains the device queue between frames (each device_get is a
        # relay round-trip)
        self._standing = None
        self._alive_after_prune = None  # post-prune alive count (mono path)
        self._zero_depth = None  # cached device zeros for mono slots
        self.telemetry = {
            "insert_dropped": 0,
            "insert_evicted": 0,  # lowest-opacity actives evicted to make
            # room for keyframe inserts under capacity pressure
            "densify_dropped": 0,
            "map_chunks": 0,  # chunk dispatches (fixed cost each: binning
            # rebuild + host sync) vs iterations actually run
            "map_iters": 0,
            # max screen-space drift (px) of projected means within any
            # chunk that reused its binnings; compare against
            # cfg.mapping_rebin_dilation (gradient truncation is silent
            # beyond that margin)
            "max_binning_drift": 0.0,
            "max_bulk_drift": 0.0,  # p99.5 drift (the controller's signal)
            "map_compactions": 0,  # tier shrinks (compact_map)
            "map_grows": 0,  # tier grows back to capacity
            # DP-path phase evidence (MULTICHIP dryrun tail; VERDICT r4 #7)
            "dp_init_iters": 0,  # init-BA iterations run through the mesh
            "dp_densify_events": 0,
            "dp_resets": 0,
        }

    def _split_rng(self) -> jax.Array:
        self.rng, k = jax.random.split(self.rng)
        return k

    # ------------------------------------------------------ capacity tiers

    def map_rows(self) -> int:
        """Current static row count (the mapping tier)."""
        return int(self.gmap.aux.active.shape[0])

    def _grow_to_capacity(self) -> None:
        """Grow the tier back to full capacity (insert/densify pressure)."""
        rows = self.map_rows()
        if rows >= self.capacity:
            self._grow_pending = False
            return
        self.gmap = resize_map(self.gmap, self.capacity)
        self.telemetry["map_grows"] += 1
        self._grow_pending = False
        Log(
            f"map tier grown {rows} -> {self.capacity} rows",
            tag="MonoGS-TPU",
        )

    def _maybe_compact(self) -> None:
        """Shrink the tier to `tier_small` when the alive count fits with
        densify headroom. Active rows are stably packed to the row prefix;
        the same permutation is applied to the host-side occ-aware
        visibility vectors (kept capacity-padded for the frontend's
        keyframe-policy numpy ops). Called at full-window prune syncs —
        right after visibility pruning collapses the alive count."""
        rows = self.map_rows()
        target = self.tier_small
        if target >= rows:
            return
        alive = getattr(self, "_alive_after_prune", None)
        self._alive_after_prune = None  # consume-once (prune-fresh only)
        if alive is None:
            alive = int(jax.device_get(self.gmap.aux.active.sum()))
        # hysteresis: the compacted tier must hold the alive set PLUS one
        # keyframe insert (~H*W/downsample points) and densify headroom —
        # well below the grow trigger (free < insert estimate), so the tier
        # cannot ping-pong when alive hovers near the boundary
        kf_insert = (self.intr.height * self.intr.width) // self.pcd_downsample
        densify_headroom = min(6144, self.capacity // 8)
        if alive + kf_insert + densify_headroom > target:
            return
        gmap, perm = compact_map(self.gmap, target)
        perm_np = np.asarray(perm)
        self.gmap = gmap
        for k, v in list(self.occ_aware_visibility.items()):
            vv = np.asarray(v)
            if vv.shape[0] < perm_np.shape[0]:
                vv = np.pad(vv, (0, perm_np.shape[0] - vv.shape[0]))
            out = np.zeros(self.capacity, bool)
            out[:target] = vv[perm_np[:target]]
            self.occ_aware_visibility[k] = out
        self.telemetry["map_compactions"] += 1
        Log(
            f"map compacted: {alive} active -> {target} rows (was {rows})",
            tag="MonoGS-TPU",
        )

    # ------------------------------------------------------------- insertion

    def add_next_kf(
        self, frame_idx: int, kf: Keyframe, depth_map: jnp.ndarray, init: bool = False
    ) -> None:
        """extend_from_pcd_seq equivalent (gaussian_model.py:235-...)."""
        downsample = self.pcd_downsample_init if init else self.pcd_downsample
        h, w = self.intr.height, self.intr.width
        budget = _next_pow2(max(int(2 * h * w / downsample), 256))
        if self.map_rows() < self.capacity:
            # grow-before-evict: at a reduced tier, insert pressure means the
            # tier is too small, not that the map is full (eviction is the
            # full-capacity backstop only)
            free = int(jax.device_get((~self.gmap.aux.active).sum()))
            if budget // 2 > free:
                self._grow_to_capacity()
        with DEVICE_LOCK:
            new_params, valid = new_points_from_frame(
                self._split_rng(),
                kf.image,
                depth_map,
                kf.exposure,
                kf.T_w2c,
                self.intr,
                self.cfg.sh_degree,
                budget,
                downsample,
                self.point_size,
                self.adaptive_pointsize,
            )
            self.gmap, dropped, evicted = insert_points_evict(
                self.gmap, new_params, valid, frame_idx
            )
            self.telemetry["insert_dropped"] += int(dropped)
            self.telemetry["insert_evicted"] += int(evicted)
        self.viewpoints[frame_idx] = kf

    # ----------------------------------------------------------- batch build

    def _slot_tier(self) -> int:
        """Static slot-count tier: the smallest of a few fixed sizes that
        holds window + 2 random keyframes. Early phases (init, growing
        window) then pay for 4 slots of binning/scan instead of the full
        window_slots — each tier is its own compiled mapping program."""
        need = min(len(self.current_window), self.cfg.window_slots - 2) + 2
        # two tiers only — every tier is a separate ~1 min mapping compile
        if need <= 4 or self.cfg.window_slots <= 4:
            return min(4, self.cfg.window_slots) if self.cfg.window_slots < 4 else 4
        return self.cfg.window_slots

    def _build_batch(
        self, apply_exposure: bool, frames_to_optimize: int, b: int
    ) -> tuple[KeyframeBatch, list[int]]:
        """Stack the current window + 2 random past keyframes into slots.

        Keyframe images/depths are immutable per keyframe id, so the stacked
        (B, H, W) device arrays are cached across chunk dispatches and only
        the slots whose keyframe assignment changed are rewritten (usually
        just the 2 resampled random slots) — poses/exposures, which mapping
        mutates, are refreshed every call."""
        window = list(self.current_window)[: b - 2]
        others = [i for i in self.viewpoints if i not in set(window)]
        rand: List[int] = []
        if others:
            # host-side numpy draw: a jax.random.choice over jnp.array(others)
            # recompiles (convert/shuffle/slice) at every new keyframe count
            picks = self.np_rng.choice(
                np.array(others), size=min(2, len(others)), replace=False
            )
            rand = [int(i) for i in picks]
        slot_ids = window + rand
        h, w = self.intr.height, self.intr.width

        cache = self._batch_cache
        if cache is not None and cache[0].shape[0] == b:
            images, depths, cached_ids = cache
        else:
            images = jnp.zeros((b, h, w, 3))
            depths = jnp.zeros((b, h, w))
            cached_ids = [None] * b

        # poses/exposures/flags are host numpy: the jitted mapping program
        # transfers them once at dispatch (eager .at[].set ops cost one
        # transport roundtrip each on the remote-relay device)
        T = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        exposure = np.zeros((b, 2), np.float32)
        valid = np.zeros(b, bool)
        opt_pose = np.zeros(b, bool)
        opt_exp = np.zeros(b, bool)
        harvest = np.zeros(b, bool)

        if self._zero_depth is None:
            self._zero_depth = jnp.zeros((h, w))
        new_ids: list = [None] * b
        for s, kf_idx in enumerate(slot_ids):
            kf = self.viewpoints[kf_idx]
            new_ids[s] = kf_idx
            if cached_ids[s] != kf_idx:
                images, depths = _set_batch_slot(
                    images,
                    depths,
                    kf.image,
                    kf.depth if kf.depth is not None else self._zero_depth,
                    np.int32(s),
                )
            T[s] = kf.T_w2c
            exposure[s] = kf.exposure
            valid[s] = True
            in_window = s < len(window)
            harvest[s] = in_window
            if in_window and kf_idx != 0:
                opt_exp[s] = True
                if s < frames_to_optimize:
                    opt_pose[s] = True
        self._batch_cache = (images, depths, new_ids)

        batch = KeyframeBatch(
            images=images,
            depths=depths,
            T_w2c=T,
            exposure=exposure,
            valid=valid,
            optimize_pose=opt_pose,
            optimize_exposure=opt_exp,
            apply_exposure=np.full(b, apply_exposure) & valid,
            harvest_visibility=harvest,
        )
        return batch, slot_ids

    def _writeback_np(self, T_np: np.ndarray, exp_np: np.ndarray, slot_ids: list[int]) -> None:
        for s, kf_idx in enumerate(slot_ids):
            kf = self.viewpoints[kf_idx]
            kf.T_w2c = T_np[s]
            kf.exposure = exp_np[s]

    def _resample_random_slots(
        self, batch: KeyframeBatch, slot_ids: list[int], n_win: int
    ) -> tuple[KeyframeBatch, list[int]]:
        """Redraw the 2 random past keyframes of a device-resident batch
        between chunks (slam_backend.py resamples per iteration; we resample
        per binning-reuse chunk). Window slots — whose poses/exposures the
        previous chunk optimized — stay on device untouched. Falls back to
        keeping the current draw when the round has fewer than 2 random
        slots (early phases)."""
        n_rand = len(slot_ids) - n_win
        others = [i for i in self.viewpoints if i not in set(slot_ids[:n_win])]
        if n_rand != 2 or len(others) < 2:
            return batch, slot_ids
        picks = self.np_rng.choice(np.array(others), size=2, replace=False)
        rand = [int(i) for i in picks]
        kfs = [self.viewpoints[i] for i in rand]
        img2 = jnp.stack([kf.image for kf in kfs])
        if self._zero_depth is None:
            self._zero_depth = jnp.zeros((self.intr.height, self.intr.width))
        dep2 = jnp.stack(
            [kf.depth if kf.depth is not None else self._zero_depth for kf in kfs]
        )
        T2 = np.stack([kf.T_w2c for kf in kfs]).astype(np.float32)
        exp2 = np.stack([kf.exposure for kf in kfs]).astype(np.float32)
        images, depths, T, exposure = _swap_random_slots(
            batch.images, batch.depths, batch.T_w2c, batch.exposure,
            img2, dep2, T2, exp2, np.int32(n_win),
        )
        new_ids = slot_ids[:n_win] + rand
        cache_ids = new_ids + [None] * (batch.T_w2c.shape[0] - len(new_ids))
        self._batch_cache = (images, depths, cache_ids)
        batch = batch._replace(
            images=images, depths=depths, T_w2c=T, exposure=exposure
        )
        return batch, new_ids

    def _consume_chunk_telemetry(
        self, out, chunk: int, densified: bool, extra: tuple = ()
    ) -> tuple:
        """Host fetch + adaptive-chunk feedback for ONE dispatched chunk.

        Called one chunk BEHIND the dispatch loop so the device queue never
        drains on this sync; the controller therefore reacts to the previous
        chunk's drift, one decision late.

        `extra`: additional device arrays to fetch IN THE SAME device_get
        (returned host-side) — every separate device_get is a full relay
        round-trip, so sync points batch their pose/exposure writeback
        fetch with the telemetry fetch."""
        fetched = jax.device_get(
            (out.n_dropped, out.max_drift, out.bulk_drift, out.n_free)
            + tuple(extra)
        )
        n_dropped, drift_dev, bulk_dev, n_free = fetched[:4]
        self.telemetry["densify_dropped"] += int(n_dropped)
        if (int(n_dropped) > 0 or int(n_free) < 2048) and (
            self.map_rows() < self.capacity
        ):
            # densify pressure at a reduced tier: grow before the next chunk
            # so children are never dropped for lack of rows
            self._grow_pending = True
        self.telemetry["map_chunks"] += 1
        self.telemetry["map_iters"] += chunk
        # drift telemetry is meaningless on chunks whose final iteration
        # densified: split children land in slots that were active at
        # binning time, reading as huge fake "drift"
        drift = 0.0 if densified else float(drift_dev)
        bulk = 0.0 if densified else float(bulk_dev)
        if drift > self.telemetry["max_binning_drift"]:
            self.telemetry["max_binning_drift"] = drift
        if bulk > self.telemetry.get("max_bulk_drift", 0.0):
            self.telemetry["max_bulk_drift"] = bulk
            if bulk > self.cfg.mapping_rebin_dilation:
                Log(
                    f"mapping bulk (p99.5) binning drift {bulk:.1f}px exceeds "
                    f"dilation {self.cfg.mapping_rebin_dilation:.1f}px "
                    "(gradients near tile borders truncated for >0.5% of "
                    "gaussians; lower TPU.map_chunk or raise the dilation)",
                    tag="MonoGS-TPU",
                )
        if not densified:
            # the controller keys on the BULK (p99.5) drift: the max has a
            # heavy per-iteration tail (a few young gaussians move ~3 px/it)
            # that pinned the chunk at 1 and made the fixed per-dispatch cost
            # dominate mapping
            self._adaptive_chunk = next_chunk(
                chunk,
                bulk,
                self.cfg.mapping_rebin_dilation,
                self._adaptive_chunk,
                self.map_chunk,
            )
        return fetched[4:]

    # ---------------------------------------------------------------- mapping

    def flush_standing(self) -> None:
        """Consume a deferred idle round's telemetry and write its optimized
        poses back to the keyframe store. Must run before anything reads
        `viewpoints` poses (push_to_frontend, batch rebuilds on a changed
        window, checkpointing, eval)."""
        st = self._standing
        if st is None:
            return
        self._standing = None
        batch, slot_ids, pending, _ = st
        with DEVICE_LOCK:
            if pending is not None:
                T_np, exp_np = self._consume_chunk_telemetry(
                    *pending, extra=(batch.T_w2c, batch.exposure)
                )
            else:
                T_np, exp_np = jax.device_get((batch.T_w2c, batch.exposure))
            self._writeback_np(T_np, exp_np, slot_ids)

    def map(
        self,
        iters: int = 1,
        prune: bool = False,
        init_mode: bool = False,
        frames_to_optimize: Optional[int] = None,
        harvest: bool = True,
        sync: bool = True,
    ) -> None:
        """BackEnd.map equivalent (slam_backend.py:142-318), chunk-dispatched.

        `harvest=False` skips the occ-aware-visibility render pass; callers
        that immediately follow up with a harvesting call (idle-loop single
        iterations, the pre-prune mapping burst) use it — visibility is only
        consumed at sync/prune points, while the reference recomputes it per
        iteration only because its renders emit n_touched anyway."""
        if not self.current_window:
            return
        if frames_to_optimize is None:
            frames_to_optimize = self.pose_window

        if self._dp_step is not None:
            # ALL mapping phases route through the mesh — including the
            # init BA (the heaviest phase; VERDICT r4 #7 lifted the old
            # bootstrap exclusion)
            self.flush_standing()
            last_batch, slot_ids = self._map_dp(
                iters, frames_to_optimize, init_mode=init_mode
            )
        else:
            last_batch, slot_ids = self._map_single(
                iters, init_mode, frames_to_optimize, sync=sync or harvest
            )

        if last_batch is not None and harvest:
            self._harvest_tail(last_batch, slot_ids)

        if prune and len(self.current_window) == self.window_size:
            with DEVICE_LOCK:
                self._visibility_prune()
                self._maybe_compact()
            if not self.initialized:
                self.initialized = True
                Log("Initialized SLAM")

    def _map_single(
        self, iters: int, init_mode: bool, frames_to_optimize: int,
        sync: bool = True,
    ):
        """Single-device chunk-dispatched mapping round (the default path).

        With sync=False the round is enqueue-only: the final chunk's
        telemetry fetch and the pose writeback are deferred into
        `self._standing`, adopted by the next round over the same window
        (or flushed when the window changes)."""
        if init_mode:
            update_every, update_offset = self.init_gaussian_update, 1
            reset_interval = self.init_gaussian_reset
            g_th, g_extent = self.init_gaussian_th, self.init_gaussian_extent
            size_th = 0.0
        else:
            update_every, update_offset = (
                self.gaussian_update_every,
                self.gaussian_update_offset,
            )
            reset_interval = self.gaussian_reset
            g_th, g_extent = self.gaussian_th, self.gaussian_extent
            size_th = self.size_threshold

        remaining = iters
        last_batch = None
        slot_ids: list[int] = []
        batch = None
        pending = None  # previous chunk's (out, chunk, densified)
        tier = self._slot_tier()
        if self.kf_state is None or self.kf_state.mu.shape[0] != tier:
            self.kf_state = make_keyframe_opt_state(tier)
        n_win = min(len(self.current_window), tier - 2)

        # adopt a deferred idle round's device-resident batch when this
        # round optimizes the same window slots — poses never left the
        # device, so no writeback/rebuild roundtrip is owed yet
        st = self._standing
        if st is not None:
            st_batch, st_ids, st_pending, st_nwin = st
            if (
                not init_mode
                and st_nwin == n_win
                and st_ids[:st_nwin] == list(self.current_window)[:n_win]
                and st_batch.images.shape[0] == tier
            ):
                self._standing = None
                batch, slot_ids, pending = st_batch, st_ids, st_pending
            else:
                self.flush_standing()
        while remaining > 0:
            if self._grow_pending:
                with DEVICE_LOCK:
                    self._grow_to_capacity()
                    # the standing device batch is tier-agnostic (keyframe
                    # stacks, poses); only the map changed size
            if self.cfg.mapping_rebin_every > 0:
                # in-program rebinning: the jitted loop rebuilds binnings on
                # its own cadence AND right after every densify/reset, so
                # neither the drift controller nor event splitting applies —
                # dispatch the whole round as one program call (the fixed
                # per-dispatch relay cost is the dominant pump term)
                chunk = min(remaining, max(self.map_chunk, 1))
            else:
                chunk = min(self._adaptive_chunk, remaining)
                # the device program reuses per-slot binnings for a whole
                # chunk; end the chunk exactly ON the next densify/opacity-
                # reset event so a topology change never renders against a
                # stale binning
                event = self._next_map_event(
                    self.iteration_count, update_every, update_offset,
                    reset_interval, init_mode,
                )
                chunk = min(chunk, event - self.iteration_count)
            with DEVICE_LOCK:
                if batch is None:
                    batch, slot_ids = self._build_batch(
                        apply_exposure=not init_mode,
                        frames_to_optimize=frames_to_optimize,
                        b=tier,
                    )
                else:
                    # chunks after the first: poses/exposures stay on device
                    # (out.batch), only the 2 random keyframe slots redraw
                    batch, slot_ids = self._resample_random_slots(
                        batch, slot_ids, n_win
                    )
                out = mapping_iterations(
                    self.gmap,
                    batch,
                    self.kf_state,
                    jnp.asarray(self.iteration_count, jnp.int32),
                    self._split_rng(),
                    self.bg_color,
                    jnp.float32(g_th),
                    jnp.float32(g_extent),
                    self.cfg,
                    self.opt_cfg,
                    self.intr,
                    self.raster_cfg,
                    iters=chunk,
                    update_every=update_every,
                    update_offset=update_offset,
                    reset_interval=reset_interval,
                    size_threshold=size_th,
                    use_depth=self.use_depth,
                    init_mode=init_mode,
                )
                self.gmap = out.gmap
                self.kf_state = out.kf_state
                self.iteration_count += chunk
                it_end = self.iteration_count
                densified = (it_end % update_every) == update_offset or (
                    init_mode and it_end == reset_interval
                )
                # fetch the PREVIOUS chunk's telemetry only now that this
                # chunk is enqueued: the host sync happens while the device
                # is busy, so the queue never drains between chunks
                if pending is not None:
                    self._consume_chunk_telemetry(*pending)
                pending = (out, chunk, densified)
                batch = out.batch
            last_batch = out.batch
            remaining -= chunk

        if last_batch is None:
            return last_batch, slot_ids
        if not sync:
            # enqueue-only round: defer telemetry + writeback to the next
            # sync point (adopted by the next same-window round, or flushed)
            self._standing = (last_batch, slot_ids, pending, n_win)
            return last_batch, slot_ids
        if pending is not None:
            with DEVICE_LOCK:
                # ONE pose/exposure writeback per round (not per chunk),
                # fetched in the SAME device_get as the chunk telemetry —
                # each separate get is a full relay round-trip
                T_np, exp_np = self._consume_chunk_telemetry(
                    *pending, extra=(last_batch.T_w2c, last_batch.exposure)
                )
                self._writeback_np(T_np, exp_np, slot_ids)
        return last_batch, slot_ids

    def _harvest_tail(self, last_batch, slot_ids: list) -> None:
        """Refresh occ-aware visibility from the round's final poses."""
        with DEVICE_LOCK:
            visibility = harvest_visibility(
                self.gmap, last_batch, self.bg_color, self.cfg, self.intr,
                self.raster_cfg,
            )
            visibility = np.asarray(visibility)
        if visibility.shape[1] < self.capacity:
            # host-side visibility vectors are ALWAYS capacity-padded so the
            # frontend's keyframe-policy numpy ops see one fixed length
            # regardless of the current mapping tier
            visibility = np.pad(
                visibility,
                ((0, 0), (0, self.capacity - visibility.shape[1])),
            )
        for s, kf_idx in enumerate(slot_ids):
            if s < len(self.current_window):
                self.occ_aware_visibility[kf_idx] = visibility[s]
        self.occ_aware_visibility = {
            k: v
            for k, v in self.occ_aware_visibility.items()
            if k in set(self.current_window)
        }

    # ------------------------------------------------------- DP mapping path

    def _init_dp(self) -> None:
        """Build the mesh + jitted DP mapping step (TPU.mesh_devices)."""
        from ..parallel import dp_mapping_step, make_mesh

        n = self.mesh_devices
        self.mesh = make_mesh(n)
        # slot count padded to a multiple of the mesh size; extra slots ride
        # along with valid=False (loss masked to zero inside the step)
        self._dp_slots = -(-self.cfg.window_slots // n) * n
        self._dp_step = dp_mapping_step(
            self.mesh,
            self.cfg,
            self.opt_cfg,
            self.intr,
            self.raster_cfg,
            use_depth=self.use_depth,
            update_every=self.gaussian_update_every,
            update_offset=self.gaussian_update_offset,
            size_threshold=self.size_threshold,
        )
        # init-BA variant (VERDICT r4 #7): bootstrap is the phase with the
        # most keyframes x iterations (300-1050), so on real multi-chip
        # hardware it is the FIRST place DP pays — same step, the init
        # densify cadence (init_gaussian_update @ offset 1, no screen-size
        # pruning; slam_backend.py:86-140)
        self._dp_step_init = dp_mapping_step(
            self.mesh,
            self.cfg,
            self.opt_cfg,
            self.intr,
            self.raster_cfg,
            use_depth=self.use_depth,
            update_every=self.init_gaussian_update,
            update_offset=1,
            size_threshold=0.0,
        )
        Log(
            f"DP mapping enabled: {n}-device mesh, {self._dp_slots} slots",
            tag="MonoGS-TPU",
        )

    def _map_dp(self, iters: int, frames_to_optimize: int, init_mode: bool = False):
        """Data-parallel mapping round: one dp_mapping_step per iteration
        over the mesh (parallel/mesh.py:96-294) — keyframe slots sharded,
        map replicated, grads psum'd over ICI.

        Cadence parity with _map_single: densify fires inside the step at
        the phase's update_every/update_offset; the opacity reset — global
        at init_gaussian_reset during init BA (slam_backend.py:86-140),
        non-visible at gaussian_reset otherwise (slam_backend.py:300-305) —
        is applied between steps when the counter crosses the boundary."""
        from ..models.gaussians import reset_opacity, reset_opacity_nonvisible
        from ..parallel import DPBatch, make_dp_opt_state, shard_batch

        step_fn = self._dp_step_init if init_mode else self._dp_step
        g_th = self.init_gaussian_th if init_mode else self.gaussian_th
        g_extent = (
            self.init_gaussian_extent if init_mode else self.gaussian_extent
        )
        upd_every = self.init_gaussian_update if init_mode else self.gaussian_update_every
        upd_offset = 1 if init_mode else self.gaussian_update_offset

        b = self._dp_slots
        dropped_acc = []
        with DEVICE_LOCK:
            kb, slot_ids = self._build_batch(
                apply_exposure=not init_mode,
                frames_to_optimize=frames_to_optimize,
                b=b,
            )
            batch = shard_batch(
                self.mesh,
                DPBatch(
                    images=kb.images,
                    depths=kb.depths,
                    T_w2c=jnp.asarray(kb.T_w2c),
                    exposure=jnp.asarray(kb.exposure),
                    valid=jnp.asarray(kb.valid),
                    optimize_pose=jnp.asarray(kb.optimize_pose),
                    optimize_exposure=jnp.asarray(kb.optimize_exposure),
                ),
            )
            if self._dp_state is None or self._dp_state.mu.shape[0] != b:
                self._dp_state = make_dp_opt_state(b)
            opt = self._dp_state
            gmap = self.gmap
            for _ in range(int(iters)):
                it_next = self.iteration_count + 1
                do_update = (it_next % upd_every) == upd_offset
                if do_update:
                    self.telemetry["dp_densify_events"] += 1
                if init_mode:
                    # initialize_map: ONE global opacity reset to 0.01 at
                    # the init reset iteration (core/mapping.py init branch)
                    if it_next == self.init_gaussian_reset:
                        gmap = reset_opacity(gmap, 0.01)
                        self.telemetry["dp_resets"] += 1
                elif (it_next % self.gaussian_reset) == 0 and not do_update:
                    self.telemetry["dp_resets"] += 1
                    kb_now = kb._replace(
                        T_w2c=batch.T_w2c, exposure=batch.exposure
                    )
                    vis = harvest_visibility(
                        gmap, kb_now, self.bg_color, self.cfg, self.intr,
                        self.raster_cfg,
                    )
                    vis_union = (
                        vis & jnp.asarray(kb.harvest_visibility)[:, None]
                    ).any(axis=0)
                    gmap = reset_opacity_nonvisible(gmap, vis_union, 0.4)
                gmap, batch, opt, loss, dropped = step_fn(
                    gmap,
                    batch,
                    opt,
                    jnp.asarray(self.iteration_count, jnp.int32),
                    self._split_rng(),
                    jnp.float32(g_th),
                    jnp.float32(g_extent),
                )
                self.iteration_count += 1
                dropped_acc.append(dropped)
            self.gmap = gmap
            self._dp_state = opt
            T_np, exp_np = jax.device_get((batch.T_w2c, batch.exposure))
            self._writeback_np(T_np, exp_np, slot_ids)
            if dropped_acc:
                self.telemetry["densify_dropped"] += int(
                    np.sum(jax.device_get(dropped_acc))
                )
            self.telemetry["map_iters"] += int(iters)
            self.telemetry["map_chunks"] += 1
            if init_mode:
                self.telemetry["dp_init_iters"] += int(iters)
        # harvest tail expects a KeyframeBatch at the optimized poses
        last_batch = kb._replace(T_w2c=batch.T_w2c, exposure=batch.exposure)
        return last_batch, slot_ids

    @staticmethod
    def _next_map_event(
        start: int, update_every: int, update_offset: int,
        reset_interval: int, init_mode: bool,
    ) -> int:
        """Smallest iteration > start where densify or opacity reset fires
        (mapping_iterations' in-loop cadence, core/mapping.py)."""
        k = (start - update_offset) // update_every * update_every + update_offset
        while k <= start:
            k += update_every
        cands = [k]
        if init_mode:
            if start < reset_interval:
                cands.append(reset_interval)
        else:
            cands.append((start // reset_interval + 1) * reset_interval)
        return min(cands)

    def _visibility_prune(self) -> None:
        b = self.cfg.window_slots
        n = self.map_rows()
        vis = np.zeros((b, n), bool)
        valid = np.zeros(b, bool)
        kf_ids = np.full(b, -1, np.int32)
        for s, kf_idx in enumerate(self.current_window[:b]):
            if kf_idx in self.occ_aware_visibility:
                vis[s] = np.asarray(self.occ_aware_visibility[kf_idx])[:n]
                valid[s] = True
                kf_ids[s] = kf_idx
        sorted_window = sorted(self.current_window, reverse=True)
        third_newest = sorted_window[2] if len(sorted_window) > 2 else 0
        prev_active = self.gmap.aux.active
        self.gmap = visibility_prune(
            self.gmap,
            vis,
            valid,
            kf_ids,
            np.int32(third_newest),
            np.asarray(self.initialized),
            self.prune_mode,
            self.cfg.monocular,
        )
        self._alive_after_prune = None
        if self.cfg.monocular:
            # keep visibility vectors consistent with the pruned map
            # (one batched d2h fetch, then host numpy)
            active_np, prev_np = jax.device_get(
                (self.gmap.aux.active, prev_active)
            )
            # free alive count for _maybe_compact: saves that method's own
            # relay round-trip on the (monocular) bench path
            self._alive_after_prune = int(active_np.sum())
            kept = active_np | ~prev_np
            if kept.shape[0] < self.capacity:
                # occ vectors are capacity-padded; rows past the tier were
                # never prunable (inactive), so they stay "kept"
                kept = np.pad(
                    kept,
                    (0, self.capacity - kept.shape[0]),
                    constant_values=True,
                )
            for k in list(self.occ_aware_visibility):
                self.occ_aware_visibility[k] = (
                    np.asarray(self.occ_aware_visibility[k]) & kept
                )

    # ------------------------------------------------------------- commands

    def handle_init(self, frame_idx: int, kf: Keyframe, depth_map: jnp.ndarray):
        """["init"] handler (slam_backend.py:396-407)."""
        Log("Resetting the system")
        self.reset()
        self.current_window = [frame_idx]
        self.add_next_kf(frame_idx, kf, depth_map, init=True)
        self.initialize_map(frame_idx)

    def initialize_map(self, frame_idx: int) -> None:
        """initialize_map (slam_backend.py:86-140)."""
        self.kf_state = None  # sized to the slot tier inside map()
        self.map(
            iters=self.init_itr_num,
            init_mode=True,
            frames_to_optimize=0,  # the first keyframe's pose stays fixed
        )
        Log("Initialized map")

    def handle_keyframe(
        self,
        frame_idx: int,
        kf: Keyframe,
        current_window: List[int],
        depth_map: jnp.ndarray,
        single_thread: bool,
    ) -> None:
        """["keyframe"] handler (slam_backend.py:409-475)."""
        self.current_window = list(current_window)
        self.add_next_kf(frame_idx, kf, depth_map, init=False)

        frames_to_optimize = self.pose_window
        iter_per_kf = self.mapping_itr_num if single_thread else 10
        if not self.initialized:
            if len(self.current_window) == self.window_size:
                frames_to_optimize = self.window_size - 1
                iter_per_kf = 50 if self.live_mode else 300
                Log("Performing initial BA for initialization")
            else:
                iter_per_kf = self.mapping_itr_num

        self.kf_state = None  # fresh Adam per keyframe, sized in map()
        # reference: map(iter_per_kf) then map(prune=True) (one more
        # iteration + prune, slam_backend.py:473-474) — fused into ONE call
        # (one harvest, one prune) to halve per-dispatch overhead
        self.map(
            iters=iter_per_kf + 1, prune=True,
            frames_to_optimize=frames_to_optimize,
        )

    def color_refinement(self, iterations: Optional[int] = None) -> None:
        """Photometric-only refinement (slam_backend.py:320-353).

        Budget defaults to the reference's 26,000 iterations; configurable
        via Training.refinement_itr_num."""
        from .refinement import run_color_refinement

        self.flush_standing()
        with DEVICE_LOCK:
            self.gmap, self.iteration_count = run_color_refinement(
                self,
                iterations=self.refinement_itr_num if iterations is None else iterations,
            )

    # ----------------------------------------------------------------- views

    def keyframe_poses(self) -> Dict[int, np.ndarray]:
        self.flush_standing()
        return {idx: np.asarray(kf.T_w2c) for idx, kf in self.viewpoints.items()}


class _BackendProtocol:
    """Shared reference message protocol
    (init/keyframe/pause/unpause/color_refinement/stop,
    slam_backend.py:384-477) over a backend_queue/frontend_queue pair, with
    the reference's idle cadence: one background mapping iteration per idle
    round, a 10-iteration prune pass + frontend sync every 10 un-synced
    rounds (slam_backend.py:369-383). The Gaussian map itself is shared
    (JAX arrays are immutable; the frontend reads a consistent snapshot
    reference instead of the CUDA-IPC deep copy)."""

    engine: BackendEngine
    single_thread: bool

    def _init_protocol(self, engine: BackendEngine, single_thread: bool):
        self.engine = engine
        self.single_thread = single_thread
        self.backend_queue: "queue.Queue" = queue.Queue()
        self.frontend_queue: "queue.Queue" = queue.Queue()
        self.pause = False
        self.last_sent = 0
        self.stopped = False

    def push_to_frontend(self, tag: str = "sync_backend") -> None:
        self.last_sent = 0
        e = self.engine
        e.flush_standing()  # keyframe poses must be host-current
        with DEVICE_LOCK:
            keyframes = [
                (idx, np.asarray(e.viewpoints[idx].T_w2c))
                for idx in e.current_window
            ]
            snapshot = (e.gmap.params, e.gmap.aux.active)
        self.frontend_queue.put(
            [tag, snapshot, dict(e.occ_aware_visibility), keyframes]
        )

    def _idle_round(self) -> None:
        e = self.engine
        if self.stopped or self.pause or not e.current_window or self.single_thread:
            return
        # reference cadence: after 10 un-synced background iterations, a
        # 10-iteration prune pass + frontend sync (slam_backend.py:377-383);
        # counted in iterations so idle_iters batching keeps the cadence.
        # The round that CROSSES the threshold fuses its idle iterations
        # with the prune pass into ONE dispatch round — same iteration
        # count and prune/sync cadence, one fewer fixed per-dispatch cost
        # (relay round-trip + standing-batch adoption) per sync cycle.
        if self.last_sent + e.idle_iters >= 10:
            e.map(iters=e.idle_iters + 10, prune=True)
            self.push_to_frontend()
        else:
            # enqueue-only background round: no telemetry fetch, no pose
            # writeback — the device queue stays full through the
            # frontend's next tracking dispatch
            e.map(iters=e.idle_iters, harvest=False, sync=False)
            self.last_sent += e.idle_iters

    def _handle(self, data) -> None:
        e = self.engine
        tag = data[0]
        if tag == "stop":
            self.stopped = True
        elif tag == "pause":
            self.pause = True
        elif tag == "unpause":
            self.pause = False
        elif tag == "color_refinement":
            e.color_refinement()
            self.push_to_frontend()
        elif tag == "init":
            _, frame_idx, kf, depth_map = data
            e.handle_init(frame_idx, kf, depth_map)
            self.push_to_frontend("init")
        elif tag == "keyframe":
            _, frame_idx, kf, window, depth_map = data
            e.handle_keyframe(frame_idx, kf, window, depth_map, self.single_thread)
            self.push_to_frontend("keyframe")
        else:
            raise RuntimeError(f"Unprocessed message {tag}")


class BackendThread(threading.Thread, _BackendProtocol):
    """Reference-style message-driven backend running as a host thread.

    NOTE: some remote-attached TPU transports (the axon relay) wedge on
    device dispatch from worker threads; `InlineBackendScheduler` is the
    default there (same protocol, frontend-pumped)."""

    def __init__(self, engine: BackendEngine, single_thread: bool = False):
        super().__init__(daemon=True)
        self._init_protocol(engine, single_thread)

    def run(self) -> None:
        while not self.stopped:
            try:
                data = self.backend_queue.get(timeout=0.005)
            except queue.Empty:
                self._idle_round()
                continue
            self._handle(data)


class InlineBackendScheduler(_BackendProtocol):
    """Message-driven backend pumped synchronously by the frontend thread.

    The TPU-idiomatic schedule for one chip: a single host thread issues
    ONE command stream, time-slicing tracking programs and mapping programs
    — the role the reference fills with two OS processes sharing one GPU.
    `pump()` drains pending protocol messages and runs up to `idle_budget`
    idle mapping rounds; the frontend calls it once per frame and while
    waiting on init/keyframe backpressure."""

    def __init__(self, engine: BackendEngine, single_thread: bool = False):
        self._init_protocol(engine, single_thread)

    # thread-API compatibility (SLAM.run/stop treat schedulers uniformly)
    def start(self) -> None:
        pass

    def is_alive(self) -> bool:
        return not self.stopped

    def join(self, timeout: Optional[float] = None) -> None:
        self.pump(idle_budget=0)

    def pump(self, idle_budget: int = 1) -> None:
        while True:
            try:
                data = self.backend_queue.get_nowait()
            except queue.Empty:
                break
            self._handle(data)
        if idle_budget > 0:
            # run background mapping only every idle_every-th pumped frame —
            # per-dispatch overhead on relay-attached chips makes per-frame
            # single-iteration rounds disproportionately expensive
            self._pump_tick = getattr(self, "_pump_tick", 0) + 1
            if self._pump_tick % max(self.engine.idle_every, 1) == 0:
                for _ in range(idle_budget):
                    self._idle_round()
