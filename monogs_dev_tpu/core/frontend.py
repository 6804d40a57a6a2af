"""Tracking frontend: per-frame loop, keyframe policy, window management.

Rebuild of FrontEnd (/root/reference/utils/slam_frontend.py). Hot compute
(tracking, pseudo-depth synthesis) runs as jitted device programs
(core/tracking.py, core/insertion.py); the keyframe policy and window
bookkeeping stay host-side numpy, as in the reference.

Two execution modes mirror the reference's process topology (SURVEY.md §2
"Parallelism & communication"):
  - direct (single_thread): backend commands run inline;
  - threaded: commands go through the reference's message protocol to a
    `BackendThread`, with the same backpressure rules (wait while an init or
    keyframe request is in flight).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Intrinsics
from ..ops.raster_types import RasterConfig
from ..utils.device_lock import DEVICE_LOCK
from ..utils.logging import Log
from .backend import BackendEngine, BackendThread
from .insertion import mono_bootstrap_depth, pseudo_depth_map
from .keyframe import Keyframe
from .params import StepConfig
from .tracking import TrackResult, track_frame


@jax.jit
def _high_water(active: jnp.ndarray) -> jnp.ndarray:
    """1 + highest active row index (0 when empty) — the prefix bound used
    to pick a tracking capacity tier."""
    n = active.shape[0]
    return jnp.max(
        jnp.where(active, jnp.arange(n, dtype=jnp.int32) + 1, 0)
    )


@jax.jit
def _valid_rgb_depth(image, depth, threshold):
    """RGB-D keyframe depth: observed depth masked to valid-RGB pixels
    (slam_frontend.py:103-107) — one program instead of eager ops."""
    return jnp.where(image.sum(axis=-1) > threshold, depth, 0.0)


@functools.partial(jax.jit, static_argnames=("tier",))
def _slice_tier(params, active, tier: int):
    """Prefix-slice the map snapshot to a capacity tier in ONE device
    program. Eager per-leaf slicing costs one transport roundtrip per leaf
    on the remote-relay device (~180 ms for the 6-leaf param set)."""
    return jax.tree.map(lambda x: x[:tier], params), active[:tier]


@dataclasses.dataclass
class FrameInfo:
    """Host-side per-frame record (for eval and keyframe policy)."""

    idx: int
    T_est: np.ndarray  # (4, 4) W2C estimate
    T_gt: np.ndarray
    exposure: np.ndarray
    is_keyframe: bool = False


# ---------------------------------------------------------------------------
# keyframe policy (host, numpy) — slam_frontend.py:198-286


def is_keyframe_check(
    T_cur: np.ndarray,
    T_last_kf: np.ndarray,
    median_depth: float,
    cur_vis: np.ndarray,
    last_kf_vis: np.ndarray,
    kf_translation: float,
    kf_min_translation: float,
    kf_overlap: float,
) -> bool:
    dist = np.linalg.norm((T_cur @ np.linalg.inv(T_last_kf))[0:3, 3])
    dist_check = dist > kf_translation * median_depth
    dist_check2 = dist > kf_min_translation * median_depth
    union = np.count_nonzero(cur_vis | last_kf_vis)
    intersection = np.count_nonzero(cur_vis & last_kf_vis)
    point_ratio = intersection / max(union, 1)
    return (point_ratio < kf_overlap and dist_check2) or dist_check


def add_to_window(
    cur_frame_idx: int,
    cur_vis: np.ndarray,
    occ_aware_visibility: Dict[int, np.ndarray],
    window: List[int],
    poses: Dict[int, np.ndarray],
    kf_cutoff: float,
    initialized: bool,
    window_size: int,
) -> Tuple[List[int], Optional[int]]:
    n_dont_touch = 2
    window = [cur_frame_idx] + window
    removed_frame = None

    # overlap eviction (Szymkiewicz-Simpson)
    to_remove = []
    cutoff = kf_cutoff if initialized else 0.4
    for i in range(n_dont_touch, len(window)):
        kf_idx = window[i]
        vis = occ_aware_visibility[kf_idx]
        intersection = np.count_nonzero(cur_vis & vis)
        denom = max(min(np.count_nonzero(cur_vis), np.count_nonzero(vis)), 1)
        if intersection / denom <= cutoff:
            to_remove.append(kf_idx)
    if to_remove:
        window.remove(to_remove[-1])
        removed_frame = to_remove[-1]

    # inverse-distance eviction when over capacity
    if len(window) > window_size:
        T0_wc = np.linalg.inv(poses[cur_frame_idx])
        inv_dist = []
        for i in range(n_dont_touch, len(window)):
            T_i = poses[window[i]]
            inv_dists = []
            for j in range(n_dont_touch, len(window)):
                if i == j:
                    continue
                T_j_wc = np.linalg.inv(poses[window[j]])
                inv_dists.append(
                    1.0 / (np.linalg.norm((T_i @ T_j_wc)[0:3, 3]) + 1e-6)
                )
            k = np.sqrt(np.linalg.norm((T_i @ T0_wc)[0:3, 3]))
            inv_dist.append(k * sum(inv_dists))
        idx = int(np.argmax(inv_dist))
        removed_frame = window[n_dont_touch + idx]
        window.remove(removed_frame)

    return window, removed_frame


# ---------------------------------------------------------------------------


class FrontEnd:
    def __init__(
        self,
        config,
        dataset,
        engine: BackendEngine,
        step_cfg: StepConfig,
        intr: Intrinsics,
        raster_cfg: RasterConfig,
        backend_thread: Optional[BackendThread] = None,
        seed: int = 1,
        save_dir: Optional[str] = None,
        throttle: bool = False,
        viz_channel=None,
    ):
        self.config = config
        self.dataset = dataset
        self.engine = engine
        self.backend_thread = backend_thread
        self.cfg = step_cfg
        self.intr = intr
        self.raster_cfg = raster_cfg
        # TPU.track_alpha_min (> reference 1/255): coarser contribution
        # cutoff for the TRACKING loop only — tight culling then bins fewer
        # tail entries and saturation exits earlier, shrinking blend work
        # linearly. Pose gradients from sub-threshold tail pixels are
        # negligible; quality impact is measured (tools/probe_quality.py /
        # surface regression) before any config enables it. Mapping,
        # keyframe-policy, and eval renders keep reference alpha_min.
        tam = float((config.get("TPU") or {}).get("track_alpha_min", 0.0))
        self.track_raster_cfg = (
            dataclasses.replace(raster_cfg, alpha_min=tam)
            if tam > 0.0
            else raster_cfg
        )
        # TPU.track_compact: 0 = off, > 0 = fixed working-set cap, -1 =
        # ADAPTIVE — pick the compaction tier from the measured binned-entry
        # count (TrackResult.n_binned) with a safety margin, fall back to
        # the full tier whenever the margin can't be met or drops occur.
        # The fixed-cap mode is what broke at bootstrap (53k binned vs a
        # 16384 cap lost lock instantly — core/params.py history); adaptive
        # mode never compacts below 1.35x the recent binned max.
        self.track_compact_mode = int(
            (config.get("TPU") or {}).get("track_compact", 0)
        )
        self._binned_hist: List[int] = []  # recent n_binned maxima
        self._compact_m = 0  # current compaction tier (0 = full)
        self.save_dir = save_dir
        self.throttle = throttle
        self.viz_channel = viz_channel
        self.paused = False

        training = config["Training"]
        self.monocular = step_cfg.monocular
        self.kf_interval = int(training.get("kf_interval", 5))
        self.window_size = int(training.get("window_size", 8))
        self.kf_translation = float(training.get("kf_translation", 0.08))
        self.kf_min_translation = float(training.get("kf_min_translation", 0.05))
        self.kf_overlap = float(training.get("kf_overlap", 0.9))
        self.kf_cutoff = float(training.get("kf_cutoff", 0.4))
        self.edge_threshold = float(training.get("edge_threshold", 1.1))
        self.single_thread = bool(training.get("single_thread", False))
        # TPU extension (off by default for reference parity): seed tracking
        # with a constant-velocity motion model instead of the previous pose
        # (the reference starts from the prior pose alone,
        # slam_frontend.py:129-130) — fewer tracking iterations per frame.
        self.const_velocity = bool(training.get("const_velocity_init", False))
        self.save_trj = bool(config["Results"].get("save_trj", False))
        self.save_trj_kf_intv = int(config["Results"].get("save_trj_kf_intv", 10))
        self.per_block_mask = config["Dataset"]["type"] == "replica"
        self.use_depth = not self.monocular

        self.bg_color = jnp.zeros(3)
        self.rng = jax.random.PRNGKey(seed)

        # state (slam_frontend.py:29-44)
        self.cameras: Dict[int, FrameInfo] = {}
        self.kf_indices: List[int] = []
        self.current_window: List[int] = []
        self.occ_aware_visibility: Dict[int, np.ndarray] = {}
        self.initialized = not self.monocular
        self.reset = True
        self.requested_init = False
        self.requested_keyframe = 0
        self.median_depth = 4.0
        self.anchor_idx = 0  # last bootstrap/reset frame
        self.cur_frame_idx = 0  # persistent: run() is resumable
        self.metrics = None  # optional MetricsLogger injected by SLAM
        self.timers = None  # optional PhaseTimers injected by SLAM
        # frontend's render snapshot of the map (synced from backend)
        self.snapshot = (engine.gmap.params, engine.gmap.aux.active)
        self.ate_log: List[dict] = []
        # Capacity tiers for the tracking program: every per-iteration cost
        # in the loop (projection rows, binning sort keys, gather tables)
        # scales with the STATIC capacity, while the alive count is far
        # smaller for most of a run. Tracking is read-only over the map, and
        # `insert_points` always fills the lowest free slots, so active rows
        # stay within a low prefix; tracking runs on the smallest tier
        # prefix that covers the snapshot's high-water mark.
        cap = engine.capacity
        # three tiers (= three compiled tracking programs): cap/4, cap/2,
        # cap — the bench map's high-water sits
        # between cap/4 and cap/2 for most of a mono run (9.6k inserts per
        # keyframe), and per-iteration tracking cost scales with the static
        # tier (projection rows + binning sort keys), so the middle tier
        # roughly halves tracking cost there for one extra ~1 min compile
        self.track_tiers = sorted(
            {min(cap, max(4096, cap // 4)), min(cap, max(4096, cap // 2)), cap}
        )
        self._snapshot_hw: Optional[int] = None  # recomputed lazily per sync
        self._sliced_snapshot = None  # (tier, params, active) cache per sync
        # one-frame-ahead h2d prefetch: the upload of frame i+1 overlaps
        # frame i's tracking program (a synchronous VGA upload costs
        # ~150-200 ms on the remote-relay transport)
        self._prefetch: dict = {}
        self._zero_depth = None  # cached device zeros for monocular depth

    # ----------------------------------------------------------------- comms

    def _send(self, msg) -> None:
        if self.backend_thread is not None:
            self.backend_thread.backend_queue.put(msg)
        else:
            tag = msg[0]
            e = self.engine
            if tag == "init":
                e.handle_init(msg[1], msg[2], msg[3])
            elif tag == "keyframe":
                e.handle_keyframe(msg[1], msg[2], msg[3], msg[4], True)
            elif tag == "color_refinement":
                e.color_refinement()
            elif tag == "stop":
                pass
            self._sync_direct(tag)

    def _sync_direct(self, tag: str) -> None:
        e = self.engine
        self.snapshot = (e.gmap.params, e.gmap.aux.active)
        self._snapshot_hw = None
        self._sliced_snapshot = None
        self.occ_aware_visibility = {
            k: np.asarray(v) for k, v in e.occ_aware_visibility.items()
        }
        corr, newest = self._gauge_correction(
            {i: np.asarray(kf.T_w2c) for i, kf in e.viewpoints.items()}
        )
        for idx, kf in e.viewpoints.items():
            if idx in self.cameras:
                self.cameras[idx].T_est = np.asarray(kf.T_w2c)
        self._apply_gauge(corr, newest, set(e.viewpoints))
        if tag == "init":
            self.requested_init = False
        elif tag == "keyframe":
            self.requested_keyframe = max(0, self.requested_keyframe - 1)

    def _gauge_correction(self, kf_poses: Dict[int, np.ndarray]):
        """Correction that transports stale per-frame estimates into the
        gauge the backend's BA just moved the keyframes (and map) to.

        Mapping optimizes window keyframe poses jointly with the map (most
        drastically the 300-iteration window-fill init-BA,
        slam_backend.py:421-433); frames tracked AFTER the newest keyframe
        still carry the old gauge, so the next tracking init — prev-pose
        (reference slam_frontend.py:128-130) or const-velocity — would start
        against the updated map from an inconsistent pose. Measured on the
        VGA mono bench: the uncorrected handoff loses tracking lock right
        after the init-BA (visibility 0.78 -> 0 within 3 frames) and never
        recovers. T_f_new = T_f_old @ inv(T_kf_old) @ T_kf_new is exact for
        a rigid gauge move; a pure rescale is not representable and remains
        a (smaller) residual."""
        synced = [i for i in kf_poses if i in self.cameras]
        if not synced:
            return None, None
        newest = max(synced)
        T_old = self.cameras[newest].T_est
        T_new = kf_poses[newest]
        corr = np.linalg.inv(T_old) @ T_new
        if np.abs(corr - np.eye(4)).max() < 1e-6:
            return None, None
        return corr, newest

    def _apply_gauge(self, corr, newest, kf_ids) -> None:
        if corr is None:
            return
        for idx, cam in self.cameras.items():
            if idx > newest and idx not in kf_ids:
                cam.T_est = cam.T_est @ corr

    def _drain_frontend_queue(self, block: bool = False) -> None:
        if self.backend_thread is None:
            return
        q = self.backend_thread.frontend_queue
        while True:
            try:
                data = q.get(block=block, timeout=2000.0 if block else None)
            except queue.Empty:
                return
            tag, snapshot, visibility, keyframes = data
            self.snapshot = snapshot
            self._snapshot_hw = None
            self._sliced_snapshot = None
            self.occ_aware_visibility = {
                k: np.asarray(v) for k, v in visibility.items()
            }
            kf_poses = {int(k): np.asarray(T) for k, T in keyframes}
            corr, newest = self._gauge_correction(kf_poses)
            for kf_idx, T in kf_poses.items():
                if kf_idx in self.cameras:
                    self.cameras[kf_idx].T_est = T
            self._apply_gauge(corr, newest, set(kf_poses))
            if tag == "init":
                self.requested_init = False
            elif tag == "keyframe":
                self.requested_keyframe = max(0, self.requested_keyframe - 1)
            block = False

    # ------------------------------------------------------------- per frame

    def _split_rng(self) -> jax.Array:
        self.rng, k = jax.random.split(self.rng)
        return k

    def _load_frame(self, idx: int):
        """The edge mask is computed inside the tracking program
        (grad_mask=None). Image/depth come back as device arrays: either
        the async h2d started by `_prefetch_frame` during the previous
        frame's tracking, or a fresh (async) device_put."""
        hit = self._prefetch.pop(idx, None)
        if hit is not None:
            return hit
        return self._fetch_frame(idx)

    def _fetch_frame(self, idx: int):
        image_np, depth_np, T_gt = self.dataset[idx]
        image = jax.device_put(image_np)  # async; overlaps host work
        depth = jax.device_put(depth_np) if depth_np is not None else None
        return image, depth, np.asarray(T_gt), None

    def _prefetch_frame(self, idx: int) -> None:
        if idx not in self._prefetch and idx < len(self.dataset):
            self._prefetch = {idx: self._fetch_frame(idx)}

    def initialize(self, cur_frame_idx: int, image, depth, T_gt, grad_mask) -> None:
        """Bootstrap / reset (slam_frontend.py:110-126)."""
        self.initialized = not self.monocular
        self.kf_indices = []
        self.current_window = [cur_frame_idx]
        self.occ_aware_visibility = {}
        self.anchor_idx = cur_frame_idx

        T0 = jnp.asarray(T_gt, jnp.float32)  # GT anchor for frame 0
        kf = Keyframe(
            idx=cur_frame_idx,
            image=image,
            depth=depth if self.use_depth else None,
            T_w2c=T0,
            exposure=jnp.zeros(2),
            T_gt=T_gt,
            grad_mask=grad_mask,
        )
        self.cameras[cur_frame_idx] = FrameInfo(
            cur_frame_idx, np.asarray(T_gt), T_gt, np.zeros(2), is_keyframe=True
        )
        self.kf_indices.append(cur_frame_idx)

        with DEVICE_LOCK:
            if self.monocular or depth is None:
                depth_map = mono_bootstrap_depth(
                    self._split_rng(), self.intr.height, self.intr.width,
                    init=True,
                )
            else:
                depth_map = _valid_rgb_depth(
                    image, depth, self.cfg.rgb_boundary_threshold
                )

        self.requested_init = True
        self._send(["init", cur_frame_idx, kf, depth_map])
        self.reset = False

    def _tracking_tier(self, active) -> int:
        """Smallest capacity tier covering the snapshot's active prefix."""
        if self._snapshot_hw is None:
            self._snapshot_hw = int(jax.device_get(_high_water(active)))
        for t in self.track_tiers:
            if t >= self._snapshot_hw:
                return t
        return self.track_tiers[-1]

    @staticmethod
    def _compact_ladder(tier: int) -> List[int]:
        """Candidate working-set sizes for a tracking tier. Two rungs only:
        each (tier, m) pair is a separately compiled tracking program that
        prewarm must pay for (core/system.py)."""
        return [tier // 2, (3 * tier) // 4]

    def _choose_compact(self, tier: int) -> int:
        """Working-set compaction size for this frame's tracking dispatch.

        Adaptive mode (-1): smallest ladder rung >= 1.35x the recent binned
        max, sticky to the current rung while it keeps a 1.2x margin (no
        per-frame flapping between rungs = no surprise compiles). Gated to
        tiers <= the backend's steady tier so the bootstrap phase — whose
        binned set transiently spikes (the failure that disabled the fixed
        cap) — always runs the full tier."""
        mode = self.track_compact_mode
        if mode == 0:
            return 0
        if mode > 0:
            return mode if mode < tier else 0
        if tier > self.engine.tier_small or not self._binned_hist:
            return 0
        maxb = max(self._binned_hist)
        cands = [m for m in self._compact_ladder(tier) if m >= 1.35 * maxb]
        best = min(cands) if cands else 0
        cur = self._compact_m
        if (
            0 < cur < tier
            and cur >= 1.2 * maxb
            and (best == 0 or best >= cur)
        ):
            return cur
        return best

    def tracking(self, cur_frame_idx: int, image, depth, grad_mask) -> TrackResult:
        prev = self.cameras[cur_frame_idx - 1]
        T_init = prev.T_est
        # const-velocity extrapolation must not reach across a reset
        # boundary: pre-reset estimates were tracked against the discarded
        # map, so a velocity formed from (anchor_gt, drifted_prev) throws
        # the first post-reset frames far off and re-triggers the reset
        if (
            self.const_velocity
            and (cur_frame_idx - 2) in self.cameras
            and (cur_frame_idx - 2) >= self.anchor_idx
        ):
            prev2 = self.cameras[cur_frame_idx - 2]
            T_init = prev.T_est @ np.linalg.inv(prev2.T_est) @ prev.T_est
        with DEVICE_LOCK:
            tier = self._tracking_tier(self.snapshot[1])
            if self._sliced_snapshot is None or self._sliced_snapshot[0] != tier:
                params, active = self.snapshot
                if tier < active.shape[0]:
                    params, active = _slice_tier(params, active, tier)
                self._sliced_snapshot = (tier, params, active)
            _, params, active = self._sliced_snapshot
            use_depth = self.use_depth and depth is not None
            if not use_depth:
                if self._zero_depth is None:
                    self._zero_depth = jnp.zeros(
                        (self.intr.height, self.intr.width), jnp.float32
                    )
                depth = self._zero_depth
            self._compact_m = self._choose_compact(tier)
            cfg = dataclasses.replace(self.cfg, track_compact=self._compact_m)
            if cfg.tracking_solver == "gn":
                from .tracking_gn import track_frame_gn as track_fn
            else:
                track_fn = track_frame
            result = track_fn(
                params,
                active,
                np.asarray(T_init, np.float32),
                np.zeros(2, np.float32),
                image,
                depth,
                grad_mask,
                self.bg_color,
                cfg,
                self.intr,
                self.track_raster_cfg,
                use_depth=use_depth,
            )
            # while the device runs the tracking program, pull the next
            # frame from the dataset and start its h2d upload
            self._prefetch_frame(cur_frame_idx + 1)
            # fetch ONLY the small fields (pose, exposure, scalars, touched
            # bools) in one batched device_get; the full-res
            # color/depth/opacity renders stay on device — their only
            # consumers (pseudo-depth synthesis, viz snapshots) want device
            # arrays, and pulling them cost ~85 ms/frame over the transport
            small = jax.device_get(
                (
                    result.T_w2c,
                    result.exposure_ab,
                    result.n_iters,
                    result.converged,
                    result.touched,
                    result.median_depth,
                    result.dup_overflow,
                    result.tile_overflow,
                    result.compact_dropped,
                    result.n_binned,
                )
            )
            touched = small[4]
            cap = self.engine.capacity
            if touched.shape[0] < cap:
                # tier-sliced program: visibility vectors from the backend
                # harvest are capacity-sized
                touched = np.pad(touched, (0, cap - touched.shape[0]))
            result = result._replace(
                T_w2c=small[0],
                exposure_ab=small[1],
                n_iters=small[2],
                converged=small[3],
                touched=touched,
                median_depth=small[5],
                dup_overflow=small[6],
                tile_overflow=small[7],
                compact_dropped=small[8],
                n_binned=small[9],
            )
            self.median_depth = float(result.median_depth)
            # adaptive-compaction feedback: n_binned is the TRUE pre-
            # compaction count (measured even on compacted frames), so the
            # margin logic self-corrects; a drop additionally forces the
            # full tier immediately for the next frame
            self._binned_hist.append(int(result.n_binned))
            del self._binned_hist[:-5]
            if int(result.compact_dropped) > 0:
                Log(
                    f"tracking working-set overflow: "
                    f"{int(result.compact_dropped)} binned gaussians dropped "
                    f"at m={self._compact_m} (falling back to the full tier)",
                    tag="MonoGS-TPU",
                )
                self._compact_m = 0
        if not np.isfinite(self.median_depth):
            self.median_depth = 4.0
        return result

    def make_keyframe_depth(self, image, depth, track: TrackResult):
        """add_new_keyframe depth synthesis (slam_frontend.py:57-108)."""
        with DEVICE_LOCK:
            if self.monocular:
                out = pseudo_depth_map(
                    self._split_rng(),
                    jnp.asarray(track.depth),
                    jnp.asarray(track.opacity),
                    image,
                    jnp.asarray(self.median_depth, jnp.float32),
                    self.cfg.rgb_boundary_threshold,
                )
            else:
                out = _valid_rgb_depth(
                    image, depth, self.cfg.rgb_boundary_threshold
                )
        return out

    # ------------------------------------------------------------------- run

    def run(self, max_frames: Optional[int] = None) -> None:
        n_frames = len(self.dataset)
        if max_frames is not None:
            n_frames = min(n_frames, max_frames)
        cur_frame_idx = self.cur_frame_idx  # resumable across calls

        pump = getattr(self.backend_thread, "pump", None)

        while cur_frame_idx < n_frames:
            self.cur_frame_idx = cur_frame_idx
            tic = time.time()
            if pump is not None:
                # inline scheduler: time-slice background mapping rounds on
                # this thread (the reference's backend-process idle loop)
                t_pump = time.time()
                pump()
                if self.timers is not None:
                    self.timers.total["pump"] += time.time() - t_pump
                    self.timers.count["pump"] += 1
            self._drain_frontend_queue()

            # GUI pause channel (slam_frontend.py:333-343)
            if self.viz_channel is not None:
                ctrl = self.viz_channel.poll_control()
                if ctrl is not None and ctrl.flag_pause != self.paused:
                    self.paused = ctrl.flag_pause
                    if self.backend_thread is not None:
                        self.backend_thread.backend_queue.put(
                            ["pause" if self.paused else "unpause"]
                        )
                if self.paused:
                    time.sleep(0.01)
                    continue

            if self.requested_init:
                if pump is not None:
                    pump(idle_budget=0)
                self._drain_frontend_queue(block=False)
                time.sleep(0.0 if pump is not None else 0.005)
                continue
            if self.single_thread and self.requested_keyframe > 0:
                if pump is not None:
                    pump(idle_budget=0)
                    self._drain_frontend_queue(block=False)
                time.sleep(0.0 if pump is not None else 0.005)
                continue
            if not self.initialized and self.requested_keyframe > 0:
                if pump is not None:
                    pump(idle_budget=0)
                    self._drain_frontend_queue(block=False)
                time.sleep(0.0 if pump is not None else 0.005)
                continue

            t_ph = time.time()
            image, depth, T_gt, grad_mask = self._load_frame(cur_frame_idx)
            if self.timers is not None:
                self.timers.total["load_frame"] += time.time() - t_ph
                self.timers.count["load_frame"] += 1

            if self.reset:
                self.initialize(cur_frame_idx, image, depth, T_gt, grad_mask)
                cur_frame_idx += 1
                continue

            self.initialized = self.initialized or (
                len(self.current_window) == self.window_size
            )

            t_ph = time.time()
            track = self.tracking(cur_frame_idx, image, depth, grad_mask)
            if self.timers is not None:
                self.timers.total["tracking"] += time.time() - t_ph
                self.timers.count["tracking"] += 1
                self.timers.tally("tracking_iters", int(track.n_iters))
            if self.metrics is not None:
                self.metrics.log(
                    {
                        "tracking_iters": int(track.n_iters),
                        "converged": bool(track.converged),
                        "median_depth": self.median_depth,
                    },
                    step=cur_frame_idx,
                )
            self.cameras[cur_frame_idx] = FrameInfo(
                cur_frame_idx,
                np.asarray(track.T_w2c),
                T_gt,
                np.asarray(track.exposure_ab),
            )

            if self.viz_channel is not None:
                from ..viz.snapshot import GaussianPacket

                params, active = self.snapshot
                with DEVICE_LOCK:  # from_map fetches map arrays to host
                    packet = GaussianPacket.from_map(
                        params,
                        active,
                        current_frame_T=np.asarray(track.T_w2c),
                        gt_color=np.asarray(image),
                        keyframe_poses=[
                            self.cameras[i].T_est for i in self.current_window
                        ],
                    )
                self.viz_channel.publish(packet)

            if self.requested_keyframe > 0:
                cur_frame_idx += 1
                continue

            last_keyframe_idx = self.current_window[0]
            check_time = (cur_frame_idx - last_keyframe_idx) >= self.kf_interval
            cur_vis = np.asarray(track.touched)
            create_kf = is_keyframe_check(
                np.asarray(track.T_w2c),
                self.cameras[last_keyframe_idx].T_est,
                self.median_depth,
                cur_vis,
                self.occ_aware_visibility.get(
                    last_keyframe_idx, np.zeros_like(cur_vis)
                ),
                self.kf_translation,
                self.kf_min_translation,
                self.kf_overlap,
            )
            if len(self.current_window) < self.window_size:
                last_vis = self.occ_aware_visibility.get(
                    last_keyframe_idx, np.zeros_like(cur_vis)
                )
                union = max(np.count_nonzero(cur_vis | last_vis), 1)
                intersection = np.count_nonzero(cur_vis & last_vis)
                create_kf = check_time and (intersection / union) < self.kf_overlap
            if self.single_thread:
                create_kf = check_time and create_kf

            if create_kf:
                poses = {i: self.cameras[i].T_est for i in self.current_window}
                poses[cur_frame_idx] = np.asarray(track.T_w2c)
                self.current_window, removed = add_to_window(
                    cur_frame_idx,
                    cur_vis,
                    self.occ_aware_visibility,
                    self.current_window,
                    poses,
                    self.kf_cutoff,
                    self.initialized,
                    self.window_size,
                )
                if self.monocular and not self.initialized and removed is not None:
                    self.reset = True
                    n_cur = int(np.count_nonzero(cur_vis))
                    details = []
                    for kf_idx in self.current_window[1:]:
                        vis = self.occ_aware_visibility.get(kf_idx)
                        if vis is None:
                            details.append(f"kf{kf_idx}:none")
                            continue
                        inter = int(np.count_nonzero(cur_vis & vis))
                        denom = max(min(n_cur, int(np.count_nonzero(vis))), 1)
                        details.append(
                            f"kf{kf_idx}:{inter}/{denom}={inter / denom:.2f}"
                        )
                    Log(
                        "Keyframes lacks sufficient overlap to initialize the "
                        f"map, resetting. (evicted {removed}; |cur_vis|={n_cur}; "
                        f"overlaps {' '.join(details)})"
                    )
                    continue
                overflow = int(track.tile_overflow)
                if overflow > 0:
                    Log(
                        f"raster tile-list overflow: {overflow} entries "
                        f"dropped (raise TPU.max_per_tile)", tag="MonoGS-TPU",
                    )
                t_ph = time.time()
                depth_map = self.make_keyframe_depth(image, depth, track)
                kf = Keyframe(
                    idx=cur_frame_idx,
                    image=image,
                    depth=depth if self.use_depth else None,
                    T_w2c=track.T_w2c,
                    exposure=track.exposure_ab,
                    T_gt=T_gt,
                    grad_mask=grad_mask,
                )
                self.cameras[cur_frame_idx].is_keyframe = True
                self.kf_indices.append(cur_frame_idx)
                # trigger telemetry: which policy branch fired
                # (slam_frontend.py:198-225 semantics)
                last_vis = self.occ_aware_visibility.get(
                    last_keyframe_idx, np.zeros_like(cur_vis)
                )
                dist = np.linalg.norm(
                    (np.asarray(track.T_w2c)
                     @ np.linalg.inv(self.cameras[last_keyframe_idx].T_est))[:3, 3]
                )
                ratio = np.count_nonzero(cur_vis & last_vis) / max(
                    np.count_nonzero(cur_vis | last_vis), 1
                )
                Log(
                    f"Keyframe {cur_frame_idx} (#{len(self.kf_indices)}), "
                    f"window {self.current_window} "
                    # parentheses, not brackets: rich markup eats [tags]
                    f"(overlap {ratio:.2f}/{self.kf_overlap}, "
                    f"dist {dist:.3f} vs kf {self.kf_translation * self.median_depth:.3f}"
                    f"/min {self.kf_min_translation * self.median_depth:.3f}, "
                    f"n_vis {int(np.count_nonzero(cur_vis))})"
                )
                self.requested_keyframe += 1
                self._send(
                    ["keyframe", cur_frame_idx, kf, list(self.current_window), depth_map]
                )
                if self.timers is not None:
                    self.timers.total["keyframe"] += time.time() - t_ph
                    self.timers.count["keyframe"] += 1
            cur_frame_idx += 1

            if (
                self.save_dir is not None
                and self.save_trj
                and create_kf
                and len(self.kf_indices) % self.save_trj_kf_intv == 0
            ):
                from ..eval.ate import eval_ate

                ate = eval_ate(
                    self.cameras,
                    self.kf_indices,
                    self.save_dir,
                    cur_frame_idx,
                    final=False,
                    monocular=self.monocular,
                )
                self.ate_log.append({"frame": cur_frame_idx, "ate": ate})

            if create_kf and self.throttle:
                # reference throttles to <=3 fps on keyframe frames
                time.sleep(max(0.01, 1.0 / 3.0 - (time.time() - tic)))

        self.cur_frame_idx = cur_frame_idx
        # final sync so eval sees the last mapped state
        if self.backend_thread is not None:
            if pump is not None:
                pump(idle_budget=0)
            self._drain_frontend_queue()
        else:
            self._sync_direct("final")
