"""Keyframe-policy geometry probe (no SLAM, exact and fast).

Renders GT n_touched visibility for frames along the synthetic sweep from
the GT map at GT poses, then evaluates the exact frontend policy math
(is_keyframe IoU + add_to_window Szymkiewicz-Simpson cutoff,
slam_frontend.py:198-286) to predict:
  - keyframe cadence (first frame whose IoU vs previous kf < kf_overlap),
  - whether the oldest window keyframes fall below kf_cutoff before the
    window fills (=> monocular bootstrap reset).
Answers "can the bench sweep keep a 6-slot window covisible" in minutes of
CPU instead of an hour of mono SLAM per sweep value.

Usage: python tools/probe_policy_geometry.py [sweep ...] (default 0.7 0.4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled

N_FRAMES = 128
KF_OVERLAP = 0.9  # is_keyframe visibility-IoU threshold (bench_vga)
KF_CUTOFF = 0.3  # add_to_window eviction threshold (bench_vga)
KF_INTERVAL = 5
WINDOW = 6

intr = Intrinsics(fx=288.0, fy=288.0, cx=160.0, cy=120.0, width=320, height=240)
rcfg = RasterConfig(max_per_tile=512, k_dup=8, tile_group=30)
params, active = make_surface_scene(jax.random.PRNGKey(0), n=8000)


def visibility(T):
    out = render_tiled(
        params, active, jnp.asarray(T, jnp.float32), intr, 0, jnp.zeros(3),
        rcfg, need_touched=True,
    )
    return np.asarray(out.n_touched > 0)


def iou(a, b):
    u = np.count_nonzero(a | b)
    return np.count_nonzero(a & b) / max(u, 1)


def ss_overlap(a, b):
    """Szymkiewicz-Simpson: |a & b| / min(|a|, |b|) (slam_frontend.py:236)."""
    inter = np.count_nonzero(a & b)
    return inter / max(min(np.count_nonzero(a), np.count_nonzero(b)), 1)


for sweep in [float(s) for s in sys.argv[1:]] or [0.7, 0.4]:
    print(f"=== sweep={sweep} (ease=True) ===", flush=True)
    vis = {}

    def get_vis(i):
        if i not in vis:
            vis[i] = visibility(
                orbit_pose(i, N_FRAMES, sweep=sweep, ease=True)
            )
        return vis[i]

    # simulate the keyframe policy on GT visibility (tracking assumed exact)
    kfs = [0]
    reset_at = None
    for i in range(1, N_FRAMES):
        last = kfs[-1]
        if (i - last) < KF_INTERVAL:
            continue
        cur = get_vis(i)
        if iou(cur, get_vis(last)) < KF_OVERLAP:
            kfs.append(i)
            window = kfs[-WINDOW:]
            # add_to_window eviction: overlap of OLD kfs vs the new one
            evict = [
                k for k in window[:-1]
                if ss_overlap(get_vis(k), cur) <= KF_CUTOFF
            ]
            if evict and len(window) < WINDOW and reset_at is None:
                reset_at = i
            print(
                f"  kf {i} (n={len(kfs)}) window {window} "
                f"ss_vs_new {[round(ss_overlap(get_vis(k), cur), 2) for k in window[:-1]]}"
                + (f"  EVICT {evict}" + (" -> RESET" if evict and len(window) < WINDOW else "") if evict else ""),
                flush=True,
            )
    spans = np.diff(kfs)
    print(
        f"RESULT sweep={sweep} n_kf={len(kfs)} cadence={spans.tolist()} "
        f"window_fills={'yes' if len(kfs) >= WINDOW and reset_at is None else 'no'} "
        f"reset_at={reset_at}",
        flush=True,
    )
