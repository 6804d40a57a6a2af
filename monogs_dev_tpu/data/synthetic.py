"""Synthetic Gaussian-scene dataset.

Frames are rendered from a known random Gaussian scene with the production
rasterizer, so ground truth (poses AND appearance AND depth) is exact. Used
by the integration tests and `bench.py` since raw TUM/Replica data is not
bundled; SURVEY.md §4 calls for exactly this kind of
"synthetic dataset where ground truth is exact".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.sh import rgb_to_sh
from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams, inverse_sigmoid
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled
from .datasets import BaseDataset


def make_synthetic_scene(
    key: jax.Array,
    n: int = 2000,
    extent: float = 2.0,
    z_range: tuple = (2.0, 6.0),
    scale: float = 0.06,
    sh_degree: int = 0,
):
    ks = jax.random.split(key, 5)
    xyz = jnp.stack(
        [
            jax.random.uniform(ks[0], (n,), minval=-extent, maxval=extent),
            jax.random.uniform(ks[1], (n,), minval=-extent, maxval=extent),
            jax.random.uniform(ks[2], (n,), minval=z_range[0], maxval=z_range[1]),
        ],
        axis=-1,
    )
    rgb = jax.random.uniform(ks[3], (n, 3), minval=0.05, maxval=0.95)
    quats = jax.random.normal(ks[4], (n, 4))
    r = max((sh_degree + 1) ** 2 - 1, 0)
    params = GaussianParams(
        xyz=xyz,
        f_dc=rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((n, r, 3)),
        log_scales=jnp.full((n, 3), jnp.log(scale)),
        quats=quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
        opacity_logit=jnp.full((n,), inverse_sigmoid(jnp.float32(0.95))),
    )
    return params, jnp.ones((n,), bool)


def orbit_pose(i: int, n_frames: int, radius: float = 0.5, sweep: float = 1.2):
    """Smooth lateral arc with yaw + slight push-in, looking down +z (W2C).

    The sweep is sized so consecutive keyframe-interval frames lose enough
    covisibility to exercise the keyframe policy with TUM-like thresholds."""
    t = i / max(n_frames - 1, 1)
    angle = (t - 0.5) * sweep
    center = np.array(
        [np.sin(angle) * radius * 4.0, 0.15 * np.sin(2 * angle), 0.4 * t]
    )
    c, s = np.cos(angle), np.sin(angle)
    R_c2w = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    T_c2w = np.eye(4)
    T_c2w[:3, :3] = R_c2w
    T_c2w[:3, 3] = center
    return np.linalg.inv(T_c2w)


class SyntheticDataset(BaseDataset):
    """Config keys (Dataset group): n_frames, n_gaussians, seed, plus the
    usual Calibration block. depth_scale presence toggles RGB-D vs mono GT."""

    def __init__(self, config):
        super().__init__(config)
        ds = config["Dataset"]
        self.num_imgs = int(ds.get("n_frames", 60))
        n_gauss = int(ds.get("n_gaussians", 2000))
        seed = int(ds.get("seed", 0))
        self.sensor_type = ds.get("sensor_type", "depth")

        self.intr = Intrinsics(
            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
            width=self.width, height=self.height,
        )
        self.scene_params, self.scene_active = make_synthetic_scene(
            jax.random.PRNGKey(seed),
            n=n_gauss,
            scale=float(ds.get("gaussian_scale", 0.06)),
        )
        self.poses = [orbit_pose(i, self.num_imgs) for i in range(self.num_imgs)]
        self._raster_cfg = RasterConfig(max_per_tile=512, k_dup=16)
        self._cache: dict = {}

    def render_frame(self, idx: int):
        if idx not in self._cache:
            out = render_tiled(
                self.scene_params,
                self.scene_active,
                jnp.asarray(self.poses[idx], jnp.float32),
                self.intr,
                0,
                config=self._raster_cfg,
                need_touched=False,
            )
            color = np.clip(np.asarray(out.color), 0.0, 1.0).astype(np.float32)
            # normalized expected depth; 0 where nothing was hit
            alpha = np.asarray(out.alpha)
            depth = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
            depth[alpha < 0.5] = 0.0
            self._cache[idx] = (color, depth.astype(np.float32))
        return self._cache[idx]

    def __getitem__(self, idx: int):
        color, depth = self.render_frame(idx)
        if self.sensor_type == "monocular" or not self.has_depth:
            return color, None, self.poses[idx]
        return color, depth, self.poses[idx]
