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


def make_surface_scene(
    key: jax.Array,
    n: int = 8000,
    extent_x: float = 5.0,
    extent_y: float = 3.0,
    z_base: float = 3.0,
    scale: float = 0.035,
    sh_degree: int = 0,
):
    """Opaque 2.5D textured relief — the regime real SLAM scenes live in
    (piecewise-smooth surfaces, near-opaque splats), unlike the volumetric
    blob cloud of `make_synthetic_scene`. Splat footprint ~6 px at VGA, so
    the photometric landscape is smooth at the pixel scale and tracking
    behaves like it does on TUM/Replica imagery."""
    ks = jax.random.split(key, 5)
    x = jax.random.uniform(ks[0], (n,), minval=-extent_x, maxval=extent_x)
    y = jax.random.uniform(ks[1], (n,), minval=-extent_y, maxval=extent_y)
    z = (
        z_base
        + 0.6 * jnp.sin(2.0 * x)
        + 0.4 * jnp.cos(3.0 * y)
        + 0.15 * jnp.sin(5.0 * x) * jnp.cos(4.0 * y)
        + 0.03 * jax.random.normal(ks[2], (n,))
    )
    base = 0.5 + 0.35 * jnp.stack(
        [
            jnp.sin(1.3 * x + 2.1 * y),
            jnp.sin(2.2 * x - 1.1 * y + 1.0),
            jnp.cos(1.7 * x + 0.6 * y),
        ],
        axis=-1,
    )
    rgb = jnp.clip(
        base + 0.15 * jax.random.uniform(ks[3], (n, 3), minval=-1.0, maxval=1.0),
        0.02,
        0.98,
    )
    r = max((sh_degree + 1) ** 2 - 1, 0)
    log_scales = jnp.stack(
        [
            jnp.full((n,), jnp.log(scale)),
            jnp.full((n,), jnp.log(scale)),
            jnp.full((n,), jnp.log(scale * 0.3)),  # flattened onto the relief
        ],
        axis=-1,
    )
    params = GaussianParams(
        xyz=jnp.stack([x, y, z], -1),
        f_dc=rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((n, r, 3)),
        log_scales=log_scales,
        quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (n, 1)),
        opacity_logit=jnp.full((n,), inverse_sigmoid(jnp.float32(0.95))),
    )
    return params, jnp.ones((n,), bool)


def orbit_pose(
    i: int,
    n_frames: int,
    radius: float = 0.5,
    sweep: float = 1.2,
    ease: bool = False,
    profile: str | None = None,
):
    """Smooth lateral arc with yaw + slight push-in, looking down +z (W2C).

    The sweep is sized so consecutive keyframe-interval frames lose enough
    covisibility to exercise the keyframe policy with TUM-like thresholds.

    Motion profiles (`profile` wins over the legacy `ease` bool):
      const    constant angular velocity over the whole sequence.
      ease     smoothstep time warp (zero velocity at both ends): real
               handheld sequences (TUM fr3_office) start near-static, which
               lets the monocular bootstrap fill its keyframe window before
               early keyframes fall below the overlap cutoff.
      ease_in  quadratic ramp over the first quarter, then CONSTANT cruise
               to the end. The bench profile: `ease`'s deceleration tail
               puts late measurement windows into a degenerate regime
               (near-zero parallax, mono drift, keyframe spam), so two runs
               whose init lands a few frames apart measure different
               workloads; a uniform cruise makes every post-bootstrap
               window the same regime.
    """
    t = i / max(n_frames - 1, 1)
    if profile is None:
        profile = "ease" if ease else "const"
    if profile == "ease":
        t = t * t * (3.0 - 2.0 * t)
    elif profile == "ease_in":
        r = 0.25  # ramp fraction; cruise velocity = 2/(2-r) x mean
        if t < r:
            t = t * t / (r * (2.0 - r))
        else:
            t = (2.0 * t - r) / (2.0 - r)
    elif profile != "const":
        raise ValueError(f"unknown orbit profile {profile!r}")
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
        scene_kind = ds.get("scene", "blobs")
        if scene_kind == "surface":
            self.scene_params, self.scene_active = make_surface_scene(
                jax.random.PRNGKey(seed),
                n=n_gauss,
                scale=float(ds.get("gaussian_scale", 0.035)),
                extent_x=float(ds.get("extent_x", 5.0)),
                extent_y=float(ds.get("extent_y", 3.0)),
            )
        else:
            self.scene_params, self.scene_active = make_synthetic_scene(
                jax.random.PRNGKey(seed),
                n=n_gauss,
                scale=float(ds.get("gaussian_scale", 0.06)),
            )
        sweep = float(ds.get("sweep", 1.2))
        ease = bool(ds.get("ease", False))
        profile = ds.get("profile")  # const | ease | ease_in (wins over ease)
        self.poses = [
            orbit_pose(i, self.num_imgs, sweep=sweep, ease=ease,
                       profile=profile)
            for i in range(self.num_imgs)
        ]
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
