"""Keyframe -> new-Gaussian creation, fully on device.

Replaces the reference's CPU Open3D round trip
(/root/reference/gaussian_splatting/scene/gaussian_model.py:107-203, flagged
in SURVEY.md §7 hard-part 4): backprojection, random downsampling, kNN scale
init, and SH color init all run as one jitted program with static shapes.

Also the monocular pseudo-depth synthesis of the frontend
(/root/reference/utils/slam_frontend.py:57-108).

Pixel convention note: the rasterizer maps camera points to
``pix = f * x/z + c - 0.5`` (CUDA ndc2Pix); backprojection here inverts that
exactly (``x = (u + 0.5 - cx) z / fx``). The reference mixes Open3D's
integer-center convention with the CUDA one — a half-pixel inconsistency we
do not reproduce.

Deviation (documented): `adaptive_pointsize` uses the median of *valid*
depth; the reference medians the raw array including invalid zeros
(gaussian_model.py:139-141).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.sh import rgb_to_sh, num_sh_coeffs
from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams
from ..ops.knn import mean_sq_dist_knn3


def new_points_from_frame(
    rng,
    image,
    depth_map,
    exposure_ab,
    T_w2c,
    intr,
    sh_degree,
    budget,
    downsample,
    point_size,
    adaptive_pointsize,
):
    """Dispatch-boundary shim: strong-typed array inputs + canonical
    scalar typing so every caller shares one jit cache entry
    (utils/jit_sig.py)."""
    from ..utils.jit_sig import strongen

    return _new_points_from_frame_jit(
        strongen(rng),
        strongen(image),
        strongen(depth_map),
        strongen(exposure_ab),
        strongen(T_w2c),
        intr,
        int(sh_degree),
        int(budget),
        int(downsample),
        jnp.asarray(point_size, jnp.float32),
        bool(adaptive_pointsize),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "intr",
        "sh_degree",
        "budget",
        "downsample",
        "adaptive_pointsize",
    ),
)
def _new_points_from_frame_jit(
    rng: jax.Array,
    image: jnp.ndarray,  # (H, W, 3)
    depth_map: jnp.ndarray,  # (H, W); 0 = invalid
    exposure_ab: jnp.ndarray,  # (2,)
    T_w2c: jnp.ndarray,  # (4, 4)
    intr: Intrinsics,
    sh_degree: int,
    budget: int,
    downsample: int,
    point_size: float,
    adaptive_pointsize: bool,
) -> Tuple[GaussianParams, jnp.ndarray]:
    """Create up to `budget` new Gaussians from a keyframe.

    Mirrors create_pcd_from_image_and_depth (gaussian_model.py:133-203):
    exposure-compensated colors, 1/downsample random subsample of valid-depth
    pixels, scale init log(sqrt(clamp(knn3_dist2) * point_size)), identity
    quats, opacity 0.5.

    Returns (params_batch (budget, ...), valid (budget,)).
    """
    h, w = depth_map.shape
    k1, k2 = jax.random.split(rng)

    image_ab = jnp.clip(
        jnp.exp(exposure_ab[0]) * image + exposure_ab[1], 0.0, 1.0
    )

    valid = depth_map > 0.0
    keep = valid & (
        jax.random.uniform(k1, (h, w)) < (1.0 / downsample)
    )

    # fixed-size random selection of the kept pixels
    priority = jnp.where(keep, jax.random.uniform(k2, (h, w)), -1.0).reshape(-1)
    scores, flat_idx = jax.lax.top_k(priority, budget)
    sel_valid = scores > 0.0
    vv = (flat_idx // w).astype(jnp.float32)
    uu = (flat_idx % w).astype(jnp.float32)
    z = depth_map.reshape(-1)[flat_idx]

    # backproject with the rasterizer-consistent pixel convention
    x = (uu + 0.5 - intr.cx) * z / intr.fx
    y = (vv + 0.5 - intr.cy) * z / intr.fy
    p_cam = jnp.stack([x, y, z], axis=-1)
    R = T_w2c[:3, :3]
    t = T_w2c[:3, 3]
    p_world = (p_cam - t) @ R  # R^T (p - t)

    rgb = image_ab.reshape(-1, 3)[flat_idx]

    if adaptive_pointsize:
        med = jnp.nanmedian(jnp.where(valid, depth_map, jnp.nan))
        ps = jnp.minimum(0.05, point_size * med)
    else:
        ps = jnp.asarray(point_size, jnp.float32)

    dist2 = jnp.maximum(mean_sq_dist_knn3(p_world, sel_valid), 1e-7) * ps
    log_scales = jnp.broadcast_to(
        0.5 * jnp.log(dist2)[:, None], (budget, 3)
    )  # log(sqrt(dist2))

    k = num_sh_coeffs(sh_degree)
    params = GaussianParams(
        xyz=p_world,
        f_dc=rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((budget, max(k - 1, 0), 3), jnp.float32),
        log_scales=log_scales,
        quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (budget, 1)),
        opacity_logit=jnp.zeros((budget,), jnp.float32),  # sigmoid(0) = 0.5
    )
    return params, sel_valid


def pseudo_depth_map(
    rng,
    render_depth,
    render_opacity,
    gt_image,
    fallback_depth=2.0,
    rgb_boundary_threshold=0.01,
):
    """Dispatch-boundary shim (utils/jit_sig.py): one cache entry for all
    callers."""
    from ..utils.jit_sig import strongen

    return _pseudo_depth_map_jit(
        strongen(rng),
        strongen(render_depth),
        strongen(render_opacity),
        strongen(gt_image),
        jnp.asarray(fallback_depth, jnp.float32),
        jnp.asarray(rgb_boundary_threshold, jnp.float32),
    )


@jax.jit
def _pseudo_depth_map_jit(
    rng: jax.Array,
    render_depth: jnp.ndarray,  # (H, W) rendered depth at the new keyframe
    render_opacity: jnp.ndarray,  # (H, W)
    gt_image: jnp.ndarray,  # (H, W, 3)
    fallback_depth: jnp.ndarray = 2.0,  # () scalar; see below
    rgb_boundary_threshold: float = 0.01,
) -> jnp.ndarray:
    """Monocular keyframe pseudo-depth (slam_frontend.py:57-108).

    Outlier depths (|d - median| > std, or invalid) are replaced with the
    median; noise sigma is 0.5*std there and 0.2*std elsewhere; invalid-RGB
    pixels are zeroed.

    When NO pixel is valid (opacity never reaches 0.95 — happens right
    after a monocular bootstrap reset, when the fresh map is fit to one
    keyframe only), the median/std of the empty set are NaN and would
    poison the depth map and every Gaussian inserted from it; fall back to
    a noisy constant sheet at `fallback_depth` (the frontend's running
    median depth), matching the reference's no-estimate fallback
    (gaussian_model.py:121-126).
    """
    valid_rgb = gt_image.sum(axis=-1) > rgb_boundary_threshold
    valid = (render_depth > 0.0) & (render_opacity > 0.95) & valid_rgb
    have = valid.sum() > 0
    masked = jnp.where(valid, render_depth, jnp.nan)
    median = jnp.where(have, jnp.nanmedian(masked), fallback_depth)
    n = jnp.maximum(valid.sum(), 1)
    mean = jnp.where(valid, render_depth, 0.0).sum() / n
    std = jnp.where(
        have,
        jnp.sqrt((jnp.where(valid, render_depth - mean, 0.0) ** 2).sum() / n),
        0.05 * fallback_depth,
    )

    invalid = (
        (render_depth > median + std) | (render_depth < median - std) | ~valid
    )
    depth = jnp.where(invalid, median, render_depth)
    noise = jax.random.normal(rng, depth.shape) * jnp.where(
        invalid, std * 0.5, std * 0.2
    )
    depth = depth + noise
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return jnp.where(valid_rgb, depth, 0.0)


def mono_bootstrap_depth(
    rng: jax.Array, height: int, width: int, init: bool, scale: float = 2.0
) -> jnp.ndarray:
    """Depth used when no estimate exists yet.

    init=True: frontend's first-keyframe 2 +/- 0.3 noise
    (slam_frontend.py:64-66); init=False: the map model's
    (1 + (U-0.5)*0.05)*scale fallback (gaussian_model.py:121-126).
    """
    if init:
        return 2.0 * jnp.ones((height, width)) + jax.random.normal(
            rng, (height, width)
        ) * 0.3
    return (
        jnp.ones((height, width))
        + (jax.random.normal(rng, (height, width)) - 0.5) * 0.05
    ) * scale
