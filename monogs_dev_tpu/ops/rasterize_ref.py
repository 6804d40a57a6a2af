"""Brute-force differentiable rasterizer — the correctness oracle.

O(N * H * W): every Gaussian is alpha-composited into every pixel in global
depth order with no tile binning or truncation. Exact (up to the analytic
early-termination approximation documented below), slow, and fully
autodiff-differentiable. Used to validate `rasterize.render_tiled` and the
Pallas kernels on small scenes, and to synthesize ground-truth test datasets.

Early termination: the CUDA reference stops blending a pixel once its
transmittance drops below 1e-4. Here blending always runs to the end, but a
Gaussian's contribution is zeroed once the incoming transmittance is below
`transmittance_min` — contributions past that point are <= 1e-4 anyway.
`n_touched` counts pixels where (alpha >= 1/255 and T_in >= 1e-4), matching
the visibility semantics the SLAM logic relies on
(/root/reference/utils/slam_backend.py:236-240).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams
from .project import project_gaussians
from .raster_types import RasterConfig, RenderOutput


def render_reference(
    params: GaussianParams,
    active: jnp.ndarray,
    T_w2c: jnp.ndarray,
    intr: Intrinsics,
    sh_degree: int,
    bg_color: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
    means2d_probe: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    isotropic: bool = False,
) -> RenderOutput:
    proj = project_gaussians(
        params, active, T_w2c, intr, sh_degree, scale_modifier, isotropic
    )
    means2d = proj.means2d
    if means2d_probe is not None:
        # densification-gradient probe (reference screenspace_points trick,
        # gaussian_renderer/__init__.py:43-52)
        means2d = means2d + means2d_probe

    n = means2d.shape[0]
    h, w = intr.height, intr.width
    if bg_color is None:
        bg_color = jnp.zeros((3,), means2d.dtype)

    # global front-to-back order
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    mu = means2d[order]
    con = proj.conic[order]
    col = proj.color[order]
    opa = proj.opacity[order]
    z = proj.depth[order]

    ys = jnp.arange(h, dtype=means2d.dtype)
    xs = jnp.arange(w, dtype=means2d.dtype)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    dx = px[None] - mu[:, 0, None, None]  # (N, H, W)
    dy = py[None] - mu[:, 1, None, None]
    power = (
        -0.5 * (con[:, 0, None, None] * dx * dx + con[:, 2, None, None] * dy * dy)
        - con[:, 1, None, None] * dx * dy
    )
    alpha = jnp.minimum(config.alpha_clamp, opa[:, None, None] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)  # CUDA skips positive power
    alpha = jnp.where(alpha < config.alpha_min, 0.0, alpha)

    log_one_minus = jnp.log1p(-alpha)
    log_t_incl = jnp.cumsum(log_one_minus, axis=0)
    t_in = jnp.exp(log_t_incl - log_one_minus)  # exclusive transmittance
    contributing = t_in >= config.transmittance_min
    weight = jnp.where(contributing, alpha * t_in, 0.0)

    color = jnp.einsum("nhw,nc->hwc", weight, col)
    depth = jnp.einsum("nhw,n->hw", weight, z)
    alpha_out = weight.sum(axis=0)
    color = color + (1.0 - alpha_out[..., None]) * bg_color

    touched_sorted = ((alpha >= config.alpha_min) & contributing).sum(axis=(1, 2))
    n_touched = jnp.zeros((n,), jnp.int32).at[order].set(touched_sorted.astype(jnp.int32))

    return RenderOutput(
        color=color,
        depth=depth,
        alpha=alpha_out,
        n_touched=n_touched,
        radii=proj.radii,
        visible=proj.radii > 0.0,
        dup_overflow=jnp.zeros((), jnp.int32),
        tile_overflow=jnp.zeros((), jnp.int32),
    )
