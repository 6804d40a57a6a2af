"""Types shared by the rasterizers."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; participates in jit keys).

    tile:          tile WIDTH in pixels (16 matches the CUDA reference's
                   16x16 tiles; 256 px/tile = 2 TPU vector lanes of 128).
    tile_h:        tile HEIGHT; 0 means square (= tile). A 16x8 tile puts
                   exactly one 128-lane vreg row of pixels per tile: per-
                   chunk VPU work halves while wasted tile-box pixels
                   shrink (the blend processes every (entry, pixel) pair of
                   a tile, and a gaussian's footprint box overlaps less of
                   a smaller tile).
    max_per_tile:  per-tile Gaussian list capacity L. Overflow entries are
                   dropped back-to-front (counted in telemetry).
    k_dup:         max tiles a single Gaussian may be binned into. Span
                   beyond this is truncated (counted in telemetry).
    tile_group:    tiles blended per lax.map step (memory knob).
    """

    tile: int = 16
    tile_h: int = 0
    max_per_tile: int = 1024
    k_dup: int = 16
    tile_group: int = 60
    use_pallas: bool = True  # Pallas blend on hot paths (no n_touched)
    tight_cull: bool = True  # exact ellipse-vs-tile alpha culling in binning

    # blending constants (CUDA reference semantics)
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4


class RenderOutput(NamedTuple):
    """Mirror of the reference render dict
    (/root/reference/gaussian_splatting/gaussian_renderer/__init__.py:145-153).
    Channel-last images."""

    color: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W) alpha-weighted expected depth (unnormalized)
    alpha: jnp.ndarray  # (H, W) accumulated opacity
    n_touched: jnp.ndarray  # (N,) int32 pixels each Gaussian contributed to
    radii: jnp.ndarray  # (N,) f32 screen-space radii (0 if culled)
    visible: jnp.ndarray  # (N,) bool = radii > 0 ("visibility_filter")
    dup_overflow: jnp.ndarray  # () int32 — tile-span truncation count
    tile_overflow: jnp.ndarray  # () int32 — per-tile list overflow count
