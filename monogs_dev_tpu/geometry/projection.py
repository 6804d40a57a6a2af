"""Camera projection matrices, matching the reference conventions.

The reference stores ``R, T`` already in world-to-camera convention
(/root/reference/gaussian_splatting/utils/graphics_utils.py:33-46 — note it
does NOT transpose like upstream 3DGS) and builds an intrinsics-aware
OpenGL-style projection (`getProjectionMatrix2`,
graphics_utils.py:72-93). Our rasterizer projects directly with pinhole
intrinsics, but these matrices are kept for parity (frustum culling, GUI,
golden tests).

Matrices here are plain math convention (column vectors): ``p_cam = T_w2c @
p_world``. The reference keeps torch-style transposed copies
(`world_view_transform`); we do not.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 W2C transform from W2C rotation (3,3) and translation (3,)."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    bottom = jnp.broadcast_to(bottom, top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def projection_matrix(
    znear: float,
    zfar: float,
    cx: float,
    cy: float,
    fx: float,
    fy: float,
    width: int,
    height: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Intrinsics-aware OpenGL-style projection.

    Algebraically identical to the reference's `getProjectionMatrix2`
    (graphics_utils.py:72-93): its left/right/top/bottom construction reduces
    to the closed forms below.
    """
    p = jnp.zeros((4, 4), dtype=dtype)
    p = p.at[0, 0].set(2.0 * fx / width)
    p = p.at[1, 1].set(2.0 * fy / height)
    p = p.at[0, 2].set((2.0 * cx - width) / width)
    p = p.at[1, 2].set((2.0 * cy - height) / height)
    p = p.at[2, 2].set(zfar / (zfar - znear))
    p = p.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    p = p.at[3, 2].set(1.0)
    return p


def full_projection(proj: jnp.ndarray, T_w2c: jnp.ndarray) -> jnp.ndarray:
    """Fused view-projection: clip = full_projection @ p_world (homogeneous)."""
    return proj @ T_w2c


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))
