"""Camera intrinsics / per-frame state.

The reference's `Camera(nn.Module)` (/root/reference/utils/camera_utils.py:8)
bundles intrinsics, the current W2C estimate, learnable pose tangents and
exposure. TPU-natively we split that into:

  - `Intrinsics`: static, hashable — participates in jit static args.
  - `CameraState`: device pytree (pose + exposure) — donated through steps.
  - `Frame`: host-side record of one dataset frame (numpy images, GT pose).

Pose tangents (`cam_rot_delta` / `cam_trans_delta`) are not stored: tracking
optimizes a 6-vector tau at zero each iteration and retracts (pose_utils.py
semantics), so the tangent lives only inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def tanfovx(self) -> float:
        return 0.5 * self.width / self.fx

    @property
    def tanfovy(self) -> float:
        return 0.5 * self.height / self.fy


class CameraState(NamedTuple):
    """Device-side per-frame optimizable state."""

    T_w2c: jnp.ndarray  # (4, 4) world-to-camera
    exposure_ab: jnp.ndarray  # (2,) affine exposure (a, b)

    @staticmethod
    def identity(dtype=jnp.float32) -> "CameraState":
        return CameraState(jnp.eye(4, dtype=dtype), jnp.zeros((2,), dtype=dtype))

    @staticmethod
    def from_pose(T_w2c: jnp.ndarray) -> "CameraState":
        return CameraState(jnp.asarray(T_w2c, jnp.float32), jnp.zeros((2,), jnp.float32))


@dataclasses.dataclass
class Frame:
    """Host-side record of one dataset frame."""

    idx: int
    image: np.ndarray  # (H, W, 3) float32 in [0, 1]
    depth: Optional[np.ndarray]  # (H, W) float32 metric depth, or None
    T_gt: np.ndarray  # (4, 4) GT world-to-camera (identity if unknown)
    state: Optional[CameraState] = None  # current pose estimate (device)
    grad_mask: Optional[np.ndarray] = None  # (H, W) bool edge mask
    # SLAM bookkeeping mirrored from the reference Camera
    is_keyframe: bool = False
