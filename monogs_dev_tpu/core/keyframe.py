"""Host-side keyframe record shared by frontend and backend."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Keyframe:
    """One keyframe: device-resident images + current pose estimate.

    `image`/`depth` live on device (they are re-rendered every mapping
    iteration); poses/exposure are HOST numpy — they feed device programs
    as dispatch-time args and every host consumer (keyframe policy, eval,
    sync) reads them, so keeping a device copy would cost one transport
    roundtrip per access on the remote-relay device.
    """

    idx: int
    image: jnp.ndarray  # (H, W, 3) device
    depth: Optional[jnp.ndarray]  # (H, W) sensor depth for the loss; None if mono
    T_w2c: np.ndarray  # (4, 4) current estimate (host)
    exposure: np.ndarray  # (2,) host
    T_gt: np.ndarray  # (4, 4) host, for eval only
    grad_mask: Optional[jnp.ndarray] = None
