"""SO(3)/SE(3) exponential maps and the pose retraction used by tracking.

Semantics match the reference's Lie-algebra helpers
(/root/reference/utils/pose_utils.py:25-93): `se3_exp` takes
``tau = [rho (3, translation), theta (3, rotation)]`` and the tracking update
is the left retraction ``T_w2c <- exp(tau) @ T_w2c`` with a convergence test
at ``||tau|| < 1e-4``.

All functions are pure jnp, differentiable, and NaN-safe at theta -> 0 (the
small-angle branches are implemented with the `where(small, 1, x)` trick so
gradients stay finite).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-8


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sin_coeffs(theta: jnp.ndarray):
    """Return (A, B, C) = (sin x / x, (1-cos x)/x^2, (x - sin x)/x^3).

    NaN-safe: uses 2nd-order Taylor expansions below `_SMALL`.
    """
    x2 = jnp.sum(theta * theta, axis=-1)
    small = x2 < _SMALL
    # Guard the sqrt so the non-taken branch does not produce NaN gradients.
    x2_safe = jnp.where(small, jnp.ones_like(x2), x2)
    x = jnp.sqrt(x2_safe)
    a = jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(x) / x)
    b = jnp.where(small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(x)) / x2_safe)
    c = jnp.where(small, 1.0 / 6.0 - x2 / 120.0, (x - jnp.sin(x)) / (x2_safe * x))
    return a, b, c


def so3_exp(theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    a, b, _ = _sin_coeffs(theta)
    k = _hat(theta)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_left_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): (..., 3) -> (..., 3, 3)."""
    _, b, c = _sin_coeffs(theta)
    k = _hat(theta)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), k.shape)
    return eye + b[..., None, None] * k + c[..., None, None] * k2


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) tau = [rho, theta] -> (..., 4, 4)."""
    rho, theta = tau[..., :3], tau[..., 3:]
    rot = so3_exp(theta)
    t = (so3_left_jacobian(theta) @ rho[..., None])[..., 0]
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=tau.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_retract(tau: jnp.ndarray, T_w2c: jnp.ndarray) -> jnp.ndarray:
    """Left retraction used by pose tracking: ``exp(tau) @ T_w2c``."""
    return se3_exp(tau) @ T_w2c
