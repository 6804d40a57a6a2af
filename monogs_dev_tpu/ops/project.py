"""Gaussian projection: camera transform + EWA splatting math.

Re-derivation of the CUDA rasterizer's per-Gaussian preprocess (upstream
`cuda_rasterizer/forward.cu`; a readable spec of the same math lives in the
reference's GLSL viewer, /root/reference/gui/gl_render/shaders/
gau_vert.glsl:60-107): 3D covariance R S S^T R^T, perspective Jacobian J with
1.3x tan-FoV clamping, cov2d = J W cov3d W^T J^T with the +0.3 px low-pass,
conic = cov2d^-1, radius = 3 sqrt(lambda_max).

Everything is pure jnp and differentiable — including w.r.t. `T_w2c`, which
is how SE(3) pose gradients flow (the caller composes
``T_w2c = se3_exp(tau) @ T0`` so autodiff reaches the tangent tau; this
replaces the CUDA fork's hand-written theta/rho backward).

Pixel convention: pix = f * x/z + c - 0.5, i.e. the CUDA `ndc2Pix` mapping,
with pixel (u, v) sampled at coordinate (u, v).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.sh import eval_sh
from ..models.gaussians import GaussianParams, activations, build_rotation
from ..models.camera import Intrinsics


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coordinates
    conic: jnp.ndarray  # (N, 3) upper-triangular inverse 2D covariance
    color: jnp.ndarray  # (N, 3) view-dependent RGB (>= 0)
    opacity: jnp.ndarray  # (N,) activated opacity
    depth: jnp.ndarray  # (N,) camera-space z
    radii: jnp.ndarray  # (N,) f32 screen radius (0 where culled)
    valid: jnp.ndarray  # (N,) bool — active, in front, invertible cov


def compute_cov3d(log_scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0):
    """(N,3),(N,4) -> (N,3,3) full 3D covariance."""
    s = jnp.exp(log_scales) * scale_modifier
    r = build_rotation(quats)
    m = r * s[:, None, :]  # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)


def project_gaussians(
    params: GaussianParams,
    active: jnp.ndarray,
    T_w2c: jnp.ndarray,
    intr: Intrinsics,
    sh_degree: int,
    scale_modifier: float = 1.0,
    isotropic: bool = False,
) -> ProjectedGaussians:
    scales, quats, opacity = activations(params)
    if isotropic:
        # reference isotropic broadcast (gaussian_renderer/__init__.py:89-92)
        log_scales = jnp.broadcast_to(
            params.log_scales[:, :1], params.log_scales.shape
        )
    else:
        log_scales = params.log_scales

    R = T_w2c[:3, :3]
    t = T_w2c[:3, 3]
    p_cam = params.xyz @ R.T + t
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    in_front = z > intr.znear
    z_safe = jnp.where(in_front, z, 1.0)

    fx, fy = intr.fx, intr.fy
    means2d = jnp.stack(
        [fx * x / z_safe + intr.cx - 0.5, fy * y / z_safe + intr.cy - 0.5], axis=-1
    )

    # EWA Jacobian with frustum clamping (forward.cu convention)
    limx, limy = 1.3 * intr.tanfovx, 1.3 * intr.tanfovy
    tx = jnp.clip(x / z_safe, -limx, limx) * z_safe
    ty = jnp.clip(y / z_safe, -limy, limy) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3), W = R; cov2d = J W cov3d W^T J^T
    j00, j02 = fx * inv_z, -fx * tx * inv_z2
    j11, j12 = fy * inv_z, -fy * ty * inv_z2
    cov3d = compute_cov3d(log_scales, quats, scale_modifier)
    vw = R[None] @ cov3d @ R.T[None]  # (N, 3, 3) camera-space covariance
    a = (
        j00 * j00 * vw[:, 0, 0]
        + 2.0 * j00 * j02 * vw[:, 0, 2]
        + j02 * j02 * vw[:, 2, 2]
    )
    b = (
        j00 * j11 * vw[:, 0, 1]
        + j00 * j12 * vw[:, 0, 2]
        + j02 * j11 * vw[:, 1, 2]
        + j02 * j12 * vw[:, 2, 2]
    )
    c = (
        j11 * j11 * vw[:, 1, 1]
        + 2.0 * j11 * j12 * vw[:, 1, 2]
        + j12 * j12 * vw[:, 2, 2]
    )
    a = a + 0.3
    c = c + 0.3

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    valid = active & in_front & det_ok
    radius = jnp.where(valid, radius, 0.0)

    # view-dependent color: SH evaluated along camera->gaussian direction
    cam_center = -R.T @ t
    dirs = params.xyz - cam_center
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    if params.f_rest.shape[1] > 0:
        sh = jnp.concatenate([params.f_dc, params.f_rest], axis=1)
    else:
        sh = params.f_dc
    color = jnp.maximum(eval_sh(sh_degree, sh, dirs) + 0.5, 0.0)

    opacity = jnp.where(valid, opacity, 0.0)
    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        color=color,
        opacity=opacity,
        depth=z,
        radii=radius,
        valid=valid,
    )
