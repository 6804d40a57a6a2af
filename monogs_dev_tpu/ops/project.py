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


def _cov3d_components(log_scales, quats, scale_modifier):
    """3D covariance as six (N,) arrays (upper triangle).

    Component-wise so every op is a full-lane (N,) vector op — the (N,3,3)
    matmul formulation wastes 125/128 lanes per tile on TPU and measured
    ~10x slower through grad."""
    s0 = jnp.exp(log_scales[:, 0]) * scale_modifier
    s1 = jnp.exp(log_scales[:, 1]) * scale_modifier
    s2 = jnp.exp(log_scales[:, 2]) * scale_modifier
    q = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation matrix entries (build_rotation convention)
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    ss0, ss1, ss2 = s0 * s0, s1 * s1, s2 * s2
    # Sigma_ab = sum_j R_aj R_bj s_j^2
    c00 = r00 * r00 * ss0 + r01 * r01 * ss1 + r02 * r02 * ss2
    c01 = r00 * r10 * ss0 + r01 * r11 * ss1 + r02 * r12 * ss2
    c02 = r00 * r20 * ss0 + r01 * r21 * ss1 + r02 * r22 * ss2
    c11 = r10 * r10 * ss0 + r11 * r11 * ss1 + r12 * r12 * ss2
    c12 = r10 * r20 * ss0 + r11 * r21 * ss1 + r12 * r22 * ss2
    c22 = r20 * r20 * ss0 + r21 * r21 * ss1 + r22 * r22 * ss2
    return c00, c01, c02, c11, c12, c22


def sanitize_params(params: GaussianParams, active: jnp.ndarray):
    """NaN/Inf row quarantine. A map row whose params went non-finite
    (observed: gaussians diverging during a 10x-xyz-LR init BA, then
    pruned with their NaN params left in place) must NEVER enter the
    compute graph: masking later is not enough, because reverse-mode
    propagates `0 * NaN = NaN` from the row's projection math into the
    shared pose/exposure gradients even when the row contributes zero
    forward — measured as instant tracking-pose NaN on the realsense
    replay e2e. Quarantined rows get inert constants (tiny scale, zero
    opacity logit never matters since they also leave `active`) and the
    map self-heals: they render nothing, receive zero gradients, and are
    eventually evicted."""
    row_ok = (
        jnp.isfinite(params.xyz).all(-1)
        & jnp.isfinite(params.log_scales).all(-1)
        & jnp.isfinite(params.quats).all(-1)
        & jnp.isfinite(params.opacity_logit)
        & jnp.isfinite(params.f_dc).all((-1, -2))
    )
    if params.f_rest is not None and params.f_rest.size:
        row_ok = row_ok & jnp.isfinite(params.f_rest).all((-1, -2))
    # overflow guard on top of the finiteness check: a FINITE log-scale of
    # ~90 still turns exp(s)^2 into inf inside the covariance quadratics,
    # and `inf - inf = NaN` then leaks through det/eigen guards (observed
    # on the same diverging init-BA rows before they hit literal NaN).
    # exp(8) ~ 3000 world units is far beyond any plausible splat; the
    # clip's zero outside-gradient also stops feeding the runaway.
    log_scales_c = jnp.clip(params.log_scales, -20.0, 8.0)
    row_ok = row_ok & (
        jnp.abs(params.xyz).max(-1) < 1e6
    )  # km-scale positions are divergence debris, not geometry
    # near-zero quats normalize fine FORWARD but their normalize VJP
    # scales like 1/|q| per chain link — overflow fuel in big programs
    row_ok = row_ok & (jnp.linalg.norm(params.quats, axis=-1) > 1e-3)
    ok1 = row_ok[:, None]
    unit_quat = jnp.array([1.0, 0.0, 0.0, 0.0], params.quats.dtype)
    params = params._replace(
        xyz=jnp.where(ok1, params.xyz, 0.0),
        log_scales=jnp.where(ok1, log_scales_c, -10.0),
        quats=jnp.where(ok1, params.quats, unit_quat),
        opacity_logit=jnp.where(row_ok, params.opacity_logit, -10.0),
        f_dc=jnp.where(row_ok[:, None, None], params.f_dc, 0.0),
        f_rest=(
            jnp.where(row_ok[:, None, None], params.f_rest, 0.0)
            if params.f_rest is not None and params.f_rest.size
            else params.f_rest
        ),
    )
    return params, active & row_ok


def project_gaussians(
    params: GaussianParams,
    active: jnp.ndarray,
    T_w2c: jnp.ndarray,
    intr: Intrinsics,
    sh_degree: int,
    scale_modifier: float = 1.0,
    isotropic: bool = False,
) -> ProjectedGaussians:
    params, active = sanitize_params(params, active)
    scales, quats, opacity = activations(params)
    if isotropic:
        # reference isotropic broadcast (gaussian_renderer/__init__.py:89-92)
        log_scales = jnp.broadcast_to(
            params.log_scales[:, :1], params.log_scales.shape
        )
    else:
        log_scales = params.log_scales

    # Everything below is COMPONENT-WISE (N,) arithmetic: (N,3)/(N,3,3)
    # formulations put 3-wide tensors on 128-wide lanes and measured ~10x
    # slower through grad on TPU.
    R = T_w2c[:3, :3]
    t = T_w2c[:3, 3]
    X, Y, Z = params.xyz[:, 0], params.xyz[:, 1], params.xyz[:, 2]
    x = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z + t[0]
    y = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z + t[1]
    z = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z + t[2]
    in_front = z > intr.znear
    z_safe = jnp.where(in_front, z, 1.0)

    fx, fy = intr.fx, intr.fy
    inv_z = 1.0 / z_safe
    means2d = jnp.stack(
        [fx * x * inv_z + intr.cx - 0.5, fy * y * inv_z + intr.cy - 0.5],
        axis=-1,
    )

    # EWA Jacobian with frustum clamping (forward.cu convention)
    limx, limy = 1.3 * intr.tanfovx, 1.3 * intr.tanfovy
    tx = jnp.clip(x * inv_z, -limx, limx) * z_safe
    ty = jnp.clip(y * inv_z, -limy, limy) * z_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3), W = R; cov2d = J W cov3d W^T J^T
    j00, j02 = fx * inv_z, -fx * tx * inv_z2
    j11, j12 = fy * inv_z, -fy * ty * inv_z2
    c00, c01, c02, c11, c12, c22 = _cov3d_components(
        log_scales, quats, scale_modifier
    )
    # vw = R cov3d R^T, upper triangle, via m_a = (R cov3d) row a
    m00 = R[0, 0] * c00 + R[0, 1] * c01 + R[0, 2] * c02
    m01 = R[0, 0] * c01 + R[0, 1] * c11 + R[0, 2] * c12
    m02 = R[0, 0] * c02 + R[0, 1] * c12 + R[0, 2] * c22
    m10 = R[1, 0] * c00 + R[1, 1] * c01 + R[1, 2] * c02
    m11 = R[1, 0] * c01 + R[1, 1] * c11 + R[1, 2] * c12
    m12 = R[1, 0] * c02 + R[1, 1] * c12 + R[1, 2] * c22
    m20 = R[2, 0] * c00 + R[2, 1] * c01 + R[2, 2] * c02
    m21 = R[2, 0] * c01 + R[2, 1] * c11 + R[2, 2] * c12
    m22 = R[2, 0] * c02 + R[2, 1] * c12 + R[2, 2] * c22
    vw00 = m00 * R[0, 0] + m01 * R[0, 1] + m02 * R[0, 2]
    vw01 = m00 * R[1, 0] + m01 * R[1, 1] + m02 * R[1, 2]
    vw02 = m00 * R[2, 0] + m01 * R[2, 1] + m02 * R[2, 2]
    vw11 = m10 * R[1, 0] + m11 * R[1, 1] + m12 * R[1, 2]
    vw12 = m10 * R[2, 0] + m11 * R[2, 1] + m12 * R[2, 2]
    vw22 = m20 * R[2, 0] + m21 * R[2, 1] + m22 * R[2, 2]
    a = j00 * j00 * vw00 + 2.0 * j00 * j02 * vw02 + j02 * j02 * vw22
    b = (
        j00 * j11 * vw01
        + j00 * j12 * vw02
        + j02 * j11 * vw12
        + j02 * j12 * vw22
    )
    c = j11 * j11 * vw11 + 2.0 * j11 * j12 * vw12 + j12 * j12 * vw22
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
    # (direction math skipped entirely at degree 0, where SH is isotropic)
    if sh_degree > 0 and params.f_rest.shape[1] > 0:
        cam_center = -R.T @ t
        dirs = params.xyz - cam_center
        # eps-under-sqrt normalize: `norm(dirs)` computes sqrt(0) whose
        # derivative is inf BEFORE any maximum() guard can mask it, so one
        # row with xyz == cam_center turns the whole pose gradient NaN
        # (0-cotangent x inf; root cause of the sh3 tracking NaN on the
        # replay e2e). max on the SQUARED norm keeps every derivative
        # finite and zeroes the cotangent below the floor.
        n2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        dirs = dirs / jnp.sqrt(jnp.maximum(n2, 1e-16))
        sh = jnp.concatenate([params.f_dc, params.f_rest], axis=1)
        color = jnp.maximum(eval_sh(sh_degree, sh, dirs) + 0.5, 0.0)
    else:
        color = jnp.maximum(eval_sh(0, params.f_dc, params.xyz) + 0.5, 0.0)

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
