"""Losses and image operators (channel-last (H, W, C) convention).

Functional parity targets:
  - l1 / ssim: /root/reference/gaussian_splatting/utils/loss_utils.py:21,61-101
  - psnr: /root/reference/gaussian_splatting/utils/image_utils.py:19-21
  - Scharr gradients + validity erosion: /root/reference/utils/slam_utils.py:4-38
  - tracking / mapping losses: /root/reference/utils/slam_utils.py:56-128
  - median depth: /root/reference/utils/slam_utils.py:131-142
  - edge mask: /root/reference/utils/camera_utils.py:114-143

All masked reductions use sum(x*m)/sum(m) instead of boolean indexing so
shapes stay static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# basic metrics


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x - y).mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray | None = None):
    """PSNR; with a mask, the MSE is averaged over masked pixels only."""
    se = (img1 - img2) ** 2
    if mask is None:
        mse = se.mean()
    else:
        m = mask.astype(se.dtype)
        if m.ndim == se.ndim - 1:
            m = m[..., None]
        mse = (se * m).sum() / jnp.maximum((jnp.ones_like(se) * m).sum(), 1.0)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D convolution with SAME padding. img: (H, W, C).

    precision=HIGHEST: on TPU the default conv runs bf16 passes, and the
    SSIM variance terms E[x^2] - mu^2 then cancel catastrophically —
    measured mean SSIM of 1.106 (impossible; bounded by 1) on a fixture
    eval. Metrics must be fp32-exact; these convs are not hot."""
    c = img.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, 1))
    out = jax.lax.conv_general_dilated(
        img[None],
        jnp.tile(k, (1, 1, 1, c)),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM with an 11x11 sigma-1.5 Gaussian window (loss_utils.py:61-101)."""
    w = _gaussian_window(window_size)
    mu1 = _filter2d_same(img1, w)
    mu2 = _filter2d_same(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_same(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter2d_same(img2 * img2, w) - mu2_sq
    sigma12 = _filter2d_same(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


# ---------------------------------------------------------------------------
# image gradients / masks


def image_gradient(image: jnp.ndarray):
    """Normalized 3x3 Scharr gradients of an (H, W, C) image -> (gx, gy)."""
    kx = jnp.array([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]) / 32.0
    ky = kx.T
    gx = _filter2d_same(image, kx)
    gy = _filter2d_same(image, ky)
    return gx, gy


def image_gradient_mask(image: jnp.ndarray, eps: float = 0.01):
    """Validity mask eroded by a 3x3 all-ones filter (slam_utils.py:24-38)."""
    valid = (image.sum(axis=-1, keepdims=True) > eps).astype(jnp.float32)
    ones = jnp.ones((3, 3), dtype=jnp.float32)
    eroded = _filter2d_same(valid, ones)
    mask = eroded >= 9.0 - 1e-3
    return mask[..., 0]


@functools.partial(jax.jit, static_argnames=("edge_threshold", "per_block"))
def compute_grad_mask(image: jnp.ndarray, edge_threshold: float, per_block: bool):
    """Scharr edge mask used by the tracking loss (camera_utils.py:114-143).

    per_block=False -> global-median threshold (TUM-style);
    per_block=True  -> per-32x32-block median threshold (Replica-style).
    """
    gx, gy = image_gradient(jnp.mean(image, axis=-1, keepdims=True))
    mag = jnp.sqrt(gx**2 + gy**2)[..., 0]
    valid = image_gradient_mask(image)
    mag = mag * valid
    if not per_block:
        th = jnp.median(mag) * edge_threshold
        return mag > th
    h, w = mag.shape
    bs = 32
    hb, wb = h // bs, w // bs
    core = mag[: hb * bs, : wb * bs].reshape(hb, bs, wb, bs)
    med = jnp.median(core, axis=(1, 3))
    th = jnp.repeat(jnp.repeat(med * edge_threshold, bs, axis=0), bs, axis=1)
    out = jnp.zeros_like(mag, dtype=bool)
    return out.at[: hb * bs, : wb * bs].set(core.reshape(hb * bs, wb * bs) > th)


# ---------------------------------------------------------------------------
# SLAM losses


def apply_exposure(image: jnp.ndarray, exposure_ab: jnp.ndarray) -> jnp.ndarray:
    """Affine exposure compensation exp(a) * I + b (slam_utils.py:57)."""
    return jnp.exp(exposure_ab[0]) * image + exposure_ab[1]


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    if m.ndim == x.ndim - 1:
        m = m[..., None]
    denom = jnp.maximum((jnp.ones_like(x) * m).sum(), 1.0)
    return (x * m).sum() / denom


def tracking_loss(
    render_color: jnp.ndarray,  # (H, W, 3)
    render_depth: jnp.ndarray,  # (H, W)
    render_opacity: jnp.ndarray,  # (H, W)
    gt_image: jnp.ndarray,  # (H, W, 3)
    gt_depth: jnp.ndarray | None,  # (H, W) or None (monocular)
    exposure_ab: jnp.ndarray,  # (2,)
    grad_mask: jnp.ndarray,  # (H, W) bool edge mask
    monocular: bool,
    alpha: float = 0.95,
    rgb_boundary_threshold: float = 0.01,
) -> jnp.ndarray:
    """Per-frame tracking loss (slam_utils.py:56-88)."""
    image_ab = apply_exposure(render_color, exposure_ab)
    rgb_pixel_mask = (gt_image.sum(axis=-1) > rgb_boundary_threshold) & grad_mask
    if monocular or gt_depth is None:
        l1 = render_opacity[..., None] * jnp.abs(image_ab - gt_image)
        return _masked_mean(l1, rgb_pixel_mask)
    l1_rgb = render_opacity[..., None] * jnp.abs(image_ab - gt_image)
    rgb_term = _masked_mean(l1_rgb, rgb_pixel_mask)
    depth_mask = (gt_depth > 0.0) & (render_opacity > 0.95) & grad_mask
    # alpha-normalized expected depth: the raw accumulation Sum(w z) is
    # biased low by (1 - alpha) even at the true pose; normalization is
    # exact at saturation and removes the bias where alpha < 1
    depth_n = render_depth / jnp.maximum(render_opacity, 1e-5)
    l1_depth = jnp.abs(depth_n - gt_depth)
    depth_term = _masked_mean(l1_depth, depth_mask)
    return alpha * rgb_term + (1.0 - alpha) * depth_term


def mapping_loss(
    render_color: jnp.ndarray,
    render_depth: jnp.ndarray,
    gt_image: jnp.ndarray,
    gt_depth: jnp.ndarray | None,
    exposure_ab: jnp.ndarray,
    monocular: bool,
    initialization: bool = False,
    alpha: float = 0.95,
    rgb_boundary_threshold: float = 0.01,
    render_opacity: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-frame mapping loss (slam_utils.py:91-128)."""
    image_ab = render_color if initialization else apply_exposure(render_color, exposure_ab)
    rgb_pixel_mask = gt_image.sum(axis=-1) > rgb_boundary_threshold
    if monocular or gt_depth is None:
        return _masked_mean(jnp.abs(image_ab - gt_image), rgb_pixel_mask)
    rgb_term = _masked_mean(jnp.abs(image_ab - gt_image), rgb_pixel_mask)
    depth_mask = gt_depth > 0.0
    if render_opacity is not None:
        # see tracking_loss: alpha-normalized expected depth
        render_depth = render_depth / jnp.maximum(render_opacity, 1e-5)
    depth_term = _masked_mean(jnp.abs(render_depth - gt_depth), depth_mask)
    return alpha * rgb_term + (1.0 - alpha) * depth_term


def isotropic_regularizer(log_scales: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """10 * mean |s - mean(s)| over active Gaussians (slam_backend.py:229-231)."""
    s = jnp.exp(log_scales)
    m = active.astype(s.dtype)[:, None]
    denom = jnp.maximum(m.sum() * s.shape[-1], 1.0)
    mean_s = (s * m).sum(axis=-1, keepdims=True) / s.shape[-1]
    return 10.0 * (jnp.abs(s - mean_s) * m).sum() / denom


def median_depth(
    depth: jnp.ndarray, opacity: jnp.ndarray, mask: jnp.ndarray | None = None
):
    """Median of rendered depth over valid pixels (slam_utils.py:131-142).

    Invalid pixels are replaced with NaN and jnp.nanmedian handles them,
    keeping shapes static.
    """
    valid = (depth > 0.0) & (opacity > 0.95)
    if mask is not None:
        valid = valid & mask
    masked = jnp.where(valid, depth, jnp.nan)
    med = jnp.nanmedian(masked)
    std = _nanstd(masked)
    return med, std, valid


def _nanstd(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.isfinite(x)
    n = jnp.maximum(m.sum(), 1)
    mean = jnp.where(m, x, 0.0).sum() / n
    var = (jnp.where(m, x - mean, 0.0) ** 2).sum() / n
    return jnp.sqrt(var)


ssim_loss = functools.partial(ssim)
