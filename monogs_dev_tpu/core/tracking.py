"""Jitted camera-tracking loop.

TPU-native rebuild of FrontEnd.tracking
(/root/reference/utils/slam_frontend.py:128-196): the reference runs <=100
Python iterations of render -> backward -> Adam -> SE(3) retraction with a
convergence exit; here the whole loop is ONE device program — a
`lax.while_loop` whose body takes `jax.grad` of the tracking loss w.r.t. the
pose tangent (at zero) and exposure, applies an Adam update on the tangent,
and retracts ``T <- exp(tau) @ T`` (pose_utils.py:76-93 semantics, including
the ||tau|| < 1e-4 convergence test and torch.optim.Adam defaults
eps=1e-8).

Pose gradients flow through the rasterizer by autodiff of the composed
``se3_exp(tau) @ T`` — the TPU replacement for the CUDA fork's hand-written
theta/rho backward (SURVEY.md §2.9).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp
from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams
from ..ops.project import project_gaussians
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import (
    build_binning,
    compact_binning,
    render_binned,
    render_tiled,
)
from ..utils.losses import compute_grad_mask, tracking_loss, median_depth
from .params import StepConfig

_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8  # torch.optim.Adam defaults


class TrackResult(NamedTuple):
    T_w2c: jnp.ndarray  # (4, 4) final pose
    exposure_ab: jnp.ndarray  # (2,)
    n_iters: jnp.ndarray  # () int32
    converged: jnp.ndarray  # () bool
    color: jnp.ndarray  # (H, W, 3) render at final pose
    depth: jnp.ndarray  # (H, W)
    opacity: jnp.ndarray  # (H, W)
    touched: jnp.ndarray  # (N,) bool — n_touched > 0 (the only consumer;
    # bool quarters the d2h transfer on the remote-relay transport)
    median_depth: jnp.ndarray  # ()
    dup_overflow: jnp.ndarray  # () binning telemetry from the final render
    tile_overflow: jnp.ndarray  # ()
    compact_dropped: jnp.ndarray  # () max working-set drop over rebinnings
    n_binned: jnp.ndarray  # () max gaussians with tile entries over all
    # rebinnings/levels — the signal the frontend's ADAPTIVE working-set
    # compaction sizes its tier from (core/frontend.py _choose_compact)


class _Carry(NamedTuple):
    T: jnp.ndarray
    exp_ab: jnp.ndarray
    mu: jnp.ndarray  # (8,) Adam first moment over [tau(6), exposure(2)]
    nu: jnp.ndarray  # (8,)
    count: jnp.ndarray
    itr: jnp.ndarray
    converged: jnp.ndarray
    best_loss: jnp.ndarray  # () running best for the plateau exit
    stall: jnp.ndarray  # () iterations without relative improvement
    compact_dropped: jnp.ndarray  # () max working-set overflow (telemetry)
    n_binned: jnp.ndarray  # () max binned-gaussian count over rebinnings


def _halve_image(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, (H, W, C) or (H, W)."""
    h, w = x.shape[:2]
    c = x.shape[2:]
    return x.reshape((h // 2, 2, w // 2, 2) + c).mean(axis=(1, 3))


def _halve_depth(d: jnp.ndarray) -> jnp.ndarray:
    """2x2 pool averaging only valid (> 0) depths."""
    h, w = d.shape
    blocks = d.reshape(h // 2, 2, w // 2, 2)
    valid = (blocks > 0.0).astype(d.dtype)
    n = valid.sum(axis=(1, 3))
    return jnp.where(n > 0, blocks.sum(axis=(1, 3)) / jnp.maximum(n, 1.0), 0.0)


def _halve_mask(m: jnp.ndarray) -> jnp.ndarray:
    """2x2 any-pool for boolean masks."""
    h, w = m.shape
    return m.reshape(h // 2, 2, w // 2, 2).any(axis=(1, 3))


def _scale_intrinsics(intr: Intrinsics, k: int) -> Intrinsics:
    """Intrinsics after k 2x halvings. With the rasterizer's half-pixel
    convention (pix = f x/z + c - 0.5, ops/project.py) a 2x2 average pool
    maps exactly to (f/2, c/2)."""
    s = 1 / (1 << k)
    return Intrinsics(
        fx=intr.fx * s,
        fy=intr.fy * s,
        cx=intr.cx * s,
        cy=intr.cy * s,
        width=intr.width >> k,
        height=intr.height >> k,
        znear=intr.znear,
        zfar=intr.zfar,
    )


def track_frame(
    params,
    active,
    T_init,
    exposure_init,
    image,
    depth_gt,
    grad_mask,
    bg_color,
    cfg,
    intr,
    raster_cfg,
    use_depth,
) -> "TrackResult":
    """Dispatch-boundary shim: canonicalize every array input to a
    strong-typed device array so prewarm and production share ONE jit
    cache entry (utils/jit_sig.py documents the weak-type failure mode
    that stalled the round-4 bench)."""
    from ..utils.jit_sig import strongen

    return _track_frame_jit(
        strongen(params),
        strongen(active),
        strongen(T_init),
        strongen(exposure_init),
        strongen(image),
        strongen(depth_gt),
        strongen(grad_mask),
        strongen(bg_color),
        cfg,
        intr,
        raster_cfg,
        use_depth=bool(use_depth),
    )


@functools.partial(
    jax.jit, static_argnames=("intr", "cfg", "raster_cfg", "use_depth")
)
def _track_frame_jit(
    params: GaussianParams,
    active: jnp.ndarray,
    T_init: jnp.ndarray,
    exposure_init: jnp.ndarray,
    image: jnp.ndarray,  # (H, W, 3) gt
    depth_gt: jnp.ndarray,  # (H, W); ignored when use_depth=False
    grad_mask: jnp.ndarray,  # (H, W) bool
    bg_color: jnp.ndarray,
    cfg: StepConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    use_depth: bool,
) -> TrackResult:
    image = jnp.asarray(image)
    depth_gt = jnp.asarray(depth_gt)
    if grad_mask is None:
        # computed in-program: one dispatch per frame instead of a separate
        # grad-mask program + transfers (camera_utils.py:114-143 semantics)
        grad_mask = compute_grad_mask(
            image, cfg.edge_threshold, cfg.per_block_mask
        )
    lr = jnp.concatenate(
        [
            jnp.full((3,), cfg.cam_trans_lr),
            jnp.full((3,), cfg.cam_rot_lr),
            jnp.full((2,), cfg.exposure_lr),
        ]
    )

    def run_level(carry, image_l, depth_l, mask_l, intr_l, max_iters):
        """One pyramid level: Adam/retraction while_loop at this scale."""
        # tiles with no edge-mask pixel contribute nothing to the tracking
        # loss (both terms are gated on mask_l): blend them as background
        from ..ops.rasterize import tile_wh

        tw, th = tile_wh(raster_cfg)
        tx_n = -(-intr_l.width // tw)
        ty_n = -(-intr_l.height // th)
        m_pad = jnp.zeros((ty_n * th, tx_n * tw), bool)
        m_pad = m_pad.at[: intr_l.height, : intr_l.width].set(mask_l)
        tile_mask = (
            m_pad.reshape(ty_n, th, tx_n, tw).any(axis=(1, 3)).reshape(-1)
        )

        def loss_fn(tau, exp_ab, T, binning, params_x, active_x):
            T_new = se3_exp(tau) @ T
            proj = project_gaussians(
                params_x, active_x, T_new, intr_l, cfg.sh_degree
            )
            out = render_binned(
                proj, proj.means2d, binning, intr_l, bg_color, raster_cfg,
                need_touched=False, tile_mask=tile_mask,
            )
            return tracking_loss(
                out.color,
                out.depth,
                out.alpha,
                image_l,
                depth_l if use_depth else None,
                exp_ab,
                mask_l,
                cfg.monocular,
                cfg.alpha,
                cfg.rgb_boundary_threshold,
            )

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def not_done(c: _Carry):
            return (c.itr < max_iters) & ~c.converged

        def body(c: _Carry, binning, params_x, active_x) -> _Carry:
            loss, (g_tau, g_exp) = grad_fn(
                jnp.zeros(6), c.exp_ab, c.T, binning, params_x, active_x
            )
            g = jnp.concatenate([g_tau, g_exp])
            count = c.count + 1
            mu = _ADAM_B1 * c.mu + (1.0 - _ADAM_B1) * g
            nu = _ADAM_B2 * c.nu + (1.0 - _ADAM_B2) * g * g
            c1 = 1.0 - _ADAM_B1 ** count.astype(jnp.float32)
            c2 = 1.0 - _ADAM_B2 ** count.astype(jnp.float32)
            step = lr * (mu / c1) / (jnp.sqrt(nu / c2) + _ADAM_EPS)
            tau_new = -step[:6]
            exp_new = c.exp_ab - step[6:]
            T_new = se3_exp(tau_new) @ c.T
            converged = jnp.linalg.norm(tau_new) < cfg.convergence_threshold
            # TPU extension: loss-plateau exit. The reference only exits on
            # ||tau|| < 1e-4 (pose_utils.py:88), which Adam's lr-sized steps
            # never reach on flat photometric plateaus — it then burns the
            # full iteration budget. plateau_iters=0 restores that behavior.
            if cfg.plateau_iters > 0:
                improved = loss < c.best_loss * (1.0 - cfg.plateau_rel_tol)
                stall = jnp.where(improved, 0, c.stall + 1)
                best = jnp.minimum(c.best_loss, loss)
                converged = converged | (stall >= cfg.plateau_iters)
            else:
                stall, best = c.stall, c.best_loss
            return _Carry(
                T_new, exp_new, mu, nu, count, c.itr + 1, converged, best,
                stall, c.compact_dropped, c.n_binned,
            )

        def outer_body(c: _Carry) -> _Carry:
            # rebin at the current pose with a drift margin, then run up to
            # rebin_every inner iterations against the fixed binning
            proj = jax.lax.stop_gradient(
                project_gaussians(params, active, c.T, intr_l, cfg.sh_degree)
            )
            binning = build_binning(
                proj, intr_l, raster_cfg, dilate=cfg.rebin_dilation
            )
            # binned-set telemetry: gaussians with >= 1 tile entry at this
            # rebin (the adaptive compaction signal; cheap vs the render)
            flat_slots = binning.idx_table.shape[0] * binning.idx_table.shape[1]
            n_b = (
                (binning.pos_table < flat_slots).any(axis=1).sum()
            ).astype(jnp.int32)
            c = c._replace(n_binned=jnp.maximum(c.n_binned, n_b))
            n = active.shape[0]
            m = cfg.track_compact
            if 0 < m < n:
                # compact the iteration working set to the <= m Gaussians
                # with tile entries: every per-iteration tensor (projection
                # rows incl. their VJP, props gather) shrinks from the
                # capacity tier to the visible set. Bit-exact when nothing
                # is dropped (compact_binning docstring); drops are counted.
                sel, binning, dropped = compact_binning(binning, n, m)
                sel_c = jnp.clip(sel, 0, n - 1)
                params_x = jax.tree.map(lambda x: x[sel_c], params)
                active_x = active[sel_c] & (sel < n)
            else:
                params_x, active_x = params, active
                dropped = jnp.zeros((), jnp.int32)
            c = c._replace(
                compact_dropped=jnp.maximum(c.compact_dropped, dropped)
            )
            start_itr = c.itr

            def inner_cond(ci: _Carry):
                return not_done(ci) & (ci.itr < start_itr + cfg.rebin_every)

            return jax.lax.while_loop(
                inner_cond, lambda ci: body(ci, binning, params_x, active_x), c
            )

        return jax.lax.while_loop(not_done, outer_body, carry)

    # pyramid levels, coarse to fine. Level arrays are built by repeated
    # exact 2x pooling; intrinsics scale with the half-pixel convention.
    # cfg.pyramid_levels = 0 reproduces the reference's single full-res loop.
    if cfg.pyramid_levels > 0:
        div = 1 << cfg.pyramid_levels
        if intr.height % div or intr.width % div:
            raise ValueError(
                f"tracking_pyramid_levels={cfg.pyramid_levels} requires image "
                f"dims divisible by {div}, got {intr.height}x{intr.width}; "
                "crop/pad the input or lower the level count"
            )
    levels = []  # (image, depth, mask, intr, max_iters) coarse -> fine
    img_l, dep_l, msk_l = image, depth_gt, grad_mask
    levels.append((img_l, dep_l, msk_l, intr, cfg.tracking_max_iters))
    for k in range(1, cfg.pyramid_levels + 1):
        img_l = _halve_image(img_l)
        dep_l = _halve_depth(dep_l)
        msk_l = _halve_mask(msk_l)
        levels.append(
            (img_l, dep_l, msk_l, _scale_intrinsics(intr, k),
             cfg.pyramid_coarse_iters)
        )
    levels.reverse()

    carry = _Carry(
        T=T_init,
        exp_ab=exposure_init,
        mu=jnp.zeros(8),
        nu=jnp.zeros(8),
        count=jnp.zeros((), jnp.int32),
        itr=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool),
        best_loss=jnp.asarray(jnp.inf),
        stall=jnp.zeros((), jnp.int32),
        compact_dropped=jnp.zeros((), jnp.int32),
        n_binned=jnp.zeros((), jnp.int32),
    )
    total_iters = jnp.zeros((), jnp.int32)
    for li, (img_l, dep_l, msk_l, intr_l, max_iters) in enumerate(levels):
        if li > 0:
            # fresh optimizer state + iteration budget per level
            carry = carry._replace(
                mu=jnp.zeros(8),
                nu=jnp.zeros(8),
                count=jnp.zeros((), jnp.int32),
                itr=jnp.zeros((), jnp.int32),
                converged=jnp.zeros((), bool),
                best_loss=jnp.asarray(jnp.inf),
                stall=jnp.zeros((), jnp.int32),
            )
        carry = run_level(carry, img_l, dep_l, msk_l, intr_l, max_iters)
        total_iters = total_iters + carry.itr
    final = carry._replace(itr=total_iters)

    out = render_tiled(
        params, active, final.T, intr, cfg.sh_degree, bg_color, raster_cfg
    )
    med, _, _ = median_depth(out.depth, out.alpha)
    return TrackResult(
        T_w2c=final.T,
        exposure_ab=final.exp_ab,
        n_iters=final.itr,
        converged=final.converged,
        color=out.color,
        depth=out.depth,
        opacity=out.alpha,
        touched=out.n_touched > 0,
        median_depth=med,
        dup_overflow=out.dup_overflow,
        tile_overflow=out.tile_overflow,
        compact_dropped=final.compact_dropped,
        n_binned=final.n_binned,
    )
