"""Gauss-Newton / Levenberg-Marquardt camera tracking — TPU-first solver.

The reference burns <= 100 first-order Adam iterations per frame because
that is what CUDA autodiff hands it (/root/reference/utils/
slam_frontend.py:163-193). The pose problem is 6-DoF (+2 exposure), so a
second-order step is cheap: this module solves the damped 8x8 normal
equations per iteration using an IMAGE-SPACE linearization of the
photometric residual (the classic direct-alignment Jacobian of
DSO/LSD-SLAM, with the ESM gradient-averaging trick), needing only ONE
forward render per iteration — no VJP through the rasterizer at all.

Residual model (mirrors utils/losses.py tracking_loss, IRLS-weighted):
  rgb:   r_c(p) = exp(a) * Ihat_c(p) + b - I_c(p), weight
         w = opacity * edge_mask / sqrt(r^2 + eps^2)        (mono terms)
  depth: r_d(p) = Dhat(p)/alpha(p) - D(p), masked as the reference
         (gt > 0, opacity > 0.95, edge mask)                (RGB-D only)

Jacobian per pixel, from the warp of the scene point at rendered depth z
(X = back-projected pixel, camera frame; increment T <- exp([rho,theta]) T):
  du/dxi = [fx/z, 0, -(u+.5-cx)/z | . ] @ [I3 | -[X]x]     (2x6)
  dr_c/dxi = -g_c . du/dxi, g_c = ESM mean of exp(a)*grad(Ihat_c) and
             grad(I_c)                                    (brightness constancy)
  dr_c/da = exp(a) * Ihat_c,  dr_c/db = 1
  dr_d/dxi = [0,0,1, Y,-X,0] - grad(Dhat_n) . du/dxi

Levenberg damping with revert-on-worse; stops on the reference's
||step|| < 1e-4 test (pose_utils.py:88) or the loss plateau, whichever the
config enables. Selected via ``Training.tracking_solver: gn``; the Adam
path (core/tracking.py) remains the parity default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp
from ..models.camera import Intrinsics
from ..ops.project import project_gaussians
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import build_binning, compact_binning, render_binned, render_tiled
from ..utils.losses import (
    compute_grad_mask,
    image_gradient,
    median_depth,
    tracking_loss,
)
from .params import StepConfig
from .tracking import (
    TrackResult,
    _halve_depth,
    _halve_image,
    _halve_mask,
    _scale_intrinsics,
)

# Pseudo-Huber IRLS: w = 1/sqrt(1 + (r/delta)^2) — quadratic near zero,
# L1-like in the tails. The first cut used pure L1-IRLS (w = 1/|r| with a
# 1e-3 knee): pixels already at ~zero residual then carry weight ~1000
# while contributing ~nothing to the gradient, so H is inflated relative
# to g and steps collapse — measured as unrecoverable per-frame drift at
# the pipeline's 15-iteration budget (tiny_rgbd e2e, round 5).
_HUBER_RGB = 0.05
_HUBER_DEPTH = 0.05
_LM_MIN, _LM_MAX = 1e-5, 1e2


def track_frame_gn(
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
    """Dispatch-boundary shim (see core/tracking.py track_frame)."""
    from ..utils.jit_sig import strongen

    return _track_frame_gn_jit(
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
def _track_frame_gn_jit(
    params,
    active,
    T_init,
    exposure_init,
    image,
    depth_gt,
    grad_mask,
    bg_color,
    cfg: StepConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    use_depth: bool,
) -> TrackResult:
    image = jnp.asarray(image)
    depth_gt = jnp.asarray(depth_gt)
    if grad_mask is None:
        grad_mask = compute_grad_mask(
            image, cfg.edge_threshold, cfg.per_block_mask
        )
    opt_exposure = cfg.exposure_lr > 0.0

    def run_level(carry, image_l, depth_l, mask_l, intr_l, max_iters):
        from ..ops.rasterize import tile_wh

        tw, th = tile_wh(raster_cfg)
        tx_n = -(-intr_l.width // tw)
        ty_n = -(-intr_l.height // th)
        m_pad = jnp.zeros((ty_n * th, tx_n * tw), bool)
        m_pad = m_pad.at[: intr_l.height, : intr_l.width].set(mask_l)
        tile_mask = (
            m_pad.reshape(ty_n, th, tx_n, tw).any(axis=(1, 3)).reshape(-1)
        )
        # observed-image gradient: constant across iterations (ESM half)
        gx_obs, gy_obs = image_gradient(image_l)
        h, w = intr_l.height, intr_l.width
        uu, vv = jnp.meshgrid(
            jnp.arange(w, dtype=jnp.float32),
            jnp.arange(h, dtype=jnp.float32),
            indexing="xy",
        )
        xn = (uu + 0.5 - intr_l.cx) / intr_l.fx  # x/z per pixel
        yn = (vv + 0.5 - intr_l.cy) / intr_l.fy
        rgb_base = (image_l.sum(axis=-1) > cfg.rgb_boundary_threshold) & mask_l

        def render_at(T, binning, params_x, active_x):
            proj = project_gaussians(
                params_x, active_x, T, intr_l, cfg.sh_degree
            )
            return render_binned(
                proj, proj.means2d, binning, intr_l, bg_color, raster_cfg,
                need_touched=False, tile_mask=tile_mask,
            )

        def loss_of(out, exp_ab):
            return tracking_loss(
                out.color, out.depth, out.alpha, image_l,
                depth_l if use_depth else None, exp_ab, mask_l,
                cfg.monocular, cfg.alpha, cfg.rgb_boundary_threshold,
            )

        def normal_equations(out, exp_ab):
            """Accumulate H (8,8), g (8,) from the current render."""
            alpha_r = out.alpha
            z = out.depth / jnp.maximum(alpha_r, 1e-5)  # normalized depth
            geom_ok = (alpha_r > 0.5) & (z > intr_l.znear)
            z_s = jnp.where(geom_ok, z, 1.0)
            inv_z = 1.0 / z_s
            X = xn * z_s
            Y = yn * z_s
            # du/dxi rows (2, 6) per pixel, componentwise (H, W) arrays:
            # du/dX = [fx/z, 0, -fx X/z^2], dX'/d[rho|theta] = [I | -[X]x]
            fxz = intr_l.fx * inv_z
            fyz = intr_l.fy * inv_z
            # J_u = du/dX @ [I | -[X]x]  (6,)
            # -[X]x = [[0, Z, -Y], [-Z, 0, X], [Y, -X, 0]] columns theta
            ju0 = fxz
            ju2 = -fxz * xn  # -fx X / z^2 = -(fx/z) * (X/z)
            # compose via dX'/dtheta = theta x X derivative matrix:
            # d(theta x X)/dtheta = -[X]x with rows:
            #   dX'/dtheta = (0, Z, -Y); dY'/dtheta = (-Z, 0, X);
            #   dZ'/dtheta = (Y, -X, 0)
            # J_u(theta) = du/dX * dX'/dtheta + du/dZ * dZ'/dtheta
            ju_t0 = ju2 * Y  # fx/z*0 + 0*(-Z) + (-fxX/z^2)*Y
            ju_t1 = fxz * z_s + ju2 * (-X)  # fx/z*Z + (-fxX/z^2)*(-X)
            ju_t2 = fxz * (-Y)
            jv1 = fyz
            jv2 = -fyz * yn
            jv_t0 = -fyz * z_s + jv2 * Y
            jv_t1 = jv2 * (-X)
            jv_t2 = fyz * X
            # (H, W, 6) warp jacobians
            j_u = jnp.stack(
                [ju0, jnp.zeros_like(ju0), ju2, ju_t0, ju_t1, ju_t2], -1
            )
            j_v = jnp.stack(
                [jnp.zeros_like(jv1), jv1, jv2, jv_t0, jv_t1, jv_t2], -1
            )

            ea = jnp.exp(exp_ab[0])
            img_ab = ea * out.color + exp_ab[1]
            r_rgb = img_ab - image_l  # (H, W, 3)
            gx_r, gy_r = image_gradient(out.color)
            gx = 0.5 * (ea * gx_r + gx_obs)  # ESM gradient average
            gy = 0.5 * (ea * gy_r + gy_obs)
            # per-channel pose jacobian: -(gx*j_u + gy*j_v)  (H, W, 3, 6)
            j_pose = -(
                gx[..., None] * j_u[..., None, :]
                + gy[..., None] * j_v[..., None, :]
            )
            j_a = ea * out.color  # dr/da
            j_b = jnp.ones_like(j_a)
            if not opt_exposure:
                j_a = jnp.zeros_like(j_a)
                j_b = jnp.zeros_like(j_b)
            j_rgb = jnp.concatenate(
                [j_pose, j_a[..., None], j_b[..., None]], axis=-1
            )  # (H, W, 3, 8)

            w_irls = 1.0 / jnp.sqrt(
                1.0 + (r_rgb / _HUBER_RGB) ** 2
            )
            w_rgb = (
                alpha_r * rgb_base.astype(jnp.float32) * geom_ok
            )[..., None] * w_irls
            n_rgb = jnp.maximum(
                (rgb_base.astype(jnp.float32)).sum() * 3.0, 1.0
            )
            if use_depth and not cfg.monocular:
                w_rgb = w_rgb * (cfg.alpha / n_rgb)
            else:
                w_rgb = w_rgb * (1.0 / n_rgb)

            jw = j_rgb * w_rgb[..., None]
            H = jnp.einsum("hwci,hwcj->ij", jw, j_rgb)
            g = jnp.einsum("hwci,hwc->i", jw, r_rgb)

            if use_depth and not cfg.monocular:
                d_mask = (depth_l > 0.0) & (alpha_r > 0.95) & mask_l & geom_ok
                r_d = z - depth_l
                gzx, gzy = image_gradient(z[..., None])
                j_zwarp = -(gzx[..., 0:1] * j_u + gzy[..., 0:1] * j_v)
                j_zmotion = jnp.stack(
                    [
                        jnp.zeros_like(X), jnp.zeros_like(X),
                        jnp.ones_like(X), Y, -X, jnp.zeros_like(X),
                    ],
                    -1,
                )
                j_d = jnp.concatenate(
                    [j_zmotion + j_zwarp, jnp.zeros(z.shape + (2,))], -1
                )  # (H, W, 8)
                # depth-DISCONTINUITY downweight (DSO-style): at occlusion
                # boundaries |grad z| is meters/pixel and the first-order
                # warp model is invalid — those rows dominate H quadratically
                # and stalled the RGB-D solver at ~25% of the mono accuracy
                # on the surface A/B. sigma = 5 cm/px keeps smooth-relief
                # rows at full weight.
                g2 = gzx[..., 0] ** 2 + gzy[..., 0] ** 2
                w_edge = 0.0025 / (0.0025 + g2)
                w_d = w_edge * d_mask.astype(jnp.float32) / jnp.sqrt(
                    1.0 + (r_d / _HUBER_DEPTH) ** 2
                )
                n_d = jnp.maximum(d_mask.astype(jnp.float32).sum(), 1.0)
                w_d = w_d * ((1.0 - cfg.alpha) / n_d)
                jwd = j_d * w_d[..., None]
                H = H + jnp.einsum("hwi,hwj->ij", jwd, j_d)
                g = g + jnp.einsum("hwi,hw->i", jwd, r_d)
            return H, g

        def not_done(c):
            return (c["itr"] < max_iters) & ~c["converged"]

        def body(c, binning, params_x, active_x):
            out = render_at(c["T"], binning, params_x, active_x)
            loss = loss_of(out, c["ab"])
            worse = loss > c["best_loss"] * (1.0 + 1e-6)
            # revert-on-worse: fall back to the best state and raise damping
            T_cur = jnp.where(worse, c["best_T"], c["T"])
            ab_cur = jnp.where(worse, c["best_ab"], c["ab"])
            lam = jnp.where(
                worse,
                jnp.minimum(c["lam"] * 4.0, _LM_MAX),
                jnp.maximum(c["lam"] * 0.5, _LM_MIN),
            )
            # NOTE: after a revert the normal equations are rebuilt from the
            # CURRENT render (at the rejected pose) — one slightly stale
            # linearization instead of carrying a second full render in the
            # loop state; the higher damping shrinks that step anyway.
            H, g = normal_equations(out, ab_cur)
            D = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
            step = jnp.linalg.solve(
                H + lam * D + 1e-8 * jnp.eye(8), -g
            )
            if not opt_exposure:
                step = step.at[6:].set(0.0)
            tau = step[:6]
            T_new = se3_exp(tau) @ T_cur
            ab_new = ab_cur + step[6:]
            best_loss = jnp.minimum(c["best_loss"], loss)
            best_T = jnp.where(loss <= c["best_loss"], c["T"], c["best_T"])
            best_ab = jnp.where(loss <= c["best_loss"], c["ab"], c["best_ab"])
            converged = jnp.linalg.norm(tau) < cfg.convergence_threshold
            if cfg.plateau_iters > 0:
                improved = loss < c["best_loss"] * (1.0 - cfg.plateau_rel_tol)
                stall = jnp.where(improved, 0, c["stall"] + 1)
                converged = converged | (stall >= cfg.plateau_iters)
            else:
                stall = c["stall"]
            return dict(
                T=T_new, ab=ab_new, lam=lam, itr=c["itr"] + 1,
                converged=converged, best_loss=best_loss, best_T=best_T,
                best_ab=best_ab, stall=stall,
                compact_dropped=c["compact_dropped"],
                n_binned=c["n_binned"],
            )

        def outer_body(c):
            proj = project_gaussians(
                params, active, c["T"], intr_l, cfg.sh_degree
            )
            binning = build_binning(
                proj, intr_l, raster_cfg, dilate=cfg.rebin_dilation
            )
            flat_slots = (
                binning.idx_table.shape[0] * binning.idx_table.shape[1]
            )
            n_b = (
                (binning.pos_table < flat_slots).any(axis=1).sum()
            ).astype(jnp.int32)
            c = dict(c, n_binned=jnp.maximum(c["n_binned"], n_b))
            n = active.shape[0]
            m = cfg.track_compact
            if 0 < m < n:
                sel, binning, dropped = compact_binning(binning, n, m)
                sel_c = jnp.clip(sel, 0, n - 1)
                params_x = jax.tree.map(lambda x: x[sel_c], params)
                active_x = active[sel_c] & (sel < n)
            else:
                params_x, active_x = params, active
                dropped = jnp.zeros((), jnp.int32)
            c = dict(
                c,
                compact_dropped=jnp.maximum(c["compact_dropped"], dropped),
            )
            start_itr = c["itr"]

            def inner_cond(ci):
                return not_done(ci) & (
                    ci["itr"] < start_itr + cfg.rebin_every
                )

            return jax.lax.while_loop(
                inner_cond, lambda ci: body(ci, binning, params_x, active_x), c
            )

        return jax.lax.while_loop(not_done, outer_body, carry)

    if cfg.pyramid_levels > 0:
        div = 1 << cfg.pyramid_levels
        if intr.height % div or intr.width % div:
            raise ValueError(
                f"tracking_pyramid_levels={cfg.pyramid_levels} requires image "
                f"dims divisible by {div}, got {intr.height}x{intr.width}"
            )
    levels = []
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

    carry = dict(
        T=jnp.asarray(T_init, jnp.float32),
        ab=jnp.asarray(exposure_init, jnp.float32),
        lam=jnp.asarray(cfg.gn_lm_init, jnp.float32),
        itr=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool),
        best_loss=jnp.asarray(jnp.inf),
        best_T=jnp.asarray(T_init, jnp.float32),
        best_ab=jnp.asarray(exposure_init, jnp.float32),
        stall=jnp.zeros((), jnp.int32),
        compact_dropped=jnp.zeros((), jnp.int32),
        n_binned=jnp.zeros((), jnp.int32),
    )
    total_iters = jnp.zeros((), jnp.int32)
    for li, (img_l, dep_l, msk_l, intr_l, max_iters) in enumerate(levels):
        if li > 0:
            carry = dict(
                carry,
                lam=jnp.asarray(cfg.gn_lm_init, jnp.float32),
                itr=jnp.zeros((), jnp.int32),
                converged=jnp.zeros((), bool),
                best_loss=jnp.asarray(jnp.inf),
                best_T=carry["T"],
                best_ab=carry["ab"],
                stall=jnp.zeros((), jnp.int32),
            )
        carry = run_level(carry, img_l, dep_l, msk_l, intr_l, max_iters)
        total_iters = total_iters + carry["itr"]

    # the final state may be a just-proposed (unevaluated) step; return the
    # best evaluated pose instead — the reference returns its last stepped
    # pose, but GN's last proposal can be a rejected uphill step
    T_fin = carry["best_T"]
    ab_fin = carry["best_ab"]
    out = render_tiled(
        params, active, T_fin, intr, cfg.sh_degree, bg_color, raster_cfg
    )
    med, _, _ = median_depth(out.depth, out.alpha)
    return TrackResult(
        T_w2c=T_fin,
        exposure_ab=ab_fin,
        n_iters=total_iters,
        converged=carry["converged"],
        color=out.color,
        depth=out.depth,
        opacity=out.alpha,
        touched=out.n_touched > 0,
        median_depth=med,
        dup_overflow=out.dup_overflow,
        tile_overflow=out.tile_overflow,
        compact_dropped=carry["compact_dropped"],
        n_binned=carry["n_binned"],
    )
