"""Per-iteration tracking cost attribution at BENCH conditions (round 5).

The round-4 VERDICT blamed the flat per-iteration cost across pyramid
levels on capacity-tier row work, but the round-5 bench measured a 25% row
cut (adaptive compaction m=24576) changing tracking time by ~0%. This
probe decomposes one tracking iteration at the bench's exact shapes:
surface map ~19k alive / 32768 rows, VGA, max_per_tile=512, k_dup=8,
tight_cull, track_alpha_min=8/255, edge-mask tile skipping, mono loss —
at all three pyramid levels, plus the GN-iteration analog (forward render
+ 8x8 normal-equation assembly, no VJP).

Timing uses dependency-chained fori_loops (the relay's block_until_ready
does not synchronize individual dispatches).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
from monogs_dev_tpu.utils.precision import enable_f32_matmuls

enable_f32_matmuls()

from monogs_dev_tpu.data.synthetic import make_surface_scene
from monogs_dev_tpu.geometry import se3_exp
from monogs_dev_tpu.models import create_map, insert_points
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import (
    build_binning,
    compact_binning,
    render_binned,
    tile_wh,
)
from monogs_dev_tpu.utils.losses import compute_grad_mask, image_gradient, tracking_loss

INTR = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
RCFG = RasterConfig(
    tile=16, max_per_tile=512, k_dup=8, tile_group=60, tight_cull=True,
    alpha_min=0.03137,
)
ROWS = 32768
ALIVE = 19000
K = 60


def chain(f, x0, iters=K):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)

    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.time()
    y = run(x0)
    jax.block_until_ready(y)
    return (time.time() - t0) / iters * 1000


def scale_intr(intr, k):
    s = 1 / (1 << k)
    return Intrinsics(
        fx=intr.fx * s, fy=intr.fy * s, cx=intr.cx * s, cy=intr.cy * s,
        width=intr.width >> k, height=intr.height >> k,
        znear=intr.znear, zfar=intr.zfar,
    )


def halve(x):
    h, w = x.shape[:2]
    c = x.shape[2:]
    return x.reshape((h // 2, 2, w // 2, 2) + c).mean(axis=(1, 3))


def main():
    params, active = make_surface_scene(jax.random.PRNGKey(0), n=ALIVE, scale=0.02)
    gmap = create_map(ROWS, 0)
    gmap, _ = insert_points(gmap, params, active, kf_id=0)
    params, active = gmap.params, gmap.aux.active
    T0 = jnp.eye(4)

    # observed image = render at a slightly offset pose (realistic residual)
    out0 = jax.jit(
        lambda: render_binned(
            project_gaussians(params, active, T0, INTR, 0),
            project_gaussians(params, active, T0, INTR, 0).means2d,
            build_binning(project_gaussians(params, active, T0, INTR, 0), INTR, RCFG),
            INTR, jnp.zeros(3), RCFG, need_touched=False,
        )
    )()
    image = out0.color
    gmask_full = jax.jit(lambda im: compute_grad_mask(im, 1.1, False))(image)
    print(
        f"mask frac {float(gmask_full.mean()):.3f} alpha mean "
        f"{float(out0.alpha.mean()):.3f}", flush=True,
    )

    for lvl in (0, 1, 2):
        intr = scale_intr(INTR, lvl)
        img = image
        msk = gmask_full
        for _ in range(lvl):
            img = halve(img)
            msk = msk.reshape(msk.shape[0] // 2, 2, msk.shape[1] // 2, 2).any((1, 3))
        tw, th = tile_wh(RCFG)
        tx_n = -(-intr.width // tw)
        ty_n = -(-intr.height // th)
        m_pad = jnp.zeros((ty_n * th, tx_n * tw), bool)
        m_pad = m_pad.at[: intr.height, : intr.width].set(msk)
        tile_mask = m_pad.reshape(ty_n, th, tx_n, tw).any(axis=(1, 3)).reshape(-1)
        print(
            f"L{lvl}: {intr.width}x{intr.height}, live tiles "
            f"{int(tile_mask.sum())}/{tile_mask.shape[0]}", flush=True,
        )

        proj0 = jax.jit(
            lambda: project_gaussians(params, active, T0, intr, 0)
        )()
        binning = jax.jit(lambda: build_binning(proj0, intr, RCFG, dilate=4.0))()
        nb = int((binning.pos_table < binning.idx_table.size).any(1).sum())
        print(f"  n_binned {nb}, counts max {int(binning.counts.max())}", flush=True)

        variants = [("full", params, active, binning)]
        for m in (24576, 16384):
            if nb < m < ROWS:
                sel, bin_c, _ = jax.jit(
                    lambda b: compact_binning(b, ROWS, m)
                )(binning)
                sel_c = jnp.clip(sel, 0, ROWS - 1)
                p_c = jax.tree.map(lambda x: x[sel_c], params)
                a_c = active[sel_c] & (sel < ROWS)
                variants.append((f"m={m}", p_c, a_c, bin_c))

        for name, p_v, a_v, b_v in variants:
            def loss_fn(tau, exp_ab):
                T = se3_exp(tau) @ T0
                pr = project_gaussians(p_v, a_v, T, intr, 0)
                out = render_binned(
                    pr, pr.means2d, b_v, intr, jnp.zeros(3), RCFG,
                    need_touched=False, tile_mask=tile_mask,
                )
                return tracking_loss(
                    out.color, out.depth, out.alpha, img, None, exp_ab,
                    msk, True, 0.9, 0.01,
                )

            gfn = jax.value_and_grad(loss_fn, argnums=(0, 1))

            def adam_iter(x, i):
                l, (gt, ge) = gfn(x[:6] * 1e-6, x[6:])
                return x + 1e-6 * jnp.concatenate([gt, ge])

            def fwd_iter(x, i):
                l = loss_fn(x[:6] * 1e-6, x[6:])
                return x + 1e-9 * l

            t_g = chain(adam_iter, jnp.zeros(8))
            t_f = chain(fwd_iter, jnp.zeros(8))
            print(
                f"  {name:8s} grad {t_g:6.2f} ms  fwd {t_f:6.2f} ms",
                flush=True,
            )

        # GN-iteration analog: forward render + image gradients + J/H/g
        gx_o, gy_o = image_gradient(img)

        def gn_iter(x, i):
            T = se3_exp(x[:6] * 1e-6) @ T0
            pr = project_gaussians(params, active, T, intr, 0)
            out = render_binned(
                pr, pr.means2d, binning, intr, jnp.zeros(3), RCFG,
                need_touched=False, tile_mask=tile_mask,
            )
            gx_r, gy_r = image_gradient(out.color)
            gx = 0.5 * (gx_r + gx_o)
            gy = 0.5 * (gy_r + gy_o)
            z = out.depth / jnp.maximum(out.alpha, 1e-5)
            r = out.color - img
            w = out.alpha[..., None] / jnp.sqrt(r * r + 1e-6)
            # crude 8-col jacobian assembly cost proxy (full math in
            # core/tracking_gn.py; same arithmetic intensity)
            jrows = jnp.stack(
                [gx, gy, gx * z[..., None], gy * z[..., None],
                 gx + gy, gx - gy, out.color, jnp.ones_like(out.color)],
                axis=-1,
            )
            H = jnp.einsum("hwci,hwcj->ij", jrows * w[..., None], jrows)
            g = jnp.einsum("hwci,hwc->i", jrows * w[..., None], r)
            step = jnp.linalg.solve(H + 1e-3 * jnp.eye(8), -g)
            return x + 1e-6 * step

        print(f"  GN-iter   {chain(gn_iter, jnp.zeros(8)):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
