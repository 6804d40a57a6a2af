"""Post-hoc photometric color refinement (eval mode only).

Rebuild of BackEnd.color_refinement
(/root/reference/utils/slam_backend.py:320-353): 26,000 iterations of classic
3DGS refinement — one random keyframe per iteration, loss
(1-lambda_dssim)*L1 + lambda_dssim*(1-SSIM), map Adam only (no pose, no
densify), xyz LR scheduled by the refinement-local iteration.

Chunked like mapping: the host samples a block of random keyframes, stacks
their (device-resident) images, and one jitted `lax.fori_loop` consumes the
block one frame per iteration.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.camera import Intrinsics
from ..models.gaussians import (
    GaussianMap,
    GaussianParams,
    adam_step,
    exponential_lr,
)
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled
from ..utils.losses import l1_loss, ssim
from .params import MapOptConfig, StepConfig


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opt_cfg", "intr", "raster_cfg", "iters"),
    donate_argnames=("gmap",),
)
def refine_chunk(
    gmap: GaussianMap,
    images: jnp.ndarray,  # (K, H, W, 3)
    poses: jnp.ndarray,  # (K, 4, 4)
    start_iter: jnp.ndarray,  # () refinement-local iteration
    bg_color: jnp.ndarray,
    cfg: StepConfig,
    opt_cfg: MapOptConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    iters: int,
) -> Tuple[GaussianMap, jnp.ndarray]:
    def body(i, carry):
        g, it = carry
        it = it + 1
        img = jax.lax.dynamic_index_in_dim(images, i, keepdims=False)
        T = jax.lax.dynamic_index_in_dim(poses, i, keepdims=False)

        def loss_fn(params):
            out = render_tiled(
                params, g.aux.active, T, intr, cfg.sh_degree, bg_color,
                raster_cfg, need_touched=False,
            )
            ll1 = l1_loss(out.color, img)
            return (1.0 - opt_cfg.lambda_dssim) * ll1 + opt_cfg.lambda_dssim * (
                1.0 - ssim(out.color, img)
            )

        loss, grads = jax.value_and_grad(loss_fn)(g.params)
        xyz_lr = exponential_lr(
            it,
            opt_cfg.position_lr_init * opt_cfg.spatial_lr_scale,
            opt_cfg.position_lr_final * opt_cfg.spatial_lr_scale,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps,
        )
        lrs = GaussianParams(
            xyz=xyz_lr,
            f_dc=opt_cfg.feature_lr,
            f_rest=opt_cfg.feature_lr / 20.0,
            log_scales=opt_cfg.scaling_lr,
            quats=opt_cfg.rotation_lr,
            opacity_logit=opt_cfg.opacity_lr,
        )
        params, moments = adam_step(g.params, grads, g.moments, lrs, g.aux.active)
        return GaussianMap(params, g.aux, moments), it

    gmap, it = jax.lax.fori_loop(0, iters, body, (gmap, start_iter))
    return gmap, it


def run_color_refinement(engine, iterations: int = 26000, chunk: int = 25):
    """Drive refine_chunk over `iterations` random keyframes."""
    import numpy as np

    from ..utils.logging import Log

    kf_ids = list(engine.viewpoints)
    if not kf_ids:
        return engine.gmap, engine.iteration_count
    Log(f"Starting color refinement ({iterations} iterations)")
    rng = np.random.default_rng(0)
    gmap = engine.gmap
    local_iter = jnp.zeros((), jnp.int32)
    done = 0
    while done < iterations:
        k = min(chunk, iterations - done)
        picks = rng.integers(0, len(kf_ids), size=k)
        images = jnp.stack([engine.viewpoints[kf_ids[i]].image for i in picks])
        poses = jnp.stack([engine.viewpoints[kf_ids[i]].T_w2c for i in picks])
        gmap, local_iter = refine_chunk(
            gmap,
            images,
            poses,
            local_iter,
            engine.bg_color,
            engine.cfg,
            engine.opt_cfg,
            engine.intr,
            engine.raster_cfg,
            iters=k,
        )
        done += k
    Log("Map refinement done")
    return gmap, engine.iteration_count
