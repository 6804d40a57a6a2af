"""Multi-chip scaling: data-parallel mapping over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism &
communication"); its scaling axes are map cardinality and window size. The
natural TPU scale-out for Gaussian-splatting SLAM is keyframe/pixel data
parallelism: the map is replicated, the keyframe batch is sharded over the
mesh's "kf" axis, every device rasterizes its keyframes, and gradients ride
one `psum` over ICI before a replicated Adam step. Implemented with
`shard_map` so the collective placement is explicit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry.lie import se3_exp
from ..models.camera import Intrinsics
from ..models.gaussians import (
    GaussianMap,
    GaussianParams,
    adam_step,
    exponential_lr,
)
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled
from ..utils.losses import mapping_loss, isotropic_regularizer
from ..core.params import MapOptConfig, StepConfig


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def dp_mapping_step(
    mesh: Mesh,
    cfg: StepConfig,
    opt_cfg: MapOptConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    use_depth: bool = True,
):
    """Build a jitted data-parallel mapping train step over `mesh`.

    Returns step(gmap, images (B,H,W,3), depths (B,H,W), poses (B,4,4),
    valid (B,), iteration) -> (gmap, loss) with B sharded over the mesh.
    """
    axis = mesh.axis_names[0]

    def local_loss(params, active, images, depths, poses, valid):
        def frame_loss(args):
            img, dep, T, v = args
            out = render_tiled(
                params, active, T, intr, cfg.sh_degree, jnp.zeros(3),
                raster_cfg, need_touched=False,
            )
            loss = mapping_loss(
                out.color,
                out.depth,
                img,
                dep if use_depth else None,
                jnp.zeros(2),
                cfg.monocular,
                initialization=True,
                alpha=cfg.alpha,
                rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                render_opacity=out.alpha,
            )
            return loss * v.astype(jnp.float32)

        losses = jax.lax.map(frame_loss, (images, depths, poses, valid))
        return losses.sum()

    def sharded_grads(params, active, images, depths, poses, valid):
        dev = jax.lax.axis_index(axis)

        def lossf(p):
            # isotropic regularizer counted once globally (device 0)
            reg = jnp.where(
                dev == 0, isotropic_regularizer(p.log_scales, active), 0.0
            )
            return local_loss(p, active, images, depths, poses, valid) + reg

        loss, g = jax.value_and_grad(lossf)(params)
        g = jax.tree.map(lambda x: jax.lax.psum(x, axis), g)
        loss = jax.lax.psum(loss, axis)
        return g, loss

    sharded = jax.shard_map(
        sharded_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # the Pallas blend's out_shape carries no varying-mesh-axes
        # annotation; collectives here are explicit (psum above)
        check_vma=False,
    )

    @jax.jit
    def step(gmap: GaussianMap, images, depths, poses, valid, iteration):
        grads, loss = sharded(
            gmap.params, gmap.aux.active, images, depths, poses, valid
        )
        xyz_lr = exponential_lr(
            iteration,
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
        params, moments = adam_step(
            gmap.params, grads, gmap.moments, lrs, gmap.aux.active
        )
        return GaussianMap(params, gmap.aux, moments), loss

    return step
