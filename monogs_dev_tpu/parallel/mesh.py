"""Multi-chip scaling: data-parallel mapping over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism &
communication"); its scaling axes are map cardinality and window size. The
natural TPU scale-out for Gaussian-splatting SLAM is keyframe data
parallelism: the map is replicated, the keyframe batch is sharded over the
mesh's "kf" axis, every device rasterizes its own keyframes, and map
gradients + densification statistics ride one `psum` over ICI before a
replicated Adam step and (cadenced) densify/prune. Per-keyframe state —
pose tangents, exposures, and their Adam moments — stays sharded with its
keyframes and never crosses the interconnect.

This is the FULL mapping train step (the sharded analog of
core/mapping.mapping_iterations): map Adam with the scheduled xyz LR,
per-slot pose/exposure Adam + SE(3) retraction, densification-stat
accumulation from the means2d probe, and densify/prune on the reference's
cadence (slam_backend.py:277-305) executed replicated (identical RNG on
every device keeps the map bitwise in sync without a broadcast).

Implemented with `shard_map` for the gradient fan-out (explicit psum) and
plain sharded-array ops for the replicated update. `check_vma=False`
because the Pallas blend's out_shape carries no varying-mesh-axes
annotation; every collective here is explicit.

MEASURED (tools/probe_dp_scaling.py, 8 VIRTUAL cpu devices on ONE
physical core — wall-clock speedup is structurally impossible there, the
table documents DP OVERHEAD): iters/s at N=1/2/4/8 = 1.052/1.055/0.823/
0.917 on a fixed 30-iteration window, final loss identical to 4 decimals
across N. I.e. the psum'd capacity-sized gradients + replicated update
cost 0-22% of the per-iteration budget when the rasterization work does
NOT shrink with N; on real ICI-connected chips the per-device raster work
(the dominant term) scales 1/N while this overhead term stays, so the
crossing point is immediate for any window of >= 2 keyframes/device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.lie import se3_exp
from ..models.camera import Intrinsics
from ..models.gaussians import (
    GaussianMap,
    GaussianParams,
    adam_step,
    densify_and_prune,
    exponential_lr,
)
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled
from ..utils.losses import mapping_loss, isotropic_regularizer
from ..core.params import MapOptConfig, StepConfig

_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8  # torch.optim.Adam defaults


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


class DPBatch(NamedTuple):
    """Keyframe batch sharded over the mesh's kf axis (leading dim B)."""

    images: jnp.ndarray  # (B, H, W, 3)
    depths: jnp.ndarray  # (B, H, W) — zeros when monocular
    T_w2c: jnp.ndarray  # (B, 4, 4)
    exposure: jnp.ndarray  # (B, 2)
    valid: jnp.ndarray  # (B,) slot in use
    optimize_pose: jnp.ndarray  # (B,)
    optimize_exposure: jnp.ndarray  # (B,)


class DPOptState(NamedTuple):
    """Per-slot pose/exposure Adam moments, sharded with the batch."""

    mu: jnp.ndarray  # (B, 8) over [tau(6), exposure(2)]
    nu: jnp.ndarray  # (B, 8)
    count: jnp.ndarray  # () replicated


def make_dp_opt_state(n_slots: int) -> DPOptState:
    return DPOptState(
        mu=jnp.zeros((n_slots, 8)),
        nu=jnp.zeros((n_slots, 8)),
        count=jnp.zeros((), jnp.int32),
    )


def shard_batch(mesh: Mesh, batch: DPBatch) -> DPBatch:
    """Place a host-built batch with the leading dim sharded over the mesh."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, shard), batch)


def dp_mapping_step(
    mesh: Mesh,
    cfg: StepConfig,
    opt_cfg: MapOptConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    use_depth: bool = True,
    update_every: int = 150,
    update_offset: int = 50,
    size_threshold: float = 20.0,
):
    """Build the jitted data-parallel mapping train step over `mesh`.

    Returns step(gmap, batch: DPBatch, opt: DPOptState, iteration, rng,
    gaussian_th, gaussian_extent) -> (gmap, batch, opt, loss, n_dropped)
    with batch/opt sharded over the kf axis and gmap replicated.
    """
    axis = mesh.axis_names[0]

    def local_grads(params, active, images, depths, poses, exposures, valid):
        """Per-device: accumulate map grads over the local keyframe shard;
        per-frame tau/exp/probe grads stay local."""
        dev = jax.lax.axis_index(axis)
        n = params.xyz.shape[0]

        def frame(carry, args):
            g_acc, loss_acc, gn_acc, den_acc, rmax_acc = carry
            img, dep, T0, exp_ab, v = args

            def lossf(p, tau, e, probe):
                T = se3_exp(tau) @ T0
                out = render_tiled(
                    p, active, T, intr, cfg.sh_degree, jnp.zeros(3),
                    raster_cfg, means2d_probe=probe, need_touched=False,
                )
                loss = mapping_loss(
                    out.color,
                    out.depth,
                    img,
                    dep if use_depth else None,
                    e,
                    cfg.monocular,
                    initialization=False,
                    alpha=cfg.alpha,
                    rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                    render_opacity=out.alpha,
                )
                return loss * v.astype(jnp.float32), out.radii

            (loss, radii), (g_p, g_tau, g_exp, g_probe) = jax.value_and_grad(
                lossf, argnums=(0, 1, 2, 3), has_aux=True
            )(params, jnp.zeros(6), exp_ab, jnp.zeros((n, 2)))

            vis = (radii > 0.0) & v
            g_acc = jax.tree.map(jnp.add, g_acc, g_p)
            gn_acc = gn_acc + jnp.where(
                vis, jnp.linalg.norm(g_probe, axis=-1), 0.0
            )
            den_acc = den_acc + vis.astype(jnp.float32)
            rmax_acc = jnp.maximum(rmax_acc, jnp.where(vis, radii, 0.0))
            return (g_acc, loss + loss_acc, gn_acc, den_acc, rmax_acc), (
                g_tau,
                g_exp,
            )

        g0 = jax.tree.map(jnp.zeros_like, params)
        init = (
            g0,
            jnp.zeros(()),
            jnp.zeros((n,)),
            jnp.zeros((n,)),
            jnp.zeros((n,)),
        )
        (g_map, loss, grad_norm, denom, rmax), (g_tau, g_exp) = jax.lax.scan(
            frame, init, (images, depths, poses, exposures, valid)
        )

        # isotropic regularizer counted once globally (device 0); its grad
        # lands on that device's shard and is summed by the psum below
        def reg_fn(s):
            return jnp.where(
                dev == 0, isotropic_regularizer(s, active), 0.0
            )

        reg, g_reg = jax.value_and_grad(reg_fn)(params.log_scales)
        g_map = g_map._replace(log_scales=g_map.log_scales + g_reg)
        loss = loss + reg

        g_map = jax.tree.map(lambda x: jax.lax.psum(x, axis), g_map)
        loss = jax.lax.psum(loss, axis)
        grad_norm = jax.lax.psum(grad_norm, axis)
        denom = jax.lax.psum(denom, axis)
        rmax = jax.lax.pmax(rmax, axis)
        return g_map, loss, grad_norm, denom, rmax, g_tau, g_exp

    sharded = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P(), P(axis), P(axis)),
        check_vma=False,
    )

    pose_lr = jnp.concatenate(
        [
            jnp.full((3,), cfg.cam_trans_lr * cfg.pose_lr_scale),
            jnp.full((3,), cfg.cam_rot_lr * cfg.pose_lr_scale),
            jnp.full((2,), cfg.exposure_lr),
        ]
    )

    @jax.jit
    def step(
        gmap: GaussianMap,
        batch: DPBatch,
        opt: DPOptState,
        iteration,  # () int32 backend global counter (pre-increment)
        rng: jax.Array,  # replicated — densify must sample identically
        gaussian_th,
        gaussian_extent,
    ) -> Tuple[GaussianMap, DPBatch, DPOptState, jnp.ndarray, jnp.ndarray]:
        it = iteration + 1
        g_map, loss, grad_norm, denom, rmax, g_tau, g_exp = sharded(
            gmap.params,
            gmap.aux.active,
            batch.images,
            batch.depths,
            batch.T_w2c,
            batch.exposure,
            batch.valid,
        )

        # ---- replicated map Adam with the scheduled xyz LR
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
        params, moments = adam_step(
            gmap.params, g_map, gmap.moments, lrs, gmap.aux.active
        )

        # ---- sharded per-slot pose/exposure Adam + retraction (local math,
        # no collectives: each slot's state lives with its keyframe shard)
        g_kf = jnp.concatenate([g_tau, g_exp], axis=-1)  # (B, 8)
        kcount = opt.count + 1
        mu = _ADAM_B1 * opt.mu + (1 - _ADAM_B1) * g_kf
        nu = _ADAM_B2 * opt.nu + (1 - _ADAM_B2) * g_kf * g_kf
        c1 = 1.0 - _ADAM_B1 ** kcount.astype(jnp.float32)
        c2 = 1.0 - _ADAM_B2 ** kcount.astype(jnp.float32)
        adam_dir = pose_lr[None, :] * (mu / c1) / (jnp.sqrt(nu / c2) + _ADAM_EPS)
        pose_mask = (batch.optimize_pose & batch.valid)[:, None]
        exp_mask = (batch.optimize_exposure & batch.valid)[:, None]
        tau_step = jnp.where(pose_mask, -adam_dir[:, :6], 0.0)
        T_new = se3_exp(tau_step) @ batch.T_w2c
        exp_new = batch.exposure - jnp.where(exp_mask, adam_dir[:, 6:], 0.0)

        # ---- densification stats + cadenced densify/prune (replicated; the
        # shared rng keeps every device's map bitwise identical)
        valid_any = denom > 0.0
        aux = gmap.aux._replace(
            grad_accum=gmap.aux.grad_accum + grad_norm,
            denom=gmap.aux.denom + denom,
            max_radii=jnp.maximum(gmap.aux.max_radii, rmax),
        )
        gmap_new = GaussianMap(params, aux, moments)
        del valid_any

        do_update = (it % update_every) == update_offset
        gmap_new, dropped = jax.lax.cond(
            do_update,
            lambda g: densify_and_prune(
                g,
                rng,
                max_grad=opt_cfg.densify_grad_threshold,
                min_opacity=gaussian_th,
                extent=gaussian_extent,
                max_screen_size=size_threshold,
                percent_dense=opt_cfg.percent_dense,
                clone_budget=cfg.densify_clone_budget,
                split_budget=cfg.densify_split_budget,
            ),
            lambda g: (g, jnp.zeros((), jnp.int32)),
            gmap_new,
        )

        batch_new = batch._replace(T_w2c=T_new, exposure=exp_new)
        opt_new = DPOptState(mu, nu, kcount)
        return gmap_new, batch_new, opt_new, loss, dropped

    return step


def dp_refine_step(
    mesh: Mesh,
    cfg: StepConfig,
    opt_cfg: MapOptConfig,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
):
    """Build the jitted data-parallel color-refinement step over `mesh`.

    The reference's post-hoc refinement is 26,000 single-keyframe SGD
    iterations (slam_backend.py:320-353) — embarrassingly parallel over
    keyframes. Here every device renders ITS OWN random keyframe, the
    (1-λ)·L1 + λ·(1-SSIM) gradients are MEANED over the mesh with one psum,
    and the replicated Adam step applies the scheduled xyz LR. One step
    therefore consumes n_devices keyframe samples: a minibatch of the
    reference's per-iteration distribution (documented deviation — lower
    gradient variance per step; run iterations/n_devices steps for the
    reference's sample budget, or the full count for strictly more work).

    Returns step(gmap, images (D,H,W,3) sharded, poses (D,4,4) sharded,
    it, bg_color) -> (gmap, loss) with gmap replicated.
    """
    from ..utils.losses import l1_loss, ssim

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def local_grads(params, active, image, pose, bg_color):
        # leading dim of image/pose is the local shard: exactly 1 keyframe
        img, T = image[0], pose[0]

        def loss_fn(p):
            out = render_tiled(
                p, active, T, intr, cfg.sh_degree, bg_color, raster_cfg,
                need_touched=False,
            )
            ll1 = l1_loss(out.color, img)
            return (1.0 - opt_cfg.lambda_dssim) * ll1 + opt_cfg.lambda_dssim * (
                1.0 - ssim(out.color, img)
            )

        loss, g = jax.value_and_grad(loss_fn)(params)
        g = jax.tree.map(lambda x: jax.lax.psum(x, axis) / n_dev, g)
        loss = jax.lax.psum(loss, axis) / n_dev
        return g, loss

    sharded = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(gmap: GaussianMap, images, poses, it, bg_color):
        it = it + 1
        g, loss = sharded(gmap.params, gmap.aux.active, images, poses, bg_color)
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
        params, moments = adam_step(
            gmap.params, g, gmap.moments, lrs, gmap.aux.active
        )
        return GaussianMap(params, gmap.aux, moments), loss, it

    return step
