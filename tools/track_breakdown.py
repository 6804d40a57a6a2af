#!/usr/bin/env python
"""Decompose one tracking iteration's device cost at bench sizes.

Measures, at VGA / N=32k / L=512 (bench_vga shapes):
  project fwd        — project_gaussians alone
  binning            — build_binning alone
  gather fwd         — _tile_gather alone
  blend fwd          — blend_tiles_pallas alone
  render fwd         — render_binned (gather + blend + unpack)
  loss fwd           — full tracking loss fwd
  loss grad          — value_and_grad wrt (tau, exposure)   <- the real per-iter cost
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.geometry.lie import se3_exp
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import (
    build_binning,
    render_binned,
    _tile_gather,
)
from monogs_dev_tpu.utils.losses import tracking_loss

intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
cfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=60)
N = 32768


def timeit(name, f, *args, iters=20):
    # thread the carry into the first arg so XLA can't hoist the body out
    # of the loop (all ops stay loop-carried)
    @jax.jit
    def run(*a):
        def body(i, c):
            first = jax.tree_util.tree_map(
                lambda x: x + c.astype(x.dtype) * 1e-30 if jnp.issubdtype(
                    jnp.asarray(x).dtype, jnp.floating) else x, a[0])
            out = f(first, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + 1e-12 * leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    t0 = time.time()
    jax.block_until_ready(run(*args))
    tc = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(run(*args))
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:18s} {ms:8.2f} ms   (first {tc:.1f}s)", flush=True)
    return ms


def main():
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
    T0 = jnp.eye(4)
    image = jnp.zeros((480, 640, 3))
    mask = jnp.ones((480, 640), bool)
    bg = jnp.zeros(3)

    proj = jax.jit(lambda: project_gaussians(params, active, T0, intr, 0))()
    jax.block_until_ready(proj)
    binning = jax.jit(lambda: build_binning(proj, intr, cfg))()
    jax.block_until_ready(binning)
    print(f"counts mean/max: {float(binning.counts.mean()):.1f} "
          f"{int(binning.counts.max())}", flush=True)

    timeit("project fwd", lambda T: project_gaussians(params, active, T, intr, 0), T0)
    timeit("binning", lambda p: build_binning(p, intr, cfg), proj)

    props = jnp.concatenate(
        [proj.means2d, proj.conic, proj.color, proj.opacity[:, None],
         proj.depth[:, None]], axis=-1)
    props_pad = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
    timeit("gather fwd",
           lambda p: _tile_gather(p, binning.idx_table, binning.pos_table), props_pad)

    timeit("render fwd",
           lambda p: render_binned(p, p.means2d, binning, intr, bg, cfg,
                                 need_touched=False), proj)

    def loss_fn(tau, exp_ab):
        T_new = se3_exp(tau) @ T0
        p = project_gaussians(params, active, T_new, intr, 0)
        out = render_binned(p, p.means2d, binning, intr, bg, cfg,
                            need_touched=False)
        return tracking_loss(out.color, out.depth, out.alpha, image, None,
                             exp_ab, mask, True, 0.95, 0.01)

    timeit("loss fwd", loss_fn, jnp.zeros(6), jnp.zeros(2))
    timeit("loss grad", jax.value_and_grad(loss_fn, argnums=(0, 1)),
           jnp.zeros(6), jnp.zeros(2))

    # gather bwd isolated
    gfn = jax.grad(
        lambda p: _tile_gather(p, binning.idx_table, binning.pos_table).sum()
    )
    timeit("gather fwd+bwd", gfn, props_pad)


def _main_dispatch():
    if "extra" in sys.argv:
        extra()
    elif "loop" in sys.argv:
        loop()
    else:
        main()


def loop():
    """Measure the real tracking-loop body (grad + Adam + retraction) per
    iteration against a fixed binning, at dilation 0 and 4 — isolates the
    while_loop/dilation overhead vs the isolated `loss grad` number."""
    from monogs_dev_tpu.core.tracking import _ADAM_B1, _ADAM_B2, _ADAM_EPS

    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
    T0 = jnp.eye(4)
    image = jnp.zeros((480, 640, 3))
    mask = jnp.ones((480, 640), bool)
    bg = jnp.zeros(3)
    lr = jnp.concatenate(
        [jnp.full((3,), 0.001), jnp.full((3,), 0.003), jnp.full((2,), 0.01)]
    )

    for dilate in (0.0, 4.0):
        proj = jax.jit(
            lambda: project_gaussians(params, active, T0, intr, 0)
        )()
        binning = jax.jit(
            lambda p: build_binning(p, intr, cfg, dilate=dilate)
        )(proj)
        jax.block_until_ready(binning)
        print(
            f"dilate={dilate}: counts mean/max "
            f"{float(binning.counts.mean()):.1f} {int(binning.counts.max())}",
            flush=True,
        )

        def loss_fn(tau, exp_ab, T):
            T_new = se3_exp(tau) @ T
            p = project_gaussians(params, active, T_new, intr, 0)
            out = render_binned(p, p.means2d, binning, intr, bg, cfg,
                                need_touched=False)
            return tracking_loss(out.color, out.depth, out.alpha, image, None,
                                 exp_ab, mask, True, 0.95, 0.01)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def body(c, _):
            T, exp_ab, mu, nu, count = c
            loss, (g_tau, g_exp) = grad_fn(jnp.zeros(6), exp_ab, T)
            g = jnp.concatenate([g_tau, g_exp])
            count = count + 1
            mu = _ADAM_B1 * mu + (1.0 - _ADAM_B1) * g
            nu = _ADAM_B2 * nu + (1.0 - _ADAM_B2) * g * g
            c1 = 1.0 - _ADAM_B1 ** count.astype(jnp.float32)
            c2 = 1.0 - _ADAM_B2 ** count.astype(jnp.float32)
            step = lr * (mu / c1) / (jnp.sqrt(nu / c2) + _ADAM_EPS)
            T_new = se3_exp(-step[:6]) @ T
            return (T_new, exp_ab - step[6:], mu, nu, count), loss

        iters = 30

        @jax.jit
        def run():
            init = (T0, jnp.zeros(2), jnp.zeros(8), jnp.zeros(8),
                    jnp.zeros((), jnp.int32))
            c, losses = jax.lax.scan(body, init, None, length=iters)
            return c[0], losses

        t0 = time.time()
        jax.block_until_ready(run())
        tc = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run())
        ms = (time.time() - t0) / iters * 1000
        print(f"loop body (dilate={dilate}): {ms:.2f} ms/iter "
              f"(first {tc:.1f}s)", flush=True)


def extra():
    from monogs_dev_tpu.ops.rasterize import render_tiled
    import numpy as np
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
    T0 = jnp.eye(4)
    bg = jnp.zeros(3)
    timeit("render_tiled+touch",
           lambda T: render_tiled(params, active, T, intr, 0, bg, cfg), T0,
           iters=5)
    out = jax.jit(lambda T: render_tiled(params, active, T, intr, 0, bg, cfg))(T0)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        host = jax.tree_util.tree_map(np.asarray, out)
    print(f"host transfer of RenderOutput: {(time.time()-t0)/5*1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    _main_dispatch()
