#!/usr/bin/env python
"""Blend-kernel variant lab: measure forward/backward variants on the TPU.

The production kernel (ops/blend_pallas.py) measures ~5.3 ms fwd / ~4.4 ms
bwd at bench sizes (VGA, N=32k, counts mean ~142/tile) — ~30x off a naive
VPU-ALU bound, so the cost is structural (register spills from 5 full
(CHUNK,P) accumulators, cross-sublane rolls in the cumprod, per-chunk loop
scheduling), not arithmetic. Variants measured here:

  base     — production blend_tiles_pallas as-is
  nocond   — no saturation early-exit: plain fori over all chunks of count
  trimat   — cumprod via log-space triangular MXU matmul instead of rolls
  mxu      — rank-6 factorized power: per-chunk (CHUNK,8)@(8,P) MXU matmul
             computes the conic quadratic for all pixels; VPU does exp+mask
  lean     — mxu + single fused accumulator matmul: stack [r,g,b,z,1] as
             (CHUNK,5) and accumulate (P,5) via one (P,CHUNK)@(CHUNK,5)
             MXU matmul per chunk (kills the 5 big accumulator vregs)

Usage: timeout 1800 python tools/kernel_lab.py [variants...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning, _tile_gather
from monogs_dev_tpu.ops.blend_pallas import blend_tiles_pallas, D_IN

CHUNK = int(os.environ.get("MONOGS_CHUNK", "32"))
P_TILE = 16

intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
L = int(os.environ.get("MONOGS_L", "512"))
cfg = RasterConfig(max_per_tile=L, k_dup=16, tile_group=60)
N = 32768
TX_N = 40


def chain(name, f, x0, iters=30):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)

    t0 = time.time()
    y = run(x0)
    jax.block_until_ready(y)
    tc = time.time() - t0
    t0 = time.time()
    y = run(x0)
    jax.block_until_ready(y)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.2f} ms  (compile+first {tc:.1f}s)", flush=True)
    return ms


# ---------------------------------------------------------------- variants


def _pixel_monomials(tile: int):
    """(8, P) pixel monomial matrix in tile-local coords:
    rows [lx*lx, lx*ly, ly*ly, lx, ly, 1, 0, 0]."""
    l = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    lx = (l % tile).astype(jnp.float32)
    ly = (l // tile).astype(jnp.float32)
    one = jnp.ones_like(lx)
    zero = jnp.zeros_like(lx)
    return jnp.concatenate(
        [lx * lx, lx * ly, ly * ly, lx, ly, one, zero, zero], axis=0
    )  # (8, P)


def _chunk_coefs(chunk, ox, oy):
    """Rank-6 coefficients (CHUNK, 8) of the conic quadratic in local pixel
    coords: power = -(A @ mono) with A rows
    [0.5ca, cb, 0.5cc, -(ca mx + cb my), -(cb mx + cc my),
     0.5ca mx^2 + cb mx my + 0.5cc my^2, 0, 0], m = mu - origin."""
    mx = chunk[:, 0:1] - ox
    my = chunk[:, 1:2] - oy
    ca = chunk[:, 2:3]
    cb = chunk[:, 3:4]
    cc = chunk[:, 4:5]
    z = jnp.zeros_like(mx)
    return jnp.concatenate(
        [
            0.5 * ca,
            cb,
            0.5 * cc,
            -(ca * mx + cb * my),
            -(cb * mx + cc * my),
            0.5 * ca * mx * mx + cb * mx * my + 0.5 * cc * my * my,
            z,
            z,
        ],
        axis=1,
    )  # (CHUNK, 8)


def _cumprods_roll(x, chunk):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < chunk:
        shifted = pltpu.roll(x, shift=s, axis=0)
        x = x * jnp.where(rows >= s, shifted, 1.0)
        s *= 2
    incl = x
    excl = jnp.where(rows >= 1, pltpu.roll(incl, shift=1, axis=0), 1.0)
    return incl, excl


def _make_storew_kernel(tile: int, tx_n: int, l_max: int,
                        alpha_clamp: float, alpha_min: float, t_min: float):
    """Forward with NO live accumulators: per-chunk weights w are STORED to
    a VMEM scratch (l_max, P) — the loop carry is only t_run (1, P), the
    structure that makes the backward kernel fast — and the five weighted
    output sums happen ONCE after the loop as a single (5, L) @ (L, P) MXU
    contraction (off the serial chain, unlike the rejected per-chunk MXU
    variants)."""
    p = tile * tile

    def kernel(counts_sp, props_ref, color_ref, depth_ref, alpha_ref, w_ref):
        i = pl.program_id(0)
        ox = ((i % tx_n) * tile).astype(jnp.float32)
        oy = ((i // tx_n) * tile).astype(jnp.float32)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        px = ox + (l % tile).astype(jnp.float32)
        py = oy + (l // tile).astype(jnp.float32)
        count = counts_sp[i]
        n_chunks = (count + CHUNK - 1) // CHUNK
        w_ref[:] = jnp.zeros((l_max, p), jnp.float32)

        def body(k, t_run):
            chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]
            mu_x = chunk[:, 0:1]
            mu_y = chunk[:, 1:2]
            ca = chunk[:, 2:3]
            cb = chunk[:, 3:4]
            cc = chunk[:, 4:5]
            opa = chunk[:, 8:9]
            dx = px - mu_x
            dy = py - mu_y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(alpha_clamp, opa * jnp.exp(power))
            alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)
            incl, excl = _cumprods_roll(1.0 - alpha, CHUNK)
            t_in = t_run * excl
            w = jnp.where(t_in >= t_min, alpha * t_in, 0.0)
            w_ref[pl.ds(k * CHUNK, CHUNK), :] = w
            return t_run * incl[CHUNK - 1 : CHUNK, :]

        jax.lax.fori_loop(0, n_chunks, body, jnp.ones((1, p), jnp.float32))
        # one off-chain contraction: f (5, L) = [r g b z 1]^T per entry
        props = props_ref[0]  # (L, D)
        f = jnp.concatenate(
            [props[:, 5:8], props[:, 9:10], jnp.ones((l_max, 1), jnp.float32)],
            axis=1,
        )  # (L, 5)
        acc = jax.lax.dot_general(
            f, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5, P)
        color_ref[0] = acc[0:3]
        depth_ref[0] = acc[3:4]
        alpha_ref[0] = acc[4:5]

    return kernel


def _make_kernel(variant: str, tile: int, tx_n: int, l_max: int,
                 alpha_clamp: float, alpha_min: float, t_min: float):
    p = tile * tile
    mono = None  # built in-kernel (constant-folded)

    def kernel(counts_sp, props_ref, color_ref, depth_ref, alpha_ref):
        i = pl.program_id(0)
        ox = ((i % tx_n) * tile).astype(jnp.float32)
        oy = ((i // tx_n) * tile).astype(jnp.float32)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        px = ox + (l % tile).astype(jnp.float32)
        py = oy + (l // tile).astype(jnp.float32)
        mono_k = _pixel_monomials(tile)  # (8, P) local coords

        count = counts_sp[i]
        n_chunks = (count + CHUNK - 1) // CHUNK

        use_mxu = variant in ("mxu", "lean")
        use_tri = variant == "trimat"

        def chunk_power(chunk):
            if use_mxu:
                coefs = _chunk_coefs(chunk, ox, oy)  # (CHUNK, 8)
                q = jax.lax.dot_general(
                    coefs, mono_k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CHUNK, P)
                return -q
            mu_x = chunk[:, 0:1]
            mu_y = chunk[:, 1:2]
            ca = chunk[:, 2:3]
            cb = chunk[:, 3:4]
            cc = chunk[:, 4:5]
            dx = px - mu_x
            dy = py - mu_y
            return -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

        if variant == "lean":
            def body(k, carry):
                t_run, acc = carry  # acc: (P, 8) [r,g,b,z,w,0,0,0]
                chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]
                power = chunk_power(chunk)
                opa = chunk[:, 8:9]
                alpha = jnp.minimum(alpha_clamp, opa * jnp.exp(power))
                alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)
                incl, excl = _cumprods_roll(1.0 - alpha, CHUNK)
                t_in = t_run * excl
                w = jnp.where(t_in >= t_min, alpha * t_in, 0.0)  # (CHUNK, P)
                z = jnp.zeros_like(opa)
                one = jnp.ones_like(opa)
                f = jnp.concatenate(
                    [chunk[:, 5:8], chunk[:, 9:10], one, z, z, z], axis=1
                )  # (CHUNK, 8)
                acc = acc + jax.lax.dot_general(
                    w, f, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (P, 8)
                t_run = t_run * incl[CHUNK - 1 : CHUNK, :]
                return t_run, acc

            t_run, acc = jax.lax.fori_loop(
                0, n_chunks, body,
                (jnp.ones((1, p), jnp.float32), jnp.zeros((p, 8), jnp.float32)),
            )
            color_ref[0] = acc[:, 0:3].T
            depth_ref[0] = acc[:, 3:4].T
            alpha_ref[0] = acc[:, 4:5].T
            return

        acc_rows = 8 if variant == "acc8" else CHUNK

        def red_rows(x):
            """(CHUNK, P) -> (acc_rows, P) partial sublane reduction."""
            if acc_rows == CHUNK:
                return x
            s = CHUNK // 2
            while s >= acc_rows:
                x = x + pltpu.roll(x, shift=s, axis=0)
                s //= 2
            return x[0:acc_rows, :]

        def body(k, carry):
            t_run, cr, cg, cb_, d_acc, w_acc = carry
            chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]
            power = chunk_power(chunk)
            opa = chunk[:, 8:9]
            alpha = jnp.minimum(alpha_clamp, opa * jnp.exp(power))
            alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)
            if use_tri:
                log_om = jnp.log1p(-alpha)
                tri = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
                cs = jax.lax.dot_general(
                    tri, log_om, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # inclusive cumsum
                incl_last = jnp.exp(cs[CHUNK - 1 : CHUNK, :])
                excl = jnp.exp(cs - log_om)
            else:
                incl, excl = _cumprods_roll(1.0 - alpha, CHUNK)
                incl_last = incl[CHUNK - 1 : CHUNK, :]
            t_in = t_run * excl
            w = jnp.where(t_in >= t_min, alpha * t_in, 0.0)
            col = chunk[:, 5:8]
            cr = cr + red_rows(w * col[:, 0:1])
            cg = cg + red_rows(w * col[:, 1:2])
            cb_ = cb_ + red_rows(w * col[:, 2:3])
            d_acc = d_acc + red_rows(w * chunk[:, 9:10])
            w_acc = w_acc + red_rows(w)
            t_run = t_run * incl_last
            return t_run, cr, cg, cb_, d_acc, w_acc

        zc = jnp.zeros((acc_rows, p), jnp.float32)
        t_run, cr, cg, cb_, d_acc, w_acc = jax.lax.fori_loop(
            0, n_chunks, body, (jnp.ones((1, p), jnp.float32), zc, zc, zc, zc, zc)
        )
        color_ref[0] = jnp.concatenate(
            [
                jnp.sum(cr, axis=0, keepdims=True),
                jnp.sum(cg, axis=0, keepdims=True),
                jnp.sum(cb_, axis=0, keepdims=True),
            ],
            axis=0,
        )
        depth_ref[0] = jnp.sum(d_acc, axis=0, keepdims=True)
        alpha_ref[0] = jnp.sum(w_acc, axis=0, keepdims=True)

    return kernel


def variant_blend(variant, props, counts, tx_n, tile, alpha_clamp=0.99,
                  alpha_min=1.0 / 255.0, t_min=1e-4):
    t, l_max, _ = props.shape
    if l_max % CHUNK:
        pad = -(-l_max // CHUNK) * CHUNK - l_max
        props = jnp.concatenate(
            [props, jnp.zeros((t, pad, D_IN), props.dtype)], axis=1
        )
        l_max += pad
    p = tile * tile
    scratch = []
    if variant == "storew":
        kernel = _make_storew_kernel(
            tile, tx_n, l_max, alpha_clamp, alpha_min, t_min
        )
        scratch = [pltpu.VMEM((l_max, p), jnp.float32)]
    else:
        kernel = _make_kernel(
            variant, tile, tx_n, l_max, alpha_clamp, alpha_min, t_min
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, l_max, D_IN), lambda i, c: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
        ],
        scratch_shapes=scratch,
    )
    color, depth, alpha = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(counts, props)
    return color, depth[:, 0], alpha[:, 0]


def main():
    variants = sys.argv[1:] or ["base", "nocond", "trimat", "mxu", "lean"]
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
    proj0 = jax.jit(
        lambda: project_gaussians(params, active, jnp.eye(4), intr, 0)
    )()
    jax.block_until_ready(proj0)
    binning = jax.jit(lambda: build_binning(proj0, intr, cfg))()
    jax.block_until_ready(binning)
    print(
        f"counts mean/max: {float(binning.counts.mean()):.1f} "
        f"{int(binning.counts.max())}",
        flush=True,
    )
    props = jnp.concatenate(
        [proj0.means2d, proj0.conic, proj0.color, proj0.opacity[:, None],
         proj0.depth[:, None]], axis=-1,
    )
    props_pad = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
    t_props0 = _tile_gather(props_pad, binning.idx_table, binning.pos_table)
    jax.block_until_ready(t_props0)

    ref = None
    for v in variants:
        if v == "base":
            def f(x, i):
                c, d, a = blend_tiles_pallas(t_props0 + x, binning.counts, TX_N, P_TILE)
                return x + 1e-9 * c[0, 0, 0]
            chain("base fwd", f, jnp.zeros(()))
            ref = blend_tiles_pallas(t_props0, binning.counts, TX_N, P_TILE)
        else:
            def f(x, i, v=v):
                c, d, a = variant_blend(v, t_props0 + x, binning.counts, TX_N, P_TILE)
                return x + 1e-9 * c[0, 0, 0]
            chain(f"{v} fwd", f, jnp.zeros(()))
            if ref is not None:
                out = variant_blend(v, t_props0, binning.counts, TX_N, P_TILE)
                errs = [
                    float(jnp.max(jnp.abs(a - b))) for a, b in zip(out, ref)
                ]
                print(f"  {v} max|err| vs base: {errs}", flush=True)


if __name__ == "__main__":
    main()
