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


def _make_pair2_kernel(tile: int, tx_n: int, l_max: int,
                       alpha_clamp: float, alpha_min: float, t_min: float,
                       n_blk: int = 2):
    """TWO tiles per program as independent interleaved streams: the
    latency-bound per-chunk dependency chain (alpha -> cumprod rounds ->
    t_run) gets a second independent instruction stream to hide under,
    without lengthening any chain. Zero-prop padding rows make the
    max-trip loop correct with no masking; accumulator rows stay at 8
    (acc8 reduction)."""
    p = tile * tile

    def kernel(counts_sp, props_ref, color_ref, depth_ref, alpha_ref):
        i = pl.program_id(0)
        tids = [n_blk * i + j for j in range(n_blk)]

        def grid_for(t_id):
            ox = ((t_id % tx_n) * tile).astype(jnp.float32)
            oy = ((t_id // tx_n) * tile).astype(jnp.float32)
            l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
            px = ox + (l % tile).astype(jnp.float32)
            py = oy + (l // tile).astype(jnp.float32)
            return px, py

        grids = [grid_for(t) for t in tids]
        cmax = counts_sp[tids[0]]
        for t in tids[1:]:
            cmax = jnp.maximum(cmax, counts_sp[t])
        n_chunks = (cmax + CHUNK - 1) // CHUNK

        def red8(x):
            s = CHUNK // 2
            while s >= 8:
                x = x + pltpu.roll(x, shift=s, axis=0)
                s //= 2
            return x[0:8, :]

        def half_step(chunk, px, py, t_run):
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
            t_new = t_run * incl[CHUNK - 1 : CHUNK, :]
            return w, chunk, t_new

        def acc(accs, w, chunk):
            cr, cg, cbl, d_acc, w_acc = accs
            col = chunk[:, 5:8]
            return (
                cr + red8(w * col[:, 0:1]),
                cg + red8(w * col[:, 1:2]),
                cbl + red8(w * col[:, 2:3]),
                d_acc + red8(w * chunk[:, 9:10]),
                w_acc + red8(w),
            )

        def body(k, carry):
            t_runs, accs = carry
            # interleave the independent streams: chunk loads + alpha +
            # cumprod of every tile pipeline under each other's latencies
            chunks = [
                props_ref[j, pl.ds(k * CHUNK, CHUNK), :] for j in range(n_blk)
            ]
            outs = [
                half_step(chunks[j], grids[j][0], grids[j][1], t_runs[j])
                for j in range(n_blk)
            ]
            t_runs = tuple(o[2] for o in outs)
            accs = tuple(
                acc(accs[j], outs[j][0], outs[j][1]) for j in range(n_blk)
            )
            return t_runs, accs

        z8 = jnp.zeros((8, p), jnp.float32)
        one = jnp.ones((1, p), jnp.float32)
        _, accs_all = jax.lax.fori_loop(
            0, n_chunks, body,
            ((one,) * n_blk, (((z8,) * 5),) * n_blk),
        )

        for half, accs in enumerate(accs_all):
            cr, cg, cbl, d_acc, w_acc = accs
            color_ref[half] = jnp.concatenate(
                [
                    jnp.sum(cr, axis=0, keepdims=True),
                    jnp.sum(cg, axis=0, keepdims=True),
                    jnp.sum(cbl, axis=0, keepdims=True),
                ],
                axis=0,
            )
            depth_ref[half] = jnp.sum(d_acc, axis=0, keepdims=True)
            alpha_ref[half] = jnp.sum(w_acc, axis=0, keepdims=True)

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
    n_blk = 1
    if variant == "storew":
        kernel = _make_storew_kernel(
            tile, tx_n, l_max, alpha_clamp, alpha_min, t_min
        )
        scratch = [pltpu.VMEM((l_max, p), jnp.float32)]
    elif variant.startswith("pair"):
        n_blk = int(variant[4:])
        kernel = _make_pair2_kernel(
            tile, tx_n, l_max, alpha_clamp, alpha_min, t_min, n_blk=n_blk
        )
        if t % n_blk:
            raise ValueError(f"{variant} needs tile count % {n_blk} == 0")
    else:
        kernel = _make_kernel(
            variant, tile, tx_n, l_max, alpha_clamp, alpha_min, t_min
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // n_blk,),
        in_specs=[
            pl.BlockSpec((n_blk, l_max, D_IN), lambda i, c: (i, 0, 0))
        ],
        out_specs=[
            pl.BlockSpec((n_blk, 3, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((n_blk, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((n_blk, 1, p), lambda i, c: (i, 0, 0)),
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


def _cumsum_sublanes(x):
    tri = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def moments_bwd(residuals, cotangents, tx_n, tile,
                alpha_clamp=0.99, alpha_min=1.0 / 255.0, t_min=1e-4):
    """Backward variant: the per-chunk gradient reductions (six VPU
    cross-LANE reductions in the production kernel) become ONE MXU moments
    matmul — every needed reduction Σ_p f(dx,dy)·g_p is a linear combo of
    the moments of [d_power; d_opa_px; w] against the tile-local pixel
    basis [1, lx, ly, lx², lx·ly, ly², gD, gC0..2]."""
    props, counts, tfinal, neff = residuals
    g_color, g_depth, g_alpha = cotangents
    t, l_max, _ = props.shape
    l_in = l_max
    pad_to = CHUNK * 2
    if l_max % pad_to:
        l_max = -(-l_max // pad_to) * pad_to
        props = jnp.concatenate(
            [props, jnp.zeros((t, l_max - l_in, D_IN), props.dtype)], axis=1
        )
    p = tile * tile

    def kernel(counts_sp, props_ref, tfinal_ref, neff_ref,
               g_color_ref, g_depth_ref, g_alpha_ref, d_props_ref):
        i = pl.program_id(0)
        ox = ((i % tx_n) * tile).astype(jnp.float32)
        oy = ((i // tx_n) * tile).astype(jnp.float32)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        lx = (l % tile).astype(jnp.float32)  # tile-LOCAL coords: the
        ly = (l // tile).astype(jnp.float32)  # quadratic moments stay small
        n_eff = neff_ref[0, 0, 0]
        d_props_ref[0] = jnp.zeros((l_max, D_IN), jnp.float32)

        gC = g_color_ref[0]  # (3, P)
        gD = g_depth_ref[0]  # (1, P)
        gA = g_alpha_ref[0]  # (1, P)
        ones = jnp.ones((1, p), jnp.float32)
        basis = jnp.concatenate(
            [ones, lx, ly, lx * lx, lx * ly, ly * ly, gD, gC], axis=0
        )  # (10, P)

        def body(kk, carry):
            k = n_eff - 1 - kk
            t_after, s_wsum = carry
            chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]
            mu_x = chunk[:, 0:1] - ox  # local
            mu_y = chunk[:, 1:2] - oy
            ca = chunk[:, 2:3]
            cb = chunk[:, 3:4]
            cc = chunk[:, 4:5]
            opa = chunk[:, 8:9]
            dx = lx - mu_x
            dy = ly - mu_y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(alpha_clamp, opa * jnp.exp(power))
            alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)
            incl, excl = _cumprods_roll(1.0 - alpha, CHUNK)
            t_start = t_after / incl[CHUNK - 1 : CHUNK, :]
            t_in = t_start * excl
            contributing = t_in >= t_min
            w = jnp.where(contributing, alpha * t_in, 0.0)

            col = chunk[:, 5:8]
            z = chunk[:, 9:10]
            dL_dw = (
                col[:, 0:1] * gC[0:1]
                + col[:, 1:2] * gC[1:2]
                + col[:, 2:3] * gC[2:3]
                + z * gD
                + gA
            )
            wdl = w * dL_dw
            incl_wdl = _cumsum_sublanes(wdl)
            total_wdl = incl_wdl[CHUNK - 1 : CHUNK, :]
            S_i = (total_wdl - incl_wdl) + s_wsum
            one_minus = 1.0 - alpha
            d_alpha = jnp.where(
                contributing & (alpha > 0.0),
                t_in * dL_dw - S_i / one_minus,
                0.0,
            )
            G = jnp.where(opa > 0.0, alpha / jnp.maximum(opa, 1e-12), 0.0)
            not_clamped = alpha < alpha_clamp
            d_opa_px = jnp.where(not_clamped, d_alpha * G, 0.0)
            d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)

            # ONE moments matmul replaces all remaining reductions
            A = jnp.concatenate([d_power, d_opa_px, w], axis=0)  # (3C, P)
            M = jax.lax.dot_general(
                A, basis, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3C, 10)
            S0 = M[0:CHUNK, 0:1]
            Sx = M[0:CHUNK, 1:2]
            Sy = M[0:CHUNK, 2:3]
            Sxx = M[0:CHUNK, 3:4]
            Sxy = M[0:CHUNK, 4:5]
            Syy = M[0:CHUNK, 5:6]
            d_mu_x = ca * (Sx - mu_x * S0) + cb * (Sy - mu_y * S0)
            d_mu_y = cc * (Sy - mu_y * S0) + cb * (Sx - mu_x * S0)
            d_ca = -0.5 * (Sxx - 2.0 * mu_x * Sx + mu_x * mu_x * S0)
            d_cb = -(Sxy - mu_y * Sx - mu_x * Sy + mu_x * mu_y * S0)
            d_cc = -0.5 * (Syy - 2.0 * mu_y * Sy + mu_y * mu_y * S0)
            d_opa = M[CHUNK : 2 * CHUNK, 0:1]
            d_z = M[2 * CHUNK : 3 * CHUNK, 6:7]
            d_col = M[2 * CHUNK : 3 * CHUNK, 7:10]

            d_chunk = jnp.concatenate(
                [d_mu_x, d_mu_y, d_ca, d_cb, d_cc, d_col, d_opa, d_z], axis=1
            )
            d_props_ref[0, pl.ds(k * CHUNK, CHUNK), :] = d_chunk
            return t_start, s_wsum + total_wdl

        t_after = tfinal_ref[0]
        jax.lax.fori_loop(
            0, n_eff, body, (t_after, jnp.zeros((1, p), jnp.float32))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, l_max, D_IN), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 3, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, l_max, D_IN), lambda i, c: (i, 0, 0))],
    )
    (d_props,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, l_max, D_IN), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(
        counts, props, tfinal[:, None, :], neff, g_color,
        g_depth[:, None, :], g_alpha[:, None, :],
    )
    return d_props[:, :l_in, :]


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
        if v == "bwd":
            # production custom-VJP backward, isolated: reuse the forward's
            # residuals and time the bwd pallas_call alone
            from monogs_dev_tpu.ops.blend_pallas import _bwd_rule, _fwd_rule

            (c0, d0, a0), res = _fwd_rule(
                t_props0, binning.counts, TX_N, P_TILE, 0.99, 1 / 255.0, 1e-4
            )
            cots = (jnp.ones_like(c0) / c0.size,
                    jnp.ones_like(d0) / d0.size,
                    jnp.ones_like(a0) / a0.size)

            def f(x, i):
                d_props, _ = _bwd_rule(
                    TX_N, P_TILE, 0.99, 1 / 255.0, 1e-4,
                    (res[0] + x, res[1], res[2], res[3]), cots,
                )
                return x + 1e-9 * d_props[0, 0, 0]

            chain("bwd (production)", f, jnp.zeros(()))
        elif v == "bwdmom":
            from monogs_dev_tpu.ops.blend_pallas import _fwd_rule

            (c0, d0, a0), res = _fwd_rule(
                t_props0, binning.counts, TX_N, P_TILE, 0.99, 1 / 255.0, 1e-4
            )
            cots = (jnp.ones_like(c0) / c0.size,
                    jnp.ones_like(d0) / d0.size,
                    jnp.ones_like(a0) / a0.size)

            def f(x, i):
                d_props = moments_bwd(
                    (res[0] + x, res[1], res[2], res[3]), cots, TX_N, P_TILE
                )
                return x + 1e-9 * d_props[0, 0, 0]

            chain("bwd (moments)", f, jnp.zeros(()))
            got = moments_bwd(res, cots, TX_N, P_TILE)
            from monogs_dev_tpu.ops.blend_pallas import _bwd_rule

            want, _ = _bwd_rule(
                TX_N, P_TILE, 0.99, 1 / 255.0, 1e-4, res, cots
            )
            err = float(jnp.max(jnp.abs(got - want)))
            rel = err / (float(jnp.max(jnp.abs(want))) + 1e-12)
            print(f"  bwdmom max|err| vs production: {err:.3e} (rel {rel:.3e})",
                  flush=True)
        elif v == "base":
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
