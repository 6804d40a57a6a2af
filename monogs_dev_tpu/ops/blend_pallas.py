"""Pallas TPU kernel: per-tile front-to-back alpha compositing + custom VJP.

The performance core of the rasterizer. The XLA blend
(rasterize._blend_group) materializes (tiles, L, pixels) tensors and a
log-space cumulative sum that breaks fusion — measured 38 ms fwd+bwd per
VGA render on v5e. This kernel streams each tile's Gaussian list through
VMEM in sublane-sized chunks, carrying the per-pixel transmittance in
registers, so HBM traffic is just the gathered per-tile properties plus the
tile outputs. Per-tile entry counts arrive via scalar prefetch, so sparse
tiles only pay for the chunks they actually contain, and the forward stops
early once every pixel of the tile is saturated (max transmittance <
t_min; checked once per BLOCK of chunks so the chunk pipeline never stalls
on a data-dependent cond) — the CUDA rasterizer's early-out, which the
dense XLA formulation cannot express. The effective chunk count is stored
so the backward replays exactly the chunks that could have contributed.

Transmittance is tracked multiplicatively (cumulative products by
log-rounds of `pltpu.roll`), not in log space: one transcendental
(exp(power)) per gaussian-pixel instead of three.

Forward semantics match the XLA blend (up to float reassociation) and hence
the CUDA reference's per-pixel loop: alpha = min(alpha_clamp, opa *
exp(power)), zeroed below alpha_min or for power > 0; contributions masked
once transmittance drops below t_min.

Backward is the classic 3DGS back-to-front replay (upstream
cuda_rasterizer/backward.cu structure, re-derived): transmittance is
recovered by dividing out the chunk products from the back, and suffix
accumulators S = sum_{j>i} w_j (f_j . gF) produce d(alpha) without storing
per-entry weights. f packs [color(3), depth, 1] so color/depth/alpha-map
cotangents share one path.

The differentiable hot-loop kernel does NOT emit n_touched (the hot loops
don't need it; the reference's opacity reset keys on radii > 0, not
n_touched — slam_backend.py:300-305). Visibility renders (keyframe policy,
occ-aware visibility) use the forward-only `blend_tiles_pallas_touch`
variant, which additionally writes per-entry contributed-pixel counts —
the Pallas replacement for the dense XLA blend on those paths.

MEASURED DEAD END (do not retry): offloading the inner loop to the MXU —
quadratic as coeffs @ [1,X,Y,X²,XY,Y²] in tile-local coords, the five
weighted output sums as one f8ᵀ @ w contraction, and the backward's five
lane-reductions as one d_power @ basisᵀ moment matmul — is SLOWER than the
pure-VPU form: 13.6 ms vs 8.6 ms VJP, 7.4 vs 5.8 ms forward at per-tile
density 283 on v5e (tools/probe_iter_parts.py). Not a precision artifact
(DEFAULT vs HIGHEST differs by ~5%): the (32,8)x(8,256) matmuls sit on the
serial transmittance chain, so their MXU latency adds per chunk instead of
overlapping. The correctness of that variant was fully test-verified, so
this is purely a performance rejection.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed property columns (last-dim layout of the props array)
#   0:2 mu, 2:5 conic, 5:8 color, 8 opacity, 9 depth  (D_IN = 10)
D_IN = 10
CHUNK = 32  # entries processed per inner step (sublane dimension)
BLOCK = 2  # chunks per saturation check in the forward (unrolled)
_PAD = CHUNK * BLOCK  # L padding granularity (forward runs whole blocks)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cumprods(x):
    """(inclusive, exclusive) cumulative products along sublanes (CHUNK).

    log2(CHUNK) rounds of roll-and-multiply; multiplicative identity fill.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < CHUNK:
        shifted = pltpu.roll(x, shift=s, axis=0)
        x = x * jnp.where(rows >= s, shifted, 1.0)
        s *= 2
    incl = x
    excl = jnp.where(rows >= 1, pltpu.roll(incl, shift=1, axis=0), 1.0)
    return incl, excl


def _pixel_grid(tile: int, tx_n: int):
    """(1, tile*tile) pixel coordinates of this program's tile.

    Tile origin derived from program_id; flat pixel index l = ly*tile + lx.
    """
    i = pl.program_id(0)
    ox = ((i % tx_n) * tile).astype(jnp.float32)
    oy = ((i // tx_n) * tile).astype(jnp.float32)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    px = ox + (l % tile).astype(jnp.float32)
    py = oy + (l // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha(chunk, px, py, alpha_clamp, alpha_min):
    """chunk: (CHUNK, D) props -> alpha (CHUNK, P)."""
    mu_x = chunk[:, 0:1]
    mu_y = chunk[:, 1:2]
    ca = chunk[:, 2:3]
    cb = chunk[:, 3:4]
    cc = chunk[:, 4:5]
    opa = chunk[:, 8:9]
    dx = px - mu_x  # (CHUNK, P)
    dy = py - mu_y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(alpha_clamp, opa * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)
    return alpha


def _blend_fwd_kernel(
    counts_sp,  # scalar-prefetch (T,) int32
    props_ref,  # VMEM (1, L, D_IN)
    color_ref,  # VMEM (1, 3, P)
    depth_ref,  # VMEM (1, 1, P)
    alpha_ref,  # VMEM (1, 1, P)
    tfinal_ref,  # VMEM (1, 1, P)
    neff_ref,  # VMEM (1, 8, 128) int32 — effective chunks (broadcast)
    touch_ref=None,  # VMEM (1, l_max, 8) int32 — only when emit_touch
    *,
    tile: int,
    tx_n: int,
    l_max: int,
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
    emit_touch: bool = False,
):
    """Forward blend, structured for the TPU pipeline:

    - the loop is a `fori_loop` over BLOCKs of chunks with the saturation
      early-exit folded into the trip computation only between blocks (a
      data-dependent `while_loop` cond per chunk stalled the Mosaic pipeline
      — measured 6.8 ms vs the backward's 3.9 ms fori_loop on identical
      work);
    - per-gaussian weighted sums accumulate at full (CHUNK, P) shape and are
      reduced across sublanes ONCE after the loop (5 sublane reductions per
      chunk were ~1/3 of the inner-loop ops).
    """
    p = tile * tile
    px, py = _pixel_grid(tile, tx_n)
    count = counts_sp[pl.program_id(0)]
    n_chunks = (count + CHUNK - 1) // CHUNK
    n_blocks = (n_chunks + BLOCK - 1) // BLOCK
    if emit_touch:
        # entries live on sublanes (minor dim 8 is lane padding): chunked
        # dynamic stores are only legal on the sublane dimension (lane-dim
        # dynamic indices must be 128-multiples, CHUNK is not)
        touch_ref[0] = jnp.zeros((l_max, 8), jnp.int32)

    def chunk_step(k, t_run, cr_acc, cg_acc, cb_acc, d_acc, w_acc):
        chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]  # (CHUNK, D)
        alpha = _chunk_alpha(chunk, px, py, alpha_clamp, alpha_min)
        incl, excl = _cumprods(1.0 - alpha)
        t_in = t_run * excl  # exclusive transmittance
        contributing = t_in >= t_min
        w = jnp.where(contributing, alpha * t_in, 0.0)  # (CHUNK, P)
        if emit_touch:
            cnt = jnp.sum(
                ((alpha >= alpha_min) & contributing).astype(jnp.int32),
                axis=1,
                keepdims=True,
            )  # (CHUNK, 1) pixels touched per entry
            touch_ref[0, pl.ds(k * CHUNK, CHUNK), :] = jnp.broadcast_to(
                cnt, (CHUNK, 8)
            )
        col = chunk[:, 5:8]  # (CHUNK, 3)
        cr_acc = cr_acc + w * col[:, 0:1]
        cg_acc = cg_acc + w * col[:, 1:2]
        cb_acc = cb_acc + w * col[:, 2:3]
        d_acc = d_acc + w * chunk[:, 9:10]
        w_acc = w_acc + w
        t_run = t_run * incl[CHUNK - 1 : CHUNK, :]
        return t_run, cr_acc, cg_acc, cb_acc, d_acc, w_acc

    def block_body(blk, carry):
        nb_eff, t_run, cr, cg, cb, d_acc, w_acc = carry
        live = (blk < nb_eff) & (jnp.max(t_run) >= t_min)
        # saturation check once per BLOCK: shrink the effective trip count
        nb_eff = jnp.where(live, nb_eff, jnp.minimum(nb_eff, blk))

        def run(args):
            t_run, cr, cg, cb, d_acc, w_acc = args
            for j in range(BLOCK):  # unrolled: zero per-chunk loop overhead
                t_run, cr, cg, cb, d_acc, w_acc = chunk_step(
                    blk * BLOCK + j, t_run, cr, cg, cb, d_acc, w_acc
                )
            return t_run, cr, cg, cb, d_acc, w_acc

        args = (t_run, cr, cg, cb, d_acc, w_acc)
        args = jax.lax.cond(live, run, lambda a: a, args)
        return (nb_eff,) + args

    zc = jnp.zeros((CHUNK, p), jnp.float32)
    init = (
        n_blocks,
        jnp.ones((1, p), jnp.float32),
        zc,
        zc,
        zc,
        zc,
        zc,
    )
    nb_eff, t_run, cr, cg, cb, d_acc, w_acc = jax.lax.fori_loop(
        0, n_blocks, block_body, init
    )
    color_ref[0] = jnp.concatenate(
        [
            jnp.sum(cr, axis=0, keepdims=True),
            jnp.sum(cg, axis=0, keepdims=True),
            jnp.sum(cb, axis=0, keepdims=True),
        ],
        axis=0,
    )
    depth_ref[0] = jnp.sum(d_acc, axis=0, keepdims=True)
    alpha_ref[0] = jnp.sum(w_acc, axis=0, keepdims=True)
    tfinal_ref[0] = t_run
    k_eff = jnp.minimum(nb_eff * BLOCK, n_chunks)
    neff_ref[0] = jnp.full((8, 128), k_eff, jnp.int32)


def _blend_bwd_kernel(
    counts_sp,  # scalar-prefetch (T,) int32 (unused; neff governs)
    props_ref,  # VMEM (1, L, D_IN)
    tfinal_ref,  # VMEM (1, 1, P)
    neff_ref,  # VMEM (1, 8, 128) int32
    g_color_ref,  # VMEM (1, 3, P)
    g_depth_ref,  # VMEM (1, 1, P)
    g_alpha_ref,  # VMEM (1, 1, P)
    d_props_ref,  # VMEM (1, L, D_IN) output
    *,
    tile: int,
    tx_n: int,
    l_max: int,
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
):
    p = tile * tile
    px, py = _pixel_grid(tile, tx_n)
    n_eff = neff_ref[0, 0, 0]

    d_props_ref[0] = jnp.zeros((l_max, D_IN), jnp.float32)

    # cotangents: f = [color(3), z, 1]; gF = [gC(3), gD, gA]
    gC = g_color_ref[0]  # (3, P)
    gD = g_depth_ref[0]  # (1, P)
    gA = g_alpha_ref[0]  # (1, P)

    def body(kk, carry):
        k = n_eff - 1 - kk
        t_after, s_wsum = carry
        chunk = props_ref[0, pl.ds(k * CHUNK, CHUNK), :]
        alpha = _chunk_alpha(chunk, px, py, alpha_clamp, alpha_min)
        incl, excl = _cumprods(1.0 - alpha)
        # transmittance at chunk start, recovered by division (alpha is
        # clamped <= alpha_clamp so each factor is >= 1 - alpha_clamp)
        t_start = t_after / incl[CHUNK - 1 : CHUNK, :]
        t_in = t_start * excl
        contributing = t_in >= t_min
        w = jnp.where(contributing, alpha * t_in, 0.0)

        col = chunk[:, 5:8]  # (CHUNK, 3)
        z = chunk[:, 9:10]  # (CHUNK, 1)

        # dL/dw_i = col_i . gC + z_i * gD + gA   (CHUNK, P)
        dL_dw = (
            col[:, 0:1] * gC[0:1]
            + col[:, 1:2] * gC[1:2]
            + col[:, 2:3] * gC[2:3]
            + z * gD
            + gA
        )

        # suffix accumulators: S_i = sum_{j>i} w_j (f_j . gF)
        wdl = w * dL_dw
        incl_wdl = _cumsum_sublanes(wdl)
        total_wdl = incl_wdl[CHUNK - 1 : CHUNK, :]
        S_i = (total_wdl - incl_wdl) + s_wsum  # (CHUNK, P)

        # dL/dalpha_i = t_in * dL_dw - S_i / (1 - alpha_i)
        one_minus = 1.0 - alpha
        d_alpha = jnp.where(
            contributing & (alpha > 0.0),
            t_in * dL_dw - S_i / one_minus,
            0.0,
        )

        # alpha = min(clamp, opa * G), G = exp(power)
        opa = chunk[:, 8:9]
        G = jnp.where(opa > 0.0, alpha / jnp.maximum(opa, 1e-12), 0.0)
        not_clamped = alpha < alpha_clamp
        d_opa_px = jnp.where(not_clamped, d_alpha * G, 0.0)
        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)  # (CHUNK, P)

        mu_x = chunk[:, 0:1]
        mu_y = chunk[:, 1:2]
        ca = chunk[:, 2:3]
        cb = chunk[:, 3:4]
        cc = chunk[:, 4:5]
        dx = px - mu_x
        dy = py - mu_y
        # power = -0.5*(ca dx^2 + cc dy^2) - cb dx dy
        d_mu_x = jnp.sum(d_power * (ca * dx + cb * dy), axis=1)  # (CHUNK,)
        d_mu_y = jnp.sum(d_power * (cc * dy + cb * dx), axis=1)
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=1)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)
        d_opa = jnp.sum(d_opa_px, axis=1)
        # dL/dcol_i = sum_p w_i gC   -> (CHUNK, 3)
        d_col = jax.lax.dot_general(
            w, gC, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        d_z = jnp.sum(w * gD, axis=1)

        d_chunk = jnp.concatenate(
            [
                d_mu_x[:, None],
                d_mu_y[:, None],
                d_ca[:, None],
                d_cb[:, None],
                d_cc[:, None],
                d_col,
                d_opa[:, None],
                d_z[:, None],
            ],
            axis=1,
        )  # (CHUNK, D_IN)
        d_props_ref[0, pl.ds(k * CHUNK, CHUNK), :] = d_chunk

        s_wsum = s_wsum + total_wdl
        return t_start, s_wsum

    t_after = tfinal_ref[0]  # (1, P)
    s0 = jnp.zeros((1, p), jnp.float32)
    jax.lax.fori_loop(0, n_eff, body, (t_after, s0))


def _cumsum_sublanes(x):
    """Inclusive cumulative sum along axis 0 (size CHUNK) via a triangular
    matmul — Mosaic has no cumsum primitive; an (8,8) @ (8,P) dot is cheap
    and runs on the otherwise-idle MXU."""
    tri = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _forward(
    props: jnp.ndarray,  # (T, L, D_IN)
    counts: jnp.ndarray,  # (T,) int32
    tx_n: int,
    tile: int,
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
    emit_touch: bool = False,
):
    t, l_max, _ = props.shape
    l_in = l_max
    if l_max % _PAD:
        # block-unrolled reads/writes need L to be a CHUNK*BLOCK multiple;
        # padded entries have zero props (zero alpha) beyond every count
        l_max = -(-l_max // _PAD) * _PAD
        props = jnp.concatenate(
            [props, jnp.zeros((t, l_max - l_in, D_IN), props.dtype)], axis=1
        )
    p = tile * tile
    kernel = functools.partial(
        _blend_fwd_kernel,
        tile=tile,
        tx_n=tx_n,
        l_max=l_max,
        alpha_clamp=alpha_clamp,
        alpha_min=alpha_min,
        t_min=t_min,
        emit_touch=emit_touch,
    )
    out_specs = [
        pl.BlockSpec((1, 3, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, 3, p), jnp.float32),
        jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t, 8, 128), jnp.int32),
    ]
    if emit_touch:
        out_specs.append(pl.BlockSpec((1, l_max, 8), lambda i, c: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((t, l_max, 8), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, l_max, D_IN), lambda i, c: (i, 0, 0)),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(counts, props)
    color, depth, alpha, tfinal, neff = outs[:5]
    touch = outs[5][:, :l_in, 0] if emit_touch else None
    return color, depth[:, 0], alpha[:, 0], tfinal[:, 0], neff, touch


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def blend_tiles_pallas(
    props: jnp.ndarray,
    counts: jnp.ndarray,
    tx_n: int,
    tile: int = 16,
    alpha_clamp: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(color (T, 3, P), depth (T, P), alpha (T, P)) from per-tile props.

    Differentiable w.r.t. `props` only (counts is index data).
    """
    color, depth, alpha, _, _, _ = _forward(
        props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min
    )
    return color, depth, alpha


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def blend_tiles_pallas_touch(
    props: jnp.ndarray,
    counts: jnp.ndarray,
    tx_n: int,
    tile: int = 16,
    alpha_clamp: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blend that also emits per-entry touched-pixel counts (T, L) int32 —
    the visibility-render path (keyframe policy, occ-aware visibility;
    n_touched semantics of the CUDA rasterizer, SURVEY.md §2.9). Shares the
    back-to-front replay VJP with `blend_tiles_pallas` (touch itself is
    integer data, no cotangent)."""
    color, depth, alpha, _, _, touch = _forward(
        props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min,
        emit_touch=True,
    )
    return color, depth, alpha, touch


def _fwd_rule_touch(props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min):
    color, depth, alpha, tfinal, neff, touch = _forward(
        props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min,
        emit_touch=True,
    )
    return (color, depth, alpha, touch), (props, counts, tfinal, neff)


def _bwd_rule_touch(tx_n, tile, alpha_clamp, alpha_min, t_min, residuals, cots):
    g_color, g_depth, g_alpha, _ = cots  # touch cotangent is symbolic zero
    return _bwd_rule(
        tx_n, tile, alpha_clamp, alpha_min, t_min, residuals,
        (g_color, g_depth, g_alpha),
    )


blend_tiles_pallas_touch.defvjp(_fwd_rule_touch, _bwd_rule_touch)


def _fwd_rule(props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min):
    color, depth, alpha, tfinal, neff, _ = _forward(
        props, counts, tx_n, tile, alpha_clamp, alpha_min, t_min
    )
    return (color, depth, alpha), (props, counts, tfinal, neff)


def _bwd_rule(tx_n, tile, alpha_clamp, alpha_min, t_min, residuals, cotangents):
    props, counts, tfinal, neff = residuals
    g_color, g_depth, g_alpha = cotangents
    t, l_max, _ = props.shape
    l_in = l_max
    if l_max % _PAD:
        l_max = -(-l_max // _PAD) * _PAD
        props = jnp.concatenate(
            [props, jnp.zeros((t, l_max - l_in, D_IN), props.dtype)], axis=1
        )
    p = tile * tile
    kernel = functools.partial(
        _blend_bwd_kernel,
        tile=tile,
        tx_n=tx_n,
        l_max=l_max,
        alpha_clamp=alpha_clamp,
        alpha_min=alpha_min,
        t_min=t_min,
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
        out_specs=[
            pl.BlockSpec((1, l_max, D_IN), lambda i, c: (i, 0, 0)),
        ],
    )
    (d_props,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, l_max, D_IN), jnp.float32)],
        interpret=_interpret(),
    )(
        counts,
        props,
        tfinal[:, None, :],
        neff,
        g_color,
        g_depth[:, None, :],
        g_alpha[:, None, :],
    )
    return d_props[:, :l_in, :], None


blend_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
