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

STRUCTURE (round-3 rework, measured in tools/kernel_lab.py on v5e at
counts mean 142/tile, VGA):

- N_STREAMS tiles per program, processed as INDEPENDENT interleaved
  instruction streams. The per-chunk work is a serial dependency chain
  (alpha -> log-rounds of cumprod -> transmittance update) whose op
  latencies the VPU cannot hide within one stream — the kernel is
  latency-bound, not throughput- or spill-bound (nocond 3.04 ms vs base
  3.28 ms; acc8 3.05 ms; storew 3.47 ms; base 3.24 -> pair2 2.69 ms).
  A second tile's stream pipelines under the first's latencies.
- Per-chunk contributions are reduced to (ACC_ROWS, P) partial sums
  before accumulating (2 roll-adds), so live accumulator state is 20
  vregs for both streams instead of 80 — large live carries measured
  progressively worse as chunk width grows (nocond@64: 5.29 ms).

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
cotangents share one path. The backward pairs streams the same way; a
stream whose effective chunk count is shorter is masked (its carries
frozen) while its partner finishes.

The differentiable hot-loop kernel does NOT emit n_touched (the hot loops
don't need it; the reference's opacity reset keys on radii > 0, not
n_touched — slam_backend.py:300-305). Visibility renders (keyframe policy,
occ-aware visibility) use the forward-only `blend_tiles_pallas_touch`
variant, which additionally writes per-entry contributed-pixel counts —
the Pallas replacement for the dense XLA blend on those paths.

MEASURED DEAD ENDS (do not retry):
- MXU offload of the inner loop (quadratic as coeffs @ monomials, outputs
  as one f8^T @ w contraction): 13.6 ms vs 8.6 ms VJP — the matmuls sit
  on the serial transmittance chain, their latency adds per chunk
  (tools/probe_iter_parts.py; correctness was fully verified).
- MXU moments backward (all six per-chunk gradient reductions as ONE
  (3C, P) @ (P, 10) matmul against the local pixel basis): 6.13 ms vs
  4.25 ms production bwd — same serial-chain latency failure
  (tools/kernel_lab.py bwdmom; matched production to 3e-4 rel).
- storew forward (no live accumulators, w stored to VMEM, one final
  (5, L) @ (L, P) contraction): 3.47 ms vs 3.24 — the loop was never
  spill-bound.
- log-space cumprod via triangular MXU matmul (trimat): 3.57 ms.
- CHUNK=128: 2.96 ms vs CHUNK=64 acc8 2.76 / pair2@32 2.69 — wider ops
  stop paying once intermediates outgrow the register file.
- tile=8 (tools/probe_roofline.py MONOGS_TILE=8): pixel utilization rises
  0.27 -> 0.46 and raw entry-pixel work drops 1.85x, but P=64 fills only
  half a vreg lane dim and counts/CHUNK padding grows — blend fwd measured
  5.62 ms vs 2.82 at tile=16. A finer tiling only pays with a lane-packed
  multi-tile layout (two 64-px tiles sharing each vreg), not via the tile
  config knob.
- tile=(16,8), the round-4 "one-vreg-wide" attempt (P=128 exactly fills
  one vreg lane dim; utilization 0.27 -> 0.39, effective entry-pixels
  0.66x): fwd measured 4.16 ms at N_STREAMS=2 and 4.05 ms at 4 streams
  vs 2.88 at tile=16 — achieved rate halved (0.294 vs 0.645 Top/s) and
  extra streams did NOT recover it, so the loss is not stream-level
  latency hiding; per-chunk fixed costs and doubled per-tile epilogue
  (grid 2400 vs 1200 programs: output writes, neff stores, count checks)
  eat the work reduction. True lane-PACKED pairs (two separate 64-px tile
  lists sharing one vreg) were cost-modeled at ~+44% packing instructions
  per chunk (10 property planes x broadcast/select) for 1.85x fewer
  entry-pixels — net ~1.3x at best, below measurement noise ambition, and
  shelved. P=256 square tiles remain the operating point.
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
# tiles per program, interleaved for latency hiding. Env override is a
# probe knob (tools/probe_roofline.py stream sweeps), not a product config:
# the right value is fixed per tile shape (2 at P=256; narrower tiles halve
# vreg pressure per stream and support more).
N_STREAMS = int(__import__("os").environ.get("MONOGS_NSTREAMS", "2"))
ACC_ROWS = 8  # accumulator partial-sum rows (one sublane group)
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


def _red_rows(x):
    """(CHUNK, P) -> (ACC_ROWS, P) partial sublane reduction (roll-adds)."""
    s = CHUNK // 2
    while s >= ACC_ROWS:
        x = x + pltpu.roll(x, shift=s, axis=0)
        s //= 2
    return x[0:ACC_ROWS, :]


def _tile_wh(tile) -> Tuple[int, int]:
    """Normalize the static `tile` arg: int (square) or (tile_w, tile_h)."""
    return tile if isinstance(tile, tuple) else (tile, tile)


def _pixel_grid(tile, tx_n: int, tid):
    """(1, tile_w*tile_h) pixel coordinates of tile `tid` (row-major)."""
    tw, th = _tile_wh(tile)
    ox = ((tid % tx_n) * tw).astype(jnp.float32)
    oy = ((tid // tx_n) * th).astype(jnp.float32)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, tw * th), 1)
    px = ox + (l % tw).astype(jnp.float32)
    py = oy + (l // tw).astype(jnp.float32)
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
    props_ref,  # VMEM (N_STREAMS, L, D_IN)
    color_ref,  # VMEM (N_STREAMS, 3, P)
    depth_ref,  # VMEM (N_STREAMS, 1, P)
    alpha_ref,  # VMEM (N_STREAMS, 1, P)
    tfinal_ref,  # VMEM (N_STREAMS, 1, P)
    neff_ref,  # VMEM (N_STREAMS, 8, 128) int32 — effective chunks
    touch_ref=None,  # VMEM (N_STREAMS, l_max, 8) int32 — when emit_touch
    *,
    tile,  # int (square) or (tile_w, tile_h)
    tx_n: int,
    l_max: int,
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
    emit_touch: bool = False,
):
    """Forward blend: N_STREAMS independent tile streams per program.

    The loop is a `fori_loop` over BLOCKs of chunks; each stream's
    saturation early-exit only shrinks its effective trip/freezes its
    carries (a data-dependent `while_loop` cond per chunk stalled the
    Mosaic pipeline — measured 6.8 ms vs 3.9 ms on identical work), and
    the block compute is skipped entirely only when EVERY stream is done.
    """
    tw, th = _tile_wh(tile)
    p = tw * th
    i = pl.program_id(0)
    n = N_STREAMS
    grids = [_pixel_grid(tile, tx_n, n * i + j) for j in range(n)]
    counts = [counts_sp[n * i + j] for j in range(n)]
    n_chunks = [(c + CHUNK - 1) // CHUNK for c in counts]
    n_blocks = [(nc + BLOCK - 1) // BLOCK for nc in n_chunks]
    if emit_touch:
        # entries live on sublanes (minor dim 8 is lane padding): chunked
        # dynamic stores are only legal on the sublane dimension
        for j in range(n):
            touch_ref[j] = jnp.zeros((l_max, 8), jnp.int32)

    def chunk_step(j, k, t_run, accs, live):
        chunk = props_ref[j, pl.ds(k * CHUNK, CHUNK), :]  # (CHUNK, D)
        px, py = grids[j]
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
            # gate on stream liveness: a partner-paired stream past its own
            # chunk count must not record touches
            cnt = jnp.where(live, cnt, 0)
            touch_ref[j, pl.ds(k * CHUNK, CHUNK), :] = jnp.broadcast_to(
                cnt, (CHUNK, 8)
            )
        col = chunk[:, 5:8]  # (CHUNK, 3)
        cr, cg, cb, d_acc, w_acc = accs
        accs = (
            cr + _red_rows(w * col[:, 0:1]),
            cg + _red_rows(w * col[:, 1:2]),
            cb + _red_rows(w * col[:, 2:3]),
            d_acc + _red_rows(w * chunk[:, 9:10]),
            w_acc + _red_rows(w),
        )
        t_run = t_run * incl[CHUNK - 1 : CHUNK, :]
        return t_run, accs

    def block_body(blk, carry):
        nb_eff, t_runs, accs = carry
        # per-stream saturation: shrink the effective trip count and freeze
        # that stream's transmittance (tfinal must equal t at its k_eff so
        # the backward's divide-out recovery starts from the right value)
        live = [
            (blk < nb_eff[j]) & (jnp.max(t_runs[j]) >= t_min)
            for j in range(n)
        ]
        nb_eff = tuple(
            jnp.where(live[j], nb_eff[j], jnp.minimum(nb_eff[j], blk))
            for j in range(n)
        )
        any_live = live[0]
        for j in range(1, n):
            any_live = any_live | live[j]

        def run(args):
            t_runs, accs = args
            t_new = list(t_runs)
            a_new = list(accs)
            for jj in range(BLOCK):  # unrolled; streams interleave inside
                for j in range(n):
                    t_new[j], a_new[j] = chunk_step(
                        j, blk * BLOCK + jj, t_new[j], a_new[j], live[j]
                    )
            # discard a dead stream's block wholesale: a count-exhausted
            # (but unsaturated) stream still computes real alphas from its
            # partner-padded rows; its transmittance must also stay frozen
            # at its own k_eff for the backward's divide-out recovery
            t_new = [
                jnp.where(live[j], t_new[j], t_runs[j]) for j in range(n)
            ]
            a_new = [
                tuple(
                    jnp.where(live[j], an, ao)
                    for an, ao in zip(a_new[j], accs[j])
                )
                for j in range(n)
            ]
            return tuple(t_new), tuple(a_new)

        t_runs, accs = jax.lax.cond(any_live, run, lambda a: a, (t_runs, accs))
        return nb_eff, t_runs, accs

    max_blocks = n_blocks[0]
    for j in range(1, n):
        max_blocks = jnp.maximum(max_blocks, n_blocks[j])
    za = jnp.zeros((ACC_ROWS, p), jnp.float32)
    one = jnp.ones((1, p), jnp.float32)
    init = (
        tuple(n_blocks),
        (one,) * n,
        (((za,) * 5),) * n,
    )
    nb_eff, t_runs, accs = jax.lax.fori_loop(0, max_blocks, block_body, init)
    for j in range(n):
        cr, cg, cb, d_acc, w_acc = accs[j]
        color_ref[j] = jnp.concatenate(
            [
                jnp.sum(cr, axis=0, keepdims=True),
                jnp.sum(cg, axis=0, keepdims=True),
                jnp.sum(cb, axis=0, keepdims=True),
            ],
            axis=0,
        )
        depth_ref[j] = jnp.sum(d_acc, axis=0, keepdims=True)
        alpha_ref[j] = jnp.sum(w_acc, axis=0, keepdims=True)
        tfinal_ref[j] = t_runs[j]
        k_eff = jnp.minimum(nb_eff[j] * BLOCK, n_chunks[j])
        neff_ref[j] = jnp.full((8, 128), k_eff, jnp.int32)


def _blend_bwd_kernel(
    counts_sp,  # scalar-prefetch (T,) int32 (unused; neff governs)
    props_ref,  # VMEM (N_STREAMS, L, D_IN)
    tfinal_ref,  # VMEM (N_STREAMS, 1, P)
    neff_ref,  # VMEM (N_STREAMS, 8, 128) int32
    g_color_ref,  # VMEM (N_STREAMS, 3, P)
    g_depth_ref,  # VMEM (N_STREAMS, 1, P)
    g_alpha_ref,  # VMEM (N_STREAMS, 1, P)
    d_props_ref,  # VMEM (N_STREAMS, L, D_IN) output
    *,
    tile,  # int (square) or (tile_w, tile_h)
    tx_n: int,
    l_max: int,
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
):
    tw, th = _tile_wh(tile)
    p = tw * th
    i = pl.program_id(0)
    n = N_STREAMS
    grids = [_pixel_grid(tile, tx_n, n * i + j) for j in range(n)]
    n_effs = [neff_ref[j, 0, 0] for j in range(n)]

    for j in range(n):
        d_props_ref[j] = jnp.zeros((l_max, D_IN), jnp.float32)

    # cotangents: f = [color(3), z, 1]; gF = [gC(3), gD, gA]
    gC = [g_color_ref[j] for j in range(n)]  # (3, P)
    gD = [g_depth_ref[j] for j in range(n)]  # (1, P)
    gA = [g_alpha_ref[j] for j in range(n)]  # (1, P)

    n_eff_max = n_effs[0]
    for j in range(1, n):
        n_eff_max = jnp.maximum(n_eff_max, n_effs[j])

    def stream_step(j, k, t_after, s_wsum):
        """One back-to-front chunk for stream j; returns new carries and
        stores d_chunk. Safe for phantom chunks (zero props)."""
        chunk = props_ref[j, pl.ds(k * CHUNK, CHUNK), :]
        px, py = grids[j]
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
            col[:, 0:1] * gC[j][0:1]
            + col[:, 1:2] * gC[j][1:2]
            + col[:, 2:3] * gC[j][2:3]
            + z * gD[j]
            + gA[j]
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
            w, gC[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_z = jnp.sum(w * gD[j], axis=1)

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
        return t_start, s_wsum + total_wdl, d_chunk

    def body(kk, carry):
        t_afters, s_wsums = carry
        t_new = list(t_afters)
        s_new = list(s_wsums)
        for j in range(n):
            # front-aligned shared index: stream j is live while its own
            # chunk index is within its effective count. A dead stream's
            # carries are frozen and its store is zeroed (entries past its
            # k_eff never contributed forward, so their true grad IS zero).
            k = n_eff_max - 1 - kk
            live = k < n_effs[j]
            k_safe = jnp.minimum(k, jnp.maximum(n_effs[j] - 1, 0))
            t_j, s_j, d_chunk = stream_step(j, k_safe, t_new[j], s_new[j])
            lv = live  # scalar bool
            d_props_ref[j, pl.ds(k_safe * CHUNK, CHUNK), :] = jnp.where(
                lv, d_chunk, jnp.zeros_like(d_chunk)
            )
            t_new[j] = jnp.where(lv, t_j, t_new[j])
            s_new[j] = jnp.where(lv, s_j, s_new[j])
        return tuple(t_new), tuple(s_new)

    t_afters = tuple(tfinal_ref[j] for j in range(n))  # (1, P) each
    s0 = (jnp.zeros((1, p), jnp.float32),) * n
    jax.lax.fori_loop(0, n_eff_max, body, (t_afters, s0))


def _cumsum_sublanes(x):
    """Inclusive cumulative sum along axis 0 (size CHUNK) via a triangular
    matmul — Mosaic has no cumsum primitive; an (8,8) @ (8,P) dot is cheap
    and runs on the otherwise-idle MXU."""
    tri = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pad_tiles(props, counts):
    """Pad the tile axis to a multiple of N_STREAMS (zero props/counts)."""
    t = props.shape[0]
    t_pad = -(-t // N_STREAMS) * N_STREAMS
    if t_pad != t:
        props = jnp.concatenate(
            [props, jnp.zeros((t_pad - t,) + props.shape[1:], props.dtype)],
            axis=0,
        )
        counts = jnp.concatenate(
            [counts, jnp.zeros((t_pad - t,), counts.dtype)], axis=0
        )
    return props, counts, t


def _forward(
    props: jnp.ndarray,  # (T, L, D_IN)
    counts: jnp.ndarray,  # (T,) int32
    tx_n: int,
    tile,  # int (square) or (tile_w, tile_h)
    alpha_clamp: float,
    alpha_min: float,
    t_min: float,
    emit_touch: bool = False,
):
    t_in_, l_max, _ = props.shape
    l_in = l_max
    if l_max % _PAD:
        # block-unrolled reads/writes need L to be a CHUNK*BLOCK multiple;
        # padded entries have zero props (zero alpha) beyond every count
        l_max = -(-l_max // _PAD) * _PAD
        props = jnp.concatenate(
            [props, jnp.zeros((t_in_, l_max - l_in, D_IN), props.dtype)],
            axis=1,
        )
    props, counts, t = _pad_tiles(props, counts)
    t_pad = props.shape[0]
    grid = t_pad // N_STREAMS
    tw, th = _tile_wh(tile)
    p = tw * th
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
    ns = N_STREAMS
    out_specs = [
        pl.BlockSpec((ns, 3, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((ns, 8, 128), lambda i, c: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, 3, p), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 8, 128), jnp.int32),
    ]
    if emit_touch:
        out_specs.append(
            pl.BlockSpec((ns, l_max, 8), lambda i, c: (i, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((t_pad, l_max, 8), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ns, l_max, D_IN), lambda i, c: (i, 0, 0)),
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
    color, depth, alpha = color[:t], depth[:t], alpha[:t]
    touch = outs[5][:t, :l_in, 0] if emit_touch else None
    return color, depth[:, 0], alpha[:, 0], tfinal[:t, 0], neff[:t], touch


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
    t_in_, l_max, _ = props.shape
    l_in = l_max
    if l_max % _PAD:
        l_max = -(-l_max // _PAD) * _PAD
        props = jnp.concatenate(
            [props, jnp.zeros((t_in_, l_max - l_in, D_IN), props.dtype)],
            axis=1,
        )
    props, counts, t = _pad_tiles(props, counts)
    t_pad = props.shape[0]

    def padt(x):
        if x.shape[0] != t_pad:
            x = jnp.concatenate(
                [x, jnp.zeros((t_pad - x.shape[0],) + x.shape[1:], x.dtype)],
                axis=0,
            )
        return x

    tw, th = _tile_wh(tile)
    p = tw * th
    ns = N_STREAMS
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
        grid=(t_pad // ns,),
        in_specs=[
            pl.BlockSpec((ns, l_max, D_IN), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((ns, 8, 128), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((ns, 3, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((ns, 1, p), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ns, l_max, D_IN), lambda i, c: (i, 0, 0)),
        ],
    )
    (d_props,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, l_max, D_IN), jnp.float32)],
        interpret=_interpret(),
    )(
        counts,
        props,
        padt(tfinal[:, None, :]),
        padt(neff),
        padt(g_color),
        padt(g_depth[:, None, :]),
        padt(g_alpha[:, None, :]),
    )
    return d_props[:t, :l_in, :], None


blend_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
