"""Tile-binned differentiable rasterizer — the production forward/backward.

TPU-first redesign of the CUDA tile rasterizer (upstream
diff-gaussian-rasterization-w-pose; interface reconstructed in SURVEY.md
§2.9). Instead of CUB radix-sorted (tile, depth) keys and per-pixel warp
loops, the pipeline is:

  1. project + cull (ops/project.py, differentiable incl. pose),
  2. binning (`build_binning`, integer-only, non-differentiable):
     one global depth argsort, duplication into <= k_dup tile entries, a
     stable sort by tile id, and THREE index tables:
       - idx_table (T, L): per-tile slot -> Gaussian index (sentinel N),
       - pos_table (N, K): Gaussian entry -> flat table slot (the exact
         inverse mapping, built with a second argsort),
       - counts (T,): per-tile occupancy.
     pos_table makes the property-gather's backward a GATHER instead of a
     scatter-add — scatters serialize on TPU and dominated the backward.
  3. per-tile property gather through `_tile_gather` (custom VJP using
     pos_table),
  4. per-tile front-to-back compositing:
       - hot path: the Pallas kernel (ops/blend_pallas.py, custom VJP,
         early termination);
       - visibility path: dense XLA blend that also emits n_touched (final
         renders feeding the keyframe policy).

Because binning is integer-only it can be REUSED across tracking iterations
(`build_binning(..., dilate=...)` once, `render_binned` per iteration) —
the pose moves a few pixels per iteration while tile lists stay valid, the
TPU answer to CUDA's cheap per-iteration rebinning.

Capacity overflows (k_dup truncation, per-tile list overflow) are counted
and returned as telemetry, never silent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams
from .blend_pallas import blend_tiles_pallas, blend_tiles_pallas_touch
from .project import project_gaussians, ProjectedGaussians
from .raster_types import RasterConfig, RenderOutput


class Binning(NamedTuple):
    """Integer binning state; reusable across nearby poses."""

    idx_table: jnp.ndarray  # (T, L) int32 Gaussian ids (sentinel = N)
    pos_table: jnp.ndarray  # (N, K) int32 flat slot ids (dummy = T*L)
    counts: jnp.ndarray  # (T,) int32
    dup_overflow: jnp.ndarray  # ()
    tile_overflow: jnp.ndarray  # ()


def tile_wh(config: RasterConfig) -> Tuple[int, int]:
    """(tile_w, tile_h); tile_h == 0 means square tiles."""
    return config.tile, config.tile_h or config.tile


def _grid_dims(intr: Intrinsics, tile_w: int, tile_h: int | None = None):
    th = tile_h if tile_h is not None else tile_w
    tx_n = -(-intr.width // tile_w)
    ty_n = -(-intr.height // th)
    return tx_n, ty_n, tx_n * ty_n


def build_binning(
    proj: ProjectedGaussians,
    intr: Intrinsics,
    config: RasterConfig,
    dilate: float = 0.0,
) -> Binning:
    """Bin projected Gaussians into per-tile depth-ordered lists.

    `dilate` (pixels) enlarges each Gaussian's tile rectangle so the binning
    stays valid while the pose drifts during a tracking loop.
    """
    tw, th = tile_wh(config)
    l_max = config.max_per_tile
    tx_n, ty_n, n_tiles = _grid_dims(intr, tw, th)
    n = proj.means2d.shape[0]

    m = jax.lax.stop_gradient(proj.means2d)
    r = jax.lax.stop_gradient(proj.radii) + dilate

    # depth order
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(jax.lax.stop_gradient(sort_depth)).astype(jnp.int32)
    m = m[order]
    r = r[order]
    val = proj.valid[order]

    tx0 = jnp.clip(jnp.floor((m[:, 0] - r) / tw), 0, tx_n - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((m[:, 0] + r) / tw), 0, tx_n - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((m[:, 1] - r) / th), 0, ty_n - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((m[:, 1] + r) / th), 0, ty_n - 1).astype(jnp.int32)
    wrect = tx1 - tx0 + 1
    span = wrect * (ty1 - ty0 + 1)
    span_cap = jnp.minimum(span, config.k_dup)
    dup_overflow = jnp.where(val, span - span_cap, 0).sum().astype(jnp.int32)

    ks = jnp.arange(config.k_dup, dtype=jnp.int32)
    within = (ks[None, :] < span_cap[:, None]) & val[:, None]
    tyk = ty0[:, None] + ks[None, :] // wrect[:, None]
    txk = tx0[:, None] + ks[None, :] % wrect[:, None]
    tid = jnp.where(within, tyk * tx_n + txk, n_tiles)  # (N, K)

    if config.tight_cull:
        # Exact per-(gaussian, tile) culling: the blend zeroes any
        # alpha = opa * exp(-q) below alpha_min, so an entry whose *maximum*
        # alpha over the tile's pixel box provably stays below alpha_min
        # contributes nothing (color, transmittance, or n_touched) and can be
        # dropped here bit-exactly. The loose radius box enumerates ~4/pi x
        # more tiles than the ellipse covers (far more for anisotropic
        # splats), and blend cost is linear in per-tile occupancy, so this is
        # the cheapest big blend speedup. max alpha = opa * exp(-q_min) with
        # q_min = min over the box of the conic quadratic: 0 if the mean is
        # inside, else the min over the four edges (1D quadratics, critical
        # point clamped). The box is pre-expanded by `dilate` so reuse across
        # tracking iterations stays conservative for mean drift; a constant
        # slack absorbs the (second-order) conic drift.
        con = jax.lax.stop_gradient(proj.conic)[order]
        opa = jax.lax.stop_gradient(proj.opacity)[order]
        bx0 = (txk * tw).astype(jnp.float32) - dilate
        bx1 = (txk * tw + (tw - 1)).astype(jnp.float32) + dilate
        by0 = (tyk * th).astype(jnp.float32) - dilate
        by1 = (tyk * th + (th - 1)).astype(jnp.float32) + dilate
        dx0 = bx0 - m[:, 0:1]
        dx1 = bx1 - m[:, 0:1]
        dy0 = by0 - m[:, 1:2]
        dy1 = by1 - m[:, 1:2]
        ca = con[:, 0:1]
        cb = con[:, 1:2]
        cc = con[:, 2:3]

        def q(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        ca_s = jnp.maximum(ca, 1e-12)
        cc_s = jnp.maximum(cc, 1e-12)
        q_edges = jnp.minimum(
            jnp.minimum(
                q(dx0, jnp.clip(-cb * dx0 / cc_s, dy0, dy1)),
                q(dx1, jnp.clip(-cb * dx1 / cc_s, dy0, dy1)),
            ),
            jnp.minimum(
                q(jnp.clip(-cb * dy0 / ca_s, dx0, dx1), dy0),
                q(jnp.clip(-cb * dy1 / ca_s, dx0, dx1), dy1),
            ),
        )
        inside = (dx0 <= 0.0) & (dx1 >= 0.0) & (dy0 <= 0.0) & (dy1 >= 0.0)
        q_min = jnp.where(inside, 0.0, q_edges)
        q_thresh = jnp.log(jnp.maximum(opa, 1e-12) / config.alpha_min)[:, None]
        # slack under reuse: e^1 ~ 2.7x alpha headroom absorbs conic AND
        # opacity drift while a binning is reused across iterations
        slack = jnp.where(jnp.asarray(dilate) > 0, 1.0, 0.0)
        tid = jnp.where(q_min <= q_thresh + slack, tid, n_tiles)
    nk = n * config.k_dup

    # stable sort entries by tile id; payload = entry id. When
    # bits(tile) + bits(entry) fit an int32, pack both into ONE key
    # (tid in the high bits, eid in the low bits): a single-array sort is
    # ~2x the throughput of the two-array variant on TPU, and stability
    # w.r.t. eid is implied by eid being strictly increasing.
    eid = jnp.arange(nk, dtype=jnp.int32)
    eid_bits = max((nk - 1).bit_length(), 1)
    tid_bits = (n_tiles).bit_length()  # sentinel value n_tiles included
    if eid_bits + tid_bits <= 31:
        packed = jnp.sort((tid.reshape(-1) << eid_bits) | eid)
        sorted_tid = packed >> eid_bits
        sorted_eid = packed & ((1 << eid_bits) - 1)
    else:
        sorted_tid, sorted_eid = jax.lax.sort(
            (tid.reshape(-1), eid), num_keys=1, is_stable=True
        )
    # per-tile segments
    starts = jnp.searchsorted(
        sorted_tid, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, l_max).astype(jnp.int32)
    tile_overflow = jnp.maximum(seg_len - l_max, 0).sum().astype(jnp.int32)

    # flat table slot for each SORTED position
    pos = jnp.arange(nk, dtype=jnp.int32)
    rank = pos - starts[jnp.clip(sorted_tid, 0, n_tiles - 1)]
    in_table = (sorted_tid < n_tiles) & (rank < l_max)
    slot_at_pos = jnp.where(in_table, sorted_tid * l_max + rank, n_tiles * l_max)

    # idx_table by gather: table slot (t, l) -> original Gaussian id
    offs = jnp.arange(l_max, dtype=jnp.int32)
    gpos = starts[:-1, None] + offs[None, :]  # (T, L) sorted positions
    in_seg = offs[None, :] < counts[:, None]
    sorted_j = sorted_eid // config.k_dup  # depth-sorted gaussian per entry
    idx_sorted_space = jnp.where(
        in_seg, sorted_j[jnp.clip(gpos, 0, nk - 1)], n
    )
    order_pad = jnp.concatenate([order, jnp.array([n], jnp.int32)])
    idx_table = order_pad[idx_sorted_space]  # original ids; sentinel n

    # pos_table: second sort recovers each entry's sorted position
    _, pos_of_entry = jax.lax.sort((sorted_eid, pos), num_keys=1)
    slot_of_entry = slot_at_pos[pos_of_entry]  # (NK,) entry -> flat slot
    pos_table_sorted = slot_of_entry.reshape(n, config.k_dup)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    pos_table = pos_table_sorted[inv_order]  # rows in original gaussian order

    return Binning(idx_table, pos_table, counts, dup_overflow, tile_overflow)


def compact_binning(binning: Binning, n: int, m: int):
    """Compact a binning to the <= `m` Gaussians that actually have tile
    entries, remapping both index tables to compact ids.

    Per-iteration tracking cost scales with the ROW COUNT the projection
    and gather run over — the capacity tier (tens of thousands of rows) —
    while the set with any tile entry after tight culling is far smaller
    (VERDICT r2 weak #3). Callers gather `params[sel]` once per rebin and
    run every iteration of the reuse window on the compact rows.

    Returns `(sel, binning_c, n_dropped)`:
      sel       (m,) int32 original Gaussian ids, fill value `n` past the
                working set (callers clip for the gather and mask active),
      binning_c tables in compact id space — idx_table sentinel becomes
                `m`, pos_table rows reordered to compact order,
      n_dropped () int32 — Gaussians WITH entries that did not fit in `m`.
                Their idx_table entries remap to the sentinel and blend as
                zero-props (zero alpha) rows; bit-exact vs the full render
                whenever n_dropped == 0 (same entries, same depth order).
    """
    t, l = binning.idx_table.shape
    flat_slots = t * l
    k = binning.pos_table.shape[1]
    has_entry = (binning.pos_table < flat_slots).any(axis=1)
    sel = jnp.nonzero(has_entry, size=m, fill_value=n)[0].astype(jnp.int32)
    n_dropped = (
        jnp.maximum(has_entry.sum(dtype=jnp.int32) - m, 0)
    ).astype(jnp.int32)
    new_id = jnp.full((n + 1,), m, jnp.int32)
    new_id = new_id.at[sel].set(jnp.arange(m, dtype=jnp.int32))
    new_id = new_id.at[n].set(m)  # sentinel row (fill writes land here)
    idx_table_c = new_id[binning.idx_table]
    pos_pad = jnp.concatenate(
        [binning.pos_table, jnp.full((1, k), flat_slots, jnp.int32)], axis=0
    )
    pos_table_c = pos_pad[sel]  # fill rows -> dummy slot (zero cotangent)
    binning_c = Binning(
        idx_table_c,
        pos_table_c,
        binning.counts,
        binning.dup_overflow,
        binning.tile_overflow,
    )
    return sel, binning_c, n_dropped


# ---------------------------------------------------------------------------
# scatter-free differentiable tile gather


@jax.custom_vjp
def _tile_gather(props_pad: jnp.ndarray, idx_table: jnp.ndarray, pos_table: jnp.ndarray):
    """props_pad (N+1, D) -> (T, L, D) via idx_table; pos_table is its exact
    inverse so the VJP is a gather + sum over K (no scatter)."""
    return props_pad[idx_table]


def _tile_gather_fwd(props_pad, idx_table, pos_table):
    return props_pad[idx_table], (idx_table.shape, pos_table)


def _tile_gather_bwd(res, g):
    (t, l), pos_table = res
    d = g.shape[-1]
    g_flat = jnp.concatenate(
        [g.reshape(t * l, d), jnp.zeros((1, d), g.dtype)], axis=0
    )
    per_entry = g_flat[jnp.clip(pos_table, 0, t * l)]  # (N, K, D)
    d_props = per_entry.sum(axis=1)  # (N, D)
    d_props = jnp.concatenate([d_props, jnp.zeros((1, d), g.dtype)], axis=0)
    return d_props, None, None


_tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


# ---------------------------------------------------------------------------


def render_binned(
    proj: ProjectedGaussians,
    means2d: jnp.ndarray,
    binning: Binning,
    intr: Intrinsics,
    bg_color: jnp.ndarray,
    config: RasterConfig,
    need_touched: bool,
    tile_mask: jnp.ndarray | None = None,
) -> RenderOutput:
    """Composite with a prebuilt binning. Differentiable w.r.t. projection.

    `tile_mask` (n_tiles,) bool: tiles whose pixels are entirely excluded by
    the caller's loss mask render as background at ~zero cost (their entry
    count is zeroed, so the blend kernel skips every chunk) — bit-exact for
    any loss that is masked to the same pixels. Used by the tracking loop,
    whose loss is gated on the Scharr edge mask everywhere."""
    tw, th = tile_wh(config)
    tx_n, ty_n, n_tiles = _grid_dims(intr, tw, th)
    h, w = intr.height, intr.width
    n = means2d.shape[0]
    l_max = config.max_per_tile
    if tile_mask is not None:
        binning = binning._replace(
            counts=jnp.where(tile_mask, binning.counts, 0)
        )

    props = jnp.concatenate(
        [
            means2d,
            proj.conic,
            proj.color,
            proj.opacity[:, None],
            proj.depth[:, None],
        ],
        axis=-1,
    )  # (N, 10)
    props_pad = jnp.concatenate([props, jnp.zeros((1, 10), props.dtype)], axis=0)
    t_props = _tile_gather(props_pad, binning.idx_table, binning.pos_table)

    if config.use_pallas:
        if need_touched:
            color_t, depth_t, alpha_t, touch = blend_tiles_pallas_touch(
                t_props,
                binning.counts,
                tx_n,
                (tw, th),
                config.alpha_clamp,
                config.alpha_min,
                config.transmittance_min,
            )
        else:
            color_t, depth_t, alpha_t = blend_tiles_pallas(
                t_props,
                binning.counts,
                tx_n,
                (tw, th),
                config.alpha_clamp,
                config.alpha_min,
                config.transmittance_min,
            )
            touch = jnp.zeros((n_tiles, l_max), jnp.int32)
        colors = jnp.swapaxes(color_t, 1, 2)  # (T, P, 3)
        depths, alphas = depth_t, alpha_t
        colors = colors + (1.0 - alphas[..., None]) * bg_color
    else:
        colors, depths, alphas, touch = _blend_xla(
            t_props, config, (tw, th), tx_n, n_tiles, bg_color
        )

    def tiles_to_image(x):
        c = x.shape[3:]  # x: (n_tiles, tile_h, tile_w, *c)
        img = x.reshape((ty_n, tx_n, th, tw) + c)
        img = jnp.moveaxis(img, 2, 1).reshape((ty_n * th, tx_n * tw) + c)
        return img[:h, :w]

    color_img = tiles_to_image(colors.reshape(n_tiles, th, tw, 3))
    depth_img = tiles_to_image(depths.reshape(n_tiles, th, tw))
    alpha_img = tiles_to_image(alphas.reshape(n_tiles, th, tw))

    if need_touched:
        cnt = jnp.zeros((n + 1,), jnp.int32).at[binning.idx_table.reshape(-1)].add(
            touch.reshape(-1).astype(jnp.int32)
        )
        n_touched = cnt[:n]
    else:
        n_touched = jnp.zeros((n,), jnp.int32)

    return RenderOutput(
        color=color_img,
        depth=depth_img,
        alpha=alpha_img,
        n_touched=n_touched,
        radii=proj.radii,
        visible=proj.radii > 0.0,
        dup_overflow=binning.dup_overflow,
        tile_overflow=binning.tile_overflow,
    )


def render_tiled(
    params: GaussianParams,
    active: jnp.ndarray,
    T_w2c: jnp.ndarray,
    intr: Intrinsics,
    sh_degree: int,
    bg_color: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
    means2d_probe: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    isotropic: bool = False,
    need_touched: bool = True,
    binning: Binning | None = None,
) -> RenderOutput:
    """Project + bin + composite (rebinning every call unless one is given)."""
    proj = project_gaussians(
        params, active, T_w2c, intr, sh_degree, scale_modifier, isotropic
    )
    means2d = proj.means2d
    if means2d_probe is not None:
        means2d = means2d + means2d_probe
    if bg_color is None:
        bg_color = jnp.zeros((3,), means2d.dtype)
    if binning is None:
        binning = build_binning(proj, intr, config)
    return render_binned(
        proj, means2d, binning, intr, bg_color, config, need_touched
    )


def render_median_depth(
    params: GaussianParams,
    active: jnp.ndarray,
    T_w2c: jnp.ndarray,
    intr: Intrinsics,
    config: RasterConfig = RasterConfig(),
) -> jnp.ndarray:
    """Per-pixel MEDIAN depth: the z of the gaussian where the cumulative
    blend weight first crosses half the pixel's total weight.

    Offline utility (sensor-style GT depth for fixture/synthetic data
    generation) — NOT part of the SLAM hot path. The alpha-normalized
    EXPECTED depth (RenderOutput.depth / alpha) blends depths across
    silhouettes: a pixel half-covered by a near surface over a far one
    reports a depth on neither surface, and back-projecting such maps at
    keyframe insertion plants gaussians in free space (the suspected
    mechanism behind the 10x fixture-vs-analytic ATE gap, BASELINE.md).
    The median estimator instead returns the depth of an actual
    contributing gaussian — the same spirit as a depth sensor measuring
    the first surface (real TUM depth) and the reference's per-patch
    median pseudo-depth (/root/reference/utils/slam_frontend.py:63-104).
    Pixels with zero accumulated weight return 0 (no-hit convention)."""
    proj = project_gaussians(params, active, T_w2c, intr, 0)
    binning = build_binning(proj, intr, config)
    tw, th = tile_wh(config)
    tx_n, ty_n, n_tiles = _grid_dims(intr, tw, th)
    h, w = intr.height, intr.width

    props = jnp.concatenate(
        [
            proj.means2d,
            proj.conic,
            proj.color,
            proj.opacity[:, None],
            proj.depth[:, None],
        ],
        axis=-1,
    )
    props_pad = jnp.concatenate([props, jnp.zeros((1, 10), props.dtype)], axis=0)
    t_props = _tile_gather(props_pad, binning.idx_table, binning.pos_table)

    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    origins = jnp.stack(
        [(t_ids % tx_n) * tw, (t_ids // tx_n) * th], axis=-1
    ).astype(jnp.float32)
    ly, lx = jnp.meshgrid(
        jnp.arange(th, dtype=jnp.float32),
        jnp.arange(tw, dtype=jnp.float32),
        indexing="ij",
    )
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1)

    def one_tile(props_t, origin):
        pix = origin[None, :] + local  # (P, 2)
        mu, con = props_t[:, 0:2], props_t[:, 2:5]
        opa, z = props_t[:, 8], props_t[:, 9]
        dx = pix[None, :, 0] - mu[:, None, 0]  # (L, P)
        dy = pix[None, :, 1] - mu[:, None, 1]
        power = (
            -0.5 * (con[:, None, 0] * dx * dx + con[:, None, 2] * dy * dy)
            - con[:, None, 1] * dx * dy
        )
        alpha = jnp.minimum(config.alpha_clamp, opa[:, None] * jnp.exp(power))
        alpha = jnp.where((power > 0.0) | (alpha < config.alpha_min), 0.0, alpha)
        log_om = jnp.log1p(-alpha)
        t_in = jnp.exp(jnp.cumsum(log_om, axis=0) - log_om)
        wgt = jnp.where(t_in >= config.transmittance_min, alpha * t_in, 0.0)
        cum = jnp.cumsum(wgt, axis=0)  # (L, P) depth-ordered (binning sorts)
        total = cum[-1]
        crossed = cum >= 0.5 * total[None, :]
        first = jnp.argmax(crossed, axis=0)  # (P,)
        dep = jnp.take_along_axis(
            jnp.broadcast_to(z[:, None], wgt.shape), first[None, :], axis=0
        )[0]
        return jnp.where(total > 1e-6, dep, 0.0)

    # lax.map passes the zipped leaves as ONE pytree argument
    depths = jax.lax.map(lambda a: one_tile(*a), (t_props, origins))  # (T, P)
    img = depths.reshape((ty_n, tx_n, th, tw))
    img = jnp.moveaxis(img, 2, 1).reshape((ty_n * th, tx_n * tw))
    return img[:h, :w]


def _blend_xla(t_props, config, tile, tx_n, n_tiles, bg_color):
    """Dense XLA blend (emits n_touched); the Pallas kernel is the hot path."""
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    p = tw * th
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    origins = jnp.stack(
        [(t_ids % tx_n) * tw, (t_ids // tx_n) * th], axis=-1
    ).astype(jnp.float32)
    ly, lx = jnp.meshgrid(
        jnp.arange(th, dtype=jnp.float32),
        jnp.arange(tw, dtype=jnp.float32),
        indexing="ij",
    )
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1)  # (P, 2)
    pix = origins[:, None, :] + local[None, :, :]  # (T, P, 2)

    tg = config.tile_group
    n_groups = -(-n_tiles // tg)
    pad_t = n_groups * tg - n_tiles

    def padg(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_t,) + x.shape[1:], x.dtype)], axis=0
        ).reshape((n_groups, tg) + x.shape[1:])

    blend = functools.partial(
        _blend_group,
        alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min,
        t_min=config.transmittance_min,
        bg=bg_color,
    )
    colors, depths, alphas, touch = jax.lax.map(
        jax.checkpoint(lambda a: blend(*a)),
        (
            padg(t_props[..., 0:2]),
            padg(t_props[..., 2:5]),
            padg(t_props[..., 5:8]),
            padg(t_props[..., 8]),
            padg(t_props[..., 9]),
            padg(pix),
        ),
    )
    l_max = t_props.shape[1]
    colors = colors.reshape(n_groups * tg, p, 3)[:n_tiles]
    depths = depths.reshape(n_groups * tg, p)[:n_tiles]
    alphas = alphas.reshape(n_groups * tg, p)[:n_tiles]
    touch = touch.reshape(n_groups * tg, l_max)[:n_tiles]
    return colors, depths, alphas, touch


def _blend_group(mu, con, col, opa, z, pix, *, alpha_clamp, alpha_min, t_min, bg):
    """Alpha-composite one group of tiles.

    mu/con/col: (Tg, L, 2|3), opa/z: (Tg, L), pix: (Tg, P, 2).
    Returns color (Tg, P, 3), depth (Tg, P), alpha (Tg, P), touch (Tg, L).
    """
    dx = pix[:, None, :, 0] - mu[:, :, None, 0]  # (Tg, L, P)
    dy = pix[:, None, :, 1] - mu[:, :, None, 1]
    power = (
        -0.5 * (con[:, :, None, 0] * dx * dx + con[:, :, None, 2] * dy * dy)
        - con[:, :, None, 1] * dx * dy
    )
    alpha = jnp.minimum(alpha_clamp, opa[:, :, None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)

    log_om = jnp.log1p(-alpha)
    log_t_incl = jnp.cumsum(log_om, axis=1)
    t_in = jnp.exp(log_t_incl - log_om)  # exclusive transmittance
    contributing = t_in >= t_min
    wgt = jnp.where(contributing, alpha * t_in, 0.0)

    color = jnp.einsum("tlp,tlc->tpc", wgt, col)
    depth = jnp.einsum("tlp,tl->tp", wgt, z)
    alpha_out = wgt.sum(axis=1)
    color = color + (1.0 - alpha_out[..., None]) * bg
    touch = ((alpha >= alpha_min) & contributing).sum(axis=2).astype(jnp.int32)
    return color, depth, alpha_out, touch
