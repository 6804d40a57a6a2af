"""Tile-binned differentiable rasterizer — the production forward/backward.

TPU-first redesign of the CUDA tile rasterizer (upstream
diff-gaussian-rasterization-w-pose; interface reconstructed in SURVEY.md
§2.9). Instead of CUB radix-sorted (tile, depth) keys and per-pixel warp
loops, the pipeline is:

  1. project + cull (ops/project.py, differentiable incl. pose),
  2. one global depth argsort of the N Gaussians,
  3. duplicate each Gaussian into <= k_dup (tile) entries, stable-sort the
     N*k_dup entries by tile id (stability preserves depth order in-tile),
  4. per-tile segment table built by GATHER from the sorted entries
     (searchsorted starts + in-segment offsets; no scatter — scatters
     serialize on TPU),
  5. per-tile front-to-back alpha compositing:
       - hot path: the Pallas kernel (ops/blend_pallas.py) with a custom
         VJP — transmittance carried in registers, no (T, L, P) tensors;
       - fallback / visibility path: dense XLA blend that also emits
         n_touched (used for final renders that feed the keyframe policy).

Everything is jit-compatible with static shapes and differentiable end to
end (gather/scatter indices are integer side-paths). SE(3) pose gradients
flow through `T_w2c`; densification gradients are harvested via
`means2d_probe` (the reference's screenspace_points trick,
gaussian_renderer/__init__.py:43-52).

Capacity overflows (k_dup truncation, per-tile list overflow) are counted
and returned as telemetry, never silent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.camera import Intrinsics
from ..models.gaussians import GaussianParams
from .blend_pallas import blend_tiles_pallas
from .project import project_gaussians
from .raster_types import RasterConfig, RenderOutput


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
) -> RenderOutput:
    proj = project_gaussians(
        params, active, T_w2c, intr, sh_degree, scale_modifier, isotropic
    )
    means2d = proj.means2d
    if means2d_probe is not None:
        means2d = means2d + means2d_probe

    n = means2d.shape[0]
    h, w = intr.height, intr.width
    tile = config.tile
    tx_n = -(-w // tile)
    ty_n = -(-h // tile)
    n_tiles = tx_n * ty_n
    l_max = config.max_per_tile
    if bg_color is None:
        bg_color = jnp.zeros((3,), means2d.dtype)

    # ---- 1 global depth order --------------------------------------------
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    mu = means2d[order]
    con = proj.conic[order]
    col = proj.color[order]
    opa = proj.opacity[order]
    z = proj.depth[order]
    rad = proj.radii[order]
    val = proj.valid[order]

    # ---- 2 tile spans + duplicated entries --------------------------------
    m = jax.lax.stop_gradient(mu)
    r = jax.lax.stop_gradient(rad)
    tx0 = jnp.clip(jnp.floor((m[:, 0] - r) / tile), 0, tx_n - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((m[:, 0] + r) / tile), 0, tx_n - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((m[:, 1] - r) / tile), 0, ty_n - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((m[:, 1] + r) / tile), 0, ty_n - 1).astype(jnp.int32)
    wrect = tx1 - tx0 + 1
    span = wrect * (ty1 - ty0 + 1)
    span_cap = jnp.minimum(span, config.k_dup)
    dup_overflow = jnp.where(val, span - span_cap, 0).sum().astype(jnp.int32)

    ks = jnp.arange(config.k_dup, dtype=jnp.int32)
    within = (ks[None, :] < span_cap[:, None]) & val[:, None]
    tyk = ty0[:, None] + ks[None, :] // wrect[:, None]
    txk = tx0[:, None] + ks[None, :] % wrect[:, None]
    tid = jnp.where(within, tyk * tx_n + txk, n_tiles)  # (N, K); sentinel last
    gidx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], tid.shape
    )  # index into depth-sorted arrays

    flat_tid = tid.reshape(-1)
    flat_gidx = gidx.reshape(-1)
    nk = flat_tid.shape[0]

    # ---- 3 stable sort by tile id (preserves in-tile depth order) ---------
    sorted_tid, sorted_gidx = jax.lax.sort(
        (flat_tid, flat_gidx), num_keys=1, is_stable=True
    )

    # ---- 4 per-tile segment table by gather -------------------------------
    starts = jnp.searchsorted(
        sorted_tid, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    )  # (T+1,)
    seg_len = starts[1:] - starts[:-1]  # (T,)
    counts = jnp.minimum(seg_len, l_max).astype(jnp.int32)
    tile_overflow = jnp.maximum(seg_len - l_max, 0).sum().astype(jnp.int32)

    offs = jnp.arange(l_max, dtype=jnp.int32)
    pos = starts[:-1, None] + offs[None, :]  # (T, L)
    in_seg = offs[None, :] < counts[:, None]
    idx_table = jnp.where(
        in_seg, sorted_gidx[jnp.clip(pos, 0, nk - 1)], n
    )  # sentinel row n

    # ---- 5 gather per-tile properties (sentinel row n => alpha 0) ---------
    props = jnp.concatenate(
        [mu, con, col, opa[:, None], z[:, None]], axis=-1
    )  # (N, 10)
    props = jnp.concatenate([props, jnp.zeros((1, 10), props.dtype)], axis=0)
    t_props = props[idx_table]  # (T, L, 10)

    use_pallas = config.use_pallas and not need_touched
    if use_pallas:
        color_t, depth_t, alpha_t = blend_tiles_pallas(
            t_props,
            counts,
            tx_n,
            tile,
            config.alpha_clamp,
            config.alpha_min,
            config.transmittance_min,
        )  # (T, 3, P), (T, P), (T, P)
        colors = jnp.swapaxes(color_t, 1, 2)  # (T, P, 3)
        depths, alphas = depth_t, alpha_t
        colors = colors + (1.0 - alphas[..., None]) * bg_color
        touch = jnp.zeros((n_tiles, l_max), jnp.int32)
    else:
        colors, depths, alphas, touch = _blend_xla(
            t_props, config, tile, tx_n, n_tiles, bg_color
        )

    p = tile * tile

    def tiles_to_image(x):
        c = x.shape[3:]  # x: (n_tiles, tile, tile, *c)
        img = x.reshape((ty_n, tx_n, tile, tile) + c)
        img = jnp.moveaxis(img, 2, 1).reshape((ty_n * tile, tx_n * tile) + c)
        return img[:h, :w]

    color_img = tiles_to_image(colors.reshape(n_tiles, tile, tile, 3))
    depth_img = tiles_to_image(depths.reshape(n_tiles, tile, tile))
    alpha_img = tiles_to_image(alphas.reshape(n_tiles, tile, tile))

    # ---- n_touched back to original Gaussian order -------------------------
    if need_touched:
        cnt = jnp.zeros((n + 1,), jnp.int32).at[idx_table.reshape(-1)].add(
            touch.reshape(-1).astype(jnp.int32)
        )
        n_touched = jnp.zeros((n,), jnp.int32).at[order].set(cnt[:n])
    else:
        n_touched = jnp.zeros((n,), jnp.int32)

    return RenderOutput(
        color=color_img,
        depth=depth_img,
        alpha=alpha_img,
        n_touched=n_touched,
        radii=proj.radii,
        visible=proj.radii > 0.0,
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )


def _blend_xla(t_props, config, tile, tx_n, n_tiles, bg_color):
    """Dense XLA blend (emits n_touched); the Pallas kernel is the hot path."""
    p = tile * tile
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    origins = jnp.stack(
        [(t_ids % tx_n) * tile, (t_ids // tx_n) * tile], axis=-1
    ).astype(jnp.float32)
    ly, lx = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32),
        jnp.arange(tile, dtype=jnp.float32),
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
