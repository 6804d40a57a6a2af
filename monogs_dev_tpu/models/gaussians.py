"""Fixed-capacity Gaussian map with pure-functional state surgery.

The reference grows/shrinks torch tensors and surgically edits Adam moments
on every densify/prune (/root/reference/gaussian_splatting/scene/
gaussian_model.py:468-555). Under XLA's static shapes we instead keep
fixed-capacity SoA arrays with an `active` mask:

  - insertion  = scatter into free slots, zeroing the Adam moments there
                 (exactly the reference's zero-padding semantics,
                 gaussian_model.py:523-555);
  - prune      = clear mask + zero rows (row removal semantics,
                 gaussian_model.py:483-521);
  - clone/split= budgeted top-k selection + scatter of sampled children
                 (gaussian_model.py:593-672).

Everything here is jit-compatible with static shapes; budget overflows are
counted and surfaced as telemetry rather than crashing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.sh import num_sh_coeffs

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # reference training_setup uses eps=1e-15 (gaussian_model.py:245-294)


class GaussianParams(NamedTuple):
    """SoA optimizable parameters; leading dim = capacity C (or batch M)."""

    xyz: jnp.ndarray  # (C, 3)
    f_dc: jnp.ndarray  # (C, 1, 3) SH DC coefficients
    f_rest: jnp.ndarray  # (C, R, 3) higher-order SH (R = K-1, possibly 0)
    log_scales: jnp.ndarray  # (C, 3)
    quats: jnp.ndarray  # (C, 4) (w, x, y, z), normalized on use
    opacity_logit: jnp.ndarray  # (C,)


class MapAux(NamedTuple):
    """Non-optimized bookkeeping mirrored from the reference GaussianModel."""

    active: jnp.ndarray  # (C,) bool
    n_obs: jnp.ndarray  # (C,) int32 — visibility observation counts
    kf_id: jnp.ndarray  # (C,) int32 — keyframe that created each Gaussian
    grad_accum: jnp.ndarray  # (C,) f32 — sum ||dL/dmeans2d||
    denom: jnp.ndarray  # (C,) f32
    max_radii: jnp.ndarray  # (C,) f32 — max 2D radius seen


class AdamMoments(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # () int32 — global step (matches torch per-tensor step)


class GaussianMap(NamedTuple):
    params: GaussianParams
    aux: MapAux
    moments: AdamMoments


def create_map(capacity: int, sh_degree: int, dtype=jnp.float32) -> GaussianMap:
    k = num_sh_coeffs(sh_degree)
    params = GaussianParams(
        xyz=jnp.zeros((capacity, 3), dtype),
        f_dc=jnp.zeros((capacity, 1, 3), dtype),
        f_rest=jnp.zeros((capacity, max(k - 1, 0), 3), dtype),
        log_scales=jnp.full((capacity, 3), -10.0, dtype),
        quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], dtype), (capacity, 1)),
        opacity_logit=jnp.full((capacity,), -10.0, dtype),
    )
    aux = MapAux(
        active=jnp.zeros((capacity,), bool),
        n_obs=jnp.zeros((capacity,), jnp.int32),
        kf_id=jnp.full((capacity,), -1, jnp.int32),
        grad_accum=jnp.zeros((capacity,), dtype),
        denom=jnp.zeros((capacity,), dtype),
        max_radii=jnp.zeros((capacity,), dtype),
    )
    # distinct arrays for mu/nu so buffer donation never sees aliases
    moments = AdamMoments(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )
    return GaussianMap(params, aux, moments)


def sh_degree_of(params: GaussianParams) -> int:
    """Recover the SH degree from the f_rest leaf shape."""
    return {0: 0, 3: 1, 8: 2, 15: 3}[params.f_rest.shape[1]]


def _map_rows(gmap: GaussianMap) -> int:
    return gmap.aux.active.shape[0]


@functools.partial(jax.jit, static_argnames=("rows",))
def resize_map(gmap: GaussianMap, rows: int) -> GaussianMap:
    """Change the map's static row count (the mapping capacity tier).

    Growing pads with the `create_map` inactive defaults; shrinking slices
    the row prefix (the caller guarantees every active row is inside it —
    see `compact_map`). The reference has no analog: its torch tensors grow
    unboundedly (gaussian_model.py:523-555); under XLA static shapes the
    row count is a compile-time constant, and every per-iteration mapping
    cost (projection, binning sort keys, Adam, densify top-k) scales with
    it, so the tier tracks the alive count instead of the worst case."""
    cur = _map_rows(gmap)
    if rows == cur:
        return gmap
    if rows < cur:
        def cut(x):
            return x[:rows]

        return GaussianMap(
            jax.tree.map(cut, gmap.params),
            jax.tree.map(cut, gmap.aux),
            AdamMoments(
                jax.tree.map(cut, gmap.moments.mu),
                jax.tree.map(cut, gmap.moments.nu),
                gmap.moments.count,
            ),
        )
    base = create_map(rows, sh_degree_of(gmap.params), gmap.params.xyz.dtype)

    def put(big, small):
        return jax.lax.dynamic_update_slice(big, small, (0,) * big.ndim)

    return GaussianMap(
        jax.tree.map(put, base.params, gmap.params),
        jax.tree.map(put, base.aux, gmap.aux),
        AdamMoments(
            jax.tree.map(put, base.moments.mu, gmap.moments.mu),
            jax.tree.map(put, base.moments.nu, gmap.moments.nu),
            gmap.moments.count,
        ),
    )


@functools.partial(jax.jit, static_argnames=("rows",))
def compact_map(
    gmap: GaussianMap, rows: int
) -> Tuple[GaussianMap, jnp.ndarray]:
    """Stable-partition active rows to the front, then resize to `rows`.

    Returns (map, perm) with perm over the ORIGINAL row count: row i of the
    compacted map is old row perm[i]. The caller must apply the same
    permutation to any host-side per-row vectors (occ-aware visibility) and
    guarantee n_active <= rows (rows past the cut are dropped)."""
    c = _map_rows(gmap)
    order = jnp.arange(c, dtype=jnp.int32)
    perm = jnp.argsort(jnp.where(gmap.aux.active, order, order + c))

    def take(x):
        return x[perm]

    packed = GaussianMap(
        jax.tree.map(take, gmap.params),
        jax.tree.map(take, gmap.aux),
        AdamMoments(
            jax.tree.map(take, gmap.moments.mu),
            jax.tree.map(take, gmap.moments.nu),
            gmap.moments.count,
        ),
    )
    return resize_map(packed, rows), perm


def activations(params: GaussianParams):
    """(scales, quats_normalized, opacity) activations (gaussian_model.py:53-74)."""
    scales = jnp.exp(params.log_scales)
    quats = params.quats / jnp.maximum(
        jnp.linalg.norm(params.quats, axis=-1, keepdims=True), 1e-12
    )
    opacity = jax.nn.sigmoid(params.opacity_logit)
    return scales, quats, opacity


def build_rotation(quats: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation (general_utils.py:113-136)."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def exponential_lr(
    step: jnp.ndarray,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> jnp.ndarray:
    """Log-linear LR interpolation with optional sine delay ramp
    (general_utils.py:79-94)."""
    step_f = step.astype(jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step_f / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step_f / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return delay * log_lerp


# ---------------------------------------------------------------------------
# Adam with row masking (the state-surgery-compatible optimizer)


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    moments: AdamMoments,
    lrs: GaussianParams,
    active: jnp.ndarray,
) -> Tuple[GaussianParams, AdamMoments]:
    """One masked Adam step. `lrs` holds one scalar LR per parameter leaf.

    Inactive rows receive no update (their rows were zeroed on prune, matching
    the reference's row removal)."""
    count = moments.count + 1
    c1 = 1.0 - ADAM_B1 ** count.astype(jnp.float32)
    c2 = 1.0 - ADAM_B2 ** count.astype(jnp.float32)

    def upd(p, g, mu, nu, lr):
        mu = ADAM_B1 * mu + (1.0 - ADAM_B1) * g
        nu = ADAM_B2 * nu + (1.0 - ADAM_B2) * g * g
        step = lr * (mu / c1) / (jnp.sqrt(nu / c2) + ADAM_EPS)
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        return p - step * mask, mu, nu

    new_p, new_mu, new_nu = [], [], []
    for p, g, mu, nu, lr in zip(params, grads, moments.mu, moments.nu, lrs):
        if p.shape[1:] == (0, 3):  # degenerate f_rest at sh_degree 0
            new_p.append(p)
            new_mu.append(mu)
            new_nu.append(nu)
            continue
        np_, nmu, nnu = upd(p, g, mu, nu, lr)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)
    return (
        GaussianParams(*new_p),
        AdamMoments(GaussianParams(*new_mu), GaussianParams(*new_nu), count),
    )


# ---------------------------------------------------------------------------
# insertion


def _free_slot_table(active: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (slots, n_free): slots[r] = index of the r-th free row."""
    c = active.shape[0]
    free = ~active
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    pos = jnp.where(free, rank, c)  # out-of-range rows dropped by scatter
    slots = jnp.full((c,), c, jnp.int32).at[pos].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop"
    )
    return slots, free.sum()


def insert_points(
    gmap: GaussianMap,
    new_params: GaussianParams,
    valid: jnp.ndarray,
    kf_id,
) -> Tuple[GaussianMap, jnp.ndarray]:
    """Scatter a batch of new Gaussians into free rows.

    Equivalent to `cat_tensors_to_optimizer` + `extend_from_pcd`
    (gaussian_model.py:208-233,523-555): new rows join the live optimizer with
    zeroed Adam moments. Returns (new_map, n_dropped) where n_dropped counts
    valid points that found no free slot (capacity overflow telemetry).
    """
    c = gmap.aux.active.shape[0]
    slots, n_free = _free_slot_table(gmap.aux.active)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    ok = valid & (rank < n_free)
    target = jnp.where(ok, slots[jnp.clip(rank, 0, c - 1)], c)  # c => dropped

    def scat(dst, src):
        return dst.at[target].set(src, mode="drop")

    params = jax.tree.map(scat, gmap.params, new_params)
    zero_like = jax.tree.map(jnp.zeros_like, new_params)
    mu = jax.tree.map(scat, gmap.moments.mu, zero_like)
    nu = jax.tree.map(scat, gmap.moments.nu, zero_like)
    m = ok
    aux = MapAux(
        active=gmap.aux.active.at[target].set(m, mode="drop"),
        n_obs=gmap.aux.n_obs.at[target].set(0, mode="drop"),
        kf_id=gmap.aux.kf_id.at[target].set(
            jnp.where(m, jnp.int32(kf_id), -1), mode="drop"
        ),
        grad_accum=gmap.aux.grad_accum.at[target].set(0.0, mode="drop"),
        denom=gmap.aux.denom.at[target].set(0.0, mode="drop"),
        max_radii=gmap.aux.max_radii.at[target].set(0.0, mode="drop"),
    )
    n_dropped = (valid & ~ok).sum()
    return GaussianMap(params, aux, AdamMoments(mu, nu, gmap.moments.count)), n_dropped


def insert_points_evict(
    gmap: GaussianMap,
    new_params: GaussianParams,
    valid: jnp.ndarray,
    kf_id,
) -> Tuple[GaussianMap, jnp.ndarray, jnp.ndarray]:
    """Dispatch-boundary shim: strong-typed kf_id so every caller (prewarm,
    backend, tests) shares one jit cache entry (core/mapping.py
    mapping_iterations docstring documents the failure mode)."""
    return _insert_points_evict_jit(
        gmap, new_params, jnp.asarray(valid, bool), jnp.asarray(kf_id, jnp.int32)
    )


@jax.jit
def _insert_points_evict_jit(
    gmap: GaussianMap,
    new_params: GaussianParams,
    valid: jnp.ndarray,
    kf_id,
) -> Tuple[GaussianMap, jnp.ndarray, jnp.ndarray]:
    """`insert_points` with capacity-pressure eviction for keyframe inserts.

    The reference's tensors grow without bound (cat_tensors_to_optimizer);
    a fixed-capacity TPU map that silently DROPS keyframe inserts when full
    starves new scene regions of geometry — measured on the mono bench: the
    map pegged capacity, whole keyframes' points were dropped, and the
    init-BA left an unrenderable sparse map. Under pressure this evicts the
    lowest-opacity active rows (the map's least load-bearing mass, the same
    ordering the opacity prune uses) to make room for the incoming points.
    Returns (map, n_dropped, n_evicted).
    """
    need = valid.sum()
    free = (~gmap.aux.active).sum()
    deficit = jnp.maximum(need - free, 0)
    _, _, opacity = activations(gmap.params)
    score = jnp.where(gmap.aux.active, opacity, jnp.inf)
    order = jnp.argsort(score)  # weakest actives first
    c = gmap.aux.active.shape[0]
    evict = (
        jnp.zeros((c,), bool)
        .at[order]
        .set(jnp.arange(c) < deficit)
        & gmap.aux.active
    )
    n_evicted = evict.sum()
    gmap = prune_mask_apply(gmap, evict)
    gmap, n_dropped = insert_points(gmap, new_params, valid, kf_id)
    return gmap, n_dropped, n_evicted


def prune_mask_apply(gmap: GaussianMap, prune: jnp.ndarray) -> GaussianMap:
    """Deactivate rows (reference `prune_points`, gaussian_model.py:505-521)."""
    keep = gmap.aux.active & ~prune
    dead = ~keep

    def clear(x):
        mask = dead.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, jnp.zeros_like(x), x)

    params = jax.tree.map(clear, gmap.params)
    params = params._replace(
        opacity_logit=jnp.where(dead, -10.0, params.opacity_logit),
        log_scales=jnp.where(dead[:, None], -10.0, params.log_scales),
        quats=jnp.where(
            dead[:, None], jnp.array([1.0, 0.0, 0.0, 0.0], params.quats.dtype), params.quats
        ),
    )
    mu = jax.tree.map(clear, gmap.moments.mu)
    nu = jax.tree.map(clear, gmap.moments.nu)
    aux = MapAux(
        active=keep,
        n_obs=jnp.where(dead, 0, gmap.aux.n_obs),
        kf_id=jnp.where(dead, -1, gmap.aux.kf_id),
        grad_accum=jnp.where(dead, 0.0, gmap.aux.grad_accum),
        denom=jnp.where(dead, 0.0, gmap.aux.denom),
        max_radii=jnp.where(dead, 0.0, gmap.aux.max_radii),
    )
    return GaussianMap(params, aux, AdamMoments(mu, nu, gmap.moments.count))


# ---------------------------------------------------------------------------
# densification


def add_densification_stats(
    aux: MapAux, means2d_grad: jnp.ndarray, radii: jnp.ndarray, visible: jnp.ndarray
) -> MapAux:
    """Accumulate ||dL/dmeans2d|| for visible Gaussians
    (gaussian_model.py:691-695) and track max radii."""
    norm = jnp.linalg.norm(means2d_grad, axis=-1)
    vis = visible.astype(norm.dtype)
    return aux._replace(
        grad_accum=aux.grad_accum + norm * vis,
        denom=aux.denom + vis,
        max_radii=jnp.maximum(aux.max_radii, radii * vis),
    )


def _gather_params(params: GaussianParams, idx: jnp.ndarray) -> GaussianParams:
    return jax.tree.map(lambda x: x[idx], params)


def densify_and_prune(
    gmap: GaussianMap,
    rng: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float = 0.01,
    clone_budget: int = 4096,
    split_budget: int = 2048,
    current_kf: int = 0,
) -> Tuple[GaussianMap, jnp.ndarray]:
    """Clone + split + opacity/size prune (gaussian_model.py:593-689).

    Budgeted: at most `clone_budget` clones and `split_budget` split parents
    (2 children each) per call, chosen by descending view-space gradient.
    Returns (map, n_dropped) telemetry.
    """
    params, aux = gmap.params, gmap.aux
    capacity = aux.active.shape[0]
    clone_budget = min(clone_budget, capacity)
    split_budget = min(split_budget, capacity)
    grads = jnp.where(aux.denom > 0, aux.grad_accum / jnp.maximum(aux.denom, 1.0), 0.0)
    scales, quats, opacity = activations(params)
    max_scale = scales.max(axis=-1)

    hi_grad = (grads >= max_grad) & aux.active
    clone_mask = hi_grad & (max_scale <= percent_dense * extent)
    split_mask = hi_grad & (max_scale > percent_dense * extent)

    # --- clones: exact copies (densify_and_clone, gaussian_model.py:643-672)
    clone_score = jnp.where(clone_mask, grads, -jnp.inf)
    c_scores, c_idx = jax.lax.top_k(clone_score, clone_budget)
    c_valid = jnp.isfinite(c_scores)
    clones = _gather_params(params, c_idx)

    # --- splits: 2 children sampled from the parent Gaussian, scale/1.6,
    # parent pruned (densify_and_split, gaussian_model.py:593-641)
    split_score = jnp.where(split_mask, grads, -jnp.inf)
    s_scores, s_idx = jax.lax.top_k(split_score, split_budget)
    s_valid = jnp.isfinite(s_scores)
    parents = _gather_params(params, s_idx)
    rot = build_rotation(parents.quats)  # (B, 3, 3)
    p_scales = jnp.exp(parents.log_scales)
    samples = jax.random.normal(rng, (2, split_budget, 3), params.xyz.dtype)
    child_xyz = parents.xyz[None] + (rot[None] @ (samples * p_scales[None])[..., None])[..., 0]
    child_log_scales = jnp.log(jnp.maximum(p_scales / (0.8 * 2.0), 1e-12))

    def stack2(x):
        return jnp.concatenate([x, x], axis=0)

    children = GaussianParams(
        xyz=child_xyz.reshape(2 * split_budget, 3),
        f_dc=stack2(parents.f_dc),
        f_rest=stack2(parents.f_rest),
        log_scales=stack2(child_log_scales),
        quats=stack2(parents.quats),
        opacity_logit=stack2(parents.opacity_logit),
    )
    child_valid = jnp.concatenate([s_valid, s_valid], axis=0)

    new_params = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), clones, children
    )
    new_valid = jnp.concatenate([c_valid, child_valid], axis=0)

    # prune split parents first so their slots free up for children
    parent_prune = jnp.zeros_like(split_mask).at[s_idx].set(s_valid, mode="drop")
    gmap = prune_mask_apply(gmap, parent_prune)
    gmap, n_dropped = insert_points(gmap, new_params, new_valid, current_kf)

    # --- prune pass (densify_and_prune tail, gaussian_model.py:674-689)
    scales, _, opacity = activations(gmap.params)
    prune = (opacity < min_opacity) & gmap.aux.active
    if max_screen_size > 0:
        big_screen = gmap.aux.max_radii > max_screen_size
        big_world = scales.max(axis=-1) > 0.1 * extent
        prune = prune | ((big_screen | big_world) & gmap.aux.active)
    gmap = prune_mask_apply(gmap, prune)

    # reset densification stats (reference zeroes accumulators after densify)
    aux = gmap.aux._replace(
        grad_accum=jnp.zeros_like(gmap.aux.grad_accum),
        denom=jnp.zeros_like(gmap.aux.denom),
        max_radii=jnp.zeros_like(gmap.aux.max_radii),
    )
    return GaussianMap(gmap.params, aux, gmap.moments), n_dropped


def reset_opacity(gmap: GaussianMap, value: float = 0.01) -> GaussianMap:
    """Global opacity reset (gaussian_model.py:362-365) with moment reset."""
    new_logit = jnp.where(
        gmap.aux.active,
        jnp.minimum(gmap.params.opacity_logit, inverse_sigmoid(jnp.float32(value))),
        gmap.params.opacity_logit,
    )
    return _replace_opacity(gmap, new_logit)


def reset_opacity_nonvisible(gmap: GaussianMap, visibility: jnp.ndarray, value: float = 0.4):
    """Reset opacity of currently-nonvisible Gaussians only
    (gaussian_model.py:367-375)."""
    target = gmap.aux.active & ~visibility
    new_logit = jnp.where(
        target,
        jnp.minimum(gmap.params.opacity_logit, inverse_sigmoid(jnp.float32(value))),
        gmap.params.opacity_logit,
    )
    return _replace_opacity(gmap, new_logit)


def _replace_opacity(gmap: GaussianMap, new_logit: jnp.ndarray) -> GaussianMap:
    """Mirror `replace_tensor_to_optimizer` (gaussian_model.py:468-481):
    the new tensor gets zeroed Adam moments."""
    params = gmap.params._replace(opacity_logit=new_logit)
    mu = gmap.moments.mu._replace(opacity_logit=jnp.zeros_like(new_logit))
    nu = gmap.moments.nu._replace(opacity_logit=jnp.zeros_like(new_logit))
    return GaussianMap(params, gmap.aux, AdamMoments(mu, nu, gmap.moments.count))
