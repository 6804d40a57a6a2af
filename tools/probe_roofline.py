#!/usr/bin/env python
"""Roofline / MFU measurement for the blend kernel and the tracking iteration.

VERDICT r2 asked for an achieved-FLOP/s-vs-peak number so the builder and
judge can tell "kernel at the roofline, restructure the algorithm" from
"kernel leaves 10x on the table". This probe measures, at bench-matched
sizes (VGA, N=32k tier, L=512, k_dup=8, tight_cull):

  - blend forward wall time, blend fwd+bwd (custom VJP) wall time,
  - the binned entry statistics that define the work (counts sum/mean/max,
    effective chunks after the saturation early-exit),
  - a FLOP model counted from the kernel body (ops per entry-pixel), and
  - achieved element-op/s against a DOCUMENTED VPU peak assumption, plus
    HBM bytes against the public 819 GB/s v5e figure.

The blend is VPU-bound (elementwise alpha/transmittance math; the MXU
variant was measured slower, ops/blend_pallas.py:40-49), so the relevant
peak is the VPU, not the 197 bf16 TFLOP/s MXU headline. v5e VPU peak is
not published; we assume 8x128 lanes x 4 ALUs x ~1.7 GHz ~= 7.0e12
element-ops/s fp32 and report achieved/peak under that assumption. A
number near 1.0 means restructure-the-algorithm; near 0.1 means the
kernel itself leaves room.

Env knobs: MONOGS_N (default 32768), MONOGS_L (512), MONOGS_KDUP (8),
MONOGS_SCALE (0.03), MONOGS_DENSITY_TARGET (median per-tile count to
calibrate the scene toward; 0 = off).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.geometry import se3_exp
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.blend_pallas import CHUNK, _forward, blend_tiles_pallas
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import _tile_gather, build_binning, render_binned

N = int(os.environ.get("MONOGS_N", "32768"))
TILE_ENV = int(os.environ.get("MONOGS_TILE", "16"))
TILE_H_ENV = int(os.environ.get("MONOGS_TILE_H", "0"))  # 0 = square
L = int(os.environ.get("MONOGS_L", "512"))
KDUP = int(os.environ.get("MONOGS_KDUP", "8"))
SCALE = float(os.environ.get("MONOGS_SCALE", "0.03"))

intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
cfg = RasterConfig(tile=TILE_ENV, tile_h=TILE_H_ENV, max_per_tile=L,
                   k_dup=KDUP, tile_group=60)
TILE_W, TILE_HH = cfg.tile, cfg.tile_h or cfg.tile
TILE = TILE_W if TILE_HH == TILE_W else (TILE_W, TILE_HH)
P = TILE_W * TILE_HH
TX_N = -(-intr.width // TILE_W)
N_TILES = TX_N * (-(-intr.height // TILE_HH))

# FLOP model per (entry, pixel), counted from ops/blend_pallas.py kernels.
# Forward _chunk_alpha: dx,dy(2) power(9) opa*G+min+masks(6); cumprod
# 1-alpha + 5 rounds of roll/mul/select(16); t_in/w(4); 5 accumulators(9).
FWD_OPS_PER_EP = 46
FWD_EXP_PER_EP = 1
# Backward body: alpha recompute(17) + cumprod(16) + t recovery/div(3) +
# dL_dw(9) + wdl/suffix(4; cumsum via MXU not counted) + d_alpha(5) +
# G/d_opa/d_power(7) + five moment muls + lane reductions(~25) + d_z(2).
BWD_OPS_PER_EP = 88
BWD_EXP_PER_EP = 1

# Documented assumption for v5e VPU peak (see module docstring).
VPU_PEAK_OPS = 7.0e12
# Empirical ceiling: eight structurally different kernel variants (base,
# nocond, acc8@{32,64,128}, storew, trimat, pair2/4, plus the backward)
# all converge to ~0.7-0.85e12 element-ops/s on this op mix
# (tools/kernel_lab.py, v5e) — treat ~0.9e12 as the achievable VPU rate
# for dependent f32 elementwise work with rolls/exp/selects. A fraction
# near 1.0 of THIS number means the kernel is done; further speedups must
# reduce entry-pixel work.
VPU_EMPIRICAL_OPS = 0.9e12
HBM_PEAK_B = 819e9


def timeit(name, f, x0, iters=30):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)

    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.time()
    y = run(x0)
    jax.block_until_ready(y)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=SCALE)
    proj0 = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
    jax.block_until_ready(proj0)
    binning = jax.jit(lambda: build_binning(proj0, intr, cfg))()
    jax.block_until_ready(binning)
    counts = jax.device_get(binning.counts)
    n_entries = int(counts.sum())
    print(
        f"workload: N={N} L={L} k_dup={KDUP} entries={n_entries} "
        f"counts mean/median/max = {counts.mean():.1f}/"
        f"{float(jnp.median(binning.counts)):.0f}/{counts.max()}",
        flush=True,
    )

    props = jnp.concatenate(
        [proj0.means2d, proj0.conic, proj0.color, proj0.opacity[:, None],
         proj0.depth[:, None]], axis=-1,
    )
    props_pad = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
    t_props0 = _tile_gather(props_pad, binning.idx_table, binning.pos_table)
    jax.block_until_ready(t_props0)

    # effective chunks after the early exit (what the kernel actually runs)
    _, _, _, _, neff, _ = jax.jit(
        lambda p: _forward(p, binning.counts, TX_N, TILE, 0.99, 1 / 255.0, 1e-4)
    )(t_props0)
    eff_entries = int(jax.device_get(neff[:, 0, 0]).sum()) * CHUNK
    print(
        f"effective entries (early-exit, chunk-padded): {eff_entries} "
        f"({eff_entries / max(n_entries, 1):.2f}x binned)",
        flush=True,
    )

    # --- work-reduction diagnostics:
    # (a) pixel utilization: fraction of processed (entry, pixel) pairs
    #     where the entry actually contributes (alpha >= alpha_min and
    #     unsaturated) — the headroom a finer tile / tighter cull could
    #     reclaim;
    # (b) binned-entry counts at coarser alpha_min — what a tracking-only
    #     alpha_min raise would save (quality impact measured separately).
    _, _, _, touch = jax.jit(
        lambda p: __import__(
            "monogs_dev_tpu.ops.blend_pallas", fromlist=["x"]
        ).blend_tiles_pallas_touch(p, binning.counts, TX_N, TILE)
    )(t_props0)
    util = float(jnp.sum(touch)) / max(n_entries * P, 1)
    print(f"pixel utilization (touch / entry-pixels): {util:.3f}", flush=True)
    for am in (2.0 / 255.0, 4.0 / 255.0, 8.0 / 255.0):
        cfg_am = RasterConfig(tile=TILE_ENV, tile_h=TILE_H_ENV, max_per_tile=L, k_dup=KDUP,
                              tile_group=60, alpha_min=am)
        b_am = jax.jit(lambda: build_binning(proj0, intr, cfg_am))()
        print(
            f"alpha_min={am * 255:.0f}/255: entries "
            f"{int(jax.device_get(b_am.counts).sum())}",
            flush=True,
        )

    # --- blend forward only
    def f_fwd(x, i):
        c, d, a = blend_tiles_pallas(t_props0 + x, binning.counts, TX_N, TILE)
        return x + 1e-12 * c[0, 0, 0]

    ms_fwd = timeit("blend fwd", f_fwd, jnp.zeros(()))

    # --- blend fwd+bwd through the custom VJP
    def loss_blend(pp):
        c, d, a = blend_tiles_pallas(pp, binning.counts, TX_N, TILE)
        return c.mean() + 0.1 * d.mean() + 0.1 * a.mean()

    g_blend = jax.grad(loss_blend)

    def f_vjp(x, i):
        return x + 1e-12 * g_blend(t_props0 + x)[0, 0, 0]

    ms_vjp = timeit("blend fwd+bwd", f_vjp, jnp.zeros(()))
    ms_bwd = ms_vjp - ms_fwd

    # --- full tracking iteration (projection+gather+blend+loss, grad)
    def loss_iter(tau):
        T = se3_exp(tau) @ jnp.eye(4)
        proj = project_gaussians(params, active, T, intr, 0)
        out = render_binned(
            proj, proj.means2d, binning, intr, jnp.zeros(3), cfg, False
        )
        return jnp.abs(out.color - 0.3).mean()

    g_iter = jax.grad(loss_iter)
    ms_iter = timeit("full iter grad", g_iter and (lambda x, i: x + 1e-6 * g_iter(x * 1e-3)), jnp.zeros(6))

    # --- full tracking iteration on the COMPACTED working set (what the
    # production loop runs per iteration after compact_binning)
    from monogs_dev_tpu.ops.rasterize import compact_binning

    m = int(os.environ.get("MONOGS_COMPACT", "16384"))
    if 0 < m < N:
        sel, binning_c, dropped = jax.jit(
            lambda b: compact_binning(b, N, m)
        )(binning)
        sel_c = jnp.clip(sel, 0, N - 1)
        params_c = jax.tree.map(lambda x: x[sel_c], params)
        active_c = active[sel_c] & (sel < N)
        print(f"compact: m={m} dropped={int(dropped)}", flush=True)

        def loss_iter_c(tau):
            T = se3_exp(tau) @ jnp.eye(4)
            proj = project_gaussians(params_c, active_c, T, intr, 0)
            out = render_binned(
                proj, proj.means2d, binning_c, intr, jnp.zeros(3), cfg, False
            )
            return jnp.abs(out.color - 0.3).mean()

        g_iter_c = jax.grad(loss_iter_c)
        ms_iter_c = timeit(
            "full iter grad (compact)",
            lambda x, i: x + 1e-6 * g_iter_c(x * 1e-3),
            jnp.zeros(6),
        )
    else:
        ms_iter_c = ms_iter

    # --- binning build (amortized over rebin_every in the tracking loop)
    def f_bin(x, i):
        b = build_binning(proj0, intr, cfg, dilate=x)
        return x + 1e-9 * b.counts[0].astype(jnp.float32)

    ms_bin = timeit("build_binning", f_bin, jnp.zeros(()))

    # --- roofline numbers (work = effective entry-pixels)
    ep = eff_entries * P
    fwd_ops = ep * FWD_OPS_PER_EP
    bwd_ops = ep * BWD_OPS_PER_EP
    fwd_frac = fwd_ops / (ms_fwd * 1e-3) / VPU_PEAK_OPS
    bwd_frac = bwd_ops / (max(ms_bwd, 1e-6) * 1e-3) / VPU_PEAK_OPS
    # HBM traffic: props in (T*L*D_IN), outputs (T*(3+1+1+1)*P + neff)
    fwd_bytes = (N_TILES * L * 10 + N_TILES * 6 * P) * 4
    fwd_bw_frac = fwd_bytes / (ms_fwd * 1e-3) / HBM_PEAK_B
    result = {
        "entries_binned": n_entries,
        "entries_effective": eff_entries,
        "entry_pixels": ep,
        "blend_fwd_ms": round(ms_fwd, 3),
        "blend_bwd_ms": round(ms_bwd, 3),
        "full_iter_ms": round(ms_iter, 3),
        "full_iter_compact_ms": round(ms_iter_c, 3),
        "binning_ms": round(ms_bin, 3),
        "fwd_Gops": round(fwd_ops / 1e9, 2),
        "fwd_achieved_Top_s": round(fwd_ops / (ms_fwd * 1e-3) / 1e12, 3),
        "fwd_vpu_fraction": round(fwd_frac, 4),
        "bwd_achieved_Top_s": round(bwd_ops / (max(ms_bwd, 1e-6) * 1e-3) / 1e12, 3),
        "bwd_vpu_fraction": round(bwd_frac, 4),
        "fwd_empirical_fraction": round(
            fwd_ops / (ms_fwd * 1e-3) / VPU_EMPIRICAL_OPS, 4
        ),
        "bwd_empirical_fraction": round(
            bwd_ops / (max(ms_bwd, 1e-6) * 1e-3) / VPU_EMPIRICAL_OPS, 4
        ),
        "fwd_hbm_fraction": round(fwd_bw_frac, 4),
        "vpu_peak_assumption_Top_s": VPU_PEAK_OPS / 1e12,
        "vpu_empirical_Top_s": VPU_EMPIRICAL_OPS / 1e12,
        "ops_per_entry_pixel": {"fwd": FWD_OPS_PER_EP, "bwd": BWD_OPS_PER_EP},
    }
    print("ROOFLINE " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
