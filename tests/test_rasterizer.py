"""Rasterizer correctness: tiled production renderer vs brute-force oracle,
analytic gradient flow (Gaussian params AND SE(3) pose tangents), and
semantics of the auxiliary outputs (n_touched, radii, telemetry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_dev_tpu.geometry import se3_retract
from monogs_dev_tpu.models import Intrinsics, GaussianParams
from monogs_dev_tpu.models.gaussians import inverse_sigmoid
from monogs_dev_tpu.geometry.sh import rgb_to_sh
from monogs_dev_tpu.ops import (
    RasterConfig,
    render_reference,
    render_tiled,
    mean_sq_dist_knn3,
)

INTR = Intrinsics(fx=60.0, fy=60.0, cx=32.0, cy=32.0, width=64, height=64)
CFG = RasterConfig(tile=16, max_per_tile=64, k_dup=16, tile_group=8)


def make_scene(n=40, key=jax.random.PRNGKey(0), sh_degree=0):
    ks = jax.random.split(key, 5)
    xyz = jnp.stack(
        [
            jax.random.uniform(ks[0], (n,), minval=-1.0, maxval=1.0),
            jax.random.uniform(ks[1], (n,), minval=-1.0, maxval=1.0),
            jax.random.uniform(ks[2], (n,), minval=2.0, maxval=6.0),
        ],
        axis=-1,
    )
    rgb = jax.random.uniform(ks[3], (n, 3), minval=0.1, maxval=0.9)
    r = max((sh_degree + 1) ** 2 - 1, 0)
    quats = jax.random.normal(ks[4], (n, 4))
    params = GaussianParams(
        xyz=xyz,
        f_dc=rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((n, r, 3)),
        log_scales=jnp.full((n, 3), jnp.log(0.08)),
        quats=quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
        opacity_logit=jnp.full((n,), inverse_sigmoid(jnp.float32(0.7))),
    )
    active = jnp.ones((n,), bool)
    return params, active


class TestParityWithOracle:
    @pytest.mark.parametrize("sh_degree", [0, 3])
    def test_color_depth_alpha_match(self, sh_degree):
        params, active = make_scene(sh_degree=sh_degree)
        T = jnp.eye(4)
        ref = render_reference(params, active, T, INTR, sh_degree, config=CFG)
        tiled = render_tiled(params, active, T, INTR, sh_degree, config=CFG)
        assert int(tiled.dup_overflow) == 0
        assert int(tiled.tile_overflow) == 0
        np.testing.assert_allclose(tiled.color, ref.color, atol=2e-5)
        np.testing.assert_allclose(tiled.depth, ref.depth, atol=2e-4)
        np.testing.assert_allclose(tiled.alpha, ref.alpha, atol=2e-5)

    def test_n_touched_close(self):
        params, active = make_scene()
        T = jnp.eye(4)
        ref = render_reference(params, active, T, INTR, 0, config=CFG)
        tiled = render_tiled(params, active, T, INTR, 0, config=CFG)
        # identical semantics except tile-rectangle culling: the tiled version
        # never evaluates pixels outside the 3-sigma tile rect, the oracle
        # evaluates everything. Allow tiny slack at rect borders.
        ref_t = np.array(ref.n_touched)
        tiled_t = np.array(tiled.n_touched)
        assert np.mean(np.abs(ref_t - tiled_t)) < 3.0
        assert np.array_equal(ref_t > 0, tiled_t > 0)

    def test_background_color(self):
        # n=40 everywhere in this class: shared shapes reuse the in-process
        # compiled programs (fast-suite <5 min budget, VERDICT r4 #8)
        params, active = make_scene(n=40)
        # push gaussians out of view
        params = params._replace(xyz=params.xyz + jnp.array([100.0, 0.0, 0.0]))
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render_tiled(params, active, jnp.eye(4), INTR, 0, bg_color=bg, config=CFG)
        np.testing.assert_allclose(
            np.array(out.color), np.tile(np.array(bg), (64, 64, 1)), atol=1e-5
        )

    def test_inactive_gaussians_ignored(self):
        params, active = make_scene()
        half = active & (jnp.arange(active.shape[0]) < 20)
        out_half = render_tiled(params, half, jnp.eye(4), INTR, 0, config=CFG)
        # same shape, masked rows swapped for OTHER rows' (valid, in-range)
        # values: output must be unchanged — masked rows are fully ignored.
        # (An n=20 physical-cut comparison checked the same property but
        # compiled a whole second program family just for this test.)
        perturbed = jax.tree.map(
            lambda x: jnp.where(
                jnp.reshape(half, (-1,) + (1,) * (x.ndim - 1)),
                x,
                jnp.roll(x, 7, axis=0),
            ),
            params,
        )
        out_p = render_tiled(perturbed, half, jnp.eye(4), INTR, 0, config=CFG)
        np.testing.assert_allclose(out_half.color, out_p.color, atol=1e-6)

    def test_posed_camera(self):
        params, active = make_scene()
        tau = jnp.array([0.1, -0.05, 0.02, 0.03, -0.02, 0.01])
        T = se3_retract(tau, jnp.eye(4))
        ref = render_reference(params, active, T, INTR, 0, config=CFG)
        tiled = render_tiled(params, active, T, INTR, 0, config=CFG)
        np.testing.assert_allclose(tiled.color, ref.color, atol=2e-5)


class TestGradients:
    def _loss_tiled(self, tau, params, active, probe=None):
        T = se3_retract(tau, jnp.eye(4))
        out = render_tiled(
            params, active, T, INTR, 0, config=CFG, means2d_probe=probe
        )
        target = 0.3 * jnp.ones((64, 64, 3))
        return jnp.abs(out.color - target).mean()

    def _loss_ref(self, tau, params, active, probe=None):
        T = se3_retract(tau, jnp.eye(4))
        out = render_reference(
            params, active, T, INTR, 0, config=CFG, means2d_probe=probe
        )
        target = 0.3 * jnp.ones((64, 64, 3))
        return jnp.abs(out.color - target).mean()

    def test_pose_gradient_matches_oracle(self):
        params, active = make_scene()
        tau0 = jnp.zeros(6)
        g_tiled = jax.grad(self._loss_tiled)(tau0, params, active)
        g_ref = jax.grad(self._loss_ref)(tau0, params, active)
        assert np.all(np.isfinite(g_tiled))
        assert float(jnp.linalg.norm(g_ref)) > 1e-6
        np.testing.assert_allclose(g_tiled, g_ref, rtol=5e-3, atol=1e-7)

    @pytest.mark.slow  # 32 s: x64 recompiles every program fresh
    def test_pose_gradient_finite_difference_x64(self):
        # rigorous check: float64 central differences vs autodiff on the
        # oracle (float32 FD is swamped by rounding noise; the tiled
        # renderer's grads are separately tied to the oracle's above)
        jax.config.update("jax_enable_x64", True)
        try:
            params, active = make_scene(n=20)
            params = jax.tree.map(lambda x: x.astype(jnp.float64), params)

            def loss(tau):
                T = se3_retract(tau, jnp.eye(4, dtype=jnp.float64))
                out = render_reference(params, active, T, INTR, 0, config=CFG)
                return ((out.color - 0.3) ** 2).mean()

            g = jax.grad(loss)(jnp.zeros(6, jnp.float64))
            eps = 1e-6
            for i in range(6):
                e = jnp.zeros(6, jnp.float64).at[i].set(eps)
                fd = (loss(e) - loss(-e)) / (2 * eps)
                np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_param_gradients_match_oracle(self):
        params, active = make_scene()
        g_tiled = jax.grad(lambda p: self._loss_tiled(jnp.zeros(6), p, active))(params)
        g_ref = jax.grad(lambda p: self._loss_ref(jnp.zeros(6), p, active))(params)
        for name, gt, gr in zip(params._fields, g_tiled, g_ref):
            assert np.all(np.isfinite(gt)), name
            np.testing.assert_allclose(gt, gr, rtol=1e-2, atol=2e-6, err_msg=name)

    def test_means2d_probe_gradient(self):
        params, active = make_scene()
        n = params.xyz.shape[0]
        probe = jnp.zeros((n, 2))
        g = jax.grad(
            lambda pr: self._loss_tiled(jnp.zeros(6), params, active, pr)
        )(probe)
        assert np.all(np.isfinite(g))
        assert float(jnp.abs(g).sum()) > 0.0


class TestTightCull:
    def test_culling_is_exact_and_reduces_counts(self):
        import dataclasses

        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import build_binning, render_binned

        params, active = make_scene(n=120)
        cfg_on = dataclasses.replace(CFG, max_per_tile=128)
        cfg_off = dataclasses.replace(cfg_on, tight_cull=False)
        proj = project_gaussians(params, active, jnp.eye(4), INTR, 0)
        b_on = build_binning(proj, INTR, cfg_on)
        b_off = build_binning(proj, INTR, cfg_off)
        assert int(b_on.counts.sum()) <= int(b_off.counts.sum())
        o_on = render_binned(
            proj, proj.means2d, b_on, INTR, jnp.zeros(3), cfg_on, True
        )
        o_off = render_binned(
            proj, proj.means2d, b_off, INTR, jnp.zeros(3), cfg_off, True
        )
        # culled entries are exactly those the blend zeroes (alpha<alpha_min)
        np.testing.assert_allclose(
            np.asarray(o_on.color), np.asarray(o_off.color), atol=1e-4
        )
        assert int(jnp.abs(o_on.n_touched - o_off.n_touched).max()) <= 1


class TestTelemetry:
    def test_tile_and_dup_overflow_reported(self):
        # one render triggering BOTH overflow counters (one compile instead
        # of two ~12 s variants): tiny per-tile lists overflow under 100
        # stacked gaussians, and huge splats overflow k_dup=2 duplication
        params, active = make_scene(n=100)
        params = params._replace(
            log_scales=params.log_scales.at[:10].set(jnp.log(2.0))
        )
        cfg = RasterConfig(tile=16, max_per_tile=4, k_dup=2, tile_group=8)
        out = render_tiled(params, active, jnp.eye(4), INTR, 0, config=cfg)
        assert int(out.tile_overflow) > 0
        assert int(out.dup_overflow) > 0


class TestKnn:
    def test_matches_bruteforce(self):
        pts = np.random.default_rng(0).normal(size=(200, 3)).astype(np.float32)
        out = np.array(mean_sq_dist_knn3(jnp.array(pts), chunk=64))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(out, want, rtol=1e-4)

    def test_valid_mask(self):
        pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
        valid = np.arange(50) < 25
        out = np.array(mean_sq_dist_knn3(jnp.array(pts), jnp.array(valid), chunk=16))
        assert np.all(out[25:] == 0.0)
        d2 = ((pts[:25, None] - pts[None, :25]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(out[:25], want, rtol=1e-4)


class TestTileMaskSkip:
    def test_masked_tiles_render_background_others_exact(self):
        """render_binned(tile_mask=...) must be bit-exact on unmasked tiles
        and pure background on masked ones (the tracking loss-render skip)."""
        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import build_binning, render_binned

        params, active = make_scene(60)
        bg = jnp.array([0.1, 0.2, 0.3])
        proj = project_gaussians(params, active, jnp.eye(4), INTR, 0)
        binning = build_binning(proj, INTR, CFG)
        full = render_binned(
            proj, proj.means2d, binning, INTR, bg, CFG, need_touched=False
        )
        n_tiles = binning.counts.shape[0]
        tile_mask = (jnp.arange(n_tiles) % 2) == 0
        part = render_binned(
            proj, proj.means2d, binning, INTR, bg, CFG,
            need_touched=False, tile_mask=tile_mask,
        )
        tile = CFG.tile
        tx_n = -(-INTR.width // tile)
        for t in range(n_tiles):
            ty, tx = t // tx_n, t % tx_n
            sl = np.s_[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            if bool(tile_mask[t]):
                np.testing.assert_array_equal(
                    np.asarray(part.color[sl]), np.asarray(full.color[sl])
                )
                np.testing.assert_array_equal(
                    np.asarray(part.depth[sl]), np.asarray(full.depth[sl])
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(part.color[sl]),
                    np.broadcast_to(np.asarray(bg), part.color[sl].shape),
                    atol=1e-6,
                )
                np.testing.assert_array_equal(np.asarray(part.alpha[sl]), 0.0)

    def test_masked_loss_gradients_match(self):
        """Gradients of a mask-gated loss are identical with and without the
        tile skip."""
        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import build_binning, render_binned

        params, active = make_scene(60)
        bg = jnp.zeros(3)
        proj0 = project_gaussians(params, active, jnp.eye(4), INTR, 0)
        binning = build_binning(proj0, INTR, CFG)
        tile = CFG.tile
        tx_n = -(-INTR.width // tile)
        ty_n = -(-INTR.height // tile)
        n_tiles = tx_n * ty_n
        tile_mask = (jnp.arange(n_tiles) % 3) != 0
        pix_mask = (
            jnp.broadcast_to(
                tile_mask.reshape(ty_n, 1, tx_n, 1), (ty_n, tile, tx_n, tile)
            )
            .reshape(ty_n * tile, tx_n * tile)[: INTR.height, : INTR.width]
        )
        target = jnp.full((INTR.height, INTR.width, 3), 0.4)

        def loss(xyz, use_tile_mask):
            p = params._replace(xyz=xyz)
            proj = project_gaussians(p, active, jnp.eye(4), INTR, 0)
            out = render_binned(
                proj, proj.means2d, binning, INTR, bg, CFG,
                need_touched=False,
                tile_mask=tile_mask if use_tile_mask else None,
            )
            err = jnp.abs(out.color - target).sum(-1)
            return jnp.where(pix_mask, err, 0.0).sum()

        g_full = jax.grad(lambda x: loss(x, False))(params.xyz)
        g_skip = jax.grad(lambda x: loss(x, True))(params.xyz)
        np.testing.assert_allclose(
            np.asarray(g_full), np.asarray(g_skip), atol=1e-5
        )


class TestCompactBinning:
    """Working-set compaction (ops/rasterize.py compact_binning): the
    tracking loop's per-iteration tensors shrink to the binned set. Must be
    bit-exact when nothing is dropped, and count drops when m is too small."""

    def _setup(self, n=80, pad_inactive=40):
        import jax.tree_util as jtu

        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import build_binning

        params, active = make_scene(n)
        # pad with inactive rows so the working set << row count
        params = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad_inactive,) + x.shape[1:], x.dtype)]
            ),
            params,
        )
        active = jnp.concatenate([active, jnp.zeros((pad_inactive,), bool)])
        proj = project_gaussians(params, active, jnp.eye(4), INTR, 0)
        binning = build_binning(proj, INTR, CFG)
        return params, active, proj, binning

    def test_bit_exact_when_not_dropping(self):
        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import compact_binning, render_binned

        params, active, proj, binning = self._setup()
        n = active.shape[0]
        bg = jnp.array([0.05, 0.1, 0.15])
        full = render_binned(
            proj, proj.means2d, binning, INTR, bg, CFG, need_touched=False
        )
        m = 96
        sel, binning_c, dropped = jax.jit(
            lambda b: compact_binning(b, n, m)
        )(binning)
        assert int(dropped) == 0
        sel_c = jnp.clip(sel, 0, n - 1)
        params_c = jax.tree.map(lambda x: x[sel_c], params)
        active_c = active[sel_c] & (sel < n)
        proj_c = project_gaussians(params_c, active_c, jnp.eye(4), INTR, 0)
        out = render_binned(
            proj_c, proj_c.means2d, binning_c, INTR, bg, CFG,
            need_touched=False,
        )
        np.testing.assert_array_equal(
            np.asarray(out.color), np.asarray(full.color)
        )
        np.testing.assert_array_equal(
            np.asarray(out.depth), np.asarray(full.depth)
        )
        np.testing.assert_array_equal(
            np.asarray(out.alpha), np.asarray(full.alpha)
        )

    @pytest.mark.slow  # 18 s; covered by the core-steps compaction e2e
    def test_pose_gradient_identical(self):
        from monogs_dev_tpu.geometry import se3_exp
        from monogs_dev_tpu.ops.project import project_gaussians
        from monogs_dev_tpu.ops.rasterize import compact_binning, render_binned

        params, active, proj, binning = self._setup()
        n = active.shape[0]
        m = 96
        sel, binning_c, _ = compact_binning(binning, n, m)
        sel_c = jnp.clip(sel, 0, n - 1)
        params_c = jax.tree.map(lambda x: x[sel_c], params)
        active_c = active[sel_c] & (sel < n)
        target = jnp.full((INTR.height, INTR.width, 3), 0.4)

        def loss(tau, p, a, b):
            T = se3_exp(tau) @ jnp.eye(4)
            pr = project_gaussians(p, a, T, INTR, 0)
            out = render_binned(
                pr, pr.means2d, b, INTR, jnp.zeros(3), CFG, need_touched=False
            )
            return jnp.abs(out.color - target).mean()

        g_full = jax.grad(loss)(jnp.zeros(6), params, active, binning)
        g_comp = jax.grad(loss)(jnp.zeros(6), params_c, active_c, binning_c)
        # identical per-gaussian terms; only the row-reduction tree differs
        # (96 vs 120 rows), so agreement is to float reassociation
        np.testing.assert_allclose(
            np.asarray(g_comp), np.asarray(g_full), rtol=3e-5, atol=1e-8
        )

    def test_overflow_counted(self):
        from monogs_dev_tpu.ops.rasterize import compact_binning

        params, active, proj, binning = self._setup()
        n = active.shape[0]
        n_binned = int((binning.pos_table < binning.idx_table.size).any(axis=1).sum())
        m = max(n_binned - 5, 1)
        _, _, dropped = compact_binning(binning, n, m)
        assert int(dropped) == n_binned - m


class TestMedianDepth:
    """render_median_depth: actual-surface depth for fixture generation —
    on a silhouette pixel (near opaque surface over far one) it must
    return the NEAR surface's z where expected depth blends the two
    (BASELINE.md fixture-depth analysis; reference per-patch median
    pseudo-depth at utils/slam_frontend.py:63-104)."""

    @pytest.mark.slow  # 22 s compile; offline fixture-gen utility
    def test_silhouette_returns_near_surface(self):
        from monogs_dev_tpu.ops.rasterize import render_median_depth
        from monogs_dev_tpu.ops import render_tiled

        intr = Intrinsics(fx=70.0, fy=70.0, cx=40.0, cy=32.0,
                          width=80, height=64)
        n = 2
        # two isotropic gaussians on the optical axis: near at z=1 (60%
        # opaque), far at z=4 (opaque)
        xyz = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 4.0]])
        params = GaussianParams(
            xyz=xyz,
            f_dc=jnp.tile(rgb_to_sh(jnp.full((1, 1, 3), 0.5)), (n, 1, 1)),
            f_rest=None,
            log_scales=jnp.log(jnp.full((n, 3), 0.05)),
            quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            opacity_logit=inverse_sigmoid(jnp.array([0.6, 0.999])),
        )
        active = jnp.ones((n,), bool)
        cfg = RasterConfig(max_per_tile=64, k_dup=8, tile_group=5)
        med = np.asarray(
            render_median_depth(params, active, jnp.eye(4), intr, cfg)
        )
        out = render_tiled(params, active, jnp.eye(4), intr, 0, config=cfg)
        exp = np.asarray(out.depth) / np.maximum(np.asarray(out.alpha), 1e-6)
        cy, cx = 32, 40
        # expected depth blends: 0.6*1 + 0.4*4 = 2.2-ish at the center
        assert 1.5 < exp[cy, cx] < 3.5, exp[cy, cx]
        # median depth is the near surface exactly
        assert abs(med[cy, cx] - 1.0) < 1e-3, med[cy, cx]
        # background pixels report 0 (no-hit convention)
        assert med[0, 0] == 0.0
