"""Pallas blend kernel vs XLA blend: forward parity + gradient parity.

Runs in Pallas interpret mode on CPU; the same code compiles with Mosaic on
TPU (exercised by bench/e2e runs there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_dev_tpu.models import Intrinsics
from monogs_dev_tpu.ops import RasterConfig, render_tiled, render_reference
from tests.test_rasterizer import make_scene, INTR

CFG_XLA = RasterConfig(tile=16, max_per_tile=64, k_dup=16, tile_group=8, use_pallas=False)
CFG_PAL = RasterConfig(tile=16, max_per_tile=64, k_dup=16, tile_group=8, use_pallas=True)


class TestForwardParity:
    def test_color_depth_alpha_match_xla(self):
        params, active = make_scene(n=40)
        T = jnp.eye(4)
        ref = render_tiled(params, active, T, INTR, 0, config=CFG_XLA, need_touched=False)
        pal = render_tiled(params, active, T, INTR, 0, config=CFG_PAL, need_touched=False)
        np.testing.assert_allclose(pal.color, ref.color, atol=3e-5)
        np.testing.assert_allclose(pal.depth, ref.depth, atol=3e-4)
        np.testing.assert_allclose(pal.alpha, ref.alpha, atol=3e-5)

    # All tests in this file use n=40 scenes: render_tiled's compiled
    # programs are cached per shape inside the pytest process, so a shared
    # n means each (config, transform) variant compiles ONCE for the whole
    # file (the fast-suite <5 min budget, VERDICT r4 #8).
    def test_background(self):
        params, active = make_scene(n=40)
        bg = jnp.array([0.3, 0.5, 0.7])
        ref = render_tiled(params, active, jnp.eye(4), INTR, 0, bg_color=bg,
                           config=CFG_XLA, need_touched=False)
        pal = render_tiled(params, active, jnp.eye(4), INTR, 0, bg_color=bg,
                           config=CFG_PAL, need_touched=False)
        np.testing.assert_allclose(pal.color, ref.color, atol=3e-5)

    def test_empty_scene(self):
        params, active = make_scene(n=40)
        out = render_tiled(params, active & False, jnp.eye(4), INTR, 0,
                           config=CFG_PAL, need_touched=False)
        np.testing.assert_allclose(out.color, 0.0, atol=1e-7)
        np.testing.assert_allclose(out.alpha, 0.0, atol=1e-7)

    def test_matches_oracle(self):
        params, active = make_scene(n=40)
        ref = render_reference(params, active, jnp.eye(4), INTR, 0, config=CFG_PAL)
        pal = render_tiled(params, active, jnp.eye(4), INTR, 0,
                           config=CFG_PAL, need_touched=False)
        np.testing.assert_allclose(pal.color, ref.color, atol=3e-5)


class TestGradientParity:
    def _loss(self, params, active, cfg):
        out = render_tiled(
            params, active, jnp.eye(4), INTR, 0, config=cfg, need_touched=False
        )
        # touch all three differentiable outputs
        return (
            jnp.abs(out.color - 0.3).mean()
            + 0.3 * jnp.abs(out.depth - 2.0).mean()
            + 0.2 * (out.alpha**2).mean()
        )

    def test_param_grads_match_xla(self):
        params, active = make_scene(n=40)
        g_pal = jax.grad(lambda p: self._loss(p, active, CFG_PAL))(params)
        g_xla = jax.grad(lambda p: self._loss(p, active, CFG_XLA))(params)
        for name, a, b in zip(params._fields, g_pal, g_xla):
            assert np.all(np.isfinite(a)), name
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=3e-6, err_msg=name)

    def test_pose_grads_match_xla(self):
        from monogs_dev_tpu.geometry import se3_retract

        params, active = make_scene(n=40)

        def loss(tau, cfg):
            T = se3_retract(tau, jnp.eye(4))
            out = render_tiled(params, active, T, INTR, 0, config=cfg,
                               need_touched=False)
            return jnp.abs(out.color - 0.3).mean() + 0.1 * jnp.abs(out.depth).mean()

        g_pal = jax.grad(lambda t: loss(t, CFG_PAL))(jnp.zeros(6))
        g_xla = jax.grad(lambda t: loss(t, CFG_XLA))(jnp.zeros(6))
        np.testing.assert_allclose(g_pal, g_xla, rtol=2e-3, atol=1e-8)

    def test_deep_stack_grads(self):
        # many overlapping gaussians in one tile: exercises transmittance
        # recovery over a long chain in the backward
        n = 40
        params, active = make_scene(n=n)
        params = params._replace(
            xyz=params.xyz * jnp.array([0.05, 0.05, 1.0]),  # all near center
            log_scales=jnp.full((n, 3), jnp.log(0.3)),
        )
        g_pal = jax.grad(lambda p: self._loss(p, active, CFG_PAL))(params)
        g_xla = jax.grad(lambda p: self._loss(p, active, CFG_XLA))(params)
        for name, a, b in zip(params._fields, g_pal, g_xla):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-5, err_msg=name)
