import jax
import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.models import (
    GaussianParams,
    create_map,
    insert_points,
    prune_mask_apply,
    adam_step,
    densify_and_prune,
    reset_opacity,
    reset_opacity_nonvisible,
)
from monogs_dev_tpu.models.gaussians import (
    activations,
    build_rotation,
    exponential_lr,
    inverse_sigmoid,
)


def make_batch(m, key, sh_degree=0):
    ks = jax.random.split(key, 3)
    r = max((sh_degree + 1) ** 2 - 1, 0)
    return GaussianParams(
        xyz=jax.random.normal(ks[0], (m, 3)),
        f_dc=jax.random.uniform(ks[1], (m, 1, 3)),
        f_rest=jnp.zeros((m, r, 3)),
        log_scales=jnp.full((m, 3), -2.0),
        quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (m, 1)),
        opacity_logit=jnp.full((m,), inverse_sigmoid(jnp.float32(0.5))),
    )


class TestInsertPrune:
    def test_insert_fills_free_slots(self):
        gmap = create_map(16, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, dropped = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=3)
        assert int(gmap.aux.active.sum()) == 8
        assert int(dropped) == 0
        assert set(np.array(gmap.aux.kf_id[gmap.aux.active])) == {3}

    def test_insert_respects_valid_mask(self):
        gmap = create_map(16, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        valid = jnp.array([True, False] * 4)
        gmap, dropped = insert_points(gmap, batch, valid, kf_id=0)
        assert int(gmap.aux.active.sum()) == 4

    def test_overflow_counted(self):
        gmap = create_map(4, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, dropped = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=0)
        assert int(gmap.aux.active.sum()) == 4
        assert int(dropped) == 4

    def test_insert_zeroes_moments(self):
        gmap = create_map(8, 0)
        # dirty the moments
        mu = jax.tree.map(lambda x: x + 1.0, gmap.moments.mu)
        gmap = gmap._replace(moments=gmap.moments._replace(mu=mu))
        batch = make_batch(4, jax.random.PRNGKey(1))
        gmap, _ = insert_points(gmap, batch, jnp.ones(4, bool), kf_id=0)
        assert float(jnp.abs(gmap.moments.mu.xyz[gmap.aux.active]).sum()) == 0.0

    def test_prune_then_reinsert_reuses_slots(self):
        gmap = create_map(8, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=0)
        prune = jnp.arange(8) < 4
        gmap = prune_mask_apply(gmap, prune)
        assert int(gmap.aux.active.sum()) == 4
        batch2 = make_batch(4, jax.random.PRNGKey(2))
        gmap, dropped = insert_points(gmap, batch2, jnp.ones(4, bool), kf_id=1)
        assert int(gmap.aux.active.sum()) == 8
        assert int(dropped) == 0


class TestAdam:
    def test_adam_moves_active_only(self):
        gmap = create_map(8, 0)
        batch = make_batch(4, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(4, bool), kf_id=0)
        grads = jax.tree.map(jnp.ones_like, gmap.params)
        lrs = GaussianParams(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
        before = np.array(gmap.params.xyz)
        params, moments = adam_step(gmap.params, grads, gmap.moments, lrs, gmap.aux.active)
        after = np.array(params.xyz)
        active = np.array(gmap.aux.active)
        assert not np.allclose(after[active], before[active])
        np.testing.assert_array_equal(after[~active], before[~active])
        assert int(moments.count) == 1

    def test_adam_matches_torch_formula(self):
        # single scalar param sanity vs hand-computed Adam
        gmap = create_map(1, 0)
        batch = make_batch(1, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(1, bool), kf_id=0)
        g = 0.5
        grads = jax.tree.map(jnp.zeros_like, gmap.params)
        grads = grads._replace(opacity_logit=jnp.array([g]))
        lrs = GaussianParams(0.0, 0.0, 0.0, 0.0, 0.0, 0.05)
        p0 = float(gmap.params.opacity_logit[0])
        params, _ = adam_step(gmap.params, grads, gmap.moments, lrs, gmap.aux.active)
        mu = 0.1 * g
        nu = 0.001 * g * g
        expected = p0 - 0.05 * (mu / 0.1) / (np.sqrt(nu / 0.001) + 1e-15)
        np.testing.assert_allclose(float(params.opacity_logit[0]), expected, rtol=1e-5)


class TestDensify:
    def _grown_map(self):
        gmap = create_map(64, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=0)
        return gmap

    def test_clone_small_high_grad(self):
        gmap = self._grown_map()
        # log_scales -2 => scale ~0.135; extent such that all are "small"
        aux = gmap.aux._replace(
            grad_accum=jnp.where(gmap.aux.active, 10.0, 0.0),
            denom=jnp.where(gmap.aux.active, 1.0, 0.0),
        )
        gmap = gmap._replace(aux=aux)
        out, dropped = densify_and_prune(
            gmap, jax.random.PRNGKey(1), max_grad=1.0, min_opacity=0.01,
            extent=100.0, max_screen_size=0.0, clone_budget=16, split_budget=8,
        )
        assert int(out.aux.active.sum()) == 16  # 8 originals + 8 clones
        assert int(dropped) == 0

    def test_split_large_high_grad(self):
        gmap = self._grown_map()
        aux = gmap.aux._replace(
            grad_accum=jnp.where(gmap.aux.active, 10.0, 0.0),
            denom=jnp.where(gmap.aux.active, 1.0, 0.0),
        )
        gmap = gmap._replace(aux=aux)
        # tiny extent => everything is "large" => split
        out, _ = densify_and_prune(
            gmap, jax.random.PRNGKey(1), max_grad=1.0, min_opacity=0.01,
            extent=0.001, max_screen_size=0.0, clone_budget=16, split_budget=8,
        )
        # 8 parents pruned, 16 children inserted
        assert int(out.aux.active.sum()) == 16
        scales_out = np.exp(np.array(out.params.log_scales[out.aux.active]))
        assert np.all(scales_out < 0.14)  # children scale = parent/1.6

    def test_low_grad_untouched(self):
        gmap = self._grown_map()
        out, _ = densify_and_prune(
            gmap, jax.random.PRNGKey(1), max_grad=1.0, min_opacity=0.01,
            extent=1.0, max_screen_size=0.0,
        )
        assert int(out.aux.active.sum()) == 8

    def test_opacity_prune(self):
        gmap = self._grown_map()
        low = gmap.params._replace(
            opacity_logit=jnp.where(
                jnp.arange(64) < 4, inverse_sigmoid(jnp.float32(0.001)),
                gmap.params.opacity_logit,
            )
        )
        gmap = gmap._replace(params=low)
        out, _ = densify_and_prune(
            gmap, jax.random.PRNGKey(1), max_grad=1e9, min_opacity=0.005,
            extent=1.0, max_screen_size=0.0,
        )
        assert int(out.aux.active.sum()) == 4


class TestOpacityReset:
    def test_global_reset(self):
        gmap = create_map(8, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=0)
        out = reset_opacity(gmap, 0.01)
        _, _, opa = activations(out.params)
        np.testing.assert_allclose(np.array(opa), 0.01, rtol=1e-4)
        assert float(jnp.abs(out.moments.mu.opacity_logit).sum()) == 0.0

    def test_nonvisible_reset_keeps_visible(self):
        gmap = create_map(8, 0)
        batch = make_batch(8, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(8, bool), kf_id=0)
        vis = jnp.arange(8) < 4
        out = reset_opacity_nonvisible(gmap, vis, 0.4)
        _, _, opa = activations(out.params)
        np.testing.assert_allclose(np.array(opa[:4]), 0.5, rtol=1e-4)
        np.testing.assert_allclose(np.array(opa[4:]), 0.4, rtol=1e-4)


class TestMisc:
    def test_build_rotation_identity(self):
        r = build_rotation(jnp.array([[1.0, 0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_exponential_lr_endpoints(self):
        lr0 = exponential_lr(jnp.array(0), 1e-2, 1e-4, max_steps=100)
        lr1 = exponential_lr(jnp.array(100), 1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(lr0), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(lr1), 1e-4, rtol=1e-5)


class TestResizeCompact:
    """Mapping capacity tiers (models/gaussians.py resize_map/compact_map):
    the static row count tracks the alive set instead of worst-case
    capacity; growing pads with inactive defaults, compaction stably packs
    active rows to the prefix and returns the permutation for host-side
    per-row vectors."""

    def _map_with_holes(self, capacity=256, n=100, prune_every=3):
        from monogs_dev_tpu.models.gaussians import compact_map, resize_map  # noqa

        gmap = create_map(capacity, 0)
        batch = make_batch(n, jax.random.PRNGKey(0))
        gmap, _ = insert_points(gmap, batch, jnp.ones(n, bool), kf_id=7)
        prune = (jnp.arange(capacity) % prune_every == 1) & gmap.aux.active
        return prune_mask_apply(gmap, prune)

    def test_resize_grow_preserves_rows_and_defaults(self):
        from monogs_dev_tpu.models.gaussians import resize_map

        gmap = self._map_with_holes()
        big = resize_map(gmap, 512)
        assert big.aux.active.shape[0] == 512
        np.testing.assert_array_equal(
            np.asarray(big.aux.active[:256]), np.asarray(gmap.aux.active)
        )
        assert not bool(big.aux.active[256:].any())
        # padded rows carry create_map defaults (render-inert)
        np.testing.assert_allclose(np.asarray(big.params.opacity_logit[256:]), -10.0)
        np.testing.assert_allclose(np.asarray(big.params.log_scales[256:]), -10.0)
        np.testing.assert_array_equal(np.asarray(big.aux.kf_id[256:]), -1)
        np.testing.assert_allclose(
            np.asarray(big.params.xyz[:256]), np.asarray(gmap.params.xyz)
        )
        np.testing.assert_allclose(
            np.asarray(big.moments.mu.xyz[:256]), np.asarray(gmap.moments.mu.xyz)
        )

    def test_compact_packs_active_prefix_stably(self):
        from monogs_dev_tpu.models.gaussians import compact_map

        gmap = self._map_with_holes()
        alive = int(np.asarray(gmap.aux.active).sum())
        small, perm = compact_map(gmap, 128)
        assert alive <= 128
        active_s = np.asarray(small.aux.active)
        # all alive rows packed to the prefix
        assert active_s[:alive].all() and not active_s[alive:].any()
        # permutation is stable over the original active rows
        perm_np = np.asarray(perm)
        orig_active_rows = np.flatnonzero(np.asarray(gmap.aux.active))
        np.testing.assert_array_equal(perm_np[:alive], orig_active_rows)
        # row payloads follow the permutation (params + moments + aux)
        np.testing.assert_allclose(
            np.asarray(small.params.xyz[:alive]),
            np.asarray(gmap.params.xyz)[orig_active_rows],
        )
        np.testing.assert_array_equal(
            np.asarray(small.aux.kf_id[:alive]),
            np.asarray(gmap.aux.kf_id)[orig_active_rows],
        )
        np.testing.assert_allclose(
            np.asarray(small.moments.nu.opacity_logit[:alive]),
            np.asarray(gmap.moments.nu.opacity_logit)[orig_active_rows],
        )

    def test_compact_then_render_matches(self):
        """Compaction is render-invariant: same image from the packed map."""
        import jax as _jax

        from monogs_dev_tpu.models import Intrinsics
        from monogs_dev_tpu.models.gaussians import compact_map
        from monogs_dev_tpu.ops import RasterConfig, render_tiled
        from monogs_dev_tpu.data.synthetic import make_synthetic_scene

        intr = Intrinsics(fx=70.0, fy=70.0, cx=40.0, cy=32.0, width=80, height=64)
        rcfg = RasterConfig(tile=16, max_per_tile=128, k_dup=8, tile_group=10)
        params, active = make_synthetic_scene(_jax.random.PRNGKey(3), n=200, scale=0.08)
        gmap = create_map(1024, 0)
        gmap, _ = insert_points(gmap, params, active, kf_id=0)
        prune = (jnp.arange(1024) % 5 == 2) & gmap.aux.active
        gmap = prune_mask_apply(gmap, prune)
        ref = render_tiled(
            gmap.params, gmap.aux.active, jnp.eye(4), intr, 0, config=rcfg
        )
        small, _ = compact_map(gmap, 256)
        out = render_tiled(
            small.params, small.aux.active, jnp.eye(4), intr, 0, config=rcfg
        )
        np.testing.assert_allclose(
            np.asarray(out.color), np.asarray(ref.color), atol=1e-5
        )
