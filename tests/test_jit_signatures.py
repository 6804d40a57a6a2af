"""Jit-cache signature parity between prewarm and production dispatch.

The round-3 driver bench timed out because `SLAM.prewarm` compiled
`mapping_iterations` with a STRONG-typed `iters=jnp.asarray(1, jnp.int32)`
while `BackendEngine.map` dispatched a WEAK-typed Python int — a different
jit cache key — so the tier-small mapping program recompiled (~450 s)
inside the measured window (VERDICT r3 Weak #1 / ADVICE r3). The fix is a
normalization shim at each dispatch boundary; these tests pin the
invariant: every scalar-typing style a caller can plausibly use must land
on ONE compiled program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.core import StepConfig, MapOptConfig
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch,
    make_keyframe_opt_state,
    mapping_iterations,
    visibility_prune,
    _mapping_iterations_jit,
    _visibility_prune_jit,
)
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models import Intrinsics, create_map, insert_points
from monogs_dev_tpu.models.gaussians import (
    insert_points_evict,
    _insert_points_evict_jit,
)
from monogs_dev_tpu.ops import RasterConfig

INTR = Intrinsics(fx=40.0, fy=40.0, cx=20.0, cy=16.0, width=40, height=32)
RCFG = RasterConfig(tile=16, max_per_tile=64, k_dup=4, tile_group=6)
CAP = 256


def tiny_map():
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=64, scale=0.1)
    gmap = create_map(CAP, 0)
    gmap, _ = insert_points(gmap, params, active, kf_id=0)
    return gmap


def tiny_batch(b):
    flags = jnp.arange(b) >= 0
    return KeyframeBatch(
        images=jnp.zeros((b, 32, 40, 3)),
        depths=jnp.full((b, 32, 40), 2.0),
        T_w2c=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        exposure=jnp.zeros((b, 2)),
        valid=flags,
        optimize_pose=jnp.arange(b) > 0,
        optimize_exposure=jnp.arange(b) > 0,
        apply_exposure=flags,
        harvest_visibility=flags,
    )


class TestMappingIterationsSignature:
    def test_weak_and_strong_iters_share_one_program(self):
        gmap, batch = tiny_map(), tiny_batch(3)
        kfs = make_keyframe_opt_state(3)
        cfg, ocfg = StepConfig(monocular=False, window_slots=3), MapOptConfig()
        common = dict(
            update_every=100, update_offset=1, reset_interval=1000,
            size_threshold=0.0, use_depth=True, init_mode=False,
        )

        # prewarm style: strong-typed scalars
        out = mapping_iterations(
            gmap, batch, kfs, jnp.zeros((), jnp.int32), jax.random.PRNGKey(1),
            jnp.zeros(3), jnp.float32(0.005), jnp.float32(6.0),
            cfg, ocfg, INTR, RCFG, iters=jnp.asarray(1, jnp.int32), **common,
        )
        jax.block_until_ready(out.gmap.params.xyz)
        size0 = _mapping_iterations_jit._cache_size()

        # production style (backend.py map): Python-int iters and
        # iteration_count built via jnp.asarray of a host int
        out = mapping_iterations(
            gmap, batch, kfs, jnp.asarray(7, jnp.int32), jax.random.PRNGKey(2),
            jnp.zeros(3), jnp.float32(0.005), jnp.float32(6.0),
            cfg, ocfg, INTR, RCFG, iters=3, **common,
        )
        jax.block_until_ready(out.gmap.params.xyz)
        # a third style: numpy scalars / Python floats
        out = mapping_iterations(
            gmap, batch, kfs, 0, jax.random.PRNGKey(3),
            jnp.zeros(3), 0.005, 6.0,
            cfg, ocfg, INTR, RCFG, iters=np.int64(2), **common,
        )
        jax.block_until_ready(out.gmap.params.xyz)

        assert _mapping_iterations_jit._cache_size() == size0, (
            "scalar-typing style split the mapping_iterations jit cache"
        )


class TestVisibilityPruneSignature:
    def test_numpy_and_jnp_args_share_one_program(self):
        gmap = tiny_map()
        b = 3
        size_before = _visibility_prune_jit._cache_size()

        # prewarm style: all-jnp
        out = visibility_prune(
            gmap, jnp.zeros((b, CAP), bool), jnp.zeros((b,), bool),
            jnp.full((b,), -1, jnp.int32), jnp.zeros((), jnp.int32),
            jnp.asarray(True), "slam", False,
        )
        jax.block_until_ready(out.params.xyz)
        size0 = _visibility_prune_jit._cache_size()
        assert size0 == size_before + 1

        # production style (backend._visibility_prune): numpy arrays,
        # np.int32 scalar, np.asarray(python bool)
        out = visibility_prune(
            gmap, np.zeros((b, CAP), bool), np.zeros((b,), bool),
            np.full((b,), -1, np.int32), np.int32(4),
            np.asarray(False), "slam", False,
        )
        jax.block_until_ready(out.params.xyz)
        # Python scalars
        out = visibility_prune(
            gmap, np.zeros((b, CAP), bool), np.zeros((b,), bool),
            np.full((b,), -1, np.int32), 9, True, "slam", False,
        )
        jax.block_until_ready(out.params.xyz)
        assert _visibility_prune_jit._cache_size() == size0


class TestInsertEvictSignature:
    def test_python_and_numpy_kf_id_share_one_program(self):
        gmap = tiny_map()
        params, active = make_synthetic_scene(
            jax.random.PRNGKey(5), n=64, scale=0.1
        )
        size_before = _insert_points_evict_jit._cache_size()
        g1, _, _ = insert_points_evict(gmap, params, active, 1)  # weak int
        jax.block_until_ready(g1.params.xyz)
        size0 = _insert_points_evict_jit._cache_size()
        assert size0 == size_before + 1
        g2, _, _ = insert_points_evict(gmap, params, active, np.int32(2))
        jax.block_until_ready(g2.params.xyz)
        g3, _, _ = insert_points_evict(
            gmap, params, np.asarray(active), jnp.asarray(3, jnp.int32)
        )
        jax.block_until_ready(g3.params.xyz)
        assert _insert_points_evict_jit._cache_size() == size0


class TestWeakArrayInputs:
    """Round-4 bench killer #2: jnp.full(shape, scalar) WITHOUT a dtype is
    a WEAK-typed array; weak-vs-strong avals split the jit cache even for
    arguments the lowered program prunes as unused (depth under
    use_depth=False). The strongen shims (utils/jit_sig.py) must collapse
    every such variant onto one compiled program."""

    def test_track_frame_weak_depth_and_numpy_inputs_share_one_program(self):
        from monogs_dev_tpu.core.tracking import track_frame, _track_frame_jit

        gmap = tiny_map()
        cfg = StepConfig(monocular=True, tracking_max_iters=3)
        img_strong = jnp.zeros((32, 40, 3)) + 0.5
        img_weak = jnp.full((32, 40, 3), 0.5)  # weak: no dtype given
        dep_strong = jnp.zeros((32, 40), jnp.float32)
        dep_weak = jnp.full((32, 40), 2.0)  # weak

        def call(img, dep, T, e, bg):
            r = track_frame(
                gmap.params, gmap.aux.active, T, e, img, dep, None, bg,
                cfg, INTR, RCFG, use_depth=False,
            )
            jax.block_until_ready(r.T_w2c)

        call(img_strong, dep_strong, jnp.eye(4), jnp.zeros(2), jnp.zeros(3))
        size0 = _track_frame_jit._cache_size()
        # weak arrays, numpy arrays, weak bg — all must hit the same entry
        call(img_weak, dep_weak, jnp.eye(4), jnp.zeros(2), jnp.zeros(3))
        call(
            img_strong, dep_strong, np.eye(4, dtype=np.float32),
            np.zeros(2, np.float32), jnp.full((3,), 0.0),
        )
        assert _track_frame_jit._cache_size() == size0, (
            "weak/numpy input styles split the track_frame jit cache"
        )

    def test_mapping_weak_batch_shares_one_program(self):
        gmap = tiny_map()
        kfs = make_keyframe_opt_state(3)
        cfg, ocfg = StepConfig(monocular=True, window_slots=3), MapOptConfig()
        common = dict(
            update_every=100, update_offset=1, reset_interval=1000,
            size_threshold=0.0, use_depth=False, init_mode=False,
        )

        def batch_with(depths):
            flags = jnp.arange(3) >= 0
            return KeyframeBatch(
                images=jnp.zeros((3, 32, 40, 3)),
                depths=depths,
                T_w2c=jnp.tile(jnp.eye(4)[None], (3, 1, 1)),
                exposure=jnp.zeros((3, 2)),
                valid=flags,
                optimize_pose=jnp.arange(3) > 0,
                optimize_exposure=jnp.arange(3) > 0,
                apply_exposure=flags,
                harvest_visibility=flags,
            )

        def call(batch):
            out = mapping_iterations(
                gmap, batch, kfs, 0, jax.random.PRNGKey(1), jnp.zeros(3),
                0.005, 6.0, cfg, ocfg, INTR, RCFG, iters=1, **common,
            )
            jax.block_until_ready(out.gmap.params.xyz)

        call(batch_with(jnp.full((3, 32, 40), 2.0, jnp.float32)))  # strong
        size0 = _mapping_iterations_jit._cache_size()
        call(batch_with(jnp.full((3, 32, 40), 2.0)))  # weak
        assert _mapping_iterations_jit._cache_size() == size0, (
            "weak-typed batch depths split the mapping jit cache"
        )
