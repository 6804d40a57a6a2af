"""Tracking / insertion / mapping step behavior on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.core import (
    StepConfig,
    MapOptConfig,
    new_points_from_frame,
    pseudo_depth_map,
    track_frame,
)
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch,
    make_keyframe_opt_state,
    mapping_iterations,
)
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.geometry import se3_exp
from monogs_dev_tpu.models import Intrinsics, create_map, insert_points
from monogs_dev_tpu.ops import RasterConfig, render_tiled

INTR = Intrinsics(fx=70.0, fy=70.0, cx=40.0, cy=32.0, width=80, height=64)
RCFG = RasterConfig(tile=16, max_per_tile=128, k_dup=8, tile_group=10)


def scene_map(n=400, capacity=1024):
    params, active = make_synthetic_scene(jax.random.PRNGKey(3), n=n, scale=0.08)
    gmap = create_map(capacity, 0)
    gmap, _ = insert_points(gmap, params, active, kf_id=0)
    return gmap


class TestTracking:
    def test_recovers_pose_perturbation(self):
        gmap = scene_map()
        T_true = jnp.eye(4)
        gt = render_tiled(gmap.params, gmap.aux.active, T_true, INTR, 0, config=RCFG)
        tau = jnp.array([0.02, -0.015, 0.01, 0.004, -0.003, 0.002])
        T_init = se3_exp(tau) @ T_true

        cfg = StepConfig(monocular=False, tracking_max_iters=60)
        res = track_frame(
            gmap.params,
            gmap.aux.active,
            T_init,
            jnp.zeros(2),
            gt.color,
            gt.depth / jnp.maximum(gt.alpha, 1e-6),
            jnp.ones((64, 80), bool),
            jnp.zeros(3),
            cfg,
            INTR,
            RCFG,
            use_depth=True,
        )
        err_before = float(jnp.linalg.norm(T_init[:3, 3] - T_true[:3, 3]))
        err_after = float(jnp.linalg.norm(res.T_w2c[:3, 3] - T_true[:3, 3]))
        assert err_after < err_before * 0.5, (err_before, err_after)
        assert int(res.n_iters) > 0

    def test_pyramid_recovers_pose(self):
        # coarse-to-fine variant (TPU extension): same recovery property
        # with one half-res level before the full-res loop
        gmap = scene_map()
        T_true = jnp.eye(4)
        gt = render_tiled(gmap.params, gmap.aux.active, T_true, INTR, 0, config=RCFG)
        tau = jnp.array([0.02, -0.015, 0.01, 0.004, -0.003, 0.002])
        T_init = se3_exp(tau) @ T_true
        cfg = StepConfig(
            monocular=False, tracking_max_iters=40, pyramid_levels=1,
            pyramid_coarse_iters=30,
        )
        res = track_frame(
            gmap.params, gmap.aux.active, T_init, jnp.zeros(2),
            gt.color, gt.depth / jnp.maximum(gt.alpha, 1e-6),
            jnp.ones((64, 80), bool), jnp.zeros(3),
            cfg, INTR, RCFG, use_depth=True,
        )
        err_before = float(jnp.linalg.norm(T_init[:3, 3] - T_true[:3, 3]))
        err_after = float(jnp.linalg.norm(res.T_w2c[:3, 3] - T_true[:3, 3]))
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_stays_at_optimum(self):
        # from a perfect init the pose must not drift: Adam takes lr-sized
        # steps even on tiny gradients (scale invariance — same as the
        # reference's torch Adam), so we assert boundedness, not the
        # convergence flag.
        gmap = scene_map()
        gt = render_tiled(gmap.params, gmap.aux.active, jnp.eye(4), INTR, 0, config=RCFG)
        cfg = StepConfig(monocular=False, tracking_max_iters=30)
        res = track_frame(
            gmap.params, gmap.aux.active, jnp.eye(4), jnp.zeros(2),
            gt.color, gt.depth, jnp.ones((64, 80), bool), jnp.zeros(3),
            cfg, INTR, RCFG, use_depth=True,
        )
        assert float(jnp.linalg.norm(res.T_w2c[:3, 3])) < 5e-3
        rot_err = float(jnp.linalg.norm(res.T_w2c[:3, :3] - jnp.eye(3)))
        assert rot_err < 5e-3


class TestInsertion:
    def test_backprojection_geometry(self):
        # flat plane at z=2: backprojected points must be at depth 2 in cam space
        h, w = INTR.height, INTR.width
        depth = jnp.full((h, w), 2.0)
        image = jnp.full((h, w, 3), 0.5)
        params, valid = new_points_from_frame(
            jax.random.PRNGKey(0), image, depth, jnp.zeros(2), jnp.eye(4),
            INTR, 0, budget=512, downsample=8, point_size=0.01,
            adaptive_pointsize=True,
        )
        pts = np.asarray(params.xyz)[np.asarray(valid)]
        assert pts.shape[0] > 100
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
        # colors -> SH dc of 0.5
        from monogs_dev_tpu.geometry.sh import sh_to_rgb

        rgb = sh_to_rgb(np.asarray(params.f_dc)[np.asarray(valid), 0])
        np.testing.assert_allclose(rgb, 0.5, atol=1e-5)

    def test_downsample_rate(self):
        h, w = INTR.height, INTR.width
        depth = jnp.full((h, w), 2.0)
        image = jnp.full((h, w, 3), 0.5)
        _, valid = new_points_from_frame(
            jax.random.PRNGKey(1), image, depth, jnp.zeros(2), jnp.eye(4),
            INTR, 0, budget=2048, downsample=8, point_size=0.01,
            adaptive_pointsize=False,
        )
        n = int(valid.sum())
        expect = h * w / 8
        assert abs(n - expect) < 0.25 * expect

    def test_invalid_depth_excluded(self):
        h, w = INTR.height, INTR.width
        depth = jnp.zeros((h, w)).at[:, : w // 2].set(2.0)
        image = jnp.full((h, w, 3), 0.5)
        params, valid = new_points_from_frame(
            jax.random.PRNGKey(2), image, depth, jnp.zeros(2), jnp.eye(4),
            INTR, 0, budget=2048, downsample=4, point_size=0.01,
            adaptive_pointsize=False,
        )
        pts = np.asarray(params.xyz)[np.asarray(valid)]
        assert np.all(pts[:, 2] > 0)
        # all selected pixels are on the valid (left, x<0 in cam coords) half
        assert np.all(pts[:, 0] < 0.01)

    def test_pseudo_depth_zeroes_invalid_rgb(self):
        h, w = 32, 32
        depth_r = jnp.full((h, w), 3.0)
        opac = jnp.ones((h, w))
        img = jnp.zeros((h, w, 3)).at[: h // 2].set(0.5)
        out = pseudo_depth_map(jax.random.PRNGKey(0), depth_r, opac, img)
        out = np.asarray(out)
        assert np.all(out[h // 2 :] == 0.0)
        assert np.all(np.abs(out[: h // 2] - 3.0) < 1.0)


def _perturbed_mapping_fixture():
    """(noisy map, 3-view KeyframeBatch, kf_state): shared by the mapping
    convergence and in-program-rebin tests."""
    gt_map = scene_map()
    scene_T = [jnp.eye(4)]
    for tau in ([0.1, 0.0, 0.0, 0.0, 0.05, 0.0], [-0.1, 0.05, 0.0, 0.0, -0.05, 0.0]):
        scene_T.append(se3_exp(jnp.array(tau)) @ jnp.eye(4))
    frames = [
        render_tiled(gt_map.params, gt_map.aux.active, T, INTR, 0, config=RCFG)
        for T in scene_T
    ]
    noisy_params = gt_map.params._replace(
        xyz=gt_map.params.xyz
        + 0.02 * jax.random.normal(jax.random.PRNGKey(7), gt_map.params.xyz.shape)
    )
    gmap = gt_map._replace(params=noisy_params)
    b = 5
    images = jnp.stack(
        [f.color for f in frames] + [jnp.zeros_like(frames[0].color)] * 2
    )
    depths = jnp.stack(
        [f.depth / jnp.maximum(f.alpha, 1e-6) for f in frames]
        + [jnp.zeros_like(frames[0].depth)] * 2
    )
    batch = KeyframeBatch(
        images=images,
        depths=depths,
        T_w2c=jnp.stack(scene_T + [jnp.eye(4)] * 2),
        exposure=jnp.zeros((b, 2)),
        valid=jnp.array([True] * 3 + [False] * 2),
        optimize_pose=jnp.zeros(b, bool),
        optimize_exposure=jnp.zeros(b, bool),
        apply_exposure=jnp.zeros(b, bool),
        harvest_visibility=jnp.array([True] * 3 + [False] * 2),
    )
    return gmap, batch, make_keyframe_opt_state(b), b


class TestMappingConvergence:
    def test_loss_decreases(self):
        # optimize a perturbed map against 3 GT views
        gt_map = scene_map()
        scene_T = [jnp.eye(4)]
        for tau in ([0.1, 0.0, 0.0, 0.0, 0.05, 0.0], [-0.1, 0.05, 0.0, 0.0, -0.05, 0.0]):
            scene_T.append(se3_exp(jnp.array(tau)) @ jnp.eye(4))
        frames = [
            render_tiled(gt_map.params, gt_map.aux.active, T, INTR, 0, config=RCFG)
            for T in scene_T
        ]

        noisy_params = gt_map.params._replace(
            xyz=gt_map.params.xyz
            + 0.02 * jax.random.normal(jax.random.PRNGKey(7), gt_map.params.xyz.shape)
        )
        gmap = gt_map._replace(params=noisy_params)

        b = 5
        cfg = StepConfig(monocular=False, window_slots=b)
        images = jnp.stack(
            [f.color for f in frames] + [jnp.zeros_like(frames[0].color)] * 2
        )
        depths = jnp.stack(
            [f.depth / jnp.maximum(f.alpha, 1e-6) for f in frames]
            + [jnp.zeros_like(frames[0].depth)] * 2
        )
        batch = KeyframeBatch(
            images=images,
            depths=depths,
            T_w2c=jnp.stack(scene_T + [jnp.eye(4)] * 2),
            exposure=jnp.zeros((b, 2)),
            valid=jnp.array([True] * 3 + [False] * 2),
            optimize_pose=jnp.zeros(b, bool),
            optimize_exposure=jnp.zeros(b, bool),
            apply_exposure=jnp.zeros(b, bool),
            harvest_visibility=jnp.array([True] * 3 + [False] * 2),
        )
        kfs = make_keyframe_opt_state(b)

        losses = []
        it = jnp.zeros((), jnp.int32)
        for step in range(4):
            out = mapping_iterations(
                gmap, batch, kfs, it, jax.random.PRNGKey(step),
                jnp.zeros(3), jnp.float32(0.005), jnp.float32(180.0),
                cfg, MapOptConfig(), INTR, RCFG,
                iters=10, update_every=1000000, update_offset=50,
                reset_interval=1000000, size_threshold=0.0,
                use_depth=True, init_mode=False,
            )
            gmap, kfs, it = out.gmap, out.kf_state, out.iteration_count
            losses.append(float(out.last_loss))
        assert losses[-1] < losses[0] * 0.92, losses
        assert all(b <= a for a, b in zip(losses, losses[1:])), losses

    def test_in_program_rebin_beats_stale_binning_across_densify(self):
        """cfg.mapping_rebin_every > 0 rebuilds the per-slot binnings inside
        the jitted loop (core/mapping.py body), so densify children render
        from the next iteration and moving means keep full tile lists; a
        single long dispatch with a densify mid-chunk must therefore end at
        a LOWER loss than the same dispatch with entry-only binnings."""
        common = dict(
            iters=12, update_every=10, update_offset=5,
            reset_interval=1000000, size_threshold=0.0,
            use_depth=True, init_mode=False,
        )
        finals = {}
        for re_every in (0, 4):
            gmap, batch, kfs, b = _perturbed_mapping_fixture()
            cfg = StepConfig(
                monocular=False, window_slots=b, mapping_rebin_every=re_every
            )
            out = mapping_iterations(
                gmap, batch, kfs, 0, jax.random.PRNGKey(1), jnp.zeros(3),
                jnp.float32(0.005), jnp.float32(6.0), cfg, MapOptConfig(),
                INTR, RCFG, **common,
            )
            finals[re_every] = float(out.last_loss)
            # the rebin arm's drift is measured vs its LAST in-loop rebin
            if re_every:
                assert float(out.bulk_drift) < 1.0
        assert finals[4] < finals[0], finals


class TestAdaptiveChunkController:
    """next_chunk: binning-reuse feedback control (core/backend.py)."""

    def test_shrinks_toward_exact_on_drift(self):
        from monogs_dev_tpu.core.backend import next_chunk

        # proportional: heavy drift jumps straight to the exact chunk
        # (binning rebuilt every iteration)
        assert next_chunk(8, drift=10.0, dilation=4.0, current=8, map_chunk=25) == 1
        # moderate drift lands on the 60%-margin chunk: per-iter 0.25 px,
        # 0.6*4/0.25 = 9.6 -> 9
        assert next_chunk(8, drift=2.0, dilation=4.0, current=8, map_chunk=25) == 9

    def test_regrows_from_pinned_chunk1(self):
        from monogs_dev_tpu.core.backend import next_chunk

        # the round-4 bench regression case: p99.5 tail drift of ~1 px/iter
        # at chunk=1 must NOT pin the chunk at 1 (target 2.4, damped to 2x)
        assert next_chunk(1, drift=1.0, dilation=4.0, current=1, map_chunk=25) == 2
        assert next_chunk(2, drift=2.0, dilation=4.0, current=2, map_chunk=25) == 2
        # calmer drift converges to the proportional target
        assert next_chunk(2, drift=1.0, dilation=4.0, current=2, map_chunk=25) == 4
        assert next_chunk(4, drift=2.0, dilation=4.0, current=4, map_chunk=25) == 4

    def test_stationary_jumps_toward_max(self):
        from monogs_dev_tpu.core.backend import next_chunk

        # effectively-zero drift heads for map_chunk, damped 2x per step
        assert next_chunk(4, drift=0.0, dilation=4.0, current=4, map_chunk=25) == 8
        assert next_chunk(25, drift=0.1, dilation=4.0, current=25, map_chunk=25) == 25


class TestAdaptiveTrackCompaction:
    """Adaptive tracking working-set compaction (VERDICT r4 #1):
    TrackResult.n_binned telemetry + the frontend's rung choice."""

    def test_n_binned_reported_and_compaction_bit_exact(self):
        gmap = scene_map()
        T_true = jnp.eye(4)
        gt = render_tiled(gmap.params, gmap.aux.active, T_true, INTR, 0, config=RCFG)
        tau = jnp.array([0.01, -0.008, 0.005, 0.002, -0.002, 0.001])
        T_init = se3_exp(tau) @ T_true
        depth_gt = gt.depth / jnp.maximum(gt.alpha, 1e-6)
        mask = jnp.ones((64, 80), bool)

        def run(m):
            cfg = StepConfig(
                monocular=False, tracking_max_iters=20, track_compact=m
            )
            return track_frame(
                gmap.params, gmap.aux.active, T_init, jnp.zeros(2),
                gt.color, depth_gt, mask, jnp.zeros(3), cfg, INTR, RCFG,
                use_depth=True,
            )

        full = run(0)
        nb = int(full.n_binned)
        assert 0 < nb <= 1024
        # a working set >= n_binned drops nothing and is bit-exact
        m = min(1024 - 1, nb + 8)
        comp = run(m)
        assert int(comp.compact_dropped) == 0
        # forward renders are bit-exact (same entries, same depth order);
        # the GRADIENT path sums over m rows instead of n, so the partial-
        # sum tree differs in rounding — numerically equivalent, not
        # bitwise (measured 1.6e-9 over 20 iterations on this scene)
        np.testing.assert_allclose(
            np.asarray(comp.T_w2c), np.asarray(full.T_w2c),
            rtol=0, atol=1e-6,
        )
        assert int(comp.n_binned) == nb

    def test_choose_compact_policy(self):
        import types

        from monogs_dev_tpu.core.frontend import FrontEnd

        def fake(mode, hist, cur=0, tier_small=32768):
            return types.SimpleNamespace(
                track_compact_mode=mode,
                _binned_hist=hist,
                _compact_m=cur,
                engine=types.SimpleNamespace(tier_small=tier_small),
                _compact_ladder=FrontEnd._compact_ladder,
            )

        choose = FrontEnd._choose_compact
        # off / fixed modes
        assert choose(fake(0, [100]), 32768) == 0
        assert choose(fake(4096, [100]), 32768) == 4096
        assert choose(fake(40000, [100]), 32768) == 0  # fixed >= tier: off
        # adaptive: no history or bootstrap tier -> full
        assert choose(fake(-1, []), 32768) == 0
        assert choose(fake(-1, [1000], tier_small=16384), 32768) == 0
        # adaptive: smallest rung with a 1.35x margin
        assert choose(fake(-1, [11000]), 32768) == 16384
        assert choose(fake(-1, [15000]), 32768) == 24576
        assert choose(fake(-1, [25000]), 32768) == 0  # no rung fits
        # sticky: current rung kept while it holds a 1.2x margin
        assert choose(fake(-1, [13000], cur=16384), 32768) == 16384
        # shrink allowed when the smaller rung regains the full margin
        assert choose(fake(-1, [11000], cur=24576), 32768) == 16384
        # growth forced when the margin is lost
        assert choose(fake(-1, [14500], cur=16384), 32768) == 24576


class TestGaussNewtonTracking:
    """core/tracking_gn.py: the damped GN/LM pose solver (round-5 TPU-first
    redesign of the reference's <=100-iteration Adam loop)."""

    def _setup(self):
        gmap = scene_map()
        T_true = jnp.eye(4)
        gt = render_tiled(
            gmap.params, gmap.aux.active, T_true, INTR, 0, config=RCFG
        )
        tau = jnp.array([0.02, -0.015, 0.01, 0.004, -0.003, 0.002])
        T_init = se3_exp(tau) @ T_true
        depth_gt = gt.depth / jnp.maximum(gt.alpha, 1e-6)
        return gmap, T_true, T_init, gt, depth_gt

    def test_rgbd_recovers_pose(self):
        from monogs_dev_tpu.core.tracking_gn import track_frame_gn

        gmap, T_true, T_init, gt, depth_gt = self._setup()
        cfg = StepConfig(monocular=False, tracking_max_iters=25)
        res = track_frame_gn(
            gmap.params, gmap.aux.active, T_init, jnp.zeros(2),
            gt.color, depth_gt, jnp.ones((64, 80), bool), jnp.zeros(3),
            cfg, INTR, RCFG, use_depth=True,
        )
        eb = float(jnp.linalg.norm(T_init[:3, 3] - T_true[:3, 3]))
        ea = float(jnp.linalg.norm(res.T_w2c[:3, 3] - T_true[:3, 3]))
        assert ea < eb * 0.35, (eb, ea)
        assert int(res.n_binned) > 0

    def test_mono_recovers_pose(self):
        from monogs_dev_tpu.core.tracking_gn import track_frame_gn

        gmap, T_true, T_init, gt, depth_gt = self._setup()
        cfg = StepConfig(monocular=True, tracking_max_iters=25)
        res = track_frame_gn(
            gmap.params, gmap.aux.active, T_init, jnp.zeros(2),
            gt.color, depth_gt, jnp.ones((64, 80), bool), jnp.zeros(3),
            cfg, INTR, RCFG, use_depth=False,
        )
        eb = float(jnp.linalg.norm(T_init[:3, 3] - T_true[:3, 3]))
        ea = float(jnp.linalg.norm(res.T_w2c[:3, 3] - T_true[:3, 3]))
        assert ea < eb * 0.5, (eb, ea)

    def test_stays_at_optimum(self):
        from monogs_dev_tpu.core.tracking_gn import track_frame_gn

        gmap, T_true, _, gt, depth_gt = self._setup()
        cfg = StepConfig(monocular=False, tracking_max_iters=10)
        res = track_frame_gn(
            gmap.params, gmap.aux.active, T_true, jnp.zeros(2),
            gt.color, depth_gt, jnp.ones((64, 80), bool), jnp.zeros(3),
            cfg, INTR, RCFG, use_depth=True,
        )
        drift = float(jnp.linalg.norm(res.T_w2c[:3, 3] - T_true[:3, 3]))
        assert drift < 2e-3, drift


class TestNaNRowQuarantine:
    """ops/project.py sanitize_params: non-finite map rows must not poison
    pose gradients through 0 * NaN backward propagation (the realsense
    replay failure: NaN-diverged rows left by a 10x-LR init BA made every
    subsequent tracking pose NaN from the first iteration)."""

    def test_nan_rows_do_not_poison_pose_gradients(self):
        gmap = scene_map()
        # corrupt a band of rows the way a diverged+pruned gaussian looks
        bad = jnp.arange(50, 80)
        params = gmap.params._replace(
            xyz=gmap.params.xyz.at[bad].set(jnp.nan),
            log_scales=gmap.params.log_scales.at[bad].set(jnp.nan),
            quats=gmap.params.quats.at[bad].set(jnp.nan),
        )
        active = gmap.aux.active.at[bad].set(False)
        T_true = jnp.eye(4)
        gt = render_tiled(params, active, T_true, INTR, 0, config=RCFG)
        assert bool(jnp.isfinite(gt.color).all())

        cfg = StepConfig(monocular=False, tracking_max_iters=10)
        res = track_frame(
            params, active, T_true, jnp.zeros(2), gt.color,
            gt.depth / jnp.maximum(gt.alpha, 1e-6),
            jnp.ones((64, 80), bool), jnp.zeros(3), cfg, INTR, RCFG,
            use_depth=True,
        )
        assert bool(jnp.isfinite(res.T_w2c).all())
        # ALSO with NaN rows still marked active (mid-divergence state)
        res2 = track_frame(
            params, gmap.aux.active, T_true, jnp.zeros(2), gt.color,
            gt.depth / jnp.maximum(gt.alpha, 1e-6),
            jnp.ones((64, 80), bool), jnp.zeros(3), cfg, INTR, RCFG,
            use_depth=True,
        )
        assert bool(jnp.isfinite(res2.T_w2c).all())


class TestSHViewDirGradient:
    """sh_degree>0 pose gradients with a gaussian AT the camera center:
    the dirs normalize must use the eps-under-sqrt pattern — norm(0) has
    an inf derivative that a post-hoc maximum() cannot mask (0-cotangent x
    inf = NaN poisoned ALL sh3 pose gradients; replay e2e root cause)."""

    def test_gaussian_at_camera_center_keeps_grads_finite(self):
        from monogs_dev_tpu.ops.project import project_gaussians

        n = 8
        rng = jax.random.PRNGKey(0)
        xyz = jax.random.normal(rng, (n, 3)) + jnp.array([0.0, 0.0, 2.0])
        T = jnp.eye(4)
        cam_center = jnp.zeros(3)  # -R^T t for identity pose
        xyz = xyz.at[3].set(cam_center)  # exactly at the camera
        from monogs_dev_tpu.models.gaussians import GaussianParams, inverse_sigmoid

        params = GaussianParams(
            xyz=xyz,
            f_dc=jnp.full((n, 1, 3), 0.3),
            f_rest=jnp.zeros((n, 15, 3)).at[:, 0].set(0.1),
            log_scales=jnp.full((n, 3), jnp.log(0.05)),
            quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            opacity_logit=jnp.full((n,), inverse_sigmoid(jnp.float32(0.9))),
        )
        active = jnp.ones((n,), bool)

        def loss(tau):
            Tn = se3_exp(tau) @ T
            pr = project_gaussians(params, active, Tn, INTR, 3)
            return pr.color.sum() + jnp.where(pr.valid, pr.depth, 0.0).sum()

        g = jax.grad(loss)(jnp.zeros(6))
        assert bool(jnp.isfinite(g).all()), g
