"""System-level tests: end-to-end SLAM on tiny synthetic scenes, the
threaded frontend/backend split, and the viz snapshot protocol."""

import os

import numpy as np
import pytest

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_config(**overrides):
    cfg = load_config(os.path.join(REPO, "configs/synthetic/tiny_rgbd.yaml"))
    for key, value in overrides.items():
        group, name = key.split(".")
        cfg[group][name] = value
    return cfg


class TestSurfaceSceneAccuracy:
    """Committed accuracy regression (VERDICT r1 task 5): TUM-like RGB-D
    tracking on the 2.5D textured-relief surface scene must reach
    few-centimeter ATE, not just finiteness. Reference behavior:
    pose_utils.py:76-93 retraction + eval_utils.py:68-113 Umeyama ATE."""

    @pytest.mark.slow
    def test_ate_under_three_cm(self):
        from monogs_dev_tpu.eval.ate import eval_ate

        cfg = load_config(
            os.path.join(REPO, "configs/synthetic/surface_160.yaml")
        )
        cfg["Results"]["save_results"] = False
        slam = SLAM(cfg, save_dir=None)
        slam.run()
        fe = slam.frontend
        assert len(fe.kf_indices) >= 5
        ate = eval_ate(
            fe.cameras, fe.kf_indices, None, 0, final=True,
            monocular=slam.monocular,
        )
        slam.stop()
        assert ate < 0.03, f"surface-scene ATE {ate * 100:.2f} cm >= 3 cm"

    @pytest.mark.slow
    def test_tum_fixture_ate_under_three_cm(self):
        """End-to-end over the COMMITTED TUM-format fixture (real TUM
        parser, 16-bit depth PNGs, assoc window): measured 0.84 cm on v5e
        2026-08-21 — the earlier 12.87 cm record was a round-3-era code
        artifact, not a fixture-depth problem (the expected-vs-median
        depth A/B in tools/probe_fixture_depth.py measures 0.84 vs 1.30 cm
        on regenerated fixtures). Bar at 3 cm, same as the analytic-depth
        surface gate."""
        from monogs_dev_tpu.eval.ate import eval_ate

        fixture = os.path.join(REPO, "tests", "fixtures", "tum_surface")
        if not os.path.isdir(fixture):
            pytest.skip("fixture not generated")
        cfg = load_config(
            os.path.join(REPO, "configs/rgbd/tum/fixture_surface.yaml")
        )
        cfg["Results"]["save_results"] = False
        slam = SLAM(cfg, save_dir=None)
        slam.run()
        fe = slam.frontend
        assert len(fe.kf_indices) >= 5
        ate = eval_ate(
            fe.cameras, fe.kf_indices, None, 0, final=True,
            monocular=slam.monocular,
        )
        slam.stop()
        assert ate < 0.03, f"TUM-fixture ATE {ate * 100:.2f} cm >= 3 cm"

    @pytest.mark.slow
    def test_sp_budgets_ate_under_1p5_cm(self):
        """Serialized-backend (`_sp`) semantics regression: the Replica
        office0_sp budget set (init 1050, 150 iters/kf, Dataset.single_thread)
        measured 0.44 cm / PSNR 38.7 on v5e (BASELINE.md 2026-08-21); bar at
        1.5 cm. Reference: configs/rgbd/replica/office0_sp.yaml,
        slam_backend.py:421-433 budget dispatch."""
        from monogs_dev_tpu.eval.ate import eval_ate

        cfg = load_config(
            os.path.join(REPO, "configs/synthetic/surface_sp_160.yaml")
        )
        cfg["Results"]["save_results"] = False
        slam = SLAM(cfg, save_dir=None)
        slam.run()
        fe = slam.frontend
        assert len(fe.kf_indices) >= 6
        ate = eval_ate(
            fe.cameras, fe.kf_indices, None, 0, final=True,
            monocular=slam.monocular,
        )
        slam.stop()
        assert ate < 0.015, f"_sp-budget ATE {ate * 100:.2f} cm >= 1.5 cm"


class TestSingleThreadE2E:
    def test_runs_and_maps(self):
        cfg = tiny_config()
        slam = SLAM(cfg, save_dir=None)
        slam.run(max_frames=10)
        e, fe = slam.engine, slam.frontend
        assert len(fe.kf_indices) >= 1
        assert int(np.asarray(e.gmap.aux.active).sum()) > 50
        # all tracked poses recorded and finite
        assert len(fe.cameras) == 10
        for cam in fe.cameras.values():
            assert np.all(np.isfinite(cam.T_est))
        slam.stop()

    def test_evaluate_emits_metrics(self, tmp_path):
        cfg = tiny_config()
        cfg["Training"]["refinement_itr_num"] = 5
        slam = SLAM(cfg, save_dir=str(tmp_path))
        slam.run(max_frames=8)
        results = slam.evaluate(eval_rendering_flag=True)
        assert np.isfinite(results["ate"])
        assert np.isfinite(results["before_opt"]["mean_psnr"])
        assert results["n_keyframes"] >= 1
        # artifacts written
        assert os.path.exists(tmp_path / "plot")
        assert os.path.exists(tmp_path / "point_cloud" / "final" / "point_cloud.ply")
        slam.stop()


class TestTrackingCapacityTiers:
    @pytest.mark.slow  # compiles a second (8192) program family
    def test_small_tier_used_and_padded(self):
        # capacity 8192 -> tiers [4096, 8192]; the tiny scene stays far
        # below 4096 alive, so tracking must run on the small tier while
        # n_touched / keyframe policy still see capacity-sized vectors
        cfg = tiny_config(**{"TPU.capacity": 8192})
        slam = SLAM(cfg, save_dir=None)
        fe = slam.frontend
        assert fe.track_tiers == [4096, 8192]
        slam.run(max_frames=8)
        # _snapshot_hw is lazily recomputed per tracking call (and
        # invalidated by every backend sync); force one resolution here
        assert fe._tracking_tier(fe.snapshot[1]) == 4096
        assert fe._snapshot_hw is not None and fe._snapshot_hw <= 4096
        assert len(fe.kf_indices) >= 1
        for cam in fe.cameras.values():
            assert np.all(np.isfinite(cam.T_est))
        slam.stop()


class TestSingleThreadFlags:
    """The reference has TWO same-named flags (SURVEY.md §2.14):
    Training.single_thread (frontend backpressure, slam_frontend.py:55) and
    Dataset.single_thread (backend serialization at mapping_itr_num
    iters/kf, slam_backend.py:61-65). The `_sp` Replica configs set only
    the Dataset one."""

    def test_sp_config_serializes_backend(self):
        from monogs_dev_tpu.core.system import resolve_thread_flags

        sp = load_config(
            os.path.join(REPO, "configs/rgbd/replica/office0_sp.yaml")
        )
        mp = load_config(
            os.path.join(REPO, "configs/rgbd/replica/office0.yaml")
        )
        # Replica base sets the frontend flag for BOTH variants; only _sp
        # sets the backend flag
        assert resolve_thread_flags(sp) == (True, True)
        assert resolve_thread_flags(mp) == (True, False)

    def test_backend_flag_selects_direct_mode(self):
        # Dataset.single_thread -> schedulerless direct mode, where
        # handle_keyframe runs with single_thread=True (mapping_itr_num
        # iters/kf, backend.py keyframe handler)
        slam = SLAM(tiny_config(), save_dir=None)
        assert slam.backend_single_thread and slam.backend_thread is None
        slam.stop()
        cfg = tiny_config(**{"Dataset.single_thread": False})
        slam = SLAM(cfg, save_dir=None)
        assert not slam.backend_single_thread
        assert slam.backend_thread is not None
        assert slam.backend_thread.single_thread is False
        slam.stop()


class TestThreadedMode:
    def test_frontend_backend_threads(self):
        cfg = tiny_config()
        cfg["Training"]["single_thread"] = False
        cfg["Dataset"]["single_thread"] = False
        slam = SLAM(cfg, save_dir=None)
        assert slam.backend_thread is not None
        slam.run(max_frames=8)
        assert len(slam.frontend.kf_indices) >= 1
        assert int(np.asarray(slam.engine.gmap.aux.active).sum()) > 0
        slam.stop()
        assert not slam.backend_thread.is_alive()


class TestVizChannel:
    def test_latest_wins_and_pause(self):
        from monogs_dev_tpu.viz import GaussianPacket, VizChannel

        ch = VizChannel(maxsize=2)
        for i in range(5):
            ch.publish(GaussianPacket(xyz=np.zeros((i + 1, 3))))
        packet = ch.latest()
        assert packet is not None and packet.xyz.shape[0] == 5
        assert ch.latest() is None  # drained

        ch.request_pause(True)
        ctrl = ch.poll_control()
        assert ctrl is not None and ctrl.flag_pause
        assert ch.poll_control() is None

    def test_packet_from_map(self):
        import jax

        from monogs_dev_tpu.data.synthetic import make_synthetic_scene
        from monogs_dev_tpu.viz import GaussianPacket

        params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=32)
        packet = GaussianPacket.from_map(params, active)
        assert packet.xyz.shape == (32, 3)
        assert packet.rgb.min() >= 0.0 and packet.rgb.max() <= 1.0

    def test_render_view_modes(self):
        import jax

        from monogs_dev_tpu.data.synthetic import make_synthetic_scene
        from monogs_dev_tpu.models.camera import Intrinsics
        from monogs_dev_tpu.ops import RasterConfig
        from monogs_dev_tpu.viz import render_view

        params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=64)
        intr = Intrinsics(fx=40.0, fy=40.0, cx=16.0, cy=16.0, width=32, height=32)
        cfg = RasterConfig(max_per_tile=64, k_dup=4, tile_group=4)
        for mode in ("color", "depth", "opacity"):
            img = render_view(
                params, active, np.eye(4), intr, mode=mode, raster_cfg=cfg
            )
            assert img.shape == (32, 32, 3)
            assert np.all(np.isfinite(img))


class TestCheckpointResume:
    """Full-state save -> fresh process-equivalent SLAM -> resume ->
    continue. The reference is save-only PLY (SURVEY.md §5); resume is a
    capability extension, so the invariants tested are internal: the map
    (incl. Adam moments) round-trips bitwise, keyframe images rebuild from
    the dataset, and the continued run keeps tracking/keyframing."""

    @pytest.mark.slow  # two SLAM instances + 20-frame continuation
    def test_resume_continues_sequence(self, tmp_path):
        cfg = tiny_config()
        slam1 = SLAM(cfg, save_dir=None)
        slam1.run(max_frames=12)
        n_kf_1 = len(slam1.frontend.kf_indices)
        alive_1 = int(np.asarray(slam1.engine.gmap.aux.active).sum())
        path = str(tmp_path / "ck.npz")
        from monogs_dev_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, slam1.engine, slam1.frontend)
        slam1.stop()

        slam2 = SLAM(tiny_config(), save_dir=None)
        next_frame = slam2.resume(path)
        assert next_frame == 12
        # map round-trips: same alive rows and bitwise-equal means
        assert int(np.asarray(slam2.engine.gmap.aux.active).sum()) == alive_1
        # trajectory + keyframe bookkeeping restored
        assert len(slam2.frontend.cameras) == 12
        assert slam2.frontend.kf_indices == slam1.frontend.kf_indices
        assert slam2.engine.current_window == slam1.engine.current_window
        # keyframe images rebuilt from the dataset (device arrays, right shape)
        kf0 = next(iter(slam2.engine.viewpoints.values()))
        assert kf0.image.shape[-1] == 3

        slam2.run(max_frames=20)
        fe = slam2.frontend
        assert len(fe.cameras) == 20
        for cam in fe.cameras.values():
            assert np.all(np.isfinite(cam.T_est))
        assert len(fe.kf_indices) >= n_kf_1  # keyframing continued
        slam2.stop()


class TestMonoSurfaceAccuracy:
    """Monocular end-to-end quality gate (VERDICT r2 next-round #3): the
    headline capability — pose-gradient tracking, pseudo-depth keyframe
    insertion, mono bootstrap + init-BA — on the textured surface scene
    with exact GT. Umeyama-with-scale ATE (mono gauge). Anchor run on v5e
    2026-08-21: ATE 1.11 cm, PSNR 27.3, 9 keyframes / 120 frames (round-4
    code reached RGB-D parity; the 2026-08-19 anchor was 17.4 cm). Bar at
    8 cm absorbs bootstrap stochasticity while catching any regression
    toward the old regime."""

    @pytest.mark.slow
    def test_mono_ate_under_bar(self):
        from monogs_dev_tpu.eval.ate import eval_ate

        cfg = load_config(
            os.path.join(REPO, "configs/synthetic/surface_mono_160.yaml")
        )
        cfg["Results"]["save_results"] = False
        slam = SLAM(cfg, save_dir=None)
        slam.run()
        fe = slam.frontend
        assert len(fe.kf_indices) >= 6
        ate = eval_ate(
            fe.cameras, fe.kf_indices, None, 0, final=True,
            monocular=True,
        )
        slam.stop()
        assert ate < 0.08, f"mono surface ATE {ate * 100:.1f} cm >= 8 cm"


class TestMappingCapacityTier:
    """Round-3 perf lever: after full-window prunes the backend compacts the
    map to a smaller static row count (backend.py _maybe_compact), growing
    back under insert/densify pressure. The run must stay healthy across a
    compaction: poses finite, keyframes keep flowing, visibility vectors
    stay capacity-padded for the keyframe-policy numpy ops."""

    @pytest.mark.slow  # 30-frame run + a fresh compacted-tier compile
    def test_compaction_fires_and_run_continues(self):
        cfg = tiny_config()
        slam = SLAM(cfg, save_dir=None)
        slam.run(max_frames=16)
        e = slam.engine
        from monogs_dev_tpu.core.backend import _next_pow2

        alive = int(np.asarray(e.gmap.aux.active).sum())
        kf_insert = (e.intr.height * e.intr.width) // e.pcd_downsample
        headroom = min(6144, e.capacity // 8)
        # pick the smallest tier the engine's own hysteresis accepts
        e.tier_small = min(
            _next_pow2(alive + kf_insert + headroom), e.capacity
        )
        assert e.tier_small < e.capacity, "scene too dense for the test"
        slam.run(max_frames=30)
        assert e.telemetry["map_compactions"] >= 1
        rows = e.gmap.aux.active.shape[0]
        assert rows < e.capacity
        fe = slam.frontend
        assert len(fe.kf_indices) >= 3
        for cam in fe.cameras.values():
            assert np.all(np.isfinite(cam.T_est))
        # host-side visibility vectors stay capacity-padded after the
        # permutation (frontend policy compares them against padded touched)
        for v in e.occ_aware_visibility.values():
            assert np.asarray(v).shape[0] == e.capacity
        # nothing visible can live past the compacted tier
        for v in e.occ_aware_visibility.values():
            assert not np.asarray(v)[rows:].any()
        slam.stop()

    @pytest.mark.slow  # 30-frame run + tight-tier compile
    def test_grow_back_under_insert_pressure(self):
        cfg = tiny_config()
        slam = SLAM(cfg, save_dir=None)
        slam.run(max_frames=10)
        e = slam.engine
        from monogs_dev_tpu.models.gaussians import compact_map

        # force an implausibly tight tier, then let a keyframe insert grow it
        alive = int(np.asarray(e.gmap.aux.active).sum())
        from monogs_dev_tpu.core.backend import _next_pow2

        tight = _next_pow2(alive + 8)
        gmap, perm = compact_map(e.gmap, tight)
        e.gmap = gmap
        perm_np = np.asarray(perm)
        for k, v in list(e.occ_aware_visibility.items()):
            vv = np.asarray(v)
            out = np.zeros(e.capacity, bool)
            out[:tight] = vv[perm_np[:tight]]
            e.occ_aware_visibility[k] = out
        slam.run(max_frames=30)
        assert e.telemetry["map_grows"] >= 1
        assert e.gmap.aux.active.shape[0] == e.capacity
        assert np.all(
            [np.isfinite(c.T_est).all() for c in slam.frontend.cameras.values()]
        )
        slam.stop()


class TestColorRefinementMechanism:
    """refine_chunk improves rendering given CORRECT poses (VERDICT r4 #5).

    At-scale evidence lives in BASELINE.md (surface_sp_160 @ 2000 iters:
    PSNR 38.65 -> 41.42 on v5e). E2e refinement on poorly-tracked tiny
    scenes can DEGRADE eval PSNR (pose error bakes into the map), so the
    regression test pins the mechanism: a color-perturbed map under exact
    poses must recover PSNR monotonically with budget."""

    def test_refinement_recovers_perturbed_colors(self):
        import jax
        import jax.numpy as jnp

        from monogs_dev_tpu.core.params import MapOptConfig, StepConfig
        from monogs_dev_tpu.core.refinement import refine_chunk
        from monogs_dev_tpu.data.synthetic import make_synthetic_scene
        from monogs_dev_tpu.models import Intrinsics, create_map, insert_points
        from monogs_dev_tpu.ops import RasterConfig, render_tiled
        from monogs_dev_tpu.utils.losses import psnr

        intr = Intrinsics(fx=70.0, fy=70.0, cx=40.0, cy=32.0, width=80, height=64)
        rcfg = RasterConfig(tile=16, max_per_tile=128, k_dup=8, tile_group=10)
        params, active = make_synthetic_scene(jax.random.PRNGKey(3), n=300, scale=0.08)
        gmap = create_map(512, 0)
        gmap, _ = insert_points(gmap, params, active, kf_id=0)
        T = jnp.eye(4)
        gt = render_tiled(gmap.params, gmap.aux.active, T, intr, 0, config=rcfg)

        noisy = gmap.params._replace(
            f_dc=gmap.params.f_dc
            + 0.3 * jax.random.normal(jax.random.PRNGKey(9), gmap.params.f_dc.shape)
        )
        gmap = gmap._replace(params=noisy)

        def eval_psnr(g):
            out = render_tiled(g.params, g.aux.active, T, intr, 0, config=rcfg)
            return float(psnr(out.color, gt.color))

        p0 = eval_psnr(gmap)
        images = jnp.tile(gt.color[None], (10, 1, 1, 1))
        poses = jnp.tile(T[None], (10, 1, 1))
        gmap2, it = refine_chunk(
            gmap, images, poses, jnp.zeros((), jnp.int32), jnp.zeros(3),
            StepConfig(), MapOptConfig(), intr, rcfg, iters=10,
        )
        p1 = eval_psnr(gmap2)
        gmap3, _ = refine_chunk(
            gmap2, images, poses, it, jnp.zeros(3),
            StepConfig(), MapOptConfig(), intr, rcfg, iters=10,
        )
        p2 = eval_psnr(gmap3)
        assert p1 > p0 + 1.0, (p0, p1)
        assert p2 > p1, (p1, p2)
