import os

import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.ply import save_ply, load_ply
from monogs_dev_tpu.core.params import StepConfig, MapOptConfig
from monogs_dev_tpu.models.gaussians import GaussianParams
from monogs_dev_tpu.eval.ate import umeyama_alignment, ate_rmse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_inherit_merge(self):
        cfg = load_config(os.path.join(REPO, "configs/mono/tum/fr3_office.yaml"))
        # child values
        assert cfg["Dataset"]["Calibration"]["fx"] == 535.4
        # inherited values
        assert cfg["Training"]["tracking_itr_num"] == 100
        assert cfg["Dataset"]["sensor_type"] == "monocular"
        # dot access
        assert cfg.Training.lr.cam_rot_delta == 0.003

    def test_step_config_from_config(self):
        cfg = load_config(os.path.join(REPO, "configs/rgbd/tum/fr3_office.yaml"))
        sc = StepConfig.from_config(cfg)
        assert not sc.monocular
        assert sc.alpha == 0.9
        assert sc.window_slots == 10
        oc = MapOptConfig.from_config(cfg)
        assert oc.position_lr_init == 0.00016

    def test_all_configs_load(self):
        import glob

        for path in glob.glob(os.path.join(REPO, "configs/**/*.yaml"), recursive=True):
            if "base_config" in path:
                continue
            cfg = load_config(path)
            assert "Training" in cfg, path
            assert "Dataset" in cfg, path


class TestPly:
    def test_roundtrip(self, tmp_path):
        n = 17
        rng = np.random.default_rng(0)
        params = GaussianParams(
            xyz=jnp.array(rng.normal(size=(n, 3)), jnp.float32),
            f_dc=jnp.array(rng.normal(size=(n, 1, 3)), jnp.float32),
            f_rest=jnp.array(rng.normal(size=(n, 15, 3)), jnp.float32),
            log_scales=jnp.array(rng.normal(size=(n, 3)), jnp.float32),
            quats=jnp.array(rng.normal(size=(n, 4)), jnp.float32),
            opacity_logit=jnp.array(rng.normal(size=(n,)), jnp.float32),
        )
        active = np.ones(n, bool)
        active[3] = False
        path = str(tmp_path / "pc.ply")
        written = save_ply(params, active, path)
        assert written == 16
        loaded, lactive = load_ply(path)
        np.testing.assert_allclose(loaded.xyz, np.asarray(params.xyz)[active], atol=1e-6)
        np.testing.assert_allclose(
            loaded.f_rest, np.asarray(params.f_rest)[active], atol=1e-6
        )
        np.testing.assert_allclose(
            loaded.opacity_logit, np.asarray(params.opacity_logit)[active], atol=1e-6
        )

    def test_degree0_roundtrip(self, tmp_path):
        n = 5
        params = GaussianParams(
            xyz=jnp.zeros((n, 3)),
            f_dc=jnp.ones((n, 1, 3)),
            f_rest=jnp.zeros((n, 0, 3)),
            log_scales=jnp.zeros((n, 3)),
            quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
            opacity_logit=jnp.zeros((n,)),
        )
        path = str(tmp_path / "pc0.ply")
        save_ply(params, np.ones(n, bool), path)
        loaded, _ = load_ply(path)
        assert loaded.f_rest.shape == (n, 0, 3)


class TestATE:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 50))
        from scipy.spatial.transform import Rotation

        r_true = Rotation.from_rotvec([0.2, -0.4, 0.1]).as_matrix()
        c_true, t_true = 1.7, np.array([1.0, -2.0, 0.5])
        y = c_true * r_true @ x + t_true[:, None]
        r, t, c = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(r, r_true, atol=1e-8)
        np.testing.assert_allclose(c, c_true, atol=1e-8)
        np.testing.assert_allclose(t, t_true, atol=1e-8)

    def test_ate_zero_for_identical(self):
        rng = np.random.default_rng(1)
        poses = []
        for _ in range(10):
            T = np.eye(4)
            T[:3, 3] = rng.normal(size=3)
            poses.append(T)
        assert ate_rmse(poses, poses) < 1e-9

    def test_ate_scale_correction(self):
        # scaled trajectory has zero ATE under monocular (scale-corrected) mode
        rng = np.random.default_rng(2)
        gt, est = [], []
        for _ in range(10):
            T = np.eye(4)
            T[:3, 3] = rng.normal(size=3)
            gt.append(np.linalg.inv(T))
            T2 = np.eye(4)
            T2[:3, 3] = T[:3, 3] * 3.0
            est.append(np.linalg.inv(T2))
        assert ate_rmse(est, gt, correct_scale=True) < 1e-6
        assert ate_rmse(est, gt, correct_scale=False) > 0.1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from monogs_dev_tpu.models import create_map, insert_points
        from monogs_dev_tpu.utils.checkpoint import save_checkpoint, load_map
        from tests.test_gaussian_map import make_batch

        class FakeKf:
            def __init__(self):
                self.T_w2c = jnp.eye(4)
                self.exposure = jnp.array([0.1, -0.2])

        class FakeEngine:
            pass

        e = FakeEngine()
        gmap = create_map(16, 0)
        gmap, _ = insert_points(gmap, make_batch(8, jax.random.PRNGKey(0)),
                                jnp.ones(8, bool), kf_id=2)
        e.gmap = gmap
        e.iteration_count = 42
        e.current_window = [5, 2]
        e.initialized = True
        e.viewpoints = {2: FakeKf(), 5: FakeKf()}

        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, e)
        loaded, host = load_map(path)
        np.testing.assert_allclose(loaded.params.xyz, gmap.params.xyz)
        np.testing.assert_array_equal(loaded.aux.active, gmap.aux.active)
        np.testing.assert_allclose(loaded.moments.mu.xyz, gmap.moments.mu.xyz)
        assert host["iteration_count"] == 42
        assert host["current_window"] == [5, 2]
        assert host["kf_ids"] == [2, 5]
        np.testing.assert_allclose(host["kf_exposure"][0], [0.1, -0.2], atol=1e-7)


class TestMetricsLogger:
    def test_table_artifact_and_wandb_fallback(self, tmp_path):
        from monogs_dev_tpu.utils.profiling import MetricsLogger

        # use_wandb=True with no wandb package must fall back to JSONL-only
        m = MetricsLogger(str(tmp_path), use_wandb=True)
        m.log({"ate": 0.01}, step=2)
        m.log_table(
            "Metrics",
            ["tag", "psnr", "ssim", "lpips", "RMSE ATE", "FPS"],
            [["Before", 20.0, 0.8, None, 0.01, 2.0],
             ["After", 22.5, 0.85, None, 0.01, 2.0]],
        )
        m.finish()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 1 and '"step": 2' in lines[0]
        table = (tmp_path / "metrics_table.md").read_text()
        assert table.splitlines()[2].startswith("| Before | 20.0000 |")
        assert "| After | 22.5000 |" in table
