import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from monogs_dev_tpu.data.synthetic import SyntheticDataset
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.core import StepConfig, track_frame
from monogs_dev_tpu.utils.losses import compute_grad_mask

enable_compile_cache()
ds = SyntheticDataset(load_config("configs/synthetic/rgbd.yaml"))
intr = ds.intr
rcfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=30)
params, active = ds.scene_params, ds.scene_active
img, dep, Tg = ds[1]
image = jnp.asarray(img); depth = jnp.asarray(dep)
T_gt = jnp.asarray(Tg, jnp.float32); T_prev = jnp.asarray(ds.poses[0], jnp.float32)
gmask = compute_grad_mask(image, 1.1, False)
for elr in (0.01, 0.0):
    cfg = StepConfig(monocular=False, tracking_max_iters=100, alpha=0.9, exposure_lr=elr)
    res = track_frame(params, active, T_prev, jnp.zeros(2), image, depth, gmask,
                      jnp.zeros(3), cfg, intr, rcfg, use_depth=True)
    err = float(jnp.linalg.norm(res.T_w2c[:3,3]-T_gt[:3,3]))
    print(f"exposure_lr={elr}: terr={err:.4f}", flush=True)
