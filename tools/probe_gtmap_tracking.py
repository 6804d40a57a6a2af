"""Track the synthetic sequence against the PERFECT map (the generator's
own Gaussians). Isolates tracking quality from map quality."""
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
cfg_y = load_config("configs/synthetic/rgbd.yaml")
ds = SyntheticDataset(cfg_y)
intr = ds.intr
rcfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=30)
scfg = StepConfig(monocular=False, tracking_max_iters=100, alpha=0.9)
params, active = ds.scene_params, ds.scene_active

T_est = jnp.asarray(ds.poses[0], jnp.float32)
for i in range(1, 12):
    image_np, depth_np, T_gt = ds[i]
    image = jnp.asarray(image_np); depth = jnp.asarray(depth_np)
    gmask = compute_grad_mask(image, 1.1, False)
    res = track_frame(params, active, T_est, jnp.zeros(2), image, depth,
                      gmask, jnp.zeros(3), scfg, intr, rcfg, use_depth=True)
    T_est = res.T_w2c
    err = float(jnp.linalg.norm(T_est[:3, 3] - jnp.asarray(T_gt, jnp.float32)[:3, 3]))
    gt_step = float(np.linalg.norm(ds.poses[i][:3,3] - ds.poses[i-1][:3,3]))
    print(f"frame {i:2d}: iters={int(res.n_iters):3d} conv={bool(res.converged)} "
          f"t_err={err:.4f} (frame motion {gt_step:.3f})", flush=True)
