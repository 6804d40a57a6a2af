"""track_frame with different rebin settings vs the explicit loop."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from monogs_dev_tpu.data.synthetic import SyntheticDataset
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.core import StepConfig, track_frame
from monogs_dev_tpu.utils.losses import compute_grad_mask
import dataclasses

enable_compile_cache()
ds = SyntheticDataset(load_config("configs/synthetic/rgbd.yaml"))
intr = ds.intr
rcfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=30)
params, active = ds.scene_params, ds.scene_active
image_np, depth_np, T_gt_np = ds[1]
image = jnp.asarray(image_np); depth = jnp.asarray(depth_np)
T_gt = jnp.asarray(T_gt_np, jnp.float32)
T_prev = jnp.asarray(ds.poses[0], jnp.float32)
gmask = compute_grad_mask(image, 1.1, False)

for rebin, dil in [(1, 0.0), (10, 24.0), (100, 24.0)]:
    cfg = StepConfig(monocular=False, tracking_max_iters=100, alpha=0.9,
                     rebin_every=rebin, rebin_dilation=dil)
    res = track_frame(params, active, T_prev, jnp.zeros(2), image, depth,
                      gmask, jnp.zeros(3), cfg, intr, rcfg, use_depth=True)
    err = float(jnp.linalg.norm(res.T_w2c[:3,3] - T_gt[:3,3]))
    print(f"rebin={rebin:3d} dil={dil:4.0f}: terr={err:.4f} iters={int(res.n_iters)}", flush=True)

for rebin, dil in [(8, 6.0), (8, 0.0)]:
    cfg = StepConfig(monocular=False, tracking_max_iters=100, alpha=0.9,
                     rebin_every=rebin, rebin_dilation=dil)
    res = track_frame(params, active, T_prev, jnp.zeros(2), image, depth,
                      gmask, jnp.zeros(3), cfg, intr, rcfg, use_depth=True)
    err = float(jnp.linalg.norm(res.T_w2c[:3,3] - T_gt[:3,3]))
    print(f"rebin={rebin:3d} dil={dil:4.0f}: terr={err:.4f} iters={int(res.n_iters)}", flush=True)
