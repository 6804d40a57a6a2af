"""Backend map dynamics with PERFECT poses: handle_init + handle_keyframe
over GT-posed keyframes; prints active counts and per-phase PSNR."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from monogs_dev_tpu.data.synthetic import SyntheticDataset
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.core.keyframe import Keyframe
from monogs_dev_tpu.ops import render_tiled
from monogs_dev_tpu.utils.losses import psnr

enable_compile_cache()
cfg = load_config("configs/synthetic/rgbd.yaml")
cfg["Results"]["save_results"] = False
slam = SLAM(cfg, save_dir=None)
e, ds, intr, rcfg = slam.engine, slam.dataset, slam.intr, slam.raster_cfg

def kf_at(i):
    img, dep, T = ds[i]
    return Keyframe(idx=i, image=jnp.asarray(img), depth=jnp.asarray(dep),
                    T_w2c=jnp.asarray(T, jnp.float32), exposure=jnp.zeros(2),
                    T_gt=np.asarray(T)), jnp.asarray(dep)

def report(tag, i):
    img, _, T = ds[i]
    out = render_tiled(e.gmap.params, e.gmap.aux.active, jnp.asarray(T, jnp.float32),
                       intr, 0, config=rcfg, need_touched=False)
    p = float(psnr(jnp.clip(out.color, 0, 1), jnp.asarray(img)))
    print(f"{tag}: active={int(e.gmap.aux.active.sum())} psnr@kf{i}={p:.2f} "
          f"iters={e.iteration_count}", flush=True)

kf, dm = kf_at(0)
kf.depth = jnp.asarray(ds[0][1])
e.handle_init(0, kf, jnp.where(jnp.asarray(ds[0][0]).sum(-1) > 0.01, dm, 0.0))
report("after init", 0)
window = [0]
for i in (8, 16, 24, 32):
    kf, dm = kf_at(i)
    window = [i] + window
    e.handle_keyframe(i, kf, window, jnp.where(jnp.asarray(ds[i][0]).sum(-1) > 0.01, dm, 0.0), True)
    report(f"after kf {i}", i)
report("final check kf0", 0)
