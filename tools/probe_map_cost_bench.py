"""mapping_iterations cost vs valid slots and chunk size (bench shapes)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import create_map, insert_points
from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled
from monogs_dev_tpu.core.params import StepConfig, MapOptConfig
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch, make_keyframe_opt_state, mapping_iterations,
)

CAP = int(os.environ.get("PROBE_CAP", 32768))
H, W = 480, 640
B = 8
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=W, height=H)
rcfg = RasterConfig(max_per_tile=512, k_dup=8, tile_group=60)
cfg = StepConfig(monocular=True, tracking_max_iters=100, pyramid_levels=1,
                 alpha=0.9, exposure_lr=0.0)
opt = MapOptConfig()

params, active = make_surface_scene(jax.random.PRNGKey(0), n=21000)
gmap = create_map(CAP, 0)
gmap, _ = insert_points(gmap, params, active, kf_id=0)

imgs, poses = [], []
for i in range(B):
    T = jnp.asarray(orbit_pose(i * 3, 90), jnp.float32)
    out = render_tiled(gmap.params, gmap.aux.active, T, intr, 0, config=rcfg,
                       need_touched=False)
    imgs.append(out.color)
    poses.append(T)
images = jnp.stack(imgs)
T_all = jnp.stack(poses)
jax.block_until_ready(images)
print("scene ready", flush=True)

print("CAP", CAP, flush=True)
for n_valid in (8,):
    for iters in (0, 1, 5, 25):
        valid = np.zeros(B, bool); valid[:n_valid] = True
        batch = KeyframeBatch(
            images=images, depths=jnp.zeros((B, H, W)), T_w2c=T_all,
            exposure=jnp.zeros((B, 2)), valid=jnp.asarray(valid),
            optimize_pose=jnp.asarray(valid) & (jnp.arange(B) > 0),
            optimize_exposure=jnp.zeros(B, bool),
            apply_exposure=jnp.zeros(B, bool),
            harvest_visibility=jnp.asarray(valid),
        )
        ks = make_keyframe_opt_state(B)
        args = (gmap, batch, ks, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0),
                jnp.zeros(3), jnp.float32(0.7), jnp.float32(6.0), cfg, opt,
                intr, rcfg)
        kw = dict(iters=iters, update_every=150, update_offset=50,
                  reset_interval=2001, size_threshold=20.0, use_depth=False,
                  init_mode=False)
        r = mapping_iterations(*args, **kw)
        float(r.last_loss)  # host fetch = real sync through the relay
        t0 = time.time()
        g = gmap
        for _ in range(3):
            r = mapping_iterations(g, *args[1:], **kw)
            g = r.gmap  # dependency chain
        float(r.last_loss)
        dt = (time.time() - t0) / 3
        print(f"valid={n_valid} iters={iters}: {dt*1000:.0f} ms/call "
              f"{dt/max(iters,1)*1000:.1f} ms/iter", flush=True)
