"""Single-keyframe 3DGS fit through mapping_iterations — should reach
25-35 dB PSNR in a few hundred iterations if the optimizer is healthy."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import SyntheticDataset
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import create_map, insert_points
from monogs_dev_tpu.core.insertion import new_points_from_frame
from monogs_dev_tpu.core.mapping import KeyframeBatch, make_keyframe_opt_state, mapping_iterations
from monogs_dev_tpu.core.params import StepConfig, MapOptConfig
from monogs_dev_tpu.ops import RasterConfig, render_tiled
from monogs_dev_tpu.utils.losses import psnr

cfg_y = load_config("configs/synthetic/rgbd.yaml")
ds = SyntheticDataset(cfg_y)
image_np, depth_np, T0 = ds[0]
image = jnp.asarray(image_np); depth = jnp.asarray(depth_np)
intr = ds.intr
rcfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=30)
scfg = StepConfig(monocular=False, window_slots=4, sh_degree=0)
ocfg = MapOptConfig()

gmap = create_map(16384, 0)
newp, valid = new_points_from_frame(jax.random.PRNGKey(0), image, depth, jnp.zeros(2),
    jnp.asarray(T0, jnp.float32), intr, 0, budget=4096, downsample=16,
    point_size=0.01, adaptive_pointsize=True)
gmap, _ = insert_points(gmap, newp, valid, 0)
print("inserted", int(gmap.aux.active.sum()), flush=True)

b = 4
batch = KeyframeBatch(
    images=jnp.concatenate([image[None], jnp.zeros((b-1,)+image.shape)]),
    depths=jnp.concatenate([depth[None], jnp.zeros((b-1,)+depth.shape)]),
    T_w2c=jnp.tile(jnp.asarray(T0, jnp.float32)[None], (b,1,1)),
    exposure=jnp.zeros((b,2)),
    valid=jnp.array([True]+[False]*(b-1)),
    optimize_pose=jnp.zeros(b, bool),
    optimize_exposure=jnp.zeros(b, bool),
    apply_exposure=jnp.zeros(b, bool),
    harvest_visibility=jnp.array([True]+[False]*(b-1)),
)
kfs = make_keyframe_opt_state(b)
it = jnp.zeros((), jnp.int32)

def report(tag):
    out = render_tiled(gmap.params, gmap.aux.active, jnp.asarray(T0, jnp.float32),
                       intr, 0, config=rcfg, need_touched=False)
    p = float(psnr(jnp.clip(out.color,0,1), image))
    print(f"{tag}: psnr={p:.2f} active={int(gmap.aux.active.sum())}", flush=True)

report("start")
for step in range(50):
    out = mapping_iterations(gmap, batch, kfs, it, jax.random.PRNGKey(step+1),
        jnp.zeros(3), jnp.float32(0.005), jnp.float32(180.0), scfg, ocfg, intr, rcfg,
        iters=10, update_every=100, update_offset=1, reset_interval=500,
        size_threshold=0.0, use_depth=True, init_mode=True)
    gmap, kfs, it = out.gmap, out.kf_state, out.iteration_count
    if (step+1) % 10 == 0:
        report(f"iter {int(it)} loss={float(out.last_loss):.4f}")
