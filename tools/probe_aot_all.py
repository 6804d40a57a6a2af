"""AOT-compile every SLAM device program at bench shapes — surfaces Mosaic
errors that wedge the relay when hit via dispatch-time compilation."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import create_map
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.core.params import StepConfig, MapOptConfig
from monogs_dev_tpu.core.tracking import track_frame
from monogs_dev_tpu.core.insertion import (
    new_points_from_frame, mono_bootstrap_depth, pseudo_depth_map,
)
from monogs_dev_tpu.core.refinement import refine_chunk
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch, make_keyframe_opt_state, mapping_iterations,
    harvest_visibility, visibility_prune,
)
from monogs_dev_tpu.utils.losses import compute_grad_mask

CAP = 32768
H, W = 480, 640
B = 10
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=W, height=H)
rcfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60)
cfg = StepConfig(monocular=True, tracking_max_iters=100, pyramid_levels=1,
                 alpha=0.9)
opt = MapOptConfig()
gmap = create_map(CAP, 0)
img = jnp.zeros((H, W, 3)); dep = jnp.zeros((H, W)); msk = jnp.ones((H, W), bool)
key = jax.random.PRNGKey(0)

def timed(name, fn, *a, **kw):
    t0 = time.time()
    try:
        fn.lower(*a, **kw).compile()
        print(f"{name}: OK {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:300]}", flush=True)

timed("grad_mask", compute_grad_mask, img, 1.1, False)
timed("bootstrap_depth", mono_bootstrap_depth, key, H, W, True)
timed("pseudo_depth", pseudo_depth_map, key, dep, dep, img,
      jnp.asarray(4.0), 0.01)
timed("insertion", new_points_from_frame, key, img, dep, jnp.zeros(2),
      jnp.eye(4), intr, 0, 65536, 16, 0.01, True)
timed("track(pyr1,mono)", track_frame, gmap.params, gmap.aux.active,
      jnp.eye(4), jnp.zeros(2), img, dep, msk, jnp.zeros(3), cfg, intr, rcfg,
      False)
batch = KeyframeBatch(
    images=jnp.zeros((B, H, W, 3)), depths=jnp.zeros((B, H, W)),
    T_w2c=jnp.tile(jnp.eye(4)[None], (B, 1, 1)), exposure=jnp.zeros((B, 2)),
    valid=jnp.zeros(B, bool), optimize_pose=jnp.zeros(B, bool),
    optimize_exposure=jnp.zeros(B, bool), apply_exposure=jnp.zeros(B, bool),
    harvest_visibility=jnp.zeros(B, bool),
)
ks = make_keyframe_opt_state(B)
timed("mapping(init-mode)", mapping_iterations, gmap, batch, ks,
      jnp.zeros((), jnp.int32), key, jnp.zeros(3), jnp.float32(0.005),
      jnp.float32(180.0), cfg, opt, intr, rcfg, 10, 100, 1, 500, 0.0,
      False, True)
timed("mapping(normal)", mapping_iterations, gmap, batch, ks,
      jnp.zeros((), jnp.int32), key, jnp.zeros(3), jnp.float32(0.7),
      jnp.float32(6.0), cfg, opt, intr, rcfg, 10, 150, 50, 2001, 20.0,
      False, False)
timed("harvest", harvest_visibility, gmap, batch, jnp.zeros(3), cfg, intr, rcfg)
timed("vis_prune", visibility_prune, gmap, jnp.zeros((B, CAP), bool),
      jnp.zeros(B, bool), jnp.zeros(B, jnp.int32), jnp.zeros((), jnp.int32),
      jnp.zeros((), bool), "slam", True)
timed("refine", refine_chunk, gmap, jnp.zeros((25, H, W, 3)),
      jnp.tile(jnp.eye(4)[None], (25, 1, 1)), jnp.zeros((), jnp.int32),
      jnp.zeros(3), cfg, opt, intr, rcfg, 25)
print("all done", flush=True)
