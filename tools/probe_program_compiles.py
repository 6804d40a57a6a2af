"""Time trace/lower/compile of the real SLAM device programs at bench shapes.

All inputs are passed as jit arguments (no closed-over device arrays: those
embed as MLIR constants and each one costs a device->host fetch through the
axon relay at lowering time).
"""
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
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch, make_keyframe_opt_state, mapping_iterations,
    harvest_visibility,
)

CAP = 32768
H, W = 480, 640
B = 10
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=W, height=H)
rcfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60)
cfg = StepConfig(monocular=True, tracking_max_iters=100, pyramid_levels=1)
opt = MapOptConfig()

gmap = create_map(CAP, 0)
img = jnp.zeros((H, W, 3))
dep = jnp.zeros((H, W))
msk = jnp.ones((H, W), bool)

def timed(name, fn, *a, **kw):
    t0 = time.time()
    low = fn.lower(*a, **kw)
    t1 = time.time()
    low.compile()
    t2 = time.time()
    print(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)

timed("track_frame(pyr=1,mono)", track_frame,
      gmap.params, gmap.aux.active, jnp.eye(4), jnp.zeros(2), img, dep, msk,
      jnp.zeros(3), cfg, intr, rcfg, False)

batch = KeyframeBatch(
    images=jnp.zeros((B, H, W, 3)),
    depths=jnp.zeros((B, H, W)),
    T_w2c=jnp.tile(jnp.eye(4)[None], (B, 1, 1)),
    exposure=jnp.zeros((B, 2)),
    valid=jnp.zeros(B, bool),
    optimize_pose=jnp.zeros(B, bool),
    optimize_exposure=jnp.zeros(B, bool),
    apply_exposure=jnp.zeros(B, bool),
    harvest_visibility=jnp.zeros(B, bool),
)
ks = make_keyframe_opt_state(B)
timed("mapping_iterations(10)", mapping_iterations,
      gmap, batch, ks, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0),
      jnp.zeros(3), jnp.float32(0.7), jnp.float32(6.0),
      cfg, opt, intr, rcfg, 10, 150, 50, 2001, 20.0, False, False)
timed("harvest_visibility", harvest_visibility,
      gmap, batch, jnp.zeros(3), cfg, intr, rcfg)
print("done", flush=True)
