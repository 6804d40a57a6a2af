"""One-off probe: compile+run time of track_frame at VGA scale on TPU."""
import faulthandler, time, sys, os
faulthandler.dump_traceback_later(900, exit=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.core import StepConfig, track_frame

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
rcfg = RasterConfig(tile=16, max_per_tile=1024, k_dup=16, tile_group=60)
cfg = StepConfig(monocular=True, tracking_max_iters=100)
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=65536, scale=0.03)
img = jnp.full((480, 640, 3), 0.4)
t0 = time.time()
res = track_frame(params, active, jnp.eye(4), jnp.zeros(2), img,
                  jnp.zeros((480, 640)), jnp.ones((480, 640), bool), jnp.zeros(3),
                  cfg, intr, rcfg, use_depth=False)
jax.block_until_ready(res.T_w2c)
print(f"track compile+run {time.time()-t0:.1f}s iters={int(res.n_iters)}", flush=True)
t0 = time.time()
res = track_frame(params, active, jnp.eye(4), jnp.ones(2)*0.01, img,
                  jnp.zeros((480, 640)), jnp.ones((480, 640), bool), jnp.zeros(3),
                  cfg, intr, rcfg, use_depth=False)
jax.block_until_ready(res.T_w2c)
print(f"track run {time.time()-t0:.2f}s iters={int(res.n_iters)}", flush=True)
