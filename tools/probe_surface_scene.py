"""Tracking cost on a TUM-like SURFACE scene (opaque 2.5D wall) at VGA."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from monogs_dev_tpu.geometry.sh import rgb_to_sh
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import GaussianParams, inverse_sigmoid
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.core import StepConfig, track_frame
from monogs_dev_tpu.ops.rasterize import render_tiled, build_binning
from monogs_dev_tpu.ops.project import project_gaussians

def surface_scene(key, n):
    ks = jax.random.split(key, 4)
    x = jax.random.uniform(ks[0], (n,), minval=-3.0, maxval=3.0)
    y = jax.random.uniform(ks[1], (n,), minval=-2.0, maxval=2.0)
    z = 3.0 + 0.6*jnp.sin(x*2.0) + 0.4*jnp.cos(y*3.0) + 0.05*jax.random.normal(ks[2], (n,))
    rgb = jax.random.uniform(ks[3], (n, 3), minval=0.1, maxval=0.9)
    params = GaussianParams(
        xyz=jnp.stack([x, y, z], -1),
        f_dc=rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((n, 0, 3)),
        log_scales=jnp.full((n, 3), jnp.log(0.035)),
        quats=jnp.tile(jnp.array([[1.,0.,0.,0.]]), (n,1)),
        opacity_logit=jnp.full((n,), inverse_sigmoid(jnp.float32(0.9))),
    )
    return params, jnp.ones((n,), bool)

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
rcfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60)
cfg = StepConfig(monocular=False, tracking_max_iters=100)
params, active = surface_scene(jax.random.PRNGKey(0), 65536)

proj = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
b = jax.jit(lambda: build_binning(proj, intr, rcfg))()
print("surface counts mean/max:", float(b.counts.mean()), int(b.counts.max()),
      "dup_ovf", int(b.dup_overflow), "tile_ovf", int(b.tile_overflow), flush=True)

gt = jax.jit(lambda: render_tiled(params, active, jnp.eye(4), intr, 0, config=rcfg, need_touched=False))()
from monogs_dev_tpu.geometry import se3_exp
T_init = se3_exp(jnp.array([0.03,-0.02,0.01,0.005,-0.008,0.003])) @ jnp.eye(4)
t0=time.time()
res = track_frame(params, active, T_init, jnp.zeros(2), gt.color,
                  gt.depth/jnp.maximum(gt.alpha,1e-6), jnp.ones((480,640), bool), jnp.zeros(3),
                  cfg, intr, rcfg, use_depth=True)
jax.block_until_ready(res.T_w2c)
print(f"track compile+run {time.time()-t0:.1f}s iters={int(res.n_iters)} conv={bool(res.converged)}", flush=True)
t0=time.time()
res = track_frame(params, active, T_init, jnp.zeros(2), gt.color,
                  gt.depth/jnp.maximum(gt.alpha,1e-6), jnp.ones((480,640), bool), jnp.zeros(3),
                  cfg, intr, rcfg, use_depth=True)
jax.block_until_ready(res.T_w2c)
dt = time.time()-t0
print(f"track run {dt:.2f}s iters={int(res.n_iters)} -> {dt/max(int(res.n_iters),1)*1000:.1f} ms/iter", flush=True)
print("final T err:", float(jnp.linalg.norm(res.T_w2c[:3,3])), flush=True)
