"""Track-convergence trajectory on the surface scene: python-driven Adam
loop over the jitted grad so we can print the pose error per iteration."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tools.probe_surface_scene import surface_scene  # reuse scene builder
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled, build_binning, render_binned
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.geometry import se3_exp
from monogs_dev_tpu.utils.losses import tracking_loss

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
rcfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60)
params, active = surface_scene(jax.random.PRNGKey(0), 65536)
gt = jax.jit(lambda: render_tiled(params, active, jnp.eye(4), intr, 0, config=rcfg, need_touched=False))()
gt_depth = gt.depth / jnp.maximum(gt.alpha, 1e-6)

@jax.jit
def bin_at(T):
    proj = project_gaussians(params, active, T, intr, 0)
    return build_binning(proj, intr, rcfg, dilate=24.0)

@jax.jit
def grad_at(T, exp_ab, binning):
    def loss_fn(tau, e):
        Tn = se3_exp(tau) @ T
        proj = project_gaussians(params, active, Tn, intr, 0)
        out = render_binned(proj, proj.means2d, binning, intr, jnp.zeros(3), rcfg, False)
        return tracking_loss(out.color, out.depth, out.alpha, gt.color, gt_depth,
                             e, jnp.ones((480,640), bool), False, 0.95, 0.01)
    l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(jnp.zeros(6), exp_ab)
    return l, g

T = se3_exp(jnp.array([0.03,-0.02,0.01,0.005,-0.008,0.003])) @ jnp.eye(4)
exp_ab = jnp.zeros(2)
mu = jnp.zeros(8); nu = jnp.zeros(8)
lrv = jnp.concatenate([jnp.full((3,),0.001), jnp.full((3,),0.003), jnp.full((2,),0.01)])
binning = bin_at(T)
for i in range(1, 61):
    l, (g_tau, g_exp) = grad_at(T, exp_ab, binning)
    g = jnp.concatenate([g_tau, g_exp])
    mu = 0.9*mu + 0.1*g; nu = 0.999*nu + 0.001*g*g
    c1 = 1-0.9**i; c2 = 1-0.999**i
    step = lrv * (mu/c1)/(jnp.sqrt(nu/c2)+1e-8)
    tau = -step[:6]; exp_ab = exp_ab - step[6:]
    T = se3_exp(tau) @ T
    if i % 10 == 0 or i <= 3:
        binning = bin_at(T) if i % 10 == 0 else binning
        print(f"i={i:3d} loss={float(l):.5f} terr={float(jnp.linalg.norm(T[:3,3])):.4f} "
              f"gnorm={float(jnp.linalg.norm(g_tau)):.4g} step={float(jnp.linalg.norm(tau)):.4g}", flush=True)
