"""Explicit Adam+retraction loop for frame 0->1 of the synthetic sequence."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from monogs_dev_tpu.data.synthetic import SyntheticDataset
from monogs_dev_tpu.utils.config import load_config
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
from monogs_dev_tpu.ops import RasterConfig, render_tiled
from monogs_dev_tpu.utils.losses import tracking_loss, compute_grad_mask
from monogs_dev_tpu.geometry import se3_exp

enable_compile_cache()
ds = SyntheticDataset(load_config("configs/synthetic/rgbd.yaml"))
intr = ds.intr
rcfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=30)
params, active = ds.scene_params, ds.scene_active
image_np, depth_np, T_gt_np = ds[1]
image = jnp.asarray(image_np); depth = jnp.asarray(depth_np)
T_gt = jnp.asarray(T_gt_np, jnp.float32)
gmask = compute_grad_mask(image, 1.1, False)

@jax.jit
def lossgrad(T, exp_ab):
    def f(tau, e):
        Tn = se3_exp(tau) @ T
        out = render_tiled(params, active, Tn, intr, 0, config=rcfg, need_touched=False)
        return tracking_loss(out.color, out.depth, out.alpha, image, depth,
                             e, gmask, False, 0.9, 0.01)
    return jax.value_and_grad(f, argnums=(0, 1))(jnp.zeros(6), exp_ab)

T = jnp.asarray(ds.poses[0], jnp.float32)
exp_ab = jnp.zeros(2)
mu = jnp.zeros(8); nu = jnp.zeros(8)
lrv = jnp.concatenate([jnp.full((3,),0.001), jnp.full((3,),0.003), jnp.full((2,),0.01)])
for i in range(1, 101):
    l, (gt_, ge_) = lossgrad(T, exp_ab)
    g = jnp.concatenate([gt_, ge_])
    mu = 0.9*mu + 0.1*g; nu = 0.999*nu + 0.001*g*g
    step = lrv * (mu/(1-0.9**i))/(jnp.sqrt(nu/(1-0.999**i))+1e-8)
    tau = -step[:6]; exp_ab = exp_ab - step[6:]
    T = se3_exp(tau) @ T
    if i in (1,2,3,5) or i % 10 == 0:
        terr = float(jnp.linalg.norm(T[:3,3]-T_gt[:3,3]))
        print(f"i={i:3d} loss={float(l):.5f} terr={terr:.4f} |tau|={float(jnp.linalg.norm(tau)):.5f} exp={np.asarray(exp_ab).round(4)}", flush=True)
