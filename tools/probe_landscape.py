"""Loss-landscape sanity for tracking on the synthetic sequence."""
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
cfg_y = load_config("configs/synthetic/rgbd.yaml")
ds = SyntheticDataset(cfg_y)
intr = ds.intr
rcfg = RasterConfig(max_per_tile=512, k_dup=16, tile_group=30)
params, active = ds.scene_params, ds.scene_active

i = 1
image_np, depth_np, T_gt_np = ds[i]
image = jnp.asarray(image_np); depth = jnp.asarray(depth_np)
T_gt = jnp.asarray(T_gt_np, jnp.float32)
T_prev = jnp.asarray(ds.poses[i-1], jnp.float32)
gmask = compute_grad_mask(image, 1.1, False)
print("grad_mask frac:", float(gmask.mean()), "img nonblack:", float((image.sum(-1)>0.01).mean()), flush=True)

@jax.jit
def loss_at(tau, T_base):
    T = se3_exp(tau) @ T_base
    out = render_tiled(params, active, T, intr, 0, config=rcfg, need_touched=False)
    return tracking_loss(out.color, out.depth, out.alpha, image, depth,
                         jnp.zeros(2), gmask, False, 0.9, 0.01)

z6 = jnp.zeros(6)
print(f"loss at GT pose:   {float(loss_at(z6, T_gt)):.6f}", flush=True)
print(f"loss at prev pose: {float(loss_at(z6, T_prev)):.6f}", flush=True)
# the true correction from prev to gt: exp(xi) @ T_prev = T_gt
import scipy.linalg as sla
xi_mat = sla.logm(np.asarray(T_gt @ jnp.linalg.inv(T_prev), np.float64))
rho = xi_mat[:3, 3]; theta = np.array([xi_mat[2,1], xi_mat[0,2], xi_mat[1,0]])
# crude: for small motion logm off-diagonal ~ V rho ~ rho
xi = jnp.asarray(np.concatenate([rho, theta]), jnp.float32)
print("true correction xi:", np.asarray(xi), flush=True)
print(f"loss at prev+xi:   {float(loss_at(xi, T_prev)):.6f}", flush=True)
g = jax.jit(jax.grad(loss_at))(z6, T_prev)
print("grad at prev:", np.asarray(g), flush=True)
cos = float(jnp.dot(-g, xi) / (jnp.linalg.norm(g) * jnp.linalg.norm(xi) + 1e-12))
print(f"cos(-grad, xi) = {cos:.3f}  (positive = descent toward GT)", flush=True)
# line search along xi
for s in [0.25, 0.5, 0.75, 1.0, 1.25]:
    print(f"  loss at prev + {s:.2f}*xi: {float(loss_at(s*xi, T_prev)):.6f}", flush=True)
