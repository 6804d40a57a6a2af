"""TPU probe: Pallas blend correctness vs XLA + dependency-chained timing."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig, render_tiled
from monogs_dev_tpu.geometry import se3_retract

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg_x = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60, use_pallas=False)
cfg_p = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60, use_pallas=True)
N = 65536
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)

# correctness on TPU
fx = jax.jit(lambda: render_tiled(params, active, jnp.eye(4), intr, 0, config=cfg_x, need_touched=False))
fp = jax.jit(lambda: render_tiled(params, active, jnp.eye(4), intr, 0, config=cfg_p, need_touched=False))
ox, op = fx(), fp()
print("color maxdiff", float(jnp.abs(ox.color-op.color).max()),
      "alpha maxdiff", float(jnp.abs(ox.alpha-op.alpha).max()),
      "depth maxdiff", float(jnp.abs(ox.depth-op.depth).max()), flush=True)

def chain_loss(cfg):
    def loss(tau):
        T = se3_retract(tau, jnp.eye(4))
        out = render_tiled(params, active, T, intr, 0, config=cfg, need_touched=False)
        return jnp.abs(out.color-0.3).mean()
    g = jax.grad(loss)
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, 15, lambda i, x: x + 1e-6*g(x*1e-3), x)
    y = run(jnp.zeros(6)); jax.block_until_ready(y)
    t0=time.time(); y = run(jnp.zeros(6)); jax.block_until_ready(y)
    return (time.time()-t0)/15*1000

def chain_fwd(cfg):
    def f(tau):
        T = se3_retract(tau, jnp.eye(4))
        return render_tiled(params, active, T, intr, 0, config=cfg, need_touched=False).color.mean()
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, 15, lambda i, x: x + 1e-9*f(x)*jnp.ones(6), x)
    y = run(jnp.zeros(6)); jax.block_until_ready(y)
    t0=time.time(); y = run(jnp.zeros(6)); jax.block_until_ready(y)
    return (time.time()-t0)/15*1000

print(f"XLA   fwd {chain_fwd(cfg_x):.2f} ms  fwd+bwd {chain_loss(cfg_x):.2f} ms", flush=True)
print(f"Pallas fwd {chain_fwd(cfg_p):.2f} ms  fwd+bwd {chain_loss(cfg_p):.2f} ms", flush=True)
# grad parity on TPU
def gl(cfg):
    def loss(tau):
        T = se3_retract(tau, jnp.eye(4))
        out = render_tiled(params, active, T, intr, 0, config=cfg, need_touched=False)
        return jnp.abs(out.color-0.3).mean() + 0.1*jnp.abs(out.depth).mean() + 0.1*(out.alpha**2).mean()
    return jax.jit(jax.grad(loss))(jnp.zeros(6))
gx, gp = gl(cfg_x), gl(cfg_p)
print("pose grad XLA   ", np.asarray(gx), flush=True)
print("pose grad Pallas", np.asarray(gp), flush=True)
