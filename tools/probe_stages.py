"""Stage-by-stage timing of the tiled rasterizer with TRUE dependency chains
(the axon relay does not synchronize honestly on block_until_ready, so each
stage is timed by a lax.fori_loop that feeds its output back to its input)."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from functools import partial
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg = RasterConfig(tile=16, max_per_tile=1024, k_dup=16, tile_group=60)
N = 65536
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
K = 20

def chain(f, x0, iters=K):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)
    y = run(x0); jax.block_until_ready(y)  # compile
    t0 = time.time(); y = run(x0); jax.block_until_ready(y)
    return (time.time() - t0) / iters * 1000

# 1. projection
def s1(T, i):
    pr = project_gaussians(params, active, T, intr, 0)
    return T + 1e-12 * pr.means2d[0, 0]
print(f"project: {chain(s1, jnp.eye(4)):.2f} ms", flush=True)

pr = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
depth_key = jnp.where(pr.valid, pr.depth, jnp.inf)

# 2. depth argsort (N)
def s2(x, i):
    o = jnp.argsort(depth_key + x)
    return x + 1e-12 * o[0].astype(jnp.float32)
print(f"argsort N: {chain(s2, jnp.zeros(())):.2f} ms", flush=True)

# 3. tile-entry sort (N*k_dup)
tx_n, ty_n = 40, 30
mu = pr.means2d; rad = pr.radii
tx0 = jnp.clip(jnp.floor((mu[:,0]-rad)/16), 0, tx_n-1).astype(jnp.int32)
tx1 = jnp.clip(jnp.floor((mu[:,0]+rad)/16), 0, tx_n-1).astype(jnp.int32)
ty0 = jnp.clip(jnp.floor((mu[:,1]-rad)/16), 0, ty_n-1).astype(jnp.int32)
wrect = tx1 - tx0 + 1
ks = jnp.arange(cfg.k_dup, dtype=jnp.int32)
tid = (ty0[:,None] + ks[None]//wrect[:,None]) * tx_n + tx0[:,None] + ks[None]%wrect[:,None]
tid = tid.reshape(-1) % 1200
gidx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:,None], (N, cfg.k_dup)).reshape(-1)
def s3(x, i):
    st, sg = jax.lax.sort((tid + x, gidx), num_keys=1, is_stable=True)
    return x + st[0] % 2
print(f"tile sort {N*cfg.k_dup}: {chain(s3, jnp.zeros((), jnp.int32)):.2f} ms", flush=True)

# 4. scatter idx table
st, sg = jax.lax.sort((tid, gidx), num_keys=1, is_stable=True)
starts = jnp.searchsorted(st, jnp.arange(1200, dtype=jnp.int32))
rank = jnp.arange(N*cfg.k_dup, dtype=jnp.int32) - starts[jnp.clip(st, 0, 1199)]
keep = rank < cfg.max_per_tile
row = jnp.where(keep, st, 1200); col = jnp.where(keep, rank, 0)
def s4(x, i):
    t = jnp.full((1200, cfg.max_per_tile), N, jnp.int32).at[row, col + x].set(sg, mode="drop")
    return x + t[0,0] % 2
print(f"scatter idx table: {chain(s4, jnp.zeros((), jnp.int32)):.2f} ms", flush=True)

# 5. gather props
idx_table = jnp.full((1200, cfg.max_per_tile), N, jnp.int32).at[row, col].set(sg, mode="drop")
props = jnp.concatenate([mu, pr.conic, pr.color, pr.opacity[:,None], pr.depth[:,None]], axis=-1)
props = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
def s5(x, i):
    g = props[idx_table]  # (1200, L, 10)
    return x + 1e-12 * g[0,0,0]
print(f"gather props: {chain(s5, jnp.zeros(())):.2f} ms", flush=True)

# 6. blend (forward only)
from monogs_dev_tpu.ops.rasterize import _blend_group
t_mu = props[idx_table][..., 0:2]; t_con = props[idx_table][..., 2:5]
t_col = props[idx_table][..., 5:8]; t_opa = props[idx_table][..., 8]; t_z = props[idx_table][..., 9]
t_ids = jnp.arange(1200, dtype=jnp.int32)
ly, lx = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0), indexing="ij")
local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1)
origin = jnp.stack([(t_ids % 40)*16, (t_ids // 40)*16], axis=-1).astype(jnp.float32)
pix = origin[:, None, :] + local[None]
def padg(x):
    return x.reshape((20, 60) + x.shape[1:])
def s6(x, i):
    colors, depths, alphas, touch = jax.lax.map(
        jax.checkpoint(lambda a: _blend_group(*a, alpha_clamp=0.99, alpha_min=1/255, t_min=1e-4, bg=jnp.zeros(3))),
        (padg(t_mu + x), padg(t_con), padg(t_col), padg(t_opa), padg(t_z), padg(pix)))
    return x + 1e-12 * colors[0,0,0,0]
print(f"blend fwd: {chain(s6, jnp.zeros(())):.2f} ms", flush=True)

# 7. blend fwd+bwd
def blend_loss(t_mu_in):
    colors, depths, alphas, touch = jax.lax.map(
        jax.checkpoint(lambda a: _blend_group(*a, alpha_clamp=0.99, alpha_min=1/255, t_min=1e-4, bg=jnp.zeros(3))),
        (padg(t_mu_in), padg(t_con), padg(t_col), padg(t_opa), padg(t_z), padg(pix)))
    return jnp.abs(colors).mean()
gb = jax.grad(blend_loss)
def s7(x, i):
    g = gb(t_mu + x)
    return x + 1e-12 * g[0,0,0]
print(f"blend fwd+bwd: {chain(s7, jnp.zeros(())):.2f} ms", flush=True)
