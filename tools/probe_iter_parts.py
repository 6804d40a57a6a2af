"""Decompose the tracking iteration cost on TPU with dependency chains."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning, render_binned, _tile_gather
from monogs_dev_tpu.ops.blend_pallas import blend_tiles_pallas
from monogs_dev_tpu.geometry import se3_exp

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60)
N = 65536
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
K = 15

def chain(f, x0, iters=K):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)
    y = run(x0); jax.block_until_ready(y)
    t0 = time.time(); y = run(x0); jax.block_until_ready(y)
    return (time.time() - t0) / iters * 1000

proj0 = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
binning = jax.jit(lambda: build_binning(proj0, intr, cfg))()
print("counts mean/max:", float(binning.counts.mean()), int(binning.counts.max()), flush=True)

# A: full iteration (grad through projection+gather+blend+loss), fixed binning
def lossA(tau):
    T = se3_exp(tau) @ jnp.eye(4)
    proj = project_gaussians(params, active, T, intr, 0)
    out = render_binned(proj, proj.means2d, binning, intr, jnp.zeros(3), cfg, False)
    return jnp.abs(out.color - 0.3).mean()
gA = jax.grad(lossA)
print(f"A grad full iter: {chain(lambda x, i: x + 1e-6*gA(x*1e-3), jnp.zeros(6)):.2f} ms", flush=True)
print(f"B fwd full iter:  {chain(lambda x, i: x + 1e-9*lossA(x*1e-3)*jnp.ones(6), jnp.zeros(6)):.2f} ms", flush=True)

# C: binning build
def fC(x, i):
    b = build_binning(proj0, intr, cfg, dilate=x)
    return x + 1e-9 * b.counts[0].astype(jnp.float32)
print(f"C build_binning:  {chain(fC, jnp.zeros(())):.2f} ms", flush=True)

# D: projection grad only
def lossD(tau):
    T = se3_exp(tau) @ jnp.eye(4)
    proj = project_gaussians(params, active, T, intr, 0)
    return proj.means2d.sum() * 1e-6 + proj.conic.sum() * 1e-7 + proj.color.sum() * 1e-7
gD = jax.grad(lossD)
print(f"D grad projection: {chain(lambda x, i: x + 1e-6*gD(x*1e-3), jnp.zeros(6)):.2f} ms", flush=True)

# E: gather+blend grad only (props fixed from proj0)
props = jnp.concatenate([proj0.means2d, proj0.conic, proj0.color,
                         proj0.opacity[:, None], proj0.depth[:, None]], axis=-1)
props_pad = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
def lossE(pp):
    t_props = _tile_gather(pp, binning.idx_table, binning.pos_table)
    c, d, a = blend_tiles_pallas(t_props, binning.counts, 40, 16)
    return jnp.abs(c - 0.3).mean()
gE = jax.grad(lossE)
def fE(x, i):
    g = gE(props_pad + x)
    return x + 1e-9 * g[0, 0]
print(f"E grad gather+blend: {chain(fE, jnp.zeros(())):.2f} ms", flush=True)

# F: blend only grad (t_props fixed)
t_props0 = _tile_gather(props_pad, binning.idx_table, binning.pos_table)
def lossF(tp):
    c, d, a = blend_tiles_pallas(tp, binning.counts, 40, 16)
    return jnp.abs(c - 0.3).mean()
gF = jax.grad(lossF)
def fF(x, i):
    g = gF(t_props0 + x)
    return x + 1e-9 * g[0, 0, 0]
print(f"F grad blend only: {chain(fF, jnp.zeros(())):.2f} ms", flush=True)
# G: blend fwd only
def fG(x, i):
    c, d, a = blend_tiles_pallas(t_props0 + x, binning.counts, 40, 16)
    return x + 1e-9 * c[0, 0, 0]
print(f"G fwd blend only: {chain(fG, jnp.zeros(())):.2f} ms", flush=True)
