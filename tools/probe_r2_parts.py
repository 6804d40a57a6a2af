"""Round-2 tracking-iteration decomposition at bench sizes (with compile cache).

Run on TPU:  timeout 1200 python tools/probe_r2_parts.py
"""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops import blend_pallas
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning, render_binned, _tile_gather
from monogs_dev_tpu.ops.blend_pallas import blend_tiles_pallas
from monogs_dev_tpu.geometry import se3_exp

# kernel-parameter sweep knobs
if os.environ.get("MONOGS_CHUNK"):
    blend_pallas.CHUNK = int(os.environ["MONOGS_CHUNK"])
if os.environ.get("MONOGS_BLOCK"):
    blend_pallas.BLOCK = int(os.environ["MONOGS_BLOCK"])
blend_pallas._PAD = blend_pallas.CHUNK * blend_pallas.BLOCK
L = int(os.environ.get("MONOGS_L", "1024"))

intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
cfg = RasterConfig(max_per_tile=L, k_dup=16, tile_group=60)
N = 32768
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=N, scale=0.03)
K = 15
print(
    f"probe_r2: N={N} L={L} CHUNK={blend_pallas.CHUNK} BLOCK={blend_pallas.BLOCK}",
    flush=True,
)

def chain(name, f, x0, iters=K):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: f(x, i), x)
    t0 = time.time()
    y = run(x0); jax.block_until_ready(y)
    tc = time.time() - t0
    t0 = time.time(); y = run(x0); jax.block_until_ready(y)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.2f} ms  (compile+first {tc:.1f}s)", flush=True)
    return ms

proj0 = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
jax.block_until_ready(proj0)
print("projected", flush=True)
binning = jax.jit(lambda: build_binning(proj0, intr, cfg))()
jax.block_until_ready(binning)
print("counts mean/max:", float(binning.counts.mean()), int(binning.counts.max()),
      "dup_of", int(binning.dup_overflow), "tile_of", int(binning.tile_overflow), flush=True)

props = jnp.concatenate([proj0.means2d, proj0.conic, proj0.color,
                         proj0.opacity[:, None], proj0.depth[:, None]], axis=-1)
props_pad = jnp.concatenate([props, jnp.zeros((1, 10))], axis=0)
t_props0 = _tile_gather(props_pad, binning.idx_table, binning.pos_table)

# G: blend fwd only
def fG(x, i):
    c, d, a = blend_tiles_pallas(t_props0 + x, binning.counts, 40, 16)
    return x + 1e-9 * c[0, 0, 0]
chain("G fwd blend", fG, jnp.zeros(()))

# F: blend fwd+bwd
gF = jax.grad(lambda tp: jnp.abs(blend_tiles_pallas(tp, binning.counts, 40, 16)[0] - 0.3).mean())
def fF(x, i):
    return x + 1e-9 * gF(t_props0 + x)[0, 0, 0]
chain("F grad blend", fF, jnp.zeros(()))

# E: gather+blend fwd+bwd
gE = jax.grad(lambda pp: jnp.abs(
    blend_tiles_pallas(_tile_gather(pp, binning.idx_table, binning.pos_table),
                       binning.counts, 40, 16)[0] - 0.3).mean())
def fE(x, i):
    return x + 1e-9 * gE(props_pad + x)[0, 0]
chain("E grad gather+blend", fE, jnp.zeros(()))

# D: projection grad only
def lossD(tau):
    T = se3_exp(tau) @ jnp.eye(4)
    p = project_gaussians(params, active, T, intr, 0)
    return p.means2d.sum() * 1e-6 + p.conic.sum() * 1e-7 + p.color.sum() * 1e-7
gD = jax.grad(lossD)
chain("D grad projection", lambda x, i: x + 1e-6 * gD(x * 1e-3), jnp.zeros(6))

# C: binning build
def fC(x, i):
    b = build_binning(proj0, intr, cfg, dilate=x)
    return x + 1e-9 * b.counts[0].astype(jnp.float32)
chain("C build_binning", fC, jnp.zeros(()))

# A: full iteration grad (render_binned incl. tracking-style loss)
def lossA(tau):
    T = se3_exp(tau) @ jnp.eye(4)
    proj = project_gaussians(params, active, T, intr, 0)
    out = render_binned(proj, proj.means2d, binning, intr, jnp.zeros(3), cfg, False)
    return jnp.abs(out.color - 0.3).mean()
gA = jax.grad(lossA)
chain("A grad full iter", lambda x, i: x + 1e-6 * gA(x * 1e-3), jnp.zeros(6))
