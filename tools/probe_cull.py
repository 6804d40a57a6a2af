"""Measure tight_cull effect: per-tile counts + grad-iteration time."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import dataclasses
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning, render_binned
from monogs_dev_tpu.geometry import se3_exp

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
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

for cull in (False, True):
    cfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60, tight_cull=cull)
    proj0 = jax.jit(lambda: project_gaussians(params, active, jnp.eye(4), intr, 0))()
    binning = jax.jit(lambda: build_binning(proj0, intr, cfg))()
    print(f"cull={cull} counts mean/max: {float(binning.counts.mean()):.1f} "
          f"{int(binning.counts.max())}", flush=True)

    def lossA(tau, binning=binning, cfg=cfg):
        T = se3_exp(tau) @ jnp.eye(4)
        proj = project_gaussians(params, active, T, intr, 0)
        out = render_binned(proj, proj.means2d, binning, intr, jnp.zeros(3), cfg, False)
        return jnp.abs(out.color - 0.3).mean()
    gA = jax.grad(lossA)
    print(f"  grad iter: {chain(lambda x, i: x + 1e-6*gA(x*1e-3), jnp.zeros(6)):.2f} ms", flush=True)

    def fC(x, i, cfg=cfg):
        b = build_binning(proj0, intr, cfg, dilate=x)
        return x + 1e-9 * b.counts[0].astype(jnp.float32)
    print(f"  build_binning: {chain(fC, jnp.zeros(())):.2f} ms", flush=True)

# sanity: outputs identical with/without culling
cfgF = RasterConfig(max_per_tile=1024, tight_cull=False)
cfgT = RasterConfig(max_per_tile=1024, tight_cull=True)
bF = jax.jit(lambda: build_binning(proj0, intr, cfgF))()
bT = jax.jit(lambda: build_binning(proj0, intr, cfgT))()
oF = jax.jit(lambda: render_binned(proj0, proj0.means2d, bF, intr, jnp.zeros(3), cfgF, True))()
oT = jax.jit(lambda: render_binned(proj0, proj0.means2d, bT, intr, jnp.zeros(3), cfgT, True))()
print("color maxdiff:", float(jnp.abs(oF.color - oT.color).max()))
print("depth maxdiff:", float(jnp.abs(oF.depth - oT.depth).max()))
print("touched maxdiff:", int(jnp.abs(oF.n_touched - oT.n_touched).max()))
