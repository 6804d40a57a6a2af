"""Bisect the pathological TPU compile: grad(render with in-graph binning),
tight_cull on/off, with per-stage wall timing. Run with CULL=0/1 env."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import dataclasses
from monogs_dev_tpu.data.synthetic import make_synthetic_scene
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled

cull = os.environ.get("CULL", "1") == "1"
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
cfg = RasterConfig(max_per_tile=1024, k_dup=16, tile_group=60, tight_cull=cull)
params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=32768, scale=0.03)

def loss(xyz):
    p = params._replace(xyz=xyz)
    out = render_tiled(p, active, jnp.eye(4), intr, 0, config=cfg,
                       need_touched=False)
    return jnp.abs(out.color - 0.3).mean()

t0 = time.time()
g = jax.jit(jax.grad(loss)).lower(params.xyz)
print(f"cull={cull} traced+lowered in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
c = g.compile()
print(f"cull={cull} compiled in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
y = c(params.xyz); jax.block_until_ready(y)
print(f"cull={cull} ran in {time.time()-t0:.2f}s", flush=True)
