"""Is the blend VJP numerically program-dependent?

Same single-frame mapping gradient computed three ways on ONE device:
  direct  : jit(grad(loss)) on the frame
  scan1   : the same wrapped in lax.scan of length 1
  scan8   : scan over 8 frames, 7 masked out by valid=0
If these differ materially, the mesh1-vs-mesh8 mismatch is not a sharding
bug but numerical sensitivity of the backward (e.g. transmittance-replay
amplification in the custom VJP).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.core.params import StepConfig
from monogs_dev_tpu.ops.rasterize import render_tiled
from monogs_dev_tpu.utils.losses import mapping_loss
from test_parallel import _scene_map, _make_batch, INTR, RCFG

cfg = StepConfig(monocular=False)
gmap = _scene_map()
batch = _make_batch(gmap, 8)
active = gmap.aux.active


def frame_loss(p, img, dep, T, v):
    out = render_tiled(
        p, active, T, INTR, cfg.sh_degree, jnp.zeros(3), RCFG,
        means2d_probe=jnp.zeros((p.xyz.shape[0], 2)), need_touched=False,
    )
    loss = mapping_loss(
        out.color, out.depth, img, dep, jnp.zeros(2), cfg.monocular,
        initialization=False, alpha=cfg.alpha,
        rgb_boundary_threshold=cfg.rgb_boundary_threshold,
        render_opacity=out.alpha,
    )
    return loss * v


@jax.jit
def g_direct(p, i):
    return jax.grad(frame_loss)(
        p, batch.images[i], batch.depths[i], batch.T_w2c[i], 1.0
    )


@jax.jit
def g_scan(p, valid):
    def body(acc, args):
        img, dep, T, v = args
        g = jax.grad(frame_loss)(p, img, dep, T, v)
        return jax.tree.map(jnp.add, acc, g), None

    acc0 = jax.tree.map(jnp.zeros_like, p)
    acc, _ = jax.lax.scan(
        body, acc0, (batch.images, batch.depths, batch.T_w2c, valid)
    )
    return acc


def cmp(tag, ta, tb):
    worst = 0.0
    for name, a, b in zip(ta._fields, jax.tree.leaves(ta), jax.tree.leaves(tb)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0:
            continue
        d = np.abs(a - b).max()
        s = max(np.abs(a).max(), 1e-30)
        worst = max(worst, d / s)
        print(f"  {tag} {name:14s} |diff|={d:.3e} scale={s:.3e}")
    print(f"  {tag} worst rel={worst:.3e}")


i = 1
gd = g_direct(gmap.params, i)
v1 = np.zeros(8, np.float32)
v1[i] = 1.0
gs = g_scan(gmap.params, jnp.asarray(v1))
print("== direct vs scan8(masked) ==")
cmp("d/s8", gd, gs)
