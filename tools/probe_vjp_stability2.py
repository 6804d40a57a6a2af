"""Stage-2 isolation of the program-dependent gradient.

On one CPU device, for one frame:
  1. forward color/depth/alpha: direct jit vs scan-wrapped — bit-diff?
  2. grad of sum(color): direct vs scan — still 10%?
  3. both vs the oracle (rasterize_ref autodiff) — which is correct?
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

from monogs_dev_tpu.ops.rasterize import render_tiled
from test_parallel import _scene_map, _make_batch, INTR, RCFG

gmap = _scene_map()
batch = _make_batch(gmap, 8)
active = gmap.aux.active
i = 1
T_i = batch.T_w2c[i]


def fwd(p, T):
    out = render_tiled(
        p, active, T, INTR, 0, jnp.zeros(3), RCFG, need_touched=False
    )
    return out.color, out.depth, out.alpha


def obj(p, T):
    c, d, a = fwd(p, T)
    return jnp.sum(c)


@jax.jit
def direct_fwd(p):
    return fwd(p, T_i)


@jax.jit
def scan_fwd(p):
    def body(_, T):
        return None, fwd(p, T)

    _, outs = jax.lax.scan(body, None, batch.T_w2c)
    return jax.tree.map(lambda x: x[i], outs)


@jax.jit
def direct_grad(p):
    return jax.grad(obj)(p, T_i)


@jax.jit
def scan_grad(p):
    def body(acc, args):
        T, v = args
        g = jax.grad(lambda pp: obj(pp, T) * v)(p)
        return jax.tree.map(jnp.add, acc, g), None

    v = jnp.zeros(8).at[i].set(1.0)
    acc, _ = jax.lax.scan(
        body, jax.tree.map(jnp.zeros_like, p), (batch.T_w2c, v)
    )
    return acc


def cmp(tag, ta, tb):
    for name, a, b in zip(ta._fields, jax.tree.leaves(ta), jax.tree.leaves(tb)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0:
            continue
        print(
            f"  {tag} {name:14s} |diff|={np.abs(a - b).max():.3e} "
            f"scale={np.abs(a).max():.3e}"
        )


cd, dd, ad = direct_fwd(gmap.params)
cs, ds, as_ = scan_fwd(gmap.params)
print("== forward bit-diff (direct vs scan) ==")
print("  color:", np.abs(np.asarray(cd) - np.asarray(cs)).max())
print("  depth:", np.abs(np.asarray(dd) - np.asarray(ds)).max())
print("  alpha:", np.abs(np.asarray(ad) - np.asarray(as_)).max())

gd = direct_grad(gmap.params)
gs = scan_grad(gmap.params)
print("== grad sum(color): direct vs scan ==")
cmp("d/s", gd, gs)

# oracle comparison
from monogs_dev_tpu.ops.rasterize_ref import render_reference


def obj_ref(p, T):
    out = render_reference(p, active, T, INTR, 0, jnp.zeros(3))
    return jnp.sum(out.color if hasattr(out, "color") else out[0])


try:
    go = jax.jit(jax.grad(obj_ref))(gmap.params, T_i)
    print("== vs oracle ==")
    cmp("d/oracle", gd, go)
    cmp("s/oracle", gs, go)
except Exception as e:
    print("oracle failed:", e)
