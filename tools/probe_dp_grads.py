"""Diagnose mesh8-vs-mesh1 gradient mismatch in dp_mapping_step.

Computes map gradients three ways on the same 8-keyframe batch:
  serial : plain jax.grad over the summed loss (no shard_map)
  mesh1  : dp shard_map on a 1-device mesh
  mesh8  : dp shard_map on the 8-device CPU mesh
and prints max |diff| per pairing, plus per-frame grad magnitudes.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.core.params import MapOptConfig, StepConfig
from monogs_dev_tpu.geometry.lie import se3_exp
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.rasterize import render_tiled
from monogs_dev_tpu.utils.losses import mapping_loss, isotropic_regularizer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from test_parallel import _scene_map, _make_batch, INTR, RCFG  # noqa: E402

from monogs_dev_tpu.parallel import dp_mapping_step, make_dp_opt_state, make_mesh, shard_batch

cfg = StepConfig(monocular=False)
OPT = MapOptConfig()

gmap = _scene_map()
batch = _make_batch(gmap, 8)


def serial_grads(params, active, batch):
    def lossf(p):
        tot = 0.0
        for i in range(8):
            T = se3_exp(jnp.zeros(6)) @ batch.T_w2c[i]
            out = render_tiled(
                p, active, T, INTR, cfg.sh_degree, jnp.zeros(3), RCFG,
                means2d_probe=jnp.zeros((p.xyz.shape[0], 2)),
                need_touched=False,
            )
            tot = tot + mapping_loss(
                out.color, out.depth, batch.images[i], batch.depths[i],
                batch.exposure[i], cfg.monocular, initialization=False,
                alpha=cfg.alpha,
                rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                render_opacity=out.alpha,
            )
        return tot + isotropic_regularizer(p.log_scales, active)

    return jax.grad(lossf)(params)


def dp_grads(mesh):
    step = dp_mapping_step(
        mesh, cfg, OPT, INTR, RCFG, use_depth=True,
        update_every=150, update_offset=0,
    )
    b = shard_batch(mesh, batch)
    opt = make_dp_opt_state(8)
    g_new, _, _, loss, _ = step(
        gmap, b, opt, jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
        jnp.float32(0.005), jnp.float32(6.0),
    )
    # first Adam step: mu = 0.1 * g
    g = jax.tree.map(lambda m: np.asarray(m) / 0.1, g_new.moments.mu)
    return g, float(loss)


def cmp(tag, ta, tb):
    for name, a, b in zip(
        GaussianParamsFields, jax.tree.leaves(ta), jax.tree.leaves(tb)
    ):
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0:
            continue
        print(
            f"  {tag} {name:14s} |diff|={np.abs(a - b).max():.3e} "
            f"scale={np.abs(a).max():.3e}"
        )


GaussianParamsFields = gmap.params._fields

print("== self-consistency: serial twice ==")
gs_a = serial_grads(gmap.params, gmap.aux.active, batch)
gs_b = serial_grads(gmap.params, gmap.aux.active, batch)
cmp("ser/ser", gs_a, gs_b)

print("== self-consistency: mesh1 twice ==")
g1a, l1a = dp_grads(make_mesh(1))
g1b, l1b = dp_grads(make_mesh(1))
cmp("m1/m1", g1a, g1b)

print("== serial vs mesh1 ==")
cmp("ser/m1", gs_a, g1a)

print("== mesh1 vs mesh8 ==")
g8a, l8 = dp_grads(make_mesh(8))
cmp("m1/m8", g1a, g8a)
print("loss m1", l1a, "m8", l8)

print("== per-frame grads: mesh1 vs mesh8 (valid-mask isolation) ==")
for i in range(8):
    v = np.zeros(8, bool)
    v[i] = True
    b_i = batch._replace(valid=jnp.asarray(v))

    def dp_g(mesh, b_i=b_i):
        step = dp_mapping_step(
            mesh, cfg, OPT, INTR, RCFG, use_depth=True,
            update_every=150, update_offset=0,
        )
        b = shard_batch(mesh, b_i)
        opt = make_dp_opt_state(8)
        g_new, _, _, loss, _ = step(
            gmap, b, opt, jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
            jnp.float32(0.005), jnp.float32(6.0),
        )
        return jax.tree.map(lambda m: np.asarray(m) / 0.1, g_new.moments.mu)

    f1 = dp_g(make_mesh(1))
    f8 = dp_g(make_mesh(8))
    d = max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(f8))
        if np.asarray(a).size
    )
    s = max(
        np.abs(np.asarray(a)).max()
        for a in jax.tree.leaves(f1)
        if np.asarray(a).size
    )
    print(f"  frame {i}: |m1-m8|={d:.3e} scale={s:.3e}")
