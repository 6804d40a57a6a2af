"""Decompose the mapping iteration cost (b slots, VGA) on TPU.

Bisects mapping_iterations' per-iteration cost into:
  - per-slot render fwd (loss only)
  - full grad of the summed mapping loss wrt map params + poses
  - Adam/surgery overhead (mapping_iterations minus the grad)
"""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import create_map, insert_points
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning, render_binned
from monogs_dev_tpu.utils.losses import mapping_loss
from monogs_dev_tpu.core.params import StepConfig, MapOptConfig
from monogs_dev_tpu.core.mapping import (
    KeyframeBatch, make_keyframe_opt_state, mapping_iterations,
)
import numpy as np

CAP = int(os.environ.get("PROBE_CAP", 65536))
N_PTS = int(os.environ.get("PROBE_N", 24000))
H, W = 480, 640
B = 8
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=W, height=H)
rcfg = RasterConfig(max_per_tile=512, k_dup=8, tile_group=60)
cfg = StepConfig(monocular=True, window_slots=B, alpha=0.9, exposure_lr=0.0)
ocfg = MapOptConfig()

params, active = make_surface_scene(jax.random.PRNGKey(0), n=N_PTS)
gmap = create_map(CAP, 0)
gmap, _ = insert_points(gmap, params, active, 0)

poses = np.stack([
    orbit_pose(i * 6, 128, sweep=0.7) for i in range(B)
]).astype(np.float32)
images = jnp.zeros((B, H, W, 3))
batch = KeyframeBatch(
    images=images,
    depths=jnp.zeros((B, H, W)),
    T_w2c=jnp.asarray(poses),
    exposure=jnp.zeros((B, 2)),
    valid=np.ones(B, bool),
    optimize_pose=np.ones(B, bool),
    optimize_exposure=np.zeros(B, bool),
    apply_exposure=np.zeros(B, bool),
    harvest_visibility=np.ones(B, bool),
)
kfs = make_keyframe_opt_state(B)
print("scene ready", flush=True)


def timeit(name, run, iters):
    y = run(); jax.block_until_ready(y)
    t0 = time.time(); y = run(); jax.block_until_ready(y)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {ms:8.1f} ms/iter", flush=True)


K = 10

# (a) per-slot render forward only, all B slots, K reps
@jax.jit
def renders_fwd():
    def body(i, acc):
        tot = jnp.zeros(())
        for s in range(B):
            proj = project_gaussians(
                gmap.params, gmap.aux.active, batch.T_w2c[s], intr, 0)
            binning = build_binning(proj, intr, rcfg)
            out = render_binned(proj, proj.means2d, binning, intr,
                                jnp.zeros(3), rcfg, need_touched=False)
            tot = tot + out.color.sum()
        return acc + tot * 1e-20
    return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

timeit("B renders fwd (rebin each)", renders_fwd, K)


# (b) full grad of summed loss wrt map params (rebin each iter)
def loss_fn(p, images):
    tot = jnp.zeros(())
    for s in range(B):
        proj = project_gaussians(p, gmap.aux.active, batch.T_w2c[s], intr, 0)
        binning = build_binning(proj, intr, rcfg)
        out = render_binned(proj, proj.means2d, binning, intr,
                            jnp.zeros(3), rcfg, need_touched=False)
        tot = tot + mapping_loss(
            out.color, out.depth, images[s], None,
            batch.exposure[s], True, False, 0.9, 0.01)
    return tot

@jax.jit
def grads():
    def body(i, acc):
        g = jax.grad(loss_fn)(gmap.params, batch.images)
        return acc + g.xyz[0, 0] * 1e-20
    return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

timeit("B loss grad (rebin each)", grads, K)


# (b2) grads wrt pose tangents only (tracking-like backward, B slots)
def loss_tau(taus, images):
    tot = jnp.zeros(())
    for s in range(B):
        from monogs_dev_tpu.geometry.lie import se3_exp
        T_new = se3_exp(taus[s]) @ batch.T_w2c[s]
        proj = project_gaussians(gmap.params, gmap.aux.active, T_new, intr, 0)
        binning = build_binning(proj, intr, rcfg)
        out = render_binned(proj, proj.means2d, binning, intr,
                            jnp.zeros(3), rcfg, need_touched=False)
        tot = tot + mapping_loss(
            out.color, out.depth, images[s], None,
            batch.exposure[s], True, False, 0.9, 0.01)
    return tot

@jax.jit
def grads_tau():
    def body(i, acc):
        g = jax.grad(loss_tau)(jnp.zeros((B, 6)), batch.images)
        return acc + g[0, 0] * 1e-20
    return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

timeit("B pose-grad only (rebin each)", grads_tau, K)


# (b3) map grads with binning built once outside the loop (chunk reuse)
def loss_fixed_bin(p, images, binnings, projs_m2d):
    tot = jnp.zeros(())
    for s in range(B):
        proj = project_gaussians(p, gmap.aux.active, batch.T_w2c[s], intr, 0)
        out = render_binned(
            proj, proj.means2d,
            jax.tree.map(lambda x: x[s], binnings), intr,
            jnp.zeros(3), rcfg, need_touched=False)
        tot = tot + mapping_loss(
            out.color, out.depth, images[s], None,
            batch.exposure[s], True, False, 0.9, 0.01)
    return tot

@jax.jit
def grads_fixed_bin():
    bins = []
    m2ds = []
    for s in range(B):
        proj = jax.lax.stop_gradient(project_gaussians(
            gmap.params, gmap.aux.active, batch.T_w2c[s], intr, 0))
        bins.append(build_binning(proj, intr, rcfg))
        m2ds.append(proj.means2d)
    binnings = jax.tree.map(lambda *xs: jnp.stack(xs), *bins)
    m2d = jnp.stack(m2ds)
    def body(i, acc):
        g = jax.grad(loss_fixed_bin)(gmap.params, batch.images, binnings, m2d)
        return acc + g.xyz[0, 0] * 1e-20
    return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

timeit("B loss grad (bin reused)", grads_fixed_bin, K)

# (c) the real mapping program, chunk of K iterations
def mapping(chunk):
    return mapping_iterations(
        gmap, batch, kfs, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0),
        jnp.zeros(3), jnp.float32(0.7), jnp.float32(6.0), cfg, ocfg, intr,
        rcfg, iters=chunk, update_every=150, update_offset=50,
        reset_interval=2001, size_threshold=20.0, use_depth=False,
        init_mode=False,
    )

for chunk in (1, K):
    timeit(f"mapping_iterations x{chunk}", lambda c=chunk: mapping(c), chunk)
