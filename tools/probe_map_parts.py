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


# (b4) bin-reused grad with mapping's exact argnums (params, taus, exps, probes)
from monogs_dev_tpu.geometry.lie import se3_exp as _se3
from monogs_dev_tpu.models.gaussians import adam_step as _adam, GaussianParams as _GP
from monogs_dev_tpu.models.gaussians import exponential_lr as _elr

def loss4(p, taus, exps, probes, binnings, m2d):
    tot = jnp.zeros(())
    for s in range(B):
        T = _se3(taus[s]) @ batch.T_w2c[s]
        proj = project_gaussians(p, gmap.aux.active, T, intr, 0)
        out = render_binned(
            proj, proj.means2d + probes[s],
            jax.tree.map(lambda x: x[s], binnings), intr,
            jnp.zeros(3), rcfg, need_touched=False)
        tot = tot + mapping_loss(
            out.color, out.depth, batch.images[s], None,
            exps[s], True, False, 0.9, 0.01)
    return tot, jnp.zeros((B, CAP))

g4 = jax.value_and_grad(loss4, argnums=(0, 1, 2, 3), has_aux=True)

@jax.jit
def grads4():
    bins = []
    for s in range(B):
        proj = jax.lax.stop_gradient(project_gaussians(
            gmap.params, gmap.aux.active, batch.T_w2c[s], intr, 0))
        bins.append(build_binning(proj, intr, rcfg))
    binnings = jax.tree.map(lambda *xs: jnp.stack(xs), *bins)
    def body(i, acc):
        (l, _), (gm, gt, ge, gp) = g4(
            gmap.params, jnp.zeros((B, 6)), jnp.zeros((B, 2)),
            jnp.zeros((B, CAP, 2)), binnings, None)
        return acc + gm.xyz[0, 0] * 1e-20 + gt[0, 0] * 1e-20
    return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

timeit("B grad4 pose+probe (bin reused)", grads4, K)


# (b5) b4 + map adam + kf adam + densify stats (no conds, no drift)
@jax.jit
def grads5():
    bins = []
    for s in range(B):
        proj = jax.lax.stop_gradient(project_gaussians(
            gmap.params, gmap.aux.active, batch.T_w2c[s], intr, 0))
        bins.append(build_binning(proj, intr, rcfg))
    binnings = jax.tree.map(lambda *xs: jnp.stack(xs), *bins)
    def body(i, carry):
        p, mom, acc = carry
        (l, radii), (gm, gt, ge, gp) = g4(
            p, jnp.zeros((B, 6)), jnp.zeros((B, 2)),
            jnp.zeros((B, CAP, 2)), binnings, None)
        xyz_lr = _elr(i, 0.00016 * 6, 0.0000016 * 6, 0.01, 30000)
        lrs = _GP(xyz=xyz_lr, f_dc=0.0025, f_rest=0.000125,
                  log_scales=0.001, quats=0.001, opacity_logit=0.05)
        p2, mom2 = _adam(p, gm, mom, lrs, gmap.aux.active)
        gn = jnp.linalg.norm(gp * jnp.array([320.0, 240.0]), axis=-1).sum(0)
        return p2, mom2, acc + gn[0] * 1e-20
    p, mom, acc = jax.lax.fori_loop(
        0, K, body, (gmap.params, gmap.moments, jnp.zeros(())))
    return acc + p.xyz[0, 0] * 1e-20

timeit("B grad5 +adam+stats (bin reused)", grads5, K)


def _carried(name, with_adam, with_stats):
    @jax.jit
    def run():
        bins = []
        for s in range(B):
            proj = jax.lax.stop_gradient(project_gaussians(
                gmap.params, gmap.aux.active, batch.T_w2c[s], intr, 0))
            bins.append(build_binning(proj, intr, rcfg))
        binnings = jax.tree.map(lambda *xs: jnp.stack(xs), *bins)
        def body(i, carry):
            p, mom, acc = carry
            (l, radii), (gm, gt, ge, gp) = g4(
                p, jnp.zeros((B, 6)), jnp.zeros((B, 2)),
                jnp.zeros((B, CAP, 2)), binnings, None)
            if with_adam:
                xyz_lr = _elr(i, 0.00016 * 6, 0.0000016 * 6, 0.01, 30000)
                lrs = _GP(xyz=xyz_lr, f_dc=0.0025, f_rest=0.000125,
                          log_scales=0.001, quats=0.001, opacity_logit=0.05)
                p2, mom2 = _adam(p, gm, mom, lrs, gmap.aux.active)
            else:
                p2 = jax.tree.map(lambda a, g: a - 1e-12 * g, p, gm)
                mom2 = mom
            if with_stats:
                gn = jnp.linalg.norm(
                    gp * jnp.array([320.0, 240.0]), axis=-1).sum(0)
                acc = acc + gn[0] * 1e-20
            return p2, mom2, acc
        p, mom, acc = jax.lax.fori_loop(
            0, K, body, (gmap.params, gmap.moments, jnp.zeros(())))
        return acc + p.xyz[0, 0] * 1e-20
    timeit(name, run, K)

_carried("carried grad only", False, False)
_carried("carried grad+adam", True, False)
_carried("carried grad+stats", False, True)
