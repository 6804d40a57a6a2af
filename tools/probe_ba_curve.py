"""Loss/opacity trajectory through the window-fill init-BA (bench mono).

Wraps core.backend.mapping_iterations to print, per dispatched chunk:
iteration range, last_loss, mean active opacity, active count, drift.
Shows whether the 300-iter BA diverges, when opacity collapses, and
whether densify events inside the BA are implicated.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.core import backend as backend_mod
from monogs_dev_tpu.utils.config import load_config

config = load_config("configs/synthetic/bench_vga.yaml")
config["Dataset"]["sensor_type"] = "monocular"
config["Results"]["save_results"] = False

slam = SLAM(config, save_dir=None)
for i in range(140):
    slam.dataset.render_frame(i)
slam.prewarm()
print("prewarm done", flush=True)
eng = slam.engine
orig_map_iters = backend_mod.mapping_iterations
VERBOSE = [False]


@jax.jit
def _stats(gmap):
    act = gmap.aux.active
    opa = jax.nn.sigmoid(gmap.params.opacity_logit)
    n = jnp.maximum(act.sum(), 1)
    g = jnp.where(
        act & (gmap.aux.denom > 0),
        gmap.aux.grad_accum / jnp.maximum(gmap.aux.denom, 1.0),
        0.0,
    )
    n_hi = (g >= 0.0002).sum()
    return (
        jnp.where(act, opa, 0.0).sum() / n,
        act.sum(),
        jnp.max(g),
        jnp.quantile(jnp.where(act, g, jnp.nan), 0.99),
        n_hi,
    )


def wrapped(gmap, batch, kf_state, it0, *a, **kw):
    out = orig_map_iters(gmap, batch, kf_state, it0, *a, **kw)
    if VERBOSE[0]:
        mo, na, gmax, gq, nhi = _stats(out.gmap)
        print(f"  MAP it={int(jax.device_get(it0))}+{kw.get('iters')} "
              f"loss={float(out.last_loss):.4f} mean_opa={float(mo):.3f} "
              f"active={int(na)} drift={float(out.max_drift):.1f}px "
              f"dropped={int(out.n_dropped)} gmax={float(gmax):.6f} "
              f"g99={float(gq):.6f} n_hi={int(nhi)}", flush=True)
    return out


backend_mod.mapping_iterations = wrapped

orig_kf = eng.handle_keyframe


def handle_kf(frame_idx, kf, window, depth_map, *args, **kwargs):
    if (not eng.initialized) and len(window) == eng.window_size:
        print(f"INIT-BA at kf {frame_idx}", flush=True)
        VERBOSE[0] = True
    r = orig_kf(frame_idx, kf, window, depth_map, *args, **kwargs)
    VERBOSE[0] = False
    return r


eng.handle_keyframe = handle_kf
slam.frontend.run(max_frames=133)
print("done", flush=True)
