"""Split the init-BA damage: BA iterations vs the init visibility prune.

Runs the VGA mono bench to the window-fill keyframe, then replays the
reference handle_keyframe sequence in two stages with PSNR/alpha reports
between them:
  pre-BA  -> map(300, prune=False) -> post-BA(pre-prune) -> map(1, prune=True)
  -> post-prune
Per-chunk MAP stats (loss, active, mean opacity, densify stats vs the
0.0002 NDC threshold) print throughout the BA. Then continues 20 frames to
watch the keyframe cadence.
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
from monogs_dev_tpu.ops.rasterize import render_tiled
from monogs_dev_tpu.utils.config import load_config

config = load_config("configs/synthetic/bench_vga.yaml")
config["Dataset"]["sensor_type"] = "monocular"
config["Results"]["save_results"] = False

slam = SLAM(config, save_dir=None)
for i in range(160):
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
    n_hi = ((g >= 0.0002) & act).sum()
    gq = jnp.nan_to_num(jnp.nanquantile(jnp.where(act, g, jnp.nan), 0.99))
    return (
        jnp.where(act, opa, 0.0).sum() / n,
        act.sum(),
        jnp.max(g),
        gq,
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


def window_report(label):
    for kf_idx in eng.current_window:
        if kf_idx not in eng.viewpoints:
            continue
        kf = eng.viewpoints[kf_idx]
        out = render_tiled(
            eng.gmap.params, eng.gmap.aux.active,
            jnp.asarray(kf.T_w2c, jnp.float32), eng.intr,
            eng.cfg.sh_degree, eng.bg_color, eng.raster_cfg,
            need_touched=False,
        )
        img = np.asarray(out.color)
        gt = np.asarray(kf.image)
        mse = float(((img - gt) ** 2).mean())
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        print(f"  {label} kf={kf_idx} psnr={psnr:.2f} "
              f"alpha_mean={float(np.asarray(out.alpha).mean()):.3f}", flush=True)


orig_kf = eng.handle_keyframe


def handle_kf(frame_idx, kf, window, depth_map, *a, **kw):
    will_init_ba = (not eng.initialized) and len(window) == eng.window_size
    if not will_init_ba:
        return orig_kf(frame_idx, kf, window, depth_map, *a, **kw)

    print(f"INIT-BA fires at kf {frame_idx}, window {window} "
          f"iteration_count={eng.iteration_count}", flush=True)
    VERBOSE[0] = True
    eng.current_window = list(window)
    eng.add_next_kf(frame_idx, kf, depth_map, init=False)
    window_report("pre      ")
    pre_T = {i: np.asarray(eng.viewpoints[i].T_w2c).copy()
             for i in window if i in eng.viewpoints}
    eng.kf_state = None
    eng.map(iters=300, prune=False, frames_to_optimize=eng.window_size - 1)
    window_report("post-BA  ")
    print(f"  active post-BA: {int(np.asarray(eng.gmap.aux.active).sum())}",
          flush=True)
    eng.map(iters=1, prune=True, frames_to_optimize=eng.window_size - 1)
    window_report("post-prn ")
    print(f"  active post-prune: {int(np.asarray(eng.gmap.aux.active).sum())}",
          flush=True)
    for i, T0 in pre_T.items():
        T1 = np.asarray(eng.viewpoints[i].T_w2c)
        dt = np.linalg.norm(T1[:3, 3] - T0[:3, 3])
        dR = np.linalg.norm(T1[:3, :3] - T0[:3, :3])
        print(f"  pose kf={i} |dT|={dt:.4f} |dR|_F={dR:.4f}", flush=True)
    VERBOSE[0] = False  # _handle pushes to frontend after this returns
    return None


eng.handle_keyframe = handle_kf
slam.frontend.run(max_frames=155)
print("done", flush=True)
