"""Map quality + pose movement around the window-fill init-BA (bench mono).

Wraps BackendEngine.handle_keyframe; when the init-BA branch fires, renders
every window keyframe before and after (PSNR vs GT) and prints pose deltas.
Answers: does the init-BA leave a good map (tracking handoff problem) or a
corrupted one (BA convergence / binning-drift problem)?
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.ops.rasterize import render_tiled
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
orig_kf = eng.handle_keyframe


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


def handle_kf(frame_idx, kf, window, depth_map, *a, **kw):
    will_init_ba = (not eng.initialized) and (
        len(window) == eng.window_size
    )
    if will_init_ba:
        print(f"INIT-BA fires at kf {frame_idx}, window {window}", flush=True)
        pre_T = {i: np.asarray(eng.viewpoints[i].T_w2c).copy()
                 for i in window if i in eng.viewpoints}
        eng.current_window = list(window)
        window_report("pre ")
    r = orig_kf(frame_idx, kf, window, depth_map, *a, **kw)
    if will_init_ba:
        window_report("post")
        for i, T0 in pre_T.items():
            T1 = np.asarray(eng.viewpoints[i].T_w2c)
            dt = np.linalg.norm(T1[:3, 3] - T0[:3, 3])
            dR = np.linalg.norm(T1[:3, :3] - T0[:3, :3])
            print(f"  pose kf={i} |dT|={dt:.4f} |dR|_F={dR:.4f}", flush=True)
        print(f"  active={int(np.asarray(eng.gmap.aux.active).sum())}",
              flush=True)
    return r


eng.handle_keyframe = handle_kf
slam.frontend.run(max_frames=137)
print("done", flush=True)
