"""Decompose the GN tracking program's per-FRAME cost at real bench state.

Bench r5d: tracking 218 ms/frame at 13.0 solver iterations — the
iterations themselves account for only ~40-70 ms, so most of the frame
cost is fixed overhead (dispatch, per-level rebins, final touched render,
...). This probe boots the actual bench pipeline to steady state (cached
frames, real map) and times track_frame_gn variants that isolate the
parts: iteration slope (max_iters sweep with plateau off), pyramid-level
count, the final full-tier n_touched render, and the raw dispatch floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.utils.config import load_config


def main():
    config = load_config("configs/synthetic/bench_vga.yaml")
    config["Dataset"]["sensor_type"] = "monocular"
    config["Results"]["save_results"] = False
    slam = SLAM(config, save_dir=None)

    # bench frame cache (bench.py writes it; regenerate if missing)
    import bench as bench_mod  # noqa: F401  (same cache key logic inline)
    import hashlib
    import json

    ds_cfg = config["Dataset"]
    synth_src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "monogs_dev_tpu/data/synthetic.py",
    )
    with open(synth_src, "rb") as f:
        h = hashlib.sha1(f.read())
    h.update(json.dumps(ds_cfg, sort_keys=True, default=str).encode())
    cache_path = "/tmp/bench_frames_{}x{}_n{}_{}.npz".format(
        ds_cfg["Calibration"]["width"], ds_cfg["Calibration"]["height"],
        len(slam.dataset), h.hexdigest()[:16],
    )
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        for i in range(len(slam.dataset)):
            slam.dataset._cache[i] = (z[f"c{i}"], z[f"d{i}"])
        print("frames loaded from cache", flush=True)
    else:
        print("no frame cache; rendering (slow)", flush=True)

    # steady state: run until initialized
    frame = 16
    slam.frontend.run(max_frames=frame)
    while not (slam.frontend.initialized and slam.engine.initialized):
        frame += 5
        slam.frontend.run(max_frames=frame)
    print(f"steady at frame {frame}", flush=True)

    fe = slam.frontend
    idx = fe.cur_frame_idx
    image, depth, T_gt, gm = fe._fetch_frame(idx)
    tier = fe._tracking_tier(fe.snapshot[1])
    from monogs_dev_tpu.core.frontend import _slice_tier

    params, active = fe.snapshot
    if tier < active.shape[0]:
        params, active = _slice_tier(params, active, tier)
    m = fe._choose_compact(tier)
    print(f"tier {tier} m {m}", flush=True)
    T_init = np.asarray(fe.cameras[idx - 1].T_est, np.float32)
    zdep = jnp.zeros((fe.intr.height, fe.intr.width), jnp.float32)

    from monogs_dev_tpu.core.tracking_gn import track_frame_gn

    def run_cfg(tag, cfg, n_rep=8):
        # warm
        r = track_frame_gn(
            params, active, T_init, np.zeros(2, np.float32), image, zdep,
            None, fe.bg_color, cfg, fe.intr, fe.track_raster_cfg,
            use_depth=False,
        )
        jax.block_until_ready(r.T_w2c)
        ts = []
        iters = 0
        for _ in range(n_rep):
            t0 = time.time()
            r = track_frame_gn(
                params, active, T_init, np.zeros(2, np.float32), image,
                zdep, None, fe.bg_color, cfg, fe.intr, fe.track_raster_cfg,
                use_depth=False,
            )
            small = jax.device_get((r.T_w2c, r.n_iters))
            ts.append(time.time() - t0)
            iters = int(small[1])
        print(
            f"{tag:34s} {1e3 * np.median(ts):7.1f} ms  iters {iters}",
            flush=True,
        )
        return np.median(ts)

    base = dataclasses.replace(fe.cfg, track_compact=m)
    run_cfg("production (plateau, pyr2)", base)
    nop = dataclasses.replace(base, plateau_iters=0)
    for n_it in (1, 5, 13, 25):
        run_cfg(
            f"pyr2 fixed iters={n_it}",
            dataclasses.replace(
                nop, tracking_max_iters=n_it, pyramid_coarse_iters=n_it,
                convergence_threshold=0.0,
            ),
        )
    for n_it in (1, 13):
        run_cfg(
            f"pyr0 fixed iters={n_it}",
            dataclasses.replace(
                nop, tracking_max_iters=n_it, pyramid_levels=0,
                convergence_threshold=0.0,
            ),
        )

    # raw dispatch floor: trivial program over the same params pytree
    @jax.jit
    def trivial(p, a, T):
        return T + 0.0 * p.xyz[0, 0]

    jax.block_until_ready(trivial(params, active, jnp.asarray(T_init)))
    ts = []
    for _ in range(10):
        t0 = time.time()
        jax.device_get(trivial(params, active, jnp.asarray(T_init)))
        ts.append(time.time() - t0)
    print(f"{'raw dispatch+get floor':34s} {1e3 * np.median(ts):7.1f} ms", flush=True)

    # final full-tier touched render alone
    from monogs_dev_tpu.ops.rasterize import render_tiled

    @jax.jit
    def final_render(p, a, T):
        out = render_tiled(
            p, a, T, fe.intr, 0, fe.bg_color, fe.raster_cfg
        )
        return out.n_touched.sum()

    jax.block_until_ready(final_render(params, active, jnp.asarray(T_init)))
    ts = []
    for _ in range(10):
        t0 = time.time()
        jax.device_get(final_render(params, active, jnp.asarray(T_init)))
        ts.append(time.time() - t0)
    print(f"{'full-tier touched render+get':34s} {1e3 * np.median(ts):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
