"""Per-phase breakdown of the bench SLAM run (tracking vs mapping vs host)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax
import numpy as np
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.utils.config import load_config

config = load_config("configs/synthetic/bench_vga.yaml")
config["Dataset"]["sensor_type"] = "monocular"
config["Results"]["save_results"] = False
print("config loaded", flush=True)

n_warm, n_meas = 16, 25
import jax as _j; _j.devices(); print("devices up", flush=True)
slam = SLAM(config, save_dir=None)
print("slam built", flush=True)
for i in range(n_warm + n_meas):
    slam.dataset.render_frame(i)
print("frames prerendered", flush=True)

fe = slam.frontend
eng = slam.engine

stats = {"track_s": 0.0, "track_n": 0, "iters": [], "map_s": 0.0, "map_n": 0,
         "insert_s": 0.0, "load_s": 0.0, "harvest_n": 0}
orig_tracking = fe.tracking
orig_map = eng.map
orig_add = eng.add_next_kf
orig_load = fe._load_frame
measuring = [False]

def tracking(idx, image, depth, grad_mask):
    t0 = time.time(); r = orig_tracking(idx, image, depth, grad_mask)
    jax.block_until_ready(r.T_w2c)
    if measuring[0]:
        stats["track_s"] += time.time() - t0; stats["track_n"] += 1
        stats["iters"].append(int(r.n_iters))
    return r

def mapcall(iters=1, **kw):
    t0 = time.time(); r = orig_map(iters=iters, **kw)
    jax.block_until_ready(eng.gmap.params.xyz)
    if measuring[0]:
        stats["map_s"] += time.time() - t0; stats["map_n"] += iters
    return r

def addcall(*a, **kw):
    t0 = time.time(); r = orig_add(*a, **kw)
    if measuring[0]:
        stats["insert_s"] += time.time() - t0
    return r

def loadcall(idx):
    t0 = time.time(); r = orig_load(idx)
    if measuring[0]:
        stats["load_s"] += time.time() - t0
    return r

fe.tracking = tracking
eng.map = mapcall
eng.add_next_kf = addcall
fe._load_frame = loadcall

fe.run(max_frames=n_warm)
measuring[0] = True
t0 = time.time()
fe.run(max_frames=n_warm + n_meas)
dt = time.time() - t0
measuring[0] = False

iters = np.array(stats["iters"])
print(f"frames: {n_meas}  wall: {dt:.2f}s  fps: {n_meas/dt:.2f}")
print(f"tracking: {stats['track_s']:.2f}s over {stats['track_n']} frames "
      f"({1000*stats['track_s']/max(stats['track_n'],1):.0f} ms/frame)")
print(f"  iters/frame: mean {iters.mean():.1f} median {np.median(iters):.0f} "
      f"max {iters.max()} min {iters.min()}")
print(f"  ms/iter: {1000*stats['track_s']/max(iters.sum(),1):.1f}")
print(f"mapping: {stats['map_s']:.2f}s over {stats['map_n']} iters "
      f"({1000*stats['map_s']/max(stats['map_n'],1):.0f} ms/iter)")
print(f"insert: {stats['insert_s']:.2f}s  load: {stats['load_s']:.2f}s")
print(f"other: {dt - stats['track_s'] - stats['map_s'] - stats['insert_s'] - stats['load_s']:.2f}s")
print(f"active gaussians: {int(np.asarray(eng.gmap.aux.active).sum())}")
