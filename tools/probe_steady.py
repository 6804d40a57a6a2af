"""Steady-state per-phase breakdown of the bench SLAM run.

Unlike probe_bench_breakdown.py this prewarm-compiles every program variant
and extends warmup past monocular initialization (bench.py's protocol), so
the measured window is the true steady state the driver bench captures.
Phases: tracking / mapping(idle|kf|init) / harvest / insert / kf-depth /
everything else.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax
import numpy as np
from monogs_dev_tpu.core.system import SLAM
from monogs_dev_tpu.core import backend as backend_mod
from monogs_dev_tpu.utils.config import load_config

config = load_config("configs/synthetic/bench_vga.yaml")
config["Dataset"]["sensor_type"] = "monocular"
config["Results"]["save_results"] = False

n_meas = 25
slam = SLAM(config, save_dir=None)
print("slam built", flush=True)
n_total = len(slam.dataset)
for i in range(n_total):
    slam.dataset.render_frame(i)
print("frames prerendered", flush=True)
slam.prewarm()
print("prewarm done", flush=True)

fe = slam.frontend
eng = slam.engine

stats = {
    "track_s": 0.0, "track_n": 0, "iters": [],
    "map_s": {"idle": 0.0, "kf": 0.0, "init": 0.0},
    "map_n": {"idle": 0, "kf": 0, "init": 0},
    "harvest_s": 0.0, "harvest_n": 0,
    "insert_s": 0.0, "insert_n": 0,
    "kfdepth_s": 0.0, "load_s": 0.0,
}
measuring = [False]
map_phase = ["idle"]

orig_tracking = fe.tracking
orig_map = eng.map
orig_add = eng.add_next_kf
orig_load = fe._load_frame
orig_kfdepth = fe.make_keyframe_depth
orig_harvest = backend_mod.harvest_visibility
orig_handle_kf = eng.handle_keyframe
orig_init_map = eng.initialize_map


def tracking(idx, image, depth, grad_mask):
    t0 = time.time(); r = orig_tracking(idx, image, depth, grad_mask)
    if measuring[0]:
        stats["track_s"] += time.time() - t0; stats["track_n"] += 1
        stats["iters"].append(int(r.n_iters))
    return r


def mapcall(iters=1, **kw):
    t0 = time.time(); r = orig_map(iters=iters, **kw)
    jax.block_until_ready(eng.gmap.params.xyz)
    if measuring[0]:
        ph = map_phase[0]
        stats["map_s"][ph] += time.time() - t0; stats["map_n"][ph] += iters
    return r


def handle_kf(*a, **kw):
    map_phase[0] = "kf"
    try:
        return orig_handle_kf(*a, **kw)
    finally:
        map_phase[0] = "idle"


def init_map(*a, **kw):
    map_phase[0] = "init"
    try:
        return orig_init_map(*a, **kw)
    finally:
        map_phase[0] = "idle"


def addcall(*a, **kw):
    t0 = time.time(); r = orig_add(*a, **kw)
    jax.block_until_ready(eng.gmap.params.xyz)
    if measuring[0]:
        stats["insert_s"] += time.time() - t0; stats["insert_n"] += 1
    return r


def loadcall(idx):
    t0 = time.time(); r = orig_load(idx)
    if measuring[0]:
        stats["load_s"] += time.time() - t0
    return r


def kfdepth(image, depth, track):
    t0 = time.time(); r = orig_kfdepth(image, depth, track)
    if measuring[0]:
        stats["kfdepth_s"] += time.time() - t0
    return r


def harvest(*a, **kw):
    t0 = time.time(); r = orig_harvest(*a, **kw)
    jax.block_until_ready(r)
    if measuring[0]:
        stats["harvest_s"] += time.time() - t0; stats["harvest_n"] += 1
    return r


fe.tracking = tracking
eng.map = mapcall
eng.add_next_kf = addcall
eng.handle_keyframe = handle_kf
eng.initialize_map = init_map
fe._load_frame = loadcall
fe.make_keyframe_depth = kfdepth
backend_mod.harvest_visibility = harvest

# warmup to steady state, bench.py protocol
frame = 16
fe.run(max_frames=frame)
while not (fe.initialized and eng.initialized):
    if frame + 5 + n_meas > n_total:
        break
    frame += 5
    fe.run(max_frames=frame)
    print(f"warmup extended to {frame}", flush=True)
print(f"warmup done at frame {frame}", flush=True)

measuring[0] = True
t0 = time.time()
fe.run(max_frames=frame + n_meas)
dt = time.time() - t0
measuring[0] = False

iters = np.array(stats["iters"]) if stats["iters"] else np.array([0])
print(f"frames: {n_meas}  wall: {dt:.2f}s  fps: {n_meas/dt:.2f}")
print(f"tracking: {stats['track_s']:.2f}s over {stats['track_n']} frames "
      f"({1000*stats['track_s']/max(stats['track_n'],1):.0f} ms/frame)")
print(f"  iters/frame: mean {iters.mean():.1f} median {np.median(iters):.0f} "
      f"max {iters.max()} min {iters.min()}  ms/iter "
      f"{1000*stats['track_s']/max(iters.sum(),1):.1f}")
for ph in ("idle", "kf", "init"):
    s, n = stats["map_s"][ph], stats["map_n"][ph]
    print(f"mapping[{ph}]: {s:.2f}s over {n} iters "
          f"({1000*s/max(n,1):.0f} ms/iter)")
print(f"harvest: {stats['harvest_s']:.2f}s over {stats['harvest_n']} calls")
print(f"insert: {stats['insert_s']:.2f}s over {stats['insert_n']} inserts")
print(f"kf-depth: {stats['kfdepth_s']:.2f}s  load: {stats['load_s']:.2f}s")
other = (dt - stats["track_s"] - sum(stats["map_s"].values())
         - stats["insert_s"] - stats["kfdepth_s"] - stats["load_s"])
print(f"other: {other:.2f}s")
print(f"timers: {slam.timers.summary()}")
print(f"active gaussians: {int(np.asarray(eng.gmap.aux.active).sum())}")
print(f"telemetry: {eng.telemetry}")
