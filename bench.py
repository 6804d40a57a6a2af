#!/usr/bin/env python
"""Benchmark: end-to-end synthetic monocular SLAM fps on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline "up to 10 fps" mono TUM fr3_office on an
RTX 4090 (/root/reference/README.md:45; BASELINE.md). Real TUM data is not
bundled in this container, so the bench runs the full SLAM pipeline
(tracking loop, keyframing, mapping, densify/prune) on a synthetic
VGA-resolution surface sequence with TUM-like budgets and measures
steady-state frames/sec after a warmup segment that absorbs compilation.

Process layout: the measurement runs in a supervised child process
(monogs_dev_tpu/utils/watchdog.py) because the remote-attached TPU relay in
this environment intermittently wedges an RPC; the supervisor kills a
stalled child and retries (the persistent compile cache makes that cheap).
The parent imports no JAX.
"""

from __future__ import annotations

import json
import os
import sys
import time


def child() -> None:
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from monogs_dev_tpu.core.system import SLAM
    from monogs_dev_tpu.utils.config import load_config
    from monogs_dev_tpu.utils.profiling import CompileCounter

    config = load_config(
        os.path.join(os.path.dirname(__file__), "configs/synthetic/bench_vga.yaml")
    )
    config["Dataset"]["sensor_type"] = "monocular"
    config["Results"]["save_results"] = False

    n_warm_min, n_meas = 16, 25
    slam = SLAM(config, save_dir=None)
    print("bench: slam constructed", flush=True)

    # pre-render the synthetic GT frames so dataset synthesis is not timed.
    # Disk-cached: a watchdog retry after a relay wedge must not re-pay 192
    # relay renders (the round-4 first attempt stalled exactly here).
    import numpy as _np

    n_total = len(slam.dataset)
    ds_cfg = config["Dataset"]
    cache_key = "bench_frames_{}x{}_n{}_s{}_sw{}_{}".format(
        ds_cfg["Calibration"]["width"], ds_cfg["Calibration"]["height"],
        n_total, ds_cfg.get("seed", 0), ds_cfg.get("sweep", 1.2),
        ds_cfg.get("profile", "none"),
    )
    cache_path = os.path.join("/tmp", cache_key + ".npz")
    if os.path.exists(cache_path):
        z = _np.load(cache_path)
        for i in range(n_total):
            slam.dataset._cache[i] = (z[f"c{i}"], z[f"d{i}"])
        print(f"bench: {n_total} frames loaded from {cache_path}", flush=True)
    else:
        for i in range(n_total):
            slam.dataset.render_frame(i)
            if i % 16 == 15:  # keep the watchdog's stall detector fed
                print(f"bench: prerendered {i + 1}/{n_total}", flush=True)
        flat = {}
        for i, (c, d) in slam.dataset._cache.items():
            flat[f"c{i}"], flat[f"d{i}"] = c, d
        _np.savez(cache_path + ".tmp", **flat)
        os.replace(cache_path + ".tmp.npz", cache_path)
        print(f"bench: {n_total} frames prerendered -> {cache_path}", flush=True)

    # compile every program variant up front (explicit AOT warmup) ...
    slam.prewarm()

    # ... then run the pipeline until it reaches steady state: at least
    # n_warm_min frames AND past monocular initialization (the one-time
    # init-BA burst must not land inside the measured window). The whole
    # warmup runs under CompileCounter: any compile caught here is a
    # PREWARM MISS — a production dispatch whose jit signature diverged
    # from what prewarm compiled (exactly what silently killed the round-3
    # bench, VERDICT r3 Weak #1). Reported loudly BEFORE the measured
    # window so the failure mode is diagnosable from the bench log alone.
    frame = n_warm_min
    with CompileCounter() as warm_cc:
        slam.frontend.run(max_frames=frame)
        while not (slam.frontend.initialized and slam.engine.initialized):
            if frame + 5 + n_meas > n_total:
                break
            frame += 5
            slam.frontend.run(max_frames=frame)
            print(f"bench: warmup extended to {frame}", flush=True)
    if warm_cc.count:
        print(
            f"bench: PREWARM MISS — {warm_cc.count} compiles during warmup "
            f"(signature drift between prewarm and production dispatch): "
            f"{warm_cc.names[:12]}",
            flush=True,
        )
    else:
        print("bench: prewarm self-check clean (0 warmup compiles)", flush=True)
    print(f"bench: warmup done at frame {frame}", flush=True)

    # measured steady-state window; assert zero compiles inside it
    fps = 0.0
    for attempt in range(2):
        snap = slam.timers.snapshot()
        tel0 = dict(slam.engine.telemetry)
        with CompileCounter() as cc:
            t0 = time.time()
            slam.frontend.run(max_frames=frame + n_meas)
            dt = time.time() - t0
        fps = n_meas / dt
        print(
            f"bench: window [{frame}, {frame + n_meas}) {fps:.3f} fps, "
            f"{cc.count} compiles {cc.names[:8]}",
            flush=True,
        )
        # per-phase split for the MEASURED WINDOW ONLY (warmup/init-BA
        # excluded) — the perf-attribution record for the next round
        print(
            f"bench: steady split {json.dumps(slam.timers.delta_summary(snap))}",
            flush=True,
        )
        tel = {
            k: round(v - tel0.get(k, 0), 3) if isinstance(v, (int, float)) else v
            for k, v in slam.engine.telemetry.items()
        }
        tel["alive"] = int(
            __import__("numpy").asarray(slam.engine.gmap.aux.active).sum()
        )
        tel["map_rows"] = slam.engine.map_rows()
        print(f"bench: window telemetry {json.dumps(tel)}", flush=True)
        print(f"bench: timers {json.dumps(slam.timers.summary())}", flush=True)
        frame += n_meas
        if cc.count == 0:
            break
        if frame + n_meas > n_total:
            print("bench: out of frames for a clean re-measure", flush=True)
            break
        print("bench: compiles hit the window; re-measuring", flush=True)

    baseline_fps = 10.0
    print(
        "RESULT "
        + json.dumps(
            {
                "metric": "synthetic_vga_mono_slam_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        ),
        flush=True,
    )


def tpu_healthy(timeout_s: float = 120.0) -> bool:
    """Probe the accelerator in a throwaway subprocess. The axon relay's
    failure mode is a silent hang at backend init (futex, 0% CPU), so the
    probe must be a separate process we can kill, never an in-process
    import."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "jax.block_until_ready(jnp.zeros((128,)) + 1);"
        "print('HEALTHY', jax.devices()[0].platform)"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "HEALTHY" in proc.stdout


def main() -> None:
    if os.environ.get("MONOGS_BENCH_CHILD") == "1":
        child()
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from monogs_dev_tpu.utils.watchdog import run_supervised

    # Health-gated attempts: only launch the measurement when a quick probe
    # confirms the relay actually executes programs; a wedged relay would
    # otherwise burn a full stall window per attempt and can poison several
    # attempts in a row. stall_s must exceed the longest single program
    # compile (mapping variants have been observed at ~400-500 s cold).
    deadline = time.time() + float(os.environ.get("MONOGS_BENCH_DEADLINE_S", 4800))
    attempt = 0
    while time.time() < deadline:
        if not tpu_healthy():
            print(
                "[bench] accelerator probe failed/hung; waiting for the relay",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(60.0)
            continue
        attempt += 1
        try:
            lines = run_supervised(
                [sys.executable, os.path.abspath(__file__)],
                stall_s=700.0,
                max_attempts=1,
                total_timeout_s=max(120.0, deadline - time.time()),
                env={"MONOGS_BENCH_CHILD": "1"},
            )
        except RuntimeError:
            print(
                f"[bench] measurement attempt {attempt} failed; re-probing",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(10.0)
            continue
        for ln in lines:
            if ln.startswith("RESULT "):
                print(ln[len("RESULT "):])
                return
        print(
            f"[bench] attempt {attempt} exited clean but without RESULT",
            file=sys.stderr,
            flush=True,
        )
    # Never leave the driver without a data point: a 0.0 entry is the honest
    # record of "the accelerator was unreachable for the whole window".
    print(
        "[bench] giving up: accelerator unavailable for the whole deadline",
        file=sys.stderr,
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "synthetic_vga_mono_slam_fps",
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
