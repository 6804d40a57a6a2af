#!/usr/bin/env python
"""DP mapping scaling table: iterations/sec at N=1,2,4,8 mesh devices.

VERDICT r3 Next #7: measure, don't assert, the DP payoff. This container
exposes ONE physical CPU core (nproc=1) and no multi-chip TPU, so the
mesh is N *virtual* CPU devices time-slicing one core — wall-clock
SPEEDUP is structurally impossible here and the table instead documents
the OVERHEAD the DP program adds as the mesh widens (psum of
capacity-sized grads, replicated update). On real ICI-connected chips
the per-device rasterization work (the dominant term, scales 1/N) would
drop while the psum rides the interconnect; this probe pins the crossing
point math: speedup requires t_raster/N + t_psum(N) + t_update <
t_raster + t_update.

Usage: python tools/probe_dp_scaling.py [iters]
Writes one table row per N to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n: int, iters: int) -> None:
    sys.path.insert(0, REPO)
    from monogs_dev_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monogs_dev_tpu.core.params import MapOptConfig, StepConfig
    from monogs_dev_tpu.data.synthetic import make_synthetic_scene
    from monogs_dev_tpu.models import Intrinsics, create_map, insert_points
    from monogs_dev_tpu.ops import RasterConfig
    from monogs_dev_tpu.ops.rasterize import render_tiled
    from monogs_dev_tpu.parallel import (
        DPBatch,
        dp_mapping_step,
        make_dp_opt_state,
        make_mesh,
        shard_batch,
    )

    intr = Intrinsics(fx=70.0, fy=70.0, cx=40.0, cy=32.0, width=80, height=64)
    rcfg = RasterConfig(tile=16, max_per_tile=128, k_dup=8, tile_group=10)
    params, active = make_synthetic_scene(jax.random.PRNGKey(3), n=400, scale=0.08)
    gmap = create_map(4096, 0)
    gmap, _ = insert_points(gmap, params, active, kf_id=0)

    b = 8  # fixed window: 8 keyframes regardless of mesh width
    images, depths, poses = [], [], []
    for i in range(b):
        th = 0.03 * (i - b / 2)
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        T[2, 3] = 0.1 * th
        out = render_tiled(
            gmap.params, gmap.aux.active, jnp.asarray(T), intr, 0,
            jnp.zeros(3), rcfg, need_touched=False,
        )
        images.append(out.color)
        depths.append(out.depth)
        poses.append(T)
    batch = DPBatch(
        images=jnp.stack(images),
        depths=jnp.stack(depths),
        T_w2c=jnp.asarray(np.stack(poses)),
        exposure=jnp.zeros((b, 2)),
        valid=jnp.ones((b,), bool),
        optimize_pose=jnp.arange(b) > 0,
        optimize_exposure=jnp.arange(b) > 0,
    )

    mesh = make_mesh(n)
    step = dp_mapping_step(
        mesh, StepConfig(monocular=False), MapOptConfig(), intr, rcfg,
        use_depth=True, update_every=10**9, update_offset=0,
    )
    sbatch = shard_batch(mesh, batch)
    opt = make_dp_opt_state(b)
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(0)
    g = gmap
    # compile + settle
    g, sbatch, opt, loss, _ = step(
        g, sbatch, opt, it, rng, jnp.float32(0.005), jnp.float32(6.0)
    )
    jax.block_until_ready(loss)
    t0 = time.time()
    for k in range(iters):
        g, sbatch, opt, loss, _ = step(
            g, sbatch, opt, it + k + 1, rng, jnp.float32(0.005), jnp.float32(6.0)
        )
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(
        f"RESULT N={n} iters={iters} wall_s={dt:.3f} "
        f"iters_per_s={iters / dt:.3f} loss={float(loss):.5f}",
        flush=True,
    )


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        env["MONOGS_DP_CHILD"] = f"{n}:{iters}"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        for ln in proc.stdout.splitlines():
            if ln.startswith("RESULT"):
                print(ln, flush=True)
        if proc.returncode != 0:
            print(f"N={n} FAILED:\n{proc.stderr[-2000:]}", flush=True)


if __name__ == "__main__":
    spec = os.environ.get("MONOGS_DP_CHILD")
    if spec:
        n, iters = (int(v) for v in spec.split(":"))
        child(n, iters)
    else:
        main()
