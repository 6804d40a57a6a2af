"""Measure axon relay transport costs: op dispatch latency, h2d/d2h
bandwidth, device_get roundtrips — the fixed per-frame overheads that the
jitted programs cannot see."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev, flush=True)

# 1) tiny-op dispatch latency (dependency-chained adds)
x = jnp.zeros(8)
x = x + 1.0
jax.block_until_ready(x)
t0 = time.time()
for _ in range(50):
    x = x + 1.0
x = jax.device_get(x)
dt = time.time() - t0
print(f"chained tiny op: {dt / 50 * 1000:.2f} ms/op (50 ops + 1 get)", flush=True)

# 2) h2d of a VGA frame (3.7 MB), synchronous wait
img = np.random.rand(480, 640, 3).astype(np.float32)
jax.block_until_ready(jax.device_put(img))
t0 = time.time()
for _ in range(10):
    y = jax.device_put(img)
    # force completion via a dependent reduce fetched to host
    float(jnp.sum(y))
dt = time.time() - t0
print(f"h2d VGA frame + sum get: {dt / 10 * 1000:.1f} ms", flush=True)

# 3) d2h small get roundtrip
z = jnp.arange(16.0)
jax.block_until_ready(z)
t0 = time.time()
for _ in range(20):
    jax.device_get(z + 1.0)
dt = time.time() - t0
print(f"small d2h get: {dt / 20 * 1000:.2f} ms", flush=True)

# 4) d2h of a VGA render (1.2 MB)
big = jnp.zeros((480, 640))
jax.block_until_ready(big)
t0 = time.time()
for _ in range(10):
    jax.device_get(big + 1.0)
dt = time.time() - t0
print(f"VGA-plane d2h get: {dt / 10 * 1000:.1f} ms", flush=True)

# 5) non-jitted slice of a 32768-row param set (the per-frame tier slice)
N = 32768
leaves = [jnp.zeros((N, k)) for k in (3, 3, 4, 1, 1, 3)]
jax.block_until_ready(leaves[0])
t0 = time.time()
for _ in range(10):
    sl = [l[:8192] for l in leaves]
    jax.block_until_ready(sl[0])
dt = time.time() - t0
print(f"6-leaf tier slice: {dt / 10 * 1000:.2f} ms", flush=True)

# 6) jit dispatch overhead: call a trivial jitted fn with a 7-leaf pytree arg
@jax.jit
def f(ls):
    return sum(l.sum() for l in ls)

jax.block_until_ready(f(leaves))
t0 = time.time()
for _ in range(20):
    r = f(leaves)
jax.device_get(r)
dt = time.time() - t0
print(f"jit dispatch (async, amortized): {dt / 20 * 1000:.2f} ms", flush=True)
