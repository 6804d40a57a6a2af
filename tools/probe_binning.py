"""Decompose build_binning cost on TPU and measure candidate rewrites.

Dependency-chained timings (each iteration consumes the previous result so
XLA cannot hoist the work out of the loop). Bench shapes: N=65536 capacity,
18k active, VGA 16px tiles, k_dup=8, l_max=512.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from monogs_dev_tpu.data.synthetic import make_surface_scene, orbit_pose
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.models.gaussians import create_map, insert_points
from monogs_dev_tpu.ops import RasterConfig
from monogs_dev_tpu.ops.project import project_gaussians
from monogs_dev_tpu.ops.rasterize import build_binning

CAP = int(os.environ.get("PROBE_CAP", 65536))
N_PTS = int(os.environ.get("PROBE_N", 18000))
E = int(os.environ.get("PROBE_E", 24576))
intr = Intrinsics(fx=576.0, fy=576.0, cx=320.0, cy=240.0, width=640, height=480)
rcfg = RasterConfig(max_per_tile=512, k_dup=8, tile_group=60)

params, active = make_surface_scene(jax.random.PRNGKey(0), n=N_PTS)
gmap = create_map(CAP, 0)
gmap, _ = insert_points(gmap, params, active, 0)
T0 = jnp.asarray(orbit_pose(0, 128, sweep=0.45), jnp.float32)
proj = jax.jit(
    lambda: project_gaussians(gmap.params, gmap.aux.active, T0, intr, 0)
)()
jax.block_until_ready(proj)
print(
    f"CAP={CAP} E={E} active={int(jax.device_get(gmap.aux.active.sum()))} "
    f"valid={int(jax.device_get(proj.valid.sum()))}",
    flush=True,
)

K_REP = 30


def chain(name, f):
    """f: scalar x -> scalar y, full work dependent on x."""
    @jax.jit
    def run(x0):
        return jax.lax.fori_loop(0, K_REP, lambda i, x: f(x), x0)
    y = run(jnp.zeros(())); jax.block_until_ready(y)
    t0 = time.time(); jax.block_until_ready(run(jnp.zeros(())))
    print(f"{name:46s} {(time.time() - t0) / K_REP * 1000:8.2f} ms", flush=True)


tile, l_max, kd = rcfg.tile, rcfg.max_per_tile, rcfg.k_dup
tx_n, ty_n = 40, 30
n_tiles = tx_n * ty_n
n = CAP
nk = n * kd

sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)

chain(
    "depth argsort (N)",
    lambda x: jnp.argsort(sort_depth + x)[0].astype(jnp.float32) * 1e-9,
)

order = jnp.argsort(sort_depth).astype(jnp.int32)
m = proj.means2d[order]
r_ = proj.radii[order] + 4.0
val = proj.valid[order]


def tid_math(x, mm, rr, vv, ntk):
    tx0 = jnp.clip(jnp.floor((mm[:, 0] - rr + x) / tile), 0, tx_n - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mm[:, 0] + rr + x) / tile), 0, tx_n - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((mm[:, 1] - rr) / tile), 0, ty_n - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((mm[:, 1] + rr) / tile), 0, ty_n - 1).astype(jnp.int32)
    wrect = tx1 - tx0 + 1
    span = wrect * (ty1 - ty0 + 1)
    span_cap = jnp.minimum(span, kd)
    ks = jnp.arange(kd, dtype=jnp.int32)
    within = (ks[None, :] < span_cap[:, None]) & vv[:, None]
    tyk = ty0[:, None] + ks[None, :] // wrect[:, None]
    txk = tx0[:, None] + ks[None, :] % wrect[:, None]
    return jnp.where(within, tyk * tx_n + txk, ntk)


chain(
    "tid rect math (N,K)",
    lambda x: tid_math(x, m, r_, val, n_tiles)[0, 0].astype(jnp.float32) * 1e-9,
)

tid = jax.jit(lambda: tid_math(jnp.zeros(()), m, r_, val, n_tiles))()
jax.block_until_ready(tid)
eid = jnp.arange(nk, dtype=jnp.int32)
eid_bits = max((nk - 1).bit_length(), 1)


def packed_sort(x):
    t = tid.reshape(-1) + x.astype(jnp.int32)
    return jnp.sort((t << eid_bits) | eid)


chain(
    f"packed sort (N*K={nk})",
    lambda x: packed_sort(x)[0].astype(jnp.float32) * 1e-9,
)

packed = jax.jit(lambda: packed_sort(jnp.zeros(())))()
jax.block_until_ready(packed)
sorted_tid = packed >> eid_bits
sorted_eid = packed & ((1 << eid_bits) - 1)


def tables(x):
    starts = jnp.searchsorted(
        sorted_tid + x.astype(jnp.int32),
        jnp.arange(n_tiles + 1, dtype=jnp.int32),
    ).astype(jnp.int32)
    offs = jnp.arange(l_max, dtype=jnp.int32)
    gpos = starts[:-1, None] + offs[None, :]
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, l_max)
    in_seg = offs[None, :] < counts[:, None]
    sorted_j = sorted_eid // kd
    idx = jnp.where(in_seg, sorted_j[jnp.clip(gpos, 0, nk - 1)], n)
    return idx


chain(
    "searchsorted + idx_table",
    lambda x: tables(x)[0, 0].astype(jnp.float32) * 1e-9,
)

pos = jnp.arange(nk, dtype=jnp.int32)

chain(
    "inversion: second sort (N*K)",
    lambda x: jax.lax.sort(
        (sorted_eid + x.astype(jnp.int32), pos), num_keys=1
    )[1][0].astype(jnp.float32) * 1e-9,
)

chain(
    "inversion: scatter (N*K)",
    lambda x: jnp.zeros((nk,), jnp.int32).at[
        sorted_eid + x.astype(jnp.int32)
    ].set(pos, mode="drop", unique_indices=True)[0].astype(jnp.float32) * 1e-9,
)

chain(
    "build_binning (full)",
    lambda x: build_binning(proj, intr, rcfg, dilate=4.0 + x)
    .counts[0].astype(jnp.float32) * 1e-9,
)

# candidate: E-prefix build with scatter inversion
ek = E * kd
eid_e = jnp.arange(ek, dtype=jnp.int32)
eid_bits_e = max((ek - 1).bit_length(), 1)


def build_prefix(x):
    orderp = jnp.argsort(sort_depth + x).astype(jnp.int32)[:E]
    mp = proj.means2d[orderp]
    rp = proj.radii[orderp] + 4.0
    vp = proj.valid[orderp]
    tidp = tid_math(x, mp, rp, vp, n_tiles)
    packedp = jnp.sort((tidp.reshape(-1) << eid_bits_e) | eid_e)
    stp = packedp >> eid_bits_e
    sep = packedp & ((1 << eid_bits_e) - 1)
    starts = jnp.searchsorted(
        stp, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    offs = jnp.arange(l_max, dtype=jnp.int32)
    gpos = starts[:-1, None] + offs[None, :]
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, l_max)
    in_seg = offs[None, :] < counts[:, None]
    sorted_j = sep // kd
    idx = jnp.where(in_seg, sorted_j[jnp.clip(gpos, 0, ek - 1)], E)
    posp = jnp.arange(ek, dtype=jnp.int32)
    rank = posp - starts[jnp.clip(stp, 0, n_tiles - 1)]
    in_table = (stp < n_tiles) & (rank < l_max)
    slot_at_pos = jnp.where(in_table, stp * l_max + rank, n_tiles * l_max)
    pos_of_entry = jnp.zeros((ek,), jnp.int32).at[sep].set(
        posp, mode="drop", unique_indices=True
    )
    slot_of_entry = slot_at_pos[pos_of_entry]
    return idx, slot_of_entry, counts


chain(
    f"E-prefix build (E={E}, scatter inv)",
    lambda x: build_prefix(x)[0][0, 0].astype(jnp.float32) * 1e-9,
)
print("done", flush=True)
