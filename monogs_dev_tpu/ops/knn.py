"""kNN mean-squared-distance — the simple-knn (`distCUDA2`) equivalent.

The reference initializes per-Gaussian log-scales from the mean squared
distance to each point's 3 nearest neighbors
(/root/reference/gaussian_splatting/scene/gaussian_model.py:183-190), via a
~400-LoC CUDA Morton-sort kernel (SURVEY.md §2.10). Point clouds here are a
few thousand points per keyframe (post-downsample), so an exact chunked
O(M^2) pairwise top-k is both simpler and fast on TPU: each chunk is a
(chunk, M) distance matrix built from one (chunk, 3) x (3, M) matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e12


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_sq_dist_knn3(
    points: jnp.ndarray, valid: jnp.ndarray | None = None, chunk: int = 1024
) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors (self excluded).

    Args:
      points: (M, 3) float32.
      valid: optional (M,) bool; invalid points are excluded as neighbors and
        get output 0.
    Returns:
      (M,) float32.
    """
    m = points.shape[0]
    if valid is None:
        valid = jnp.ones((m,), bool)
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    pts_pad = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)], axis=0)
    valid_pad = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    idx_pad = jnp.arange(n_chunks * chunk, dtype=jnp.int32)

    sq = jnp.sum(points * points, axis=-1)  # (M,)

    def one_chunk(args):
        q, qvalid, qidx = args  # (chunk, 3), (chunk,), (chunk,)
        # squared distances via the matmul identity |a-b|^2 = |a|^2+|b|^2-2ab
        cross = q @ points.T  # (chunk, M) — MXU
        d2 = jnp.maximum(
            jnp.sum(q * q, axis=-1)[:, None] + sq[None, :] - 2.0 * cross, 0.0
        )
        self_mask = qidx[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
        d2 = jnp.where(valid[None, :] & ~self_mask, d2, _BIG)
        neg_top, _ = jax.lax.top_k(-d2, 3)
        knn3 = -neg_top  # (chunk, 3) smallest distances
        mean3 = jnp.where(knn3 >= _BIG, 0.0, knn3).mean(axis=-1)
        return jnp.where(qvalid, mean3, 0.0)

    out = jax.lax.map(
        one_chunk,
        (
            pts_pad.reshape(n_chunks, chunk, 3),
            valid_pad.reshape(n_chunks, chunk),
            idx_pad.reshape(n_chunks, chunk),
        ),
    )
    return out.reshape(-1)[:m]
