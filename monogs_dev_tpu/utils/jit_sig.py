"""Jit-signature canonicalization at dispatch boundaries.

JAX's jit cache keys on the PRE-pruning avals of every argument,
including `weak_type` — and `jnp.full(shape, python_scalar)` without an
explicit dtype produces a WEAK-typed array. A prewarmed program traced
with a weak dummy is therefore unreachable by a production dispatch whose
same-shaped input is strong (and vice versa), even when the argument is
entirely unused in the lowered program (e.g. the depth map under
use_depth=False). Round 3's driver bench died on the scalar variant of
this; round 4's first bench attempt reproduced the ARRAY variant: the
tracking program re-lowered at the first post-init frame and the relay
stalled the watchdog out (see tests/test_jit_signatures.py).

Every hot entry point routes its inputs through `strongen` so all
callers — prewarm, production, tests — land on one cache entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _strong_leaf(x):
    if x is None:
        return None
    a = jnp.asarray(x)
    if getattr(a, "weak_type", False):
        # explicit dtype clears weak_type; same-dtype conversion is a no-op
        # copy at most (usually none)
        return jnp.asarray(a, a.dtype)
    return a


def strongen(tree):
    """Coerce every array leaf of a pytree to a strong-typed jnp array."""
    return jax.tree.map(_strong_leaf, tree)
