"""LPIPS (pure-JAX AlexNet) metric sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_dev_tpu.eval.lpips import (
    load_lpips_params,
    lpips,
    random_lpips_params,
)


def _imgs():
    k = jax.random.PRNGKey(0)
    a = jax.random.uniform(k, (64, 64, 3))
    return a


def test_lpips_identity_is_zero():
    a = _imgs()
    assert abs(lpips(a, a)) < 1e-6


def test_lpips_orders_distortions():
    """More distortion -> larger LPIPS; symmetric; positive."""
    a = _imgs()
    k = jax.random.PRNGKey(1)
    noise = jax.random.normal(k, a.shape)
    small = jnp.clip(a + 0.02 * noise, 0, 1)
    big = jnp.clip(a + 0.3 * noise, 0, 1)
    d_small = lpips(a, small)
    d_big = lpips(a, big)
    assert 0.0 < d_small < d_big
    np.testing.assert_allclose(d_big, lpips(big, a), rtol=1e-5)


def test_lpips_deterministic_backend():
    p1 = random_lpips_params(0)
    p2 = random_lpips_params(0)
    np.testing.assert_array_equal(
        np.asarray(p1.conv_w[0]), np.asarray(p2.conv_w[0])
    )
    # without the canonical npz the loader must fall back to the random
    # backbone and say so
    params = load_lpips_params()
    assert params.backend in ("alexnet-random", "alexnet-lpips-v0.1")
