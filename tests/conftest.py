"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers an `axon` TPU backend in every
Python process and force-selects it; `jax.config.update` after import wins,
so tests stay off the (single, shared, claim-contended) TPU chip.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache (namespaced per backend+cpuinfo): e2e system
# tests are compile-dominated on CPU, so every run after the first starts
# from warm programs (VERDICT r3 Next #8 — fast suite under ~5 min).
from monogs_dev_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute end-to-end runs (quality regressions); "
        "deselect with -m 'not slow' for the fast suite",
    )
