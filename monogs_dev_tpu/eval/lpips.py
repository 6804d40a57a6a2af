"""LPIPS perceptual metric in pure JAX (AlexNet backbone).

The reference reports LPIPS(AlexNet) per rendering eval
(/root/reference/utils/eval_utils.py:130-132) via the torch `lpips`
package. This is a from-scratch JAX implementation of the same metric
(Zhang et al., CVPR 2018): AlexNet conv features at 5 depths,
channel-unit-normalized, squared differences re-weighted by learned 1x1
"lin" convs, spatially averaged and summed over depths.

Weights resolution order:
  1. an .npz at $MONOGS_LPIPS_WEIGHTS or monogs_dev_tpu/eval/lpips_weights.npz
     (produced by tools/export_lpips_npz.py from torchvision+lpips — the
     canonical AlexNet-LPIPS v0.1 weights; ~9 MB, not redistributable in
     this offline container),

     Why the npz cannot be produced here (verified 2026-08-20): the
     canonical weights are the torchvision AlexNet ImageNet checkpoint
     plus the lpips package's v0.1 linear heads, both fetched over the
     network on first use. This container has zero egress, torchvision
     and lpips are not installed (torch 2.13 cpu is, without weights),
     and an exhaustive disk search found no cached copy: no
     ~/.cache/torch hub dir, no *.pth checkpoints anywhere on the
     filesystem, nothing matching *alexnet* or *lpips*. There is no
     transcription source. Run tools/export_lpips_npz.py in any
     networked environment and drop the npz next to this file; the
     loader and the "alexnet-lpips-v0.1" tag path are tested
     (tests/test_lpips.py::test_npz_weights_are_loaded_and_tagged).
  2. otherwise a DETERMINISTIC He-initialized random backbone with uniform
     lin weights ("alexnet-random"). Random-feature perceptual distances
     correlate with human judgments well above pixel metrics (Zhang et al.
     §5 discuss untrained nets), but the absolute numbers are NOT
     comparable to canonical LPIPS — callers must surface the backend tag
     next to the value, which eval/rendering.py does.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, in_ch, kernel, stride, pad) per AlexNet conv layer
_ALEX = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# maxpool(3, stride 2) after relu1 and relu2
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    conv_w: Tuple[jnp.ndarray, ...]  # (O, I, K, K) per layer
    conv_b: Tuple[jnp.ndarray, ...]  # (O,) per layer
    lin_w: Tuple[jnp.ndarray, ...]  # (O,) nonneg per layer
    backend: str  # "alexnet-lpips-v0.1" | "alexnet-random"


def random_lpips_params(seed: int = 0) -> LPIPSParams:
    """Deterministic He-initialized backbone + uniform lin weights."""
    key = jax.random.PRNGKey(seed)
    conv_w, conv_b, lin_w = [], [], []
    for o, i, k, _, _ in _ALEX:
        key, kw = jax.random.split(key)
        std = float(np.sqrt(2.0 / (i * k * k)))
        conv_w.append(jax.random.normal(kw, (o, i, k, k)) * std)
        conv_b.append(jnp.zeros((o,)))
        lin_w.append(jnp.full((o,), 1.0 / o))
    return LPIPSParams(tuple(conv_w), tuple(conv_b), tuple(lin_w), "alexnet-random")


_DEFAULT_NPZ = os.path.join(os.path.dirname(__file__), "lpips_weights.npz")


@functools.lru_cache(maxsize=1)
def load_lpips_params() -> LPIPSParams:
    """Canonical weights if the npz is present, else the random backbone."""
    path = os.environ.get("MONOGS_LPIPS_WEIGHTS", _DEFAULT_NPZ)
    if os.path.exists(path):
        z = np.load(path)
        conv_w = tuple(jnp.asarray(z[f"conv{i}_w"]) for i in range(5))
        conv_b = tuple(jnp.asarray(z[f"conv{i}_b"]) for i in range(5))
        lin_w = tuple(jnp.asarray(z[f"lin{i}_w"]).reshape(-1) for i in range(5))
        return LPIPSParams(conv_w, conv_b, lin_w, "alexnet-lpips-v0.1")
    return random_lpips_params()


def _features(x: jnp.ndarray, params: LPIPSParams):
    """x: (1, 3, H, W) normalized. Returns list of (1, C, h, w) relu outs."""
    feats = []
    for li, (o, i, k, stride, pad) in enumerate(_ALEX):
        x = jax.lax.conv_general_dilated(
            x,
            params.conv_w[li],
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + params.conv_b[li][None, :, None, None]
        x = jnp.maximum(x, 0.0)
        feats.append(x)
        if li in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, 3, 3),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@functools.partial(jax.jit, static_argnames=("backend",))
def _lpips_jit(a, b, conv_w, conv_b, lin_w, backend):
    params = LPIPSParams(conv_w, conv_b, lin_w, backend)
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(img):  # (H, W, 3) in [0,1] -> normalized (1, 3, H, W)
        x = jnp.transpose(img, (2, 0, 1))[None] * 2.0 - 1.0
        return (x - shift) / scale

    fa = _features(prep(a), params)
    fb = _features(prep(b), params)
    total = jnp.zeros(())
    for li in range(len(_ALEX)):
        d = _unit_normalize(fa[li]) - _unit_normalize(fb[li])
        d2 = d * d  # (1, C, h, w)
        w = jnp.maximum(params.lin_w[li], 0.0)[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d2 * w, axis=1))
    return total


def lpips(
    img_a: jnp.ndarray, img_b: jnp.ndarray, params: LPIPSParams | None = None
) -> float:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    if params is None:
        params = load_lpips_params()
    return float(
        _lpips_jit(
            jnp.asarray(img_a, jnp.float32),
            jnp.asarray(img_b, jnp.float32),
            params.conv_w,
            params.conv_b,
            params.lin_w,
            params.backend,
        )
    )


def lpips_backend() -> str:
    return load_lpips_params().backend
