"""Rendering-quality evaluation: masked PSNR, SSIM, LPIPS (gated).

eval_utils.eval_rendering equivalent
(/root/reference/utils/eval_utils.py:116-180): every `interval`-th
non-keyframe frame is re-rendered from its estimated pose and scored. LPIPS
uses the torch `lpips` package when importable (it is not bundled in this
environment and its weights need network access); when unavailable the
metric is reported as None — PSNR/SSIM carry the comparison.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..models.camera import Intrinsics
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled
from ..utils.device_lock import DEVICE_LOCK
from ..utils.logging import Log
from ..utils.losses import psnr as psnr_fn
from ..utils.losses import ssim as ssim_fn
from ..utils.ply import save_ply

def _lpips(img_a: np.ndarray, img_b: np.ndarray):
    """LPIPS(AlexNet) via the pure-JAX implementation (eval/lpips.py).

    Returns (value, backend). backend is "alexnet-lpips-v0.1" when the
    canonical weight npz is present, "alexnet-random" otherwise — values
    from the random backbone are internally consistent but NOT comparable
    to published LPIPS numbers, so the backend tag is reported alongside."""
    from .lpips import lpips, lpips_backend

    return lpips(img_a, img_b), lpips_backend()


def eval_rendering(
    cameras: Dict[int, "FrameInfo"],  # noqa: F821
    dataset,
    params,
    active,
    intr: Intrinsics,
    raster_cfg: RasterConfig,
    sh_degree: int,
    save_dir: str | None,
    kf_indices: List[int],
    iteration: str = "final",
    interval: int = 5,
) -> dict:
    img_pred, img_gt = [], []
    psnrs, ssims, lpipss = [], [], []
    lpips_backend = None

    end_idx = len(dataset) - 1
    for idx in range(0, end_idx, interval):
        if idx in kf_indices or idx not in cameras:
            continue
        image_np, _, _ = dataset[idx]
        with DEVICE_LOCK:  # the backend thread may still be idle-mapping
            gt = jnp.asarray(image_np)
            T = jnp.asarray(cameras[idx].T_est, jnp.float32)
            out = render_tiled(
                params, active, T, intr, sh_degree, config=raster_cfg,
                need_touched=False,
            )
            pred = jnp.clip(out.color, 0.0, 1.0)
            mask = gt.sum(axis=-1) > 0.0
            psnrs.append(float(psnr_fn(pred, gt, mask)))
            ssims.append(float(ssim_fn(pred, gt)))
            pred = np.asarray(pred)
            gt = np.asarray(gt)
        lp, lpips_backend = _lpips(pred, gt)
        lpipss.append(lp)
        img_pred.append(pred)
        img_gt.append(gt)

    output = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "mean_ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "mean_lpips": float(np.mean(lpipss)) if lpipss else None,
        "lpips_backend": lpips_backend if lpipss else None,
        "n_frames": len(psnrs),
    }
    Log(
        f'mean psnr: {output["mean_psnr"]}, ssim: {output["mean_ssim"]}, '
        f'lpips: {output["mean_lpips"]}',
        tag="Eval",
    )
    if lpipss and lpips_backend != "alexnet-lpips-v0.1":
        # fail LOUDLY, not just a tag: values from a random backbone must
        # never be quoted against published LPIPS numbers (the reference
        # reports canonical AlexNet-LPIPS, eval_utils.py:130-132). The
        # value stays in the JSON under its backend tag; the comparable
        # field is withheld.
        Log(
            "WARNING: LPIPS ran on the NON-CANONICAL random backbone "
            f"('{lpips_backend}'); values are not comparable to published "
            "LPIPS. Install the v0.1 weights npz (tools/export_lpips_npz.py"
            " or $MONOGS_LPIPS_WEIGHTS) for canonical numbers.",
            tag="Eval",
        )
        output["mean_lpips_noncanonical"] = output.pop("mean_lpips")
        output["mean_lpips"] = None
    if save_dir is not None:
        psnr_save_dir = os.path.join(save_dir, "psnr", str(iteration))
        os.makedirs(psnr_save_dir, exist_ok=True)
        with open(
            os.path.join(psnr_save_dir, "final_result.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(output, f, indent=2)
    return output


def save_gaussians(params, active, save_dir: str | None, iteration, final=False):
    """PLY snapshot (eval_utils.py:183-192 layout)."""
    if save_dir is None:
        return
    point_cloud_path = os.path.join(
        save_dir,
        "point_cloud/final" if final else f"point_cloud/iteration_{iteration}",
    )
    n = save_ply(params, active, os.path.join(point_cloud_path, "point_cloud.ply"))
    Log(f"Saved {n} gaussians to {point_cloud_path}", tag="Eval")
