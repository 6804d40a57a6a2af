"""Absolute trajectory error with Umeyama alignment.

Replaces the reference's `evo` dependency
(/root/reference/utils/eval_utils.py:10-66): keyframe C2W trajectories are
aligned with a closed-form Umeyama similarity transform (scale-corrected for
monocular, matching `correct_scale=monocular`) and scored as translation
RMSE. Emits the same artifacts: trj json, stats json, 2D plot PNG.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from ..utils.logging import Log


def umeyama_alignment(
    x: np.ndarray, y: np.ndarray, with_scale: bool = False
):
    """Least-squares similarity transform aligning x -> y.

    Args:
      x, y: (3, N) point sets.
    Returns:
      (R (3,3), t (3,), c scalar) with y ~ c * R @ x + t.
    """
    mx = x.mean(axis=1, keepdims=True)
    my = y.mean(axis=1, keepdims=True)
    xc, yc = x - mx, y - my
    n = x.shape[1]
    cov = yc @ xc.T / n
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    r = u @ s @ vt
    if with_scale:
        var_x = (xc**2).sum() / n
        c = float(np.trace(np.diag(d) @ s) / max(var_x, 1e-12))
    else:
        c = 1.0
    t = my[:, 0] - c * r @ mx[:, 0]
    return r, t, c


def ate_rmse(
    T_est: List[np.ndarray], T_gt: List[np.ndarray], correct_scale: bool = False
) -> float:
    """ATE translation RMSE over W2C pose lists, Umeyama-aligned."""
    pos_est = np.stack([np.linalg.inv(T)[:3, 3] for T in T_est], axis=1)  # (3, N)
    pos_gt = np.stack([np.linalg.inv(T)[:3, 3] for T in T_gt], axis=1)
    if pos_est.shape[1] < 3:
        return float(np.sqrt(((pos_est - pos_gt) ** 2).sum(axis=0).mean()))
    r, t, c = umeyama_alignment(pos_est, pos_gt, with_scale=correct_scale)
    aligned = c * r @ pos_est + t[:, None]
    err = aligned - pos_gt
    return float(np.sqrt((err**2).sum(axis=0).mean()))


def eval_ate(
    cameras: Dict[int, "FrameInfo"],  # noqa: F821 - frontend FrameInfo
    kf_ids: List[int],
    save_dir: str | None,
    iterations: int,
    final: bool = False,
    monocular: bool = False,
) -> float:
    """eval_utils.eval_ate equivalent: keyframe-trajectory ATE + artifacts."""
    trj_est, trj_gt, trj_est_np, trj_gt_np, trj_id = [], [], [], [], []

    def c2w(T):
        return np.linalg.inv(np.asarray(T, dtype=np.float64))

    for kf_id in kf_ids:
        cam = cameras[kf_id]
        pose_est = c2w(cam.T_est)
        pose_gt = c2w(cam.T_gt)
        trj_id.append(int(cam.idx))
        trj_est.append(pose_est.tolist())
        trj_gt.append(pose_gt.tolist())
        trj_est_np.append(np.asarray(cam.T_est, np.float64))
        trj_gt_np.append(np.asarray(cam.T_gt, np.float64))

    ate = ate_rmse(trj_est_np, trj_gt_np, correct_scale=monocular)
    Log(f"ATE RMSE (cm): {ate * 100:.3f}", tag="Eval")

    if save_dir is not None:
        plot_dir = os.path.join(save_dir, "plot")
        os.makedirs(plot_dir, exist_ok=True)
        label = "final" if final else str(iterations)
        with open(
            os.path.join(save_dir, f"trj_{label}.json"), "w", encoding="utf-8"
        ) as f:
            json.dump({"trj_id": trj_id, "trj_est": trj_est, "trj_gt": trj_gt}, f)
        with open(os.path.join(plot_dir, f"stats_{label}.json"), "w") as f:
            json.dump({"rmse": ate, "n_kf": len(kf_ids)}, f, indent=2)
        _plot_trajectory(trj_est_np, trj_gt_np, monocular, plot_dir, label, ate)
    return ate


def _plot_trajectory(T_est, T_gt, monocular, plot_dir, label, ate):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pos_est = np.stack([np.linalg.inv(T)[:3, 3] for T in T_est], axis=1)
        pos_gt = np.stack([np.linalg.inv(T)[:3, 3] for T in T_gt], axis=1)
        if pos_est.shape[1] >= 3:
            r, t, c = umeyama_alignment(pos_est, pos_gt, with_scale=monocular)
            pos_est = c * r @ pos_est + t[:, None]
        fig, ax = plt.subplots()
        ax.plot(pos_gt[0], pos_gt[1], label="GT", color="k", lw=1)
        ax.plot(pos_est[0], pos_est[1], label="est", color="tab:blue", lw=1)
        ax.set_title(f"ATE RMSE {ate * 100:.2f} cm")
        ax.legend()
        ax.set_aspect("equal")
        fig.savefig(os.path.join(plot_dir, f"trj_{label}.png"), dpi=90)
        plt.close(fig)
    except Exception as e:  # pragma: no cover
        Log(f"trajectory plot skipped: {e}", tag="Eval")
