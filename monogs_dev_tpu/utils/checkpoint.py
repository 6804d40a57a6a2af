"""Full-state checkpoint / resume.

The reference only saves PLY snapshots of the map and never resumes
(SURVEY.md §5 "Checkpoint / resume": save-only). This framework adds real
resume: the Gaussian map (params + aux + Adam moments), the backend
counters, keyframe poses/exposures, and the frontend trajectory are written
as one compressed npz; PLY export for viewer interop stays in utils/ply.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import AdamMoments, GaussianMap, GaussianParams, MapAux


def save_checkpoint(path: str, engine, frontend=None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    gmap = engine.gmap
    data = {}
    for group, tree in (
        ("params", gmap.params),
        ("mu", gmap.moments.mu),
        ("nu", gmap.moments.nu),
    ):
        for name, arr in zip(tree._fields, tree):
            data[f"{group}.{name}"] = np.asarray(arr)
    for name, arr in zip(gmap.aux._fields, gmap.aux):
        data[f"aux.{name}"] = np.asarray(arr)
    data["moments.count"] = np.asarray(gmap.moments.count)
    data["iteration_count"] = np.asarray(engine.iteration_count)
    data["current_window"] = np.asarray(engine.current_window, np.int64)
    data["initialized"] = np.asarray(engine.initialized)
    kf_ids = sorted(engine.viewpoints)
    data["kf_ids"] = np.asarray(kf_ids, np.int64)
    data["kf_T"] = np.stack(
        [np.asarray(engine.viewpoints[i].T_w2c) for i in kf_ids]
    ) if kf_ids else np.zeros((0, 4, 4))
    data["kf_exposure"] = np.stack(
        [np.asarray(engine.viewpoints[i].exposure) for i in kf_ids]
    ) if kf_ids else np.zeros((0, 2))
    if frontend is not None:
        frame_ids = sorted(frontend.cameras)
        data["trj_ids"] = np.asarray(frame_ids, np.int64)
        data["trj_est"] = np.stack(
            [frontend.cameras[i].T_est for i in frame_ids]
        ) if frame_ids else np.zeros((0, 4, 4))
        data["trj_gt"] = np.stack(
            [frontend.cameras[i].T_gt for i in frame_ids]
        ) if frame_ids else np.zeros((0, 4, 4))
    np.savez_compressed(path, **data)


def load_map(path: str) -> Tuple[GaussianMap, dict]:
    """Restore the GaussianMap and a dict of host-side state."""
    with np.load(path, allow_pickle=False) as data:
        def tree(group):
            return GaussianParams(
                **{
                    name: jnp.asarray(data[f"{group}.{name}"])
                    for name in GaussianParams._fields
                }
            )

        params = tree("params")
        moments = AdamMoments(
            mu=tree("mu"),
            nu=tree("nu"),
            count=jnp.asarray(data["moments.count"]),
        )
        aux = MapAux(
            **{name: jnp.asarray(data[f"aux.{name}"]) for name in MapAux._fields}
        )
        host = {
            "iteration_count": int(data["iteration_count"]),
            "current_window": [int(i) for i in data["current_window"]],
            "initialized": bool(data["initialized"]),
            "kf_ids": [int(i) for i in data["kf_ids"]],
            "kf_T": np.asarray(data["kf_T"]),
            "kf_exposure": np.asarray(data["kf_exposure"]),
        }
        if "trj_ids" in data:
            host["trj_ids"] = [int(i) for i in data["trj_ids"]]
            host["trj_est"] = np.asarray(data["trj_est"])
            host["trj_gt"] = np.asarray(data["trj_gt"])
    return GaussianMap(params, aux, moments), host
