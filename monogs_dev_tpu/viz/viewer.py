"""Map viewer: re-render the live map from arbitrary viewpoints.

The reference GUI re-rasterizes the map from the interactive Open3D camera
with the same CUDA renderer (/root/reference/gui/slam_gui.py:540-571) and
offers depth/opacity colormap modes (slam_gui.py:573-596). Open3D/OpenGL are
not available in this environment, so the TPU equivalent is:

  - `render_view`: rasterize the map from any pose/intrinsics with the
    production renderer (same-renderer parity with the reference GUI);
  - depth / opacity colormapping via matplotlib colormaps;
  - `OfflineViewer`: consumes `VizChannel` packets and writes PNG frames —
    a headless stand-in for the interactive window, usable as a live monitor
    (`watch -n1` on the output dir) or to build turntable videos after a run.

The GL ellipsoid view (gui/gl_render) is a debug visualization of the same
Gaussians; `render_view(..., mode="opacity")` covers its diagnostic role.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.camera import Intrinsics
from ..ops.raster_types import RasterConfig
from ..ops.rasterize import render_tiled


def render_view(
    params,
    active,
    T_w2c,
    intr: Intrinsics,
    sh_degree: int = 0,
    mode: str = "color",
    raster_cfg: RasterConfig = RasterConfig(),
    scale_modifier: float = 1.0,
) -> np.ndarray:
    """Render the map from a viewpoint. mode: color | depth | opacity."""
    out = render_tiled(
        params,
        active,
        jnp.asarray(T_w2c, jnp.float32),
        intr,
        sh_degree,
        config=raster_cfg,
        scale_modifier=scale_modifier,
        need_touched=False,
    )
    if mode == "color":
        return np.clip(np.asarray(out.color), 0.0, 1.0)
    if mode == "depth":
        depth = np.asarray(out.depth) / np.maximum(np.asarray(out.alpha), 1e-6)
        return _colormap(depth, "turbo")
    if mode == "opacity":
        return _colormap(np.asarray(out.alpha), "viridis")
    raise ValueError(f"unknown mode {mode}")


def render_ellipsoids(
    params,
    active,
    T_w2c,
    intr: Intrinsics,
    raster_cfg: RasterConfig = RasterConfig(),
    scale_modifier: float = 1.0,
) -> np.ndarray:
    """Ellipsoid debug view: every Gaussian rendered as a solid opaque
    ellipse in its own color — the diagnostic role of the reference's GL
    instanced-quad viewer (gui/gl_render, selected via the GUI's ellipsoid
    mode, slam_gui.py:598-638). Opacities are forced to ~1 so structure,
    scale, and orientation are visible regardless of training state."""
    solid = params._replace(
        opacity_logit=jnp.full_like(params.opacity_logit, 12.0)  # sigmoid->1
    )
    out = render_tiled(
        solid,
        active,
        jnp.asarray(T_w2c, jnp.float32),
        intr,
        0,
        config=raster_cfg,
        scale_modifier=scale_modifier,
        need_touched=False,
    )
    return np.clip(np.asarray(out.color), 0.0, 1.0)


def orbit_poses(
    center: np.ndarray, radius: float, n_frames: int, elevation: float = 0.35
) -> list:
    """W2C poses orbiting `center` on a tilted circle, always looking at it."""
    poses = []
    for i in range(n_frames):
        ang = 2.0 * np.pi * i / max(n_frames, 1)
        eye = center + radius * np.array(
            [np.sin(ang), -np.sin(elevation), -np.cos(ang) * np.cos(elevation)]
        )
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right = right / np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_c2w = np.stack([right, up2, fwd], axis=1)  # columns
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_c2w.T
        T[:3, 3] = -R_c2w.T @ eye
        poses.append(T)
    return poses


def export_turntable(
    params,
    active,
    intr: Intrinsics,
    out_path: str,
    n_frames: int = 36,
    mode: str = "color",
    radius: float | None = None,
    raster_cfg: RasterConfig = RasterConfig(),
    fps: int = 12,
) -> str:
    """Render an orbit around the map and write an animated GIF (plus the
    individual PNG frames next to it) — the headless product surface for
    the reference GUI's interactive inspection."""
    act = np.asarray(active)
    xyz = np.asarray(params.xyz)[act]
    if xyz.size == 0:
        raise ValueError("no active gaussians to visualize")
    center = xyz.mean(axis=0)
    if radius is None:
        radius = 1.5 * float(np.percentile(np.linalg.norm(xyz - center, axis=-1), 90))

    from PIL import Image

    frames = []
    frame_dir = os.path.splitext(out_path)[0] + "_frames"
    os.makedirs(frame_dir, exist_ok=True)
    for i, T in enumerate(orbit_poses(center, radius, n_frames)):
        if mode == "ellipsoid":
            img = render_ellipsoids(params, active, T, intr, raster_cfg)
        else:
            img = render_view(
                params, active, T, intr, mode=mode, raster_cfg=raster_cfg
            )
        save_view_png(img, os.path.join(frame_dir, f"orbit_{i:04d}.png"))
        frames.append(Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    frames[0].save(
        out_path,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return out_path


def _colormap(x: np.ndarray, name: str) -> np.ndarray:
    lo, hi = np.percentile(x, 2.0), np.percentile(x, 98.0)
    xn = np.clip((x - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
    try:
        import matplotlib.cm as cm

        return np.asarray(cm.get_cmap(name)(xn))[..., :3].astype(np.float32)
    except Exception:  # pragma: no cover
        return np.stack([xn] * 3, axis=-1).astype(np.float32)


def save_view_png(image01: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8)).save(path)


class OfflineViewer:
    """Headless viewer thread: drains a VizChannel, writes PNG frames."""

    def __init__(
        self,
        channel,
        intr: Intrinsics,
        out_dir: str,
        mode: str = "color",
        every: int = 1,
    ):
        self.channel = channel
        self.intr = intr
        self.out_dir = out_dir
        self.mode = mode
        self.every = every
        self._count = 0

    def tick(self, params=None, active=None) -> Optional[str]:
        """Render the newest packet (if any). Returns the written path."""
        packet = self.channel.latest()
        if packet is None or packet.finish:
            return None
        self._count += 1
        if self._count % self.every != 0:
            return None
        if params is None or packet.current_frame_T is None:
            # fall back to saving the GT image context
            if packet.gt_color is not None:
                path = os.path.join(self.out_dir, f"frame_{self._count:05d}.png")
                save_view_png(packet.gt_color, path)
                return path
            return None
        img = render_view(
            params, active, packet.current_frame_T, self.intr, mode=self.mode
        )
        path = os.path.join(self.out_dir, f"view_{self._count:05d}.png")
        save_view_png(img, path)
        return path
