"""Visualization snapshot protocol.

Equivalent of the reference's GUI queue messages
(/root/reference/gui/gui_utils.py:77-158): `GaussianPacket` is a detached
snapshot of the map plus current-frame context shipped from the SLAM loop to
a viewer; `VizChannel` implements the latest-wins main->vis queue and the
pause/unpause vis->main channel (gui_utils.get_latest_queue semantics,
gui_utils.py:144-155; pause consumed at slam_frontend.py:333-343).

JAX arrays are immutable, so "detaching" is just keeping references — no
deep copy needed (the reference's clone_obj CUDA-IPC copy has no analogue
here).
"""

from __future__ import annotations

import dataclasses
import queue
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class GaussianPacket:
    """Snapshot for the viewer (subset of gui_utils.GaussianPacket)."""

    xyz: Optional[np.ndarray] = None  # (M, 3) active Gaussians
    rgb: Optional[np.ndarray] = None  # (M, 3)
    opacity: Optional[np.ndarray] = None  # (M,)
    scales: Optional[np.ndarray] = None  # (M, 3)
    current_frame_T: Optional[np.ndarray] = None  # (4, 4) W2C
    gt_color: Optional[np.ndarray] = None  # (H, W, 3) current frame
    gt_depth: Optional[np.ndarray] = None
    keyframe_poses: Optional[List[np.ndarray]] = None
    kf_window: Optional[Dict[int, list]] = None
    # full-map device references for same-renderer GUI re-rendering (JAX
    # arrays are immutable, so keeping them is a free "deep copy" — the
    # analogue of the reference's clone_obj-into-the-packet)
    params: Optional[object] = None  # GaussianParams
    active: Optional[object] = None  # (N,) bool
    finish: bool = False

    @staticmethod
    def from_map(params, active, **kwargs) -> "GaussianPacket":
        from ..geometry.sh import sh_to_rgb
        from ..models.gaussians import activations

        mask = np.asarray(active)
        scales, _, opacity = activations(params)
        return GaussianPacket(
            xyz=np.asarray(params.xyz)[mask],
            rgb=np.clip(np.asarray(sh_to_rgb(params.f_dc[:, 0, :]))[mask], 0, 1),
            opacity=np.asarray(opacity)[mask],
            scales=np.asarray(scales)[mask],
            params=params,
            active=active,
            **kwargs,
        )


@dataclasses.dataclass
class PacketVis2Main:
    """vis -> main control message (gui_utils.Packet_vis2main)."""

    flag_pause: bool = False


class VizChannel:
    """Bidirectional viewer channel with latest-wins delivery."""

    def __init__(self, maxsize: int = 4):
        self.q_main2vis: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self.q_vis2main: "queue.Queue" = queue.Queue()

    def publish(self, packet: GaussianPacket) -> None:
        """Non-blocking; drops the oldest packet when the viewer lags."""
        try:
            self.q_main2vis.put_nowait(packet)
        except queue.Full:
            try:
                self.q_main2vis.get_nowait()
            except queue.Empty:
                pass
            try:
                self.q_main2vis.put_nowait(packet)
            except queue.Full:
                pass

    def latest(self) -> Optional[GaussianPacket]:
        """Drain to the newest packet (gui_utils.get_latest_queue)."""
        packet = None
        while True:
            try:
                packet = self.q_main2vis.get_nowait()
            except queue.Empty:
                return packet

    def request_pause(self, pause: bool) -> None:
        self.q_vis2main.put(PacketVis2Main(flag_pause=pause))

    def poll_control(self) -> Optional[PacketVis2Main]:
        try:
            return self.q_vis2main.get_nowait()
        except queue.Empty:
            return None
