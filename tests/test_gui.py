"""Headless tests for the interactive GUI core (viz/gui.ViewerState).

The tk shell needs an X display; everything behavioral — packet ingestion,
orbit camera math, same-renderer re-render in every mode, frusta overlay
projection, pause protocol — lives in ViewerState and is exercised here.
"""

import numpy as np
import jax
import pytest

from monogs_dev_tpu.data.synthetic import make_synthetic_scene, orbit_pose
from monogs_dev_tpu.models.camera import Intrinsics
from monogs_dev_tpu.ops.raster_types import RasterConfig
from monogs_dev_tpu.viz.gui import OrbitCamera, ViewerState, _to_photo_data
from monogs_dev_tpu.viz.snapshot import GaussianPacket, VizChannel

INTR = Intrinsics(fx=60.0, fy=60.0, cx=40.0, cy=30.0, width=80, height=60)
CFG = RasterConfig(max_per_tile=256, k_dup=8, tile_group=20)


@pytest.fixture(scope="module")
def packet():
    params, active = make_synthetic_scene(jax.random.PRNGKey(0), n=80, scale=0.1)
    return GaussianPacket.from_map(
        params,
        active,
        current_frame_T=np.asarray(orbit_pose(3, 10), np.float32),
        keyframe_poses=[np.asarray(orbit_pose(i, 10)) for i in (0, 3)],
    )


class TestOrbitCamera:
    def test_w2c_looks_at_target(self):
        cam = OrbitCamera(target=np.array([0.0, 0.0, 4.0]), radius=2.0)
        T = cam.w2c()
        # target projects to the optical axis: camera-frame x,y ~ 0, z ~ r
        p = T[:3, :3] @ cam.target + T[:3, 3]
        np.testing.assert_allclose(p[:2], 0.0, atol=1e-6)
        assert abs(p[2] - cam.radius) < 1e-6

    def test_rotate_zoom_bounds(self):
        cam = OrbitCamera()
        cam.rotate(0.3, 99.0)
        assert cam.pitch <= 1.45
        cam.zoom(1e9)
        assert cam.radius <= 100.0
        R = cam.w2c()[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


class TestViewerState:
    def test_ingest_centers_once(self, packet):
        st = ViewerState(INTR, CFG)
        assert st.ingest(packet)
        first_target = st.camera.target.copy()
        np.testing.assert_allclose(
            first_target, packet.xyz.mean(axis=0), atol=1e-5
        )
        assert not st.ingest(None)  # no packet -> no redraw
        st.ingest(packet)
        np.testing.assert_allclose(st.camera.target, first_target)

    def test_follow_uses_current_frame(self, packet):
        st = ViewerState(INTR, CFG)
        st.ingest(packet)
        st.follow, st.from_behind = True, False
        np.testing.assert_allclose(st.view_matrix(), packet.current_frame_T)
        st.from_behind = True
        T = st.view_matrix()
        assert not np.allclose(T, packet.current_frame_T)
        st.follow = False
        np.testing.assert_allclose(st.view_matrix(), st.camera.w2c())

    @pytest.mark.parametrize("mode", ViewerState.MODES)
    def test_render_modes(self, packet, mode):
        st = ViewerState(INTR, CFG)
        st.ingest(packet)
        st.follow = False
        st.mode = mode
        img = st.render()
        assert img.shape == (60, 80, 3)
        assert np.isfinite(img).all() and img.max() <= 1.0 + 1e-6

    def test_frusta_project(self, packet):
        st = ViewerState(INTR, CFG)
        st.ingest(packet)
        st.follow = False
        st.camera.radius = 6.0
        segs = st.frusta_segments()
        assert len(segs) > 0 and len(segs) % 8 == 0  # 8 edges per frustum
        st.show_cameras = False
        assert st.frusta_segments() == []

    def test_jump_to_keyframe_reseats_orbit(self, packet):
        st = ViewerState(INTR, CFG)
        st.ingest(packet)
        st.jump_to_keyframe(1)
        assert not st.follow
        # the re-seated orbit camera looks roughly along the keyframe axis
        T_kf = np.asarray(packet.keyframe_poses[1])
        fwd_kf = T_kf[:3, :3].T @ np.array([0, 0, 1.0])
        fwd_cam = st.camera.w2c()[:3, :3].T @ np.array([0, 0, 1.0])
        assert fwd_kf @ fwd_cam > 0.99

    def test_pause_protocol(self, packet):
        st = ViewerState(INTR, CFG)
        ch = VizChannel()
        msg = st.toggle_pause()
        assert st.paused and msg.flag_pause
        ch.request_pause(msg.flag_pause)
        assert ch.poll_control().flag_pause is True
        assert not st.toggle_pause().flag_pause

    def test_photo_data_is_ppm(self, packet):
        st = ViewerState(INTR, CFG)
        st.ingest(packet)
        st.follow = False
        data = _to_photo_data(st.render())
        assert data.startswith(b"P6 80 60 255 ")
        assert len(data) == len(b"P6 80 60 255 ") + 80 * 60 * 3
