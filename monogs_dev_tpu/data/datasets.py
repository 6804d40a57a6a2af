"""Dataset loaders: TUM / Replica / EuRoC stereo / Realsense (live + replay).

Capability parity with /root/reference/utils/dataset.py (SURVEY.md §2.12),
reimplemented host-side with numpy/cv2 and a channel-last float convention:
`dataset[idx] -> (image (H, W, 3) float32 in [0,1], depth (H, W) float32 or
None, T_gt (4, 4) float64 W2C)`.

Parser behaviors preserved: TUM timestamp association (max_dt 0.08) with
32 Hz subsampling, Replica traj.txt C2W inversion, EuRoC cam0/cam1
rectification + SGBM disparity with the ORB-SLAM2 baseline*fx = 47.906
constant, undistortion via cv2.initUndistortRectifyMap.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image

from ..utils.logging import Log


def _quat_xyzw_to_matrix(quat: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion -> 4x4 homogeneous rotation."""
    x, y, z, w = quat
    n = x * x + y * y + z * z + w * w
    if n < 1e-12:
        return np.eye(4)
    s = 2.0 / n
    T = np.eye(4)
    T[:3, :3] = np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
            [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
            [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
        ]
    )
    return T


class BaseDataset:
    """Common intrinsics container + sequence interface."""

    def __init__(self, config):
        self.config = config
        calibration = config["Dataset"]["Calibration"]
        self.fx = float(calibration["fx"])
        self.fy = float(calibration["fy"])
        self.cx = float(calibration["cx"])
        self.cy = float(calibration["cy"])
        self.width = int(calibration["width"])
        self.height = int(calibration["height"])
        self.has_depth = "depth_scale" in calibration
        self.depth_scale = (
            float(calibration["depth_scale"]) if self.has_depth else None
        )
        self.num_imgs = 0

    def __len__(self) -> int:
        return self.num_imgs

    def __getitem__(self, idx: int):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# parsers


class ReplicaParser:
    """results/frame*.jpg + depth*.png; traj.txt rows are flat C2W 4x4."""

    def __init__(self, input_folder: str):
        self.color_paths = sorted(glob.glob(f"{input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(glob.glob(f"{input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        with open(f"{input_folder}/traj.txt") as f:
            lines = f.readlines()
        self.poses = []
        for i in range(self.n_img):
            c2w = np.array(list(map(float, lines[i].split()))).reshape(4, 4)
            self.poses.append(np.linalg.inv(c2w))


class TUMParser:
    """rgb/depth/groundtruth timestamp association at 32 Hz."""

    def __init__(self, input_folder: str, frame_rate: int = 32):
        pose_file = os.path.join(input_folder, "groundtruth.txt")
        if not os.path.isfile(pose_file):
            pose_file = os.path.join(input_folder, "pose.txt")
        image_data = np.loadtxt(
            os.path.join(input_folder, "rgb.txt"), delimiter=" ", dtype=str
        )
        depth_data = np.loadtxt(
            os.path.join(input_folder, "depth.txt"), delimiter=" ", dtype=str
        )
        pose_data = np.loadtxt(pose_file, delimiter=" ", dtype=str, skiprows=1)
        pose_vecs = pose_data.astype(np.float64)

        t_img = image_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_vecs[:, 0]

        assoc = self._associate(t_img, t_depth, t_pose)
        keep = [0]
        for i in range(1, len(assoc)):
            if t_img[assoc[i][0]] - t_img[assoc[keep[-1]][0]] > 1.0 / frame_rate:
                keep.append(i)

        self.color_paths: List[str] = []
        self.depth_paths: List[str] = []
        self.poses: List[np.ndarray] = []
        for ix in keep:
            i, j, k = assoc[ix]
            self.color_paths.append(os.path.join(input_folder, image_data[i, 1]))
            self.depth_paths.append(os.path.join(input_folder, depth_data[j, 1]))
            T_c2w = _quat_xyzw_to_matrix(pose_vecs[k, 4:8])
            T_c2w[:3, 3] = pose_vecs[k, 1:4]
            self.poses.append(np.linalg.inv(T_c2w))
        self.n_img = len(self.color_paths)

    @staticmethod
    def _associate(t_img, t_depth, t_pose, max_dt: float = 0.08):
        assoc = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_depth - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                assoc.append((i, j, k))
        return assoc


# body-to-cam0 extrinsic used by the reference (dataset.py:159-166)
_EUROC_T_I_C0 = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


class EuRoCParser:
    def __init__(self, input_folder: str, start_idx: int = 0):
        self.color_paths = sorted(glob.glob(f"{input_folder}/mav0/cam0/data/*.png"))
        self.color_paths_r = sorted(glob.glob(f"{input_folder}/mav0/cam1/data/*.png"))
        assert len(self.color_paths) == len(self.color_paths_r)
        self.color_paths = self.color_paths[start_idx:]
        self.color_paths_r = self.color_paths_r[start_idx:]
        self.n_img = len(self.color_paths)

        gt_file = f"{input_folder}/mav0/state_groundtruth_estimate0/data.csv"
        with open(gt_file) as f:
            reader = csv.reader(f)
            next(reader)
            data = np.array([list(map(float, row)) for row in reader])

        ts_pose = data[:, 0]
        self.poses = []
        for i in range(self.n_img):
            color_ts = float(os.path.basename(self.color_paths[i]).split(".")[0])
            k = int(np.argmin(np.abs(ts_pose - color_ts)))
            # EuRoC stores (w, x, y, z); reorder to xyzw
            quat_wxyz = data[k, 4:8]
            T_w_i = _quat_xyzw_to_matrix(quat_wxyz[[1, 2, 3, 0]])
            T_w_i[:3, 3] = data[k, 1:4]
            T_w_c = T_w_i @ _EUROC_T_I_C0
            self.poses.append(np.linalg.inv(T_w_c))


# ---------------------------------------------------------------------------
# datasets


class MonocularDataset(BaseDataset):
    """Single-camera dataset with optional depth and undistortion."""

    def __init__(self, config):
        super().__init__(config)
        calibration = config["Dataset"]["Calibration"]
        self.distorted = bool(calibration.get("distorted", False))
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        if self.distorted:
            dist = np.array(
                [calibration[k] for k in ("k1", "k2", "p1", "p2", "k3")]
            )
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                self.K, dist, np.eye(3), self.K, (self.width, self.height),
                cv2.CV_32FC1,
            )
        self.color_paths: List[str] = []
        self.depth_paths: List[str] = []
        self.poses: List[np.ndarray] = []

    def __getitem__(self, idx: int):
        image = np.array(Image.open(self.color_paths[idx]))
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        if self.distorted:
            image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)
        depth = None
        if self.has_depth and idx < len(self.depth_paths):
            depth = (
                np.array(Image.open(self.depth_paths[idx])).astype(np.float32)
                / self.depth_scale
            )
        image = np.clip(image.astype(np.float32) / 255.0, 0.0, 1.0)
        return image, depth, self.poses[idx]


class TUMDataset(MonocularDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = TUMParser(config["Dataset"]["dataset_path"])
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.poses = parser.poses


class ReplicaDataset(MonocularDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = ReplicaParser(config["Dataset"]["dataset_path"])
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.poses = parser.poses


class StereoDataset(BaseDataset):
    """EuRoC-style stereo: rectify both eyes, SGBM disparity -> depth."""

    # ORB-SLAM2 EuRoC config: baseline * fx (dataset.py:380-383)
    BASELINE_FX = 47.90639384423901

    def __init__(self, config):
        calibration = config["Dataset"]["Calibration"]
        cam0opt = calibration["cam0"]["opt"]
        # BaseDataset reads fx... from a flat Calibration dict; stereo stores
        # them per-eye, so synthesize the flat view first.
        flat = dict(calibration)
        flat.update(cam0opt)
        cfg = dict(config)
        cfg["Dataset"] = dict(config["Dataset"])
        cfg["Dataset"]["Calibration"] = flat
        super().__init__(cfg)
        self.config = config

        cam0raw, cam1raw = calibration["cam0"]["raw"], calibration["cam1"]["raw"]
        cam1opt = calibration["cam1"]["opt"]
        K_raw = np.array(
            [
                [cam0raw["fx"], 0.0, cam0raw["cx"]],
                [0.0, cam0raw["fy"], cam0raw["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        K_opt = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        K_raw_r = np.array(
            [
                [cam1raw["fx"], 0.0, cam1raw["cx"]],
                [0.0, cam1raw["fy"], cam1raw["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        K_opt_r = np.array(
            [
                [cam1opt["fx"], 0.0, cam1opt["cx"]],
                [0.0, cam1opt["fy"], cam1opt["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        R0 = np.array(calibration["cam0"]["R"]["data"]).reshape(3, 3)
        R1 = np.array(calibration["cam1"]["R"]["data"]).reshape(3, 3)
        d0 = np.array([cam0raw[k] for k in ("k1", "k2", "p1", "p2", "k3")])
        d1 = np.array([cam1raw[k] for k in ("k1", "k2", "p1", "p2", "k3")])
        size = (self.width, self.height)
        self.map1x, self.map1y = cv2.initUndistortRectifyMap(
            K_raw, d0, R0, K_opt, size, cv2.CV_32FC1
        )
        self.map1x_r, self.map1y_r = cv2.initUndistortRectifyMap(
            K_raw_r, d1, R1, K_opt_r, size, cv2.CV_32FC1
        )
        self.has_depth = True  # stereo depth is synthesized
        self.color_paths: List[str] = []
        self.color_paths_r: List[str] = []
        self.poses: List[np.ndarray] = []

    def __getitem__(self, idx: int):
        image = cv2.imread(self.color_paths[idx], 0)
        image_r = cv2.imread(self.color_paths_r[idx], 0)
        image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)
        image_r = cv2.remap(image_r, self.map1x_r, self.map1y_r, cv2.INTER_LINEAR)
        stereo = cv2.StereoSGBM_create(minDisparity=0, numDisparities=64, blockSize=20)
        stereo.setUniquenessRatio(40)
        disparity = stereo.compute(image, image_r).astype(np.float32) / 16.0
        disparity[disparity == 0] = 1e10
        depth = self.BASELINE_FX / disparity
        depth[depth < 0] = 0
        rgb = np.stack([image] * 3, axis=-1).astype(np.float32) / 255.0
        return np.clip(rgb, 0.0, 1.0), depth.astype(np.float32), self.poses[idx]


class EurocDataset(StereoDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = EuRoCParser(
            config["Dataset"]["dataset_path"],
            start_idx=int(config["Dataset"].get("start_idx", 0)),
        )
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.color_paths_r = parser.color_paths_r
        self.poses = parser.poses


class RealsenseDataset(BaseDataset):
    """Live Realsense capture (dataset.py:429-519). Requires pyrealsense2.

    Parity with the reference live path: color at 640x480/30fps with auto
    exposure and auto white balance DISABLED and a fixed exposure (photo-
    metric consistency for tracking); when `sensor_type` is 'depth', the
    depth stream is enabled and every frameset is aligned to the color
    camera, with depth scaled to meters by the device's depth scale. The
    color image is undistorted with the device-reported coefficients."""

    def __init__(self, config):
        try:
            import pyrealsense2 as rs
        except Exception as e:  # pragma: no cover - no camera in CI
            raise RuntimeError(
                "pyrealsense2 is not available; use type 'realsense_replay' "
                "to replay recorded frames"
            ) from e
        # Live capture: intrinsics come from the device, not the YAML.
        self.config = config
        self.rs = rs
        ds = config["Dataset"]
        self.has_depth = ds.get("sensor_type", "monocular") == "depth"
        self.pipeline = rs.pipeline()
        cfg = rs.config()
        cfg.enable_stream(rs.stream.color, 640, 480, rs.format.bgr8, 30)
        if self.has_depth:
            cfg.enable_stream(rs.stream.depth)
        profile = self.pipeline.start(cfg)

        # fixed photometrics (dataset.py:453-456); exposure configurable
        color_sensor = profile.get_device().query_sensors()[1]
        color_sensor.set_option(rs.option.enable_auto_exposure, False)
        color_sensor.set_option(rs.option.enable_auto_white_balance, False)
        color_sensor.set_option(
            rs.option.exposure, float(ds.get("exposure", 200.0))
        )

        intr = (
            profile.get_stream(rs.stream.color)
            .as_video_stream_profile()
            .get_intrinsics()
        )
        self.fx, self.fy, self.cx, self.cy = intr.fx, intr.fy, intr.ppx, intr.ppy
        self.width, self.height = intr.width, intr.height
        self.dist_coeffs = np.asarray(intr.coeffs, np.float32)
        self._undistort = None
        if np.any(self.dist_coeffs != 0.0):
            try:  # pragma: no cover - cv2 optional
                import cv2

                K = np.array(
                    [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]]
                )
                m1, m2 = cv2.initUndistortRectifyMap(
                    K, self.dist_coeffs, np.eye(3), K,
                    (self.width, self.height), cv2.CV_32FC1,
                )
                self._undistort = lambda im: cv2.remap(im, m1, m2, cv2.INTER_LINEAR)
            except Exception:
                pass

        if self.has_depth:
            self.align = rs.align(rs.stream.color)
            self.depth_scale = (
                profile.get_device().first_depth_sensor().get_depth_scale()
            )
        else:
            self.align = None
            self.depth_scale = None
        self.num_imgs = 999999

    def __getitem__(self, idx: int):
        frameset = self.pipeline.wait_for_frames()
        depth = None
        if self.has_depth:
            frameset = self.align.process(frameset)
            depth_frame = frameset.get_depth_frame()
            # device depth units -> meters, aligned to the color pixels
            depth = (
                np.asanyarray(depth_frame.get_data()).astype(np.float32)
                * self.depth_scale
            )
        frame = frameset.get_color_frame()
        image = np.asanyarray(frame.get_data())[..., ::-1]  # BGR -> RGB
        image = np.clip(image.astype(np.float32) / 255.0, 0.0, 1.0)
        if self._undistort is not None:
            image = self._undistort(image)
        return image, depth, np.eye(4)


class RealsenseReplayDataset(MonocularDataset):
    """Replays recorded Realsense-style frames from a directory.

    Layout: <path>/color/*.png|jpg [+ <path>/depth/*.png with depth_scale].
    GT poses are identity (live capture has none), matching dataset.py:492.
    """

    def __init__(self, config):
        super().__init__(config)
        root = config["Dataset"]["dataset_path"]
        self.color_paths = sorted(
            glob.glob(os.path.join(root, "color", "*.png"))
            + glob.glob(os.path.join(root, "color", "*.jpg"))
        )
        depth_dir = os.path.join(root, "depth")
        if self.has_depth and os.path.isdir(depth_dir):
            self.depth_paths = sorted(glob.glob(os.path.join(depth_dir, "*.png")))
        else:
            self.has_depth = False
        self.num_imgs = len(self.color_paths)
        self.poses = [np.eye(4) for _ in range(self.num_imgs)]


def load_dataset(config):
    """Factory keyed on Dataset.type (dataset.py:522-532)."""
    dtype = config["Dataset"]["type"]
    if dtype == "tum":
        return TUMDataset(config)
    if dtype == "replica":
        return ReplicaDataset(config)
    if dtype == "euroc":
        return EurocDataset(config)
    if dtype == "realsense":
        return RealsenseDataset(config)
    if dtype == "realsense_replay":
        return RealsenseReplayDataset(config)
    if dtype == "synthetic":
        from .synthetic import SyntheticDataset

        return SyntheticDataset(config)
    raise ValueError(f"Unknown dataset type: {dtype}")
