"""Typed settings: parses the reference's OpenCV-YAML config files.

Replacement for /root/reference/src/Settings.cc (638 LoC) with the same
sensor-aware semantics: required keys abort with the key name
(Settings.cc:36-126 readParameter), Camera2 + stereo extrinsics with
rectification-map precompute for unrectified pinhole rigs (:276-354,485),
image-resize calibration scaling (:356-413), IMU calibration (:414-433),
RGB-D/ORB/Viewer/LoadAndSave/misc sections (:434-483). Handles both the
`File.version: "1.0"` key scheme (Camera1.fx) and legacy flat keys
(Camera.fx)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.camera import KannalaBrandt8, Pinhole
from ..ops.imu import ImuCalib


class SettingsError(ValueError):
    """A required parameter is missing or malformed (the reference prints
    '<name> required parameter does not exist, aborting...' and exits)."""


def _load_opencv_yaml(path: str) -> Dict:
    """cv2.FileStorage YAML: strip the %YAML directive and opencv tags, then
    parse flat keys with pyyaml."""
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML[^\n]*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


def _as_matrix(v, rows=4, cols=4) -> np.ndarray:
    """An opencv-matrix node ({rows,cols,dt,data}) or plain nested list."""
    if isinstance(v, dict):
        return np.asarray(v["data"], np.float32).reshape(
            int(v.get("rows", rows)), int(v.get("cols", cols))
        )
    return np.asarray(v, np.float32).reshape(rows, cols)


@dataclass
class ViewerSettings:
    """Viewer section (Settings.cc:453-471)."""

    keyframe_size: float = 0.05
    keyframe_line_width: float = 1.0
    graph_line_width: float = 0.9
    point_size: float = 2.0
    camera_size: float = 0.08
    camera_line_width: float = 3.0
    viewpoint_x: float = 0.0
    viewpoint_y: float = -0.7
    viewpoint_z: float = -1.8
    viewpoint_f: float = 500.0
    image_view_scale: float = 1.0


@dataclass
class Settings:
    camera_type: str = "PinHole"
    cam: object = None  # Pinhole or KannalaBrandt8 (camera 1, post-rectify)
    cam2: object = None  # second camera (unrectified stereo)
    dist1: Optional[List[float]] = None  # pinhole distortion (4 or 5 coeffs)
    dist2: Optional[List[float]] = None
    lapping1: Optional[Tuple[int, int]] = None  # KB8 overlapping columns
    lapping2: Optional[Tuple[int, int]] = None
    T_c1_c2: Optional[np.ndarray] = None  # (4,4) stereo extrinsic
    width: int = 640
    height: int = 480
    new_width: Optional[int] = None  # Camera.newWidth resize target
    new_height: Optional[int] = None
    need_resize: bool = False
    need_rectify: bool = False
    # rectification maps (M1l/M2l/M1r/M2r, Settings.cc:485-541), filled by
    # precompute when need_rectify
    rect_maps: Optional[Tuple] = None
    fps: float = 30.0
    baseline: float = 0.08
    bf: float = 40.0
    th_depth: float = 3.0  # meters (Stereo.ThDepth * baseline)
    depth_map_factor: float = 5000.0
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    rgb: bool = True
    # inertial calibration (readImuParameters, Settings.cc:414-433); None
    # for vision-only configs
    imu: Optional[ImuCalib] = None
    imu_frequency: float = 200.0
    insert_kfs_when_lost: bool = True
    # IMU init schedule (LocalMapping.cc:181-242 timing)
    imu_init_time: float = 1.0
    viba1_time: float = 5.0
    viba2_time: float = 15.0
    viewer: ViewerSettings = field(default_factory=ViewerSettings)
    load_atlas_from: Optional[str] = None
    save_atlas_to: Optional[str] = None
    th_far_points: Optional[float] = None
    raw: Dict = field(default_factory=dict)

    @staticmethod
    def from_yaml(path: str, sensor: str = None) -> "Settings":
        """Parse a config. sensor: None (lenient) or one of MONOCULAR /
        STEREO / RGBD / IMU_MONOCULAR / IMU_STEREO / IMU_RGBD (enum or
        string) — enables the reference's required-parameter errors for
        that sensor's sections."""
        d = _load_opencv_yaml(path)
        if hasattr(sensor, "name"):
            sensor = sensor.name
        strict = sensor is not None
        stereo = sensor in ("STEREO", "IMU_STEREO")
        rgbd = sensor in ("RGBD", "IMU_RGBD")
        inertial = sensor in ("IMU_MONOCULAR", "IMU_STEREO", "IMU_RGBD")

        def get(*names, default=None, required=False):
            for n in names:
                if n in d and d[n] is not None:
                    return d[n]
            if required and strict:
                raise SettingsError(
                    f"{names[0]} required parameter does not exist"
                )
            return default

        s = Settings(raw=d)

        # -- camera 1 (readCamera1, Settings.cc:184-275) --------------------
        cam_type = get("Camera.type", "Camera1.type", default="PinHole")
        s.camera_type = cam_type
        fx = float(get("Camera1.fx", "Camera.fx", required=True, default=500.0))
        fy = float(get("Camera1.fy", "Camera.fy", required=True, default=500.0))
        cx = float(get("Camera1.cx", "Camera.cx", required=True, default=320.0))
        cy = float(get("Camera1.cy", "Camera.cy", required=True, default=240.0))
        if cam_type in ("PinHole", "Rectified"):
            dist = None
            if cam_type == "PinHole" and get("Camera1.k1", "Camera.k1") is not None:
                dist = [float(get("Camera1.k1", "Camera.k1", default=0.0)),
                        float(get("Camera1.k2", "Camera.k2", required=True, default=0.0)),
                        float(get("Camera1.p1", "Camera.p1", required=True, default=0.0)),
                        float(get("Camera1.p2", "Camera.p2", required=True, default=0.0))]
                k3 = get("Camera1.k3", "Camera.k3")
                if k3 is not None:
                    dist.append(float(k3))
            s.dist1 = dist
            s.cam = Pinhole.from_list(
                [fx, fy, cx, cy] + (dist or []))
        elif cam_type == "KannalaBrandt8":
            ks = [float(get(f"Camera1.k{i}", f"Camera.k{i}", required=True,
                            default=0.0)) for i in (1, 2, 3, 4)]
            s.cam = KannalaBrandt8.from_list([fx, fy, cx, cy] + ks)
            if stereo:
                s.lapping1 = (
                    int(get("Camera1.overlappingBegin", required=True, default=0)),
                    int(get("Camera1.overlappingEnd", required=True, default=0)),
                )
        else:
            raise SettingsError(f"Error: camera model {cam_type} not known")

        # -- camera 2 (readCamera2, Settings.cc:276-354) ---------------------
        if stereo:
            if cam_type == "PinHole":
                s.need_rectify = True
            if cam_type in ("PinHole", "KannalaBrandt8"):
                fx2 = float(get("Camera2.fx", required=True, default=fx))
                fy2 = float(get("Camera2.fy", required=True, default=fy))
                cx2 = float(get("Camera2.cx", required=True, default=cx))
                cy2 = float(get("Camera2.cy", required=True, default=cy))
                if cam_type == "PinHole":
                    dist2 = None
                    if get("Camera2.k1") is not None:
                        dist2 = [float(get("Camera2.k1", default=0.0)),
                                 float(get("Camera2.k2", required=True, default=0.0)),
                                 float(get("Camera2.p1", required=True, default=0.0)),
                                 float(get("Camera2.p2", required=True, default=0.0))]
                        k3 = get("Camera2.k3")
                        if k3 is not None:
                            dist2.append(float(k3))
                    s.dist2 = dist2
                    s.cam2 = Pinhole.from_list([fx2, fy2, cx2, cy2] + (dist2 or []))
                else:
                    # the reference reads Camera1.k* for camera 2 here
                    # (Settings.cc:332-335) — an upstream quirk we keep
                    ks2 = [float(get(f"Camera1.k{i}", default=0.0))
                           for i in (1, 2, 3, 4)]
                    s.cam2 = KannalaBrandt8.from_list([fx2, fy2, cx2, cy2] + ks2)
                    s.lapping2 = (
                        int(get("Camera2.overlappingBegin", required=True, default=0)),
                        int(get("Camera2.overlappingEnd", required=True, default=0)),
                    )
            if cam_type == "Rectified":
                s.baseline = float(get("Stereo.b", required=True, default=0.08))
            else:
                T = get("Stereo.T_c1_c2", required=True)
                if T is not None:
                    s.T_c1_c2 = _as_matrix(T)
                    s.baseline = float(np.linalg.norm(s.T_c1_c2[:3, 3]))
            s.bf = s.baseline * fx
            th_depth_factor = float(get("Stereo.ThDepth", required=True,
                                        default=40.0))
            s.th_depth = s.bf / fx * th_depth_factor

        # -- image info (readImageInfo, Settings.cc:356-413) -----------------
        s.width = int(get("Camera.width", "Camera1.width", required=True,
                          default=640))
        s.height = int(get("Camera.height", "Camera1.height", required=True,
                           default=480))
        new_h = get("Camera.newHeight")
        new_w = get("Camera.newWidth")
        sy = sx = 1.0
        if new_h is not None:
            s.new_height = int(new_h)
            s.need_resize = True
            sy = s.new_height / s.height
        if new_w is not None:
            s.new_width = int(new_w)
            s.need_resize = True
            sx = s.new_width / s.width
        if s.need_resize and not s.need_rectify:
            # scale the calibration like the reference (fy/cy by row factor,
            # fx/cx by column factor)
            def scaled(cam_obj):
                p = [float(x) for x in cam_obj.params_list()]
                p[0] *= sx
                p[2] *= sx
                p[1] *= sy
                p[3] *= sy
                return type(cam_obj).from_list(p)

            s.cam = scaled(s.cam)
            if s.cam2 is not None:
                s.cam2 = scaled(s.cam2)
            if s.lapping1 is not None:
                s.lapping1 = (int(s.lapping1[0] * sx), int(s.lapping1[1] * sx))
            if s.lapping2 is not None:
                s.lapping2 = (int(s.lapping2[0] * sx), int(s.lapping2[1] * sx))

        s.fps = float(get("Camera.fps", required=True, default=30.0))
        s.rgb = bool(get("Camera.RGB", required=True, default=1))

        # -- IMU (readIMU, Settings.cc:414-433) -------------------------------
        if get("IMU.NoiseGyro") is not None or inertial:
            T = get("IMU.T_b_c1", "Tbc",
                    required=inertial)
            T = np.eye(4, dtype=np.float32) if T is None else _as_matrix(T)
            s.imu = ImuCalib(
                noise_gyro=float(get("IMU.NoiseGyro", required=inertial,
                                     default=1.7e-4)),
                noise_acc=float(get("IMU.NoiseAcc", required=inertial,
                                    default=2e-3)),
                walk_gyro=float(get("IMU.GyroWalk", required=inertial,
                                    default=1.9e-5)),
                walk_acc=float(get("IMU.AccWalk", required=inertial,
                                   default=3e-3)),
                R_bc=np.ascontiguousarray(T[:3, :3]),
                t_bc=np.ascontiguousarray(T[:3, 3]),
            )
            s.imu_frequency = float(get("IMU.Frequency", required=inertial,
                                        default=200.0))
            s.insert_kfs_when_lost = bool(get("IMU.InsertKFsWhenLost",
                                              default=1))

        # -- RGB-D (readRGBD, Settings.cc:434-442) ----------------------------
        if rgbd or get("RGBD.DepthMapFactor", "DepthMapFactor") is not None:
            s.depth_map_factor = float(get("RGBD.DepthMapFactor",
                                           "DepthMapFactor", required=rgbd,
                                           default=5000.0))
            th_depth_factor = float(get("Stereo.ThDepth", "ThDepth",
                                        required=rgbd, default=40.0))
            s.baseline = float(get("Stereo.b", required=rgbd, default=0.08))
            s.bf = s.baseline * float(s.cam.fx)
            s.th_depth = s.bf / float(s.cam.fx) * th_depth_factor
        elif not stereo:
            bf = get("Camera.bf")
            if bf is not None:
                s.bf = float(bf)
                th_depth_factor = float(get("Stereo.ThDepth", "ThDepth",
                                            default=40.0))
                s.th_depth = s.bf / fx * th_depth_factor

        # -- ORB extractor (readORB, Settings.cc:443-452) ----------------------
        s.n_features = int(get("ORBextractor.nFeatures", "Extractor.nFeatures",
                               required=True, default=1000))
        s.scale_factor = float(get("ORBextractor.scaleFactor", required=True,
                                   default=1.2))
        s.n_levels = int(get("ORBextractor.nLevels", required=True, default=8))
        s.ini_th_fast = int(get("ORBextractor.iniThFAST", required=True,
                                default=20))
        s.min_th_fast = int(get("ORBextractor.minThFAST", required=True,
                                default=7))

        # -- viewer (readViewer, Settings.cc:453-471) --------------------------
        v = ViewerSettings()
        for attr, key in [
            ("keyframe_size", "Viewer.KeyFrameSize"),
            ("keyframe_line_width", "Viewer.KeyFrameLineWidth"),
            ("graph_line_width", "Viewer.GraphLineWidth"),
            ("point_size", "Viewer.PointSize"),
            ("camera_size", "Viewer.CameraSize"),
            ("camera_line_width", "Viewer.CameraLineWidth"),
            ("viewpoint_x", "Viewer.ViewpointX"),
            ("viewpoint_y", "Viewer.ViewpointY"),
            ("viewpoint_z", "Viewer.ViewpointZ"),
            ("viewpoint_f", "Viewer.ViewpointF"),
            ("image_view_scale", "Viewer.imageViewScale"),
        ]:
            val = get(key)
            if val is not None:
                setattr(v, attr, float(val))
        s.viewer = v

        # -- load/save + misc (Settings.cc:472-483) ----------------------------
        s.load_atlas_from = get("System.LoadAtlasFromFile")
        s.save_atlas_to = get("System.SaveAtlasToFile")
        tfp = get("System.thFarPoints")
        s.th_far_points = float(tfp) if tfp is not None else None

        if s.need_rectify:
            s.precompute_rectification()
        return s

    def precompute_rectification(self):
        """precomputeRectificationMaps (Settings.cc:485-541): stereoRectify +
        undistort-rectify maps; camera 1's calibration and bf update to the
        rectified projection."""
        import cv2

        if self.cam2 is None or self.T_c1_c2 is None:
            return
        size = (self.new_width or self.width, self.new_height or self.height)
        K1 = np.asarray(self.cam.K, np.float64)
        K2 = np.asarray(self.cam2.K, np.float64)
        D1 = np.asarray(self.dist1 or [0, 0, 0, 0], np.float64).reshape(1, -1)
        D2 = np.asarray(self.dist2 or [0, 0, 0, 0], np.float64).reshape(1, -1)
        # T_c1_c2 is camera1<-camera2; stereoRectify wants cam2<-cam1
        T21 = np.linalg.inv(self.T_c1_c2.astype(np.float64))
        R12 = np.ascontiguousarray(T21[:3, :3])
        t12 = np.ascontiguousarray(T21[:3, 3]).reshape(3, 1)
        R1, R2, P1, P2, Q, _roi1, _roi2 = cv2.stereoRectify(
            K1, D1, K2, D2, size, R12, t12,
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1, newImageSize=size,
        )
        M1l, M2l = cv2.initUndistortRectifyMap(
            K1, D1, R1, P1[:3, :3], size, cv2.CV_32FC1)
        M1r, M2r = cv2.initUndistortRectifyMap(
            K2, D2, R2, P2[:3, :3], size, cv2.CV_32FC1)
        self.rect_maps = (M1l, M2l, M1r, M2r)
        self.cam = Pinhole.from_list(
            [P1[0, 0], P1[1, 1], P1[0, 2], P1[1, 2]])
        self.bf = self.baseline * float(P1[0, 0])
        # IMU extrinsic follows the rectifying rotation (Settings.cc:532-540)
        if self.imu is not None:
            R_bc = self.imu.R_bc @ np.asarray(R1, np.float32).T
            self.imu = self.imu._replace(R_bc=R_bc.astype(np.float32))

    def rectify(self, img_l: np.ndarray, img_r: np.ndarray):
        """Apply the precomputed rectification maps to a stereo pair
        (System.cc:290-300 TrackStereo path)."""
        import cv2

        if self.rect_maps is None:
            return img_l, img_r
        M1l, M2l, M1r, M2r = self.rect_maps
        return (cv2.remap(img_l, M1l, M2l, cv2.INTER_LINEAR),
                cv2.remap(img_r, M1r, M2r, cv2.INTER_LINEAR))
