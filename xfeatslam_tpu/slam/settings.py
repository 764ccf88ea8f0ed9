"""Typed settings: parses the reference's OpenCV-YAML config files.

Replacement for /root/reference/src/Settings.cc (638 LoC): same keys
(Camera1.fx..., Camera.bf/fps, RGBD.DepthMapFactor, Stereo.ThDepth,
ORBextractor.nFeatures, ...) with required/optional semantics; handles both
the `File.version: "1.0"` format and legacy flat keys
(/root/reference/examples/RGB-D/TUM1.yaml)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional

from ..ops.camera import KannalaBrandt8, Pinhole


def _load_opencv_yaml(path: str) -> Dict:
    """cv2.FileStorage YAML: strip the %YAML directive and opencv tags, then
    parse flat keys with pyyaml."""
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML[^\n]*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


@dataclass
class Settings:
    camera_type: str = "PinHole"
    cam: object = None  # Pinhole or KannalaBrandt8
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 40.0
    th_depth: float = 3.0  # meters (Stereo.ThDepth * baseline)
    depth_map_factor: float = 5000.0
    n_features: int = 1000
    rgb: bool = True
    raw: Dict = field(default_factory=dict)

    @staticmethod
    def from_yaml(path: str) -> "Settings":
        d = _load_opencv_yaml(path)

        def get(*names, default=None):
            for n in names:
                if n in d and d[n] is not None:
                    return d[n]
            return default

        cam_type = get("Camera.type", "Camera1.type", default="PinHole")
        fx = float(get("Camera1.fx", "Camera.fx"))
        fy = float(get("Camera1.fy", "Camera.fy"))
        cx = float(get("Camera1.cx", "Camera.cx"))
        cy = float(get("Camera1.cy", "Camera.cy"))
        if cam_type in ("PinHole", "Rectified"):
            cam = Pinhole.from_list(
                [fx, fy, cx, cy,
                 float(get("Camera1.k1", "Camera.k1", default=0.0)),
                 float(get("Camera1.k2", "Camera.k2", default=0.0)),
                 float(get("Camera1.p1", "Camera.p1", default=0.0)),
                 float(get("Camera1.p2", "Camera.p2", default=0.0)),
                 float(get("Camera1.k3", "Camera.k3", default=0.0))]
            )
        else:  # KannalaBrandt8
            cam = KannalaBrandt8.from_list(
                [fx, fy, cx, cy,
                 float(get("Camera1.k1", "Camera.k1", default=0.0)),
                 float(get("Camera1.k2", "Camera.k2", default=0.0)),
                 float(get("Camera1.k3", "Camera.k3", default=0.0)),
                 float(get("Camera1.k4", "Camera.k4", default=0.0))]
            )

        bf = float(get("Camera.bf", "Stereo.b", default=40.0))
        th_depth_factor = float(get("Stereo.ThDepth", "ThDepth", default=40.0))
        # reference: close-point threshold = bf/fx * ThDepth (baseline*N)
        th_depth = bf / fx * th_depth_factor

        return Settings(
            camera_type=cam_type,
            cam=cam,
            width=int(get("Camera.width", "Camera1.width", default=640)),
            height=int(get("Camera.height", "Camera1.height", default=480)),
            fps=float(get("Camera.fps", default=30.0)),
            bf=bf,
            th_depth=th_depth,
            depth_map_factor=float(get("RGBD.DepthMapFactor", "DepthMapFactor", default=5000.0)),
            n_features=int(get("ORBextractor.nFeatures", "Extractor.nFeatures", default=1000)),
            rgb=bool(get("Camera.RGB", default=1)),
            raw=d,
        )
