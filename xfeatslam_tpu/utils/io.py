"""Dataset IO: TUM RGB-D loading/association and trajectory writing.

Covers the roles of the example loaders (/root/reference/examples/RGB-D/
rgbd_tum.cc:33-60 LoadImages), the association script
(/root/reference/scripts/tum_rgbd_association.py), and the TUM-format
trajectory savers (System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM,
/root/reference/src/System.cc:569-659: `t tx ty tz qx qy qz qw` per line,
camera-to-world).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class RgbdSequence:
    root: str
    timestamps: List[float]
    rgb_paths: List[str]
    depth_paths: List[str]

    def __len__(self):
        return len(self.timestamps)

    def read(self, i):
        """Returns (gray uint8 (H,W), depth float32 meters (H,W), t)."""
        import cv2

        rgb = cv2.imread(self.rgb_paths[i], cv2.IMREAD_GRAYSCALE)
        depth_raw = cv2.imread(self.depth_paths[i], cv2.IMREAD_UNCHANGED)
        return rgb, depth_raw, self.timestamps[i]


def load_tum_association(root: str, assoc_file: str) -> RgbdSequence:
    """Association file lines: `t_rgb rgb/... t_depth depth/...`
    (format consumed by rgbd_tum.cc LoadImages)."""
    ts, rgbs, depths = [], [], []
    with open(assoc_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            rgbs.append(os.path.join(root, parts[1]))
            depths.append(os.path.join(root, parts[3]))
    return RgbdSequence(root, ts, rgbs, depths)


def associate_tum(root: str, max_dt: float = 0.02) -> RgbdSequence:
    """Associate rgb.txt and depth.txt by nearest timestamp (same policy as
    /root/reference/scripts/tum_rgbd_association.py)."""

    def read_list(path):
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, p = line.split()[:2]
                out.append((float(t), p))
        return out

    rgb = read_list(os.path.join(root, "rgb.txt"))
    depth = read_list(os.path.join(root, "depth.txt"))
    d_ts = np.array([t for t, _ in depth])
    ts, rgbs, depths = [], [], []
    used = set()
    for t, p in rgb:
        j = int(np.argmin(np.abs(d_ts - t)))
        if abs(d_ts[j] - t) < max_dt and j not in used:
            used.add(j)
            ts.append(t)
            rgbs.append(os.path.join(root, p))
            depths.append(os.path.join(root, depth[j][1]))
    return RgbdSequence(root, ts, rgbs, depths)


def rotation_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """3x3 -> (qx,qy,qz,qw), TUM order."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qw = (R[2, 1] - R[1, 2]) / s
        qx = 0.25 * s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qy = 0.25 * s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
        qz = 0.25 * s
    return np.array([qx, qy, qz, qw])


def save_trajectory_tum(path: str, timestamps, poses_cw):
    """poses_cw: list of (R,t) world->camera; writes camera-to-world TUM lines
    (System::SaveTrajectoryTUM convention, /root/reference/src/System.cc:569)."""
    with open(path, "w") as f:
        for t, (R, tr) in zip(timestamps, poses_cw):
            Rwc = np.asarray(R).T
            twc = -Rwc @ np.asarray(tr)
            q = rotation_to_quat_xyzw(Rwc)
            f.write(
                f"{t:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_trajectory_euroc(path: str, timestamps, poses_cw):
    """EuRoC format: `t_ns, tx, ty, tz, qw, qx, qy, qz` comma-separated
    (System::SaveTrajectoryEuRoC convention, /root/reference/src/System.cc:662)."""
    with open(path, "w") as f:
        for t, (R, tr) in zip(timestamps, poses_cw):
            Rwc = np.asarray(R).T
            twc = -Rwc @ np.asarray(tr)
            q = rotation_to_quat_xyzw(Rwc)
            f.write(
                f"{int(t * 1e9)},{twc[0]:.7f},{twc[1]:.7f},{twc[2]:.7f},"
                f"{q[3]:.7f},{q[0]:.7f},{q[1]:.7f},{q[2]:.7f}\n"
            )


def save_trajectory_kitti(path: str, poses_cw):
    """KITTI format: 12 numbers per line, row-major [R_wc | t_wc]
    (System::SaveTrajectoryKITTI, /root/reference/src/System.cc:1206)."""
    with open(path, "w") as f:
        for (R, tr) in poses_cw:
            Rwc = np.asarray(R).T
            twc = -Rwc @ np.asarray(tr)
            row = np.concatenate([Rwc, twc[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.6e}" for v in row) + "\n")


def load_trajectory_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """-> (timestamps (N,), poses (N,7) [tx ty tz qx qy qz qw])."""
    ts, rows = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            rows.append(v[1:8])
    return np.array(ts), np.array(rows)


def ate_rmse(gt_t: np.ndarray, gt_xyz: np.ndarray, est_t: np.ndarray,
             est_xyz: np.ndarray, max_dt: float = 0.02,
             align: bool = True) -> float:
    """Absolute trajectory error RMSE after timestamp association and
    (optionally) SE3 alignment (Horn) — the standard TUM evaluation the
    reference's trajectories are scored with (SURVEY.md §4.2)."""
    pairs = []
    for i, t in enumerate(est_t):
        j = int(np.argmin(np.abs(gt_t - t)))
        if abs(gt_t[j] - t) < max_dt:
            pairs.append((j, i))
    if len(pairs) < 3:
        return float("nan")
    g = np.stack([gt_xyz[j] for j, _ in pairs])
    e = np.stack([est_xyz[i] for _, i in pairs])
    if align:
        mu_g, mu_e = g.mean(0), e.mean(0)
        gc, ec = g - mu_g, e - mu_e
        U, _, Vt = np.linalg.svd(ec.T @ gc)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = (U @ S @ Vt).T
        e = (R @ ec.T).T + mu_g
        g = gc + mu_g
    return float(np.sqrt(np.mean(np.sum((g - e) ** 2, axis=1))))


def load_kitti_mono(root: str):
    """KITTI odometry grayscale sequence dir: image_0/*.png + times.txt
    (mono_kitti.cc LoadImages, /root/reference/examples/Monocular/
    mono_kitti.cc:50)."""
    import glob

    with open(os.path.join(root, "times.txt")) as f:
        ts = [float(x) for x in f.read().split()]
    paths = sorted(glob.glob(os.path.join(root, "image_0", "*.png")))
    return ts[: len(paths)], paths


def load_euroc_mono(root: str, timestamp_file: Optional[str] = None):
    """EuRoC mav0/cam0/data + timestamp list (mono_euroc.cc:83)."""
    data_dir = os.path.join(root, "mav0", "cam0", "data")
    if timestamp_file:
        with open(timestamp_file) as f:
            stamps = [line.strip() for line in f
                      if line.strip() and not line.startswith("#")]
    else:
        stamps = sorted(os.path.splitext(p)[0] for p in os.listdir(data_dir))
    ts = [float(s) / 1e9 for s in stamps]
    paths = [os.path.join(data_dir, s + ".png") for s in stamps]
    return ts, paths


def load_tum_vi_mono(root: str, timestamp_file: Optional[str] = None):
    """TUM-VI mav0/cam0/data layout (mono_tum_vi.cc:92)."""
    return load_euroc_mono(root, timestamp_file)
