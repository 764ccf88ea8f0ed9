#!/usr/bin/env python
"""Monocular SLAM on a TUM-format sequence.

CLI parity with /root/reference/examples/Monocular/mono_tum.cc:

    python examples/mono_tum.py <settings.yaml> <sequence_dir>

(reads <sequence_dir>/rgb.txt), plus `--synthetic N` for the built-in
synthetic sequence. Saves KeyFrameTrajectory.txt (mono_tum.cc:152).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings", nargs="?", default=None)
    ap.add_argument("sequence", nargs="?", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out", default=".")
    ap.add_argument("--backend", default=None, choices=["xfeat", "orb"])
    args = ap.parse_args()

    from xfeatslam_tpu.slam.settings import Settings
    from xfeatslam_tpu.slam.system import Sensor, System
    from xfeatslam_tpu.utils import io as io_utils

    if args.synthetic:
        from xfeatslam_tpu.ops.camera import Pinhole
        from xfeatslam_tpu.utils import synthetic

        seq = synthetic.make_sequence(n_frames=args.synthetic)
        K = seq["K"]
        settings = Settings(
            cam=Pinhole.from_list([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
            fps=30.0,
        )
        frames = list(zip(seq["images"], seq["timestamps"]))
        gt = seq["poses"]
    elif args.settings is None or args.sequence is None:
        ap.error("provide <settings.yaml> <sequence_dir> or --synthetic N")
    else:
        settings = Settings.from_yaml(args.settings)
        ts, paths = [], []
        with open(os.path.join(args.sequence, "rgb.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, p = line.split()[:2]
                ts.append(float(t))
                paths.append(os.path.join(args.sequence, p))
        import cv2

        frames = [(cv2.imread(p, cv2.IMREAD_GRAYSCALE), t)
                  for p, t in zip(paths, ts)]
        gt = None

    os.makedirs(args.out, exist_ok=True)
    system = System(settings, Sensor.MONOCULAR, backend=args.backend)
    times = []
    for i, (gray, t) in enumerate(frames):
        t0 = time.time()
        state, pose = system.track_monocular(gray, t)
        times.append(time.time() - t0)
        if i % 30 == 0:
            print(f"frame {i}/{len(frames)} state={state.name} "
                  f"kfs={system.map.num_keyframes()} mps={system.map.num_points()}")

    system.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))
    times = np.array(times)
    print("-------")
    print(f"median tracking time: {np.median(times):.4f}")
    print(f"mean tracking time: {np.mean(times):.4f}")
    print("stats:", system.shutdown())

    if gt is not None:
        est_t, est = io_utils.load_trajectory_tum(
            os.path.join(args.out, "KeyFrameTrajectory.txt"))
        gt_xyz = np.stack([-R.T @ t for (R, t) in gt])
        gt_ts = np.array([i / 30.0 for i in range(len(gt))])
        rmse = io_utils.ate_rmse(gt_ts, gt_xyz, est_t, est[:, :3])
        print(f"ATE RMSE (aligned, scale-free up to SE3) : {rmse:.4f} m")


if __name__ == "__main__":
    main()
