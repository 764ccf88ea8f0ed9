#!/usr/bin/env python
"""Monocular SLAM on a kitti sequence (CLI parity with
/root/reference/examples/Monocular/mono_kitti.cc). Same engine as mono_tum;
only the dataset loader differs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("timestamps", nargs="?", default=None)
    ap.add_argument("--out", default=".")
    ap.add_argument("--backend", default=None, choices=["xfeat", "orb"])
    args = ap.parse_args()

    import cv2
    import numpy as np

    from xfeatslam_tpu.slam.settings import Settings
    from xfeatslam_tpu.slam.system import Sensor, System
    from xfeatslam_tpu.utils import io as io_utils

    loader = {
        "mono_kitti": lambda: io_utils.load_kitti_mono(args.sequence),
        "mono_euroc": lambda: io_utils.load_euroc_mono(args.sequence, args.timestamps),
        "mono_tum_vi": lambda: io_utils.load_tum_vi_mono(args.sequence, args.timestamps),
    }["mono_kitti"]
    ts, paths = loader()
    settings = Settings.from_yaml(args.settings)
    os.makedirs(args.out, exist_ok=True)
    system = System(settings, Sensor.MONOCULAR, backend=args.backend)
    import time

    times = []
    for i, (t, p) in enumerate(zip(ts, paths)):
        gray = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        t0 = time.time()
        state, pose = system.track_monocular(gray, t)
        times.append(time.time() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(paths)} state={state.name}")
    system.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))
    print(f"median tracking time: {np.median(times):.4f}")
    print("stats:", system.shutdown())


if __name__ == "__main__":
    main()
