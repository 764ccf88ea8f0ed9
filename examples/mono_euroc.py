#!/usr/bin/env python
"""Monocular SLAM on a euroc sequence (CLI parity with
/root/reference/examples/Monocular/mono_euroc.cc). Same engine as mono_tum;
only the dataset loader differs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("paths", nargs="+", metavar="seq_dir times_file",
                    help="one or more (sequence_dir, times_file) pairs — "
                    "multiple sequences run back to back in ONE session "
                    "(multi-session Atlas, like the reference's "
                    "mono_euroc.cc:177-200)")
    ap.add_argument("--out", default=".")
    ap.add_argument("--backend", default=None, choices=["xfeat", "orb"])
    args = ap.parse_args()

    import cv2
    import numpy as np

    from xfeatslam_tpu.slam.settings import Settings
    from xfeatslam_tpu.slam.system import Sensor, System
    from xfeatslam_tpu.utils import io as io_utils

    if len(args.paths) == 1:
        pairs = [(args.paths[0], None)]
    elif len(args.paths) % 2 == 0:
        pairs = list(zip(args.paths[0::2], args.paths[1::2]))
    else:
        ap.error("provide (seq_dir, times_file) pairs")
    settings = Settings.from_yaml(args.settings)
    os.makedirs(args.out, exist_ok=True)
    system = System(settings, Sensor.MONOCULAR, backend=args.backend)
    import time

    times = []
    for n_seq, (seq, tsf) in enumerate(pairs):
        if n_seq:
            print("Changing the dataset ...")
            system.change_dataset()
        ts, paths = io_utils.load_euroc_mono(seq, tsf)
        for i, (t, p) in enumerate(zip(ts, paths)):
            gray = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            t0 = time.time()
            state, pose = system.track_monocular(gray, t)
            times.append(time.time() - t0)
            if i % 50 == 0:
                print(f"seq {n_seq} frame {i}/{len(paths)} state={state.name}")
    system.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))
    print(f"median tracking time: {np.median(times):.4f}")
    print("stats:", system.shutdown())


if __name__ == "__main__":
    main()
