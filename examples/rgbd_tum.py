#!/usr/bin/env python
"""RGB-D SLAM on a TUM-format sequence.

CLI-compatible with the reference binary
(/root/reference/examples/RGB-D/rgbd_tum.cc):

    python examples/rgbd_tum.py <settings.yaml> <sequence_dir> <association_file>

Per-dataset calibrations ship under examples/configs/ (tum1_rgbd.yaml,
tum2_rgbd.yaml, tum3_rgbd.yaml), plus `--synthetic N` to run on the
built-in synthetic room sequence when no dataset is available. Writes CameraTrajectory.txt and
KeyFrameTrajectory.txt in TUM format (rgbd_tum.cc:142-143) and prints
median/mean tracking time (rgbd_tum.cc:131-139).
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
    ap.add_argument("association", nargs="?", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--out", default=".")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--viewer", default=None, metavar="DIR",
                    help="live viewer: atomically-updated live_frame.png/"
                    "live_map.png in DIR + session.gif at shutdown "
                    "(the reference's bUseViewer)")
    ap.add_argument("--viewer-port", type=int, default=None, metavar="PORT",
                    help="with --viewer: serve the interactive control "
                    "panel (pause/step/follow/top-side view/localization/"
                    "reset) at http://127.0.0.1:PORT/ (0 = auto-pick)")
    ap.add_argument("--backend", default=None, choices=["xfeat", "orb"],
                    help="feature backend (default: USE_ORB env var parity)")
    args = ap.parse_args()

    from xfeatslam_tpu.slam.settings import Settings
    from xfeatslam_tpu.slam.system import Sensor, System
    from xfeatslam_tpu.utils import io as io_utils

    if not args.synthetic and (args.settings is None or args.sequence is None
                               or args.association is None):
        ap.error("provide <settings.yaml> <sequence_dir> <association_file>"
                 " or --synthetic N")

    if args.synthetic:
        from xfeatslam_tpu.ops.camera import Pinhole
        from xfeatslam_tpu.utils import synthetic

        seq = synthetic.make_sequence(n_frames=args.synthetic)
        K = seq["K"]
        settings = Settings(
            cam=Pinhole.from_list([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
            bf=40.0, th_depth=7.0, depth_map_factor=1.0, fps=30.0,
        )
        frames = list(zip(seq["images"], seq["depths"], seq["timestamps"]))
        gt = seq["poses"]
    else:
        settings = Settings.from_yaml(args.settings)
        data = io_utils.load_tum_association(args.sequence, args.association)
        frames = None
        gt = None

    os.makedirs(args.out, exist_ok=True)
    system = System(settings, Sensor.RGBD, backend=args.backend,
                    enable_loop_closing=not args.no_loop,
                    viewer_dir=args.viewer, viewer_port=args.viewer_port)
    if system.viewer_server is not None:
        print(f"viewer panel: http://127.0.0.1:{system.viewer_server.port}/")

    times = []
    n = len(frames) if frames is not None else len(data)
    for i in range(n):
        if frames is not None:
            gray, depth, t = frames[i]
        else:
            gray, depth, t = data.read(i)
        t0 = time.time()
        state, pose = system.track_rgbd(gray, depth, t)
        times.append(time.time() - t0)
        if i % 30 == 0:
            print(f"frame {i}/{n} state={state.name} "
                  f"kfs={system.map.num_keyframes()} mps={system.map.num_points()}")

    system.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"))
    system.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))

    times = np.array(times)
    print("-------")
    print(f"median tracking time: {np.median(times):.4f}")
    print(f"mean tracking time: {np.mean(times):.4f}")
    print("stats:", system.shutdown())

    if gt is not None:
        est_t, est = io_utils.load_trajectory_tum(
            os.path.join(args.out, "CameraTrajectory.txt"))
        gt_xyz = np.stack([-R.T @ t for (R, t) in gt])
        gt_ts = np.array([i / 30.0 for i in range(len(gt))])
        rmse = io_utils.ate_rmse(gt_ts, gt_xyz, est_t, est[:, :3])
        print(f"ATE RMSE vs ground truth: {rmse:.4f} m")


if __name__ == "__main__":
    main()
