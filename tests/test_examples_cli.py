"""End-to-end CLI smoke: the example binaries' role is the reference's
de-facto test harness (SURVEY.md §4 — run a sequence, print timing, write
TUM-format trajectories, /root/reference/examples/RGB-D/rgbd_tum.cc:62-143).
These execute the actual CLIs in a subprocess on the built-in synthetic
sequence and validate the written artifacts."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, tmp):
    from xfeatslam_tpu.utils.env import cpu_env

    env = cpu_env(1)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args, env=env, cwd=REPO, timeout=1500,
        capture_output=True, text=True,
    )


def test_rgbd_tum_synthetic_writes_trajectories(tmp_path):
    out = str(tmp_path)
    r = _run_cli([os.path.join(REPO, "examples", "rgbd_tum.py"),
                  "--synthetic", "6", "--backend", "orb", "--out", out],
                 tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # median/mean timing printout (rgbd_tum.cc:131-139 role)
    assert "median" in r.stdout, r.stdout[-2000:]

    from xfeatslam_tpu.utils import io as io_utils

    cam = os.path.join(out, "CameraTrajectory.txt")
    kf = os.path.join(out, "KeyFrameTrajectory.txt")
    assert os.path.exists(cam) and os.path.exists(kf)
    ts, poses = io_utils.load_trajectory_tum(cam)
    assert len(ts) == 6
    # poses are unit quaternions + finite translations
    assert np.isfinite(np.concatenate([p.reshape(-1) for p in poses])).all()
    ts_kf, _ = io_utils.load_trajectory_tum(kf)
    assert 1 <= len(ts_kf) <= 6


def test_mono_tum_synthetic_writes_kf_trajectory(tmp_path):
    out = str(tmp_path)
    r = _run_cli([os.path.join(REPO, "examples", "mono_tum.py"),
                  "--synthetic", "12", "--backend", "orb", "--out", out],
                 tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    from xfeatslam_tpu.utils import io as io_utils

    kf = os.path.join(out, "KeyFrameTrajectory.txt")
    assert os.path.exists(kf)
    ts, _ = io_utils.load_trajectory_tum(kf)
    assert len(ts) >= 1
