"""Trajectory evaluation tool (tools/evaluate_trajectory.py): ATE with
Umeyama SE(3)/Sim(3) alignment + RPE, on TUM-format files — the scoring
workflow the reference delegates to the external TUM-benchmark scripts
(trajectory format per /root/reference/include/System.h:143-146)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import evaluate_trajectory as ev  # noqa: E402


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _write_tum(path, times, poses_wc):
    from xfeatslam_tpu.utils.io import rotation_to_quat_xyzw

    with open(path, "w") as f:
        f.write("# t tx ty tz qx qy qz qw\n")
        for t, T in zip(times, poses_wc):
            tr = T[:3, 3]
            x, y, z, w = rotation_to_quat_xyzw(T[:3, :3])
            f.write(f"{t:.6f} {tr[0]:.7f} {tr[1]:.7f} {tr[2]:.7f} "
                    f"{x:.7f} {y:.7f} {z:.7f} {w:.7f}\n")


def _circle_traj(n=60, radius=2.0, dt=1.0 / 30.0):
    times, poses = [], []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        T = np.eye(4)
        T[:3, :3] = _rot_z(a)
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.1 * np.sin(3 * a)]
        times.append(100.0 + i * dt)
        poses.append(T)
    return times, poses


@pytest.fixture()
def gt(tmp_path):
    times, poses = _circle_traj()
    p = tmp_path / "gt.txt"
    _write_tum(p, times, poses)
    return p, times, poses


class TestAssociation:
    def test_one_to_one_nearest(self):
        pairs = ev.associate([0.0, 1.0, 2.0], [0.005, 1.3, 2.004],
                             max_diff=0.02)
        assert pairs == [(0.0, 0.005), (2.0, 2.004)]

    def test_no_double_use(self):
        # two estimates near one gt stamp: only the closer one pairs
        pairs = ev.associate([0.0], [0.004, 0.006], max_diff=0.02)
        assert pairs == [(0.0, 0.004)]


class TestATE:
    def test_identity_is_zero(self, gt, tmp_path):
        p, times, poses = gt
        q = tmp_path / "est.txt"
        _write_tum(q, times, poses)
        r = ev.evaluate_ate(ev.load_tum_trajectory(str(p)),
                            ev.load_tum_trajectory(str(q)))
        assert r["rmse"] < 1e-6
        assert r["pairs"] == len(times)

    def test_rigid_offset_aligned_away(self, gt, tmp_path):
        # a global SE(3) offset of the whole estimate must not count as
        # error: ATE aligns first (Horn/Umeyama)
        p, times, poses = gt
        W = np.eye(4)
        W[:3, :3] = _rot_z(0.7)
        W[:3, 3] = [5.0, -3.0, 1.0]
        q = tmp_path / "est.txt"
        _write_tum(q, times, [W @ T for T in poses])
        r = ev.evaluate_ate(ev.load_tum_trajectory(str(p)),
                            ev.load_tum_trajectory(str(q)))
        assert r["rmse"] < 1e-5

    def test_known_noise_level(self, gt, tmp_path):
        p, times, poses = gt
        rng = np.random.default_rng(0)
        noisy = []
        for T in poses:
            N = T.copy()
            N[:3, 3] = N[:3, 3] + rng.normal(0, 0.01, 3)
            noisy.append(N)
        q = tmp_path / "est.txt"
        _write_tum(q, times, noisy)
        r = ev.evaluate_ate(ev.load_tum_trajectory(str(p)),
                            ev.load_tum_trajectory(str(q)))
        # isotropic sigma=1cm -> rmse ~ sqrt(3)*1cm, alignment shaves a bit
        assert 0.008 < r["rmse"] < 0.03

    def test_scale_recovered_with_sim3(self, gt, tmp_path):
        # monocular case: estimate at 0.4x scale. SE(3) ATE is large;
        # --scale (Sim3) alignment recovers it.
        p, times, poses = gt
        scaled = []
        for T in poses:
            N = T.copy()
            N[:3, 3] = 0.4 * N[:3, 3]
            scaled.append(N)
        q = tmp_path / "est.txt"
        _write_tum(q, times, scaled)
        g = ev.load_tum_trajectory(str(p))
        e = ev.load_tum_trajectory(str(q))
        assert ev.evaluate_ate(g, e)["rmse"] > 0.5
        r = ev.evaluate_ate(g, e, with_scale=True)
        assert r["rmse"] < 1e-5
        assert abs(r["scale"] - 2.5) < 1e-6

    def test_association_window(self, tmp_path):
        # 1 Hz trajectory: a 5ms stamp offset still associates, a 50ms
        # offset exceeds the default 20ms window and pairs nothing
        times, poses = _circle_traj(n=10, dt=1.0)
        p = tmp_path / "gt.txt"
        _write_tum(p, times, poses)
        q = tmp_path / "est.txt"
        _write_tum(q, [t + 0.005 for t in times], poses)
        r = ev.evaluate_ate(ev.load_tum_trajectory(str(p)),
                            ev.load_tum_trajectory(str(q)))
        assert r["pairs"] == len(times)
        q2 = tmp_path / "est2.txt"
        _write_tum(q2, [t + 0.05 for t in times], poses)
        with pytest.raises(ValueError):
            ev.evaluate_ate(ev.load_tum_trajectory(str(p)),
                            ev.load_tum_trajectory(str(q2)))


class TestRPE:
    def test_identity_is_zero(self, gt, tmp_path):
        p, times, poses = gt
        q = tmp_path / "est.txt"
        _write_tum(q, times, poses)
        g = ev.load_tum_trajectory(str(p))
        e = ev.load_tum_trajectory(str(q))
        r = ev.evaluate_rpe(g, e, delta_frames=1)
        assert r["trans"]["rmse"] < 1e-6
        assert r["rot_deg"]["rmse"] < 1e-3

    def test_drift_shows_in_rpe_not_hidden_by_alignment(self, gt, tmp_path):
        # constant per-frame drift of 2mm along x -> RPE trans ~= 2mm/frame
        p, times, poses = gt
        drifted = []
        for i, T in enumerate(poses):
            N = T.copy()
            N[:3, 3] = N[:3, 3] + np.array([0.002 * i, 0.0, 0.0])
            drifted.append(N)
        q = tmp_path / "est.txt"
        _write_tum(q, times, drifted)
        g = ev.load_tum_trajectory(str(p))
        e = ev.load_tum_trajectory(str(q))
        r = ev.evaluate_rpe(g, e, delta_frames=1)
        assert 0.0015 < r["trans"]["rmse"] < 0.0025

    def test_time_delta_windows(self, gt, tmp_path):
        p, times, poses = gt
        q = tmp_path / "est.txt"
        _write_tum(q, times, poses)
        g = ev.load_tum_trajectory(str(p))
        e = ev.load_tum_trajectory(str(q))
        r = ev.evaluate_rpe(g, e, delta=0.5)  # 15 frames at 30 Hz
        assert r["trans"]["n"] > 0


class TestCLI:
    def test_json_output(self, gt, tmp_path, capsys):
        p, times, poses = gt
        q = tmp_path / "est.txt"
        _write_tum(q, times, poses)
        rc = ev.main([str(p), str(q), "--json", "--delta-frames", "1"])
        assert rc == 0
        import json
        out = json.loads(capsys.readouterr().out)
        assert out["ate"]["rmse"] < 1e-6
        assert "rpe" in out

    def test_roundtrip_with_system_saver(self, tmp_path):
        # the tool must read what utils/io.py's TUM saver writes
        from xfeatslam_tpu.utils import io as io_utils
        times, poses = _circle_traj(n=20)
        # saver takes world->camera; invert
        poses_cw = []
        for T in poses:
            R, tr = T[:3, :3], T[:3, 3]
            poses_cw.append((R.T, -R.T @ tr))
        p = tmp_path / "traj.txt"
        io_utils.save_trajectory_tum(str(p), times, poses_cw)
        gt_p = tmp_path / "gt.txt"
        _write_tum(gt_p, times, poses)
        r = ev.evaluate_ate(ev.load_tum_trajectory(str(gt_p)),
                            ev.load_tum_trajectory(str(p)))
        assert r["rmse"] < 1e-5
