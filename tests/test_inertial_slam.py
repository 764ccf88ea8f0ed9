"""End-to-end visual-inertial SLAM on rendered synthetic sequences.

Covers the inertial axis VERDICT item 2 asked for: GrabImuData /
PreintegrateIMU / PredictStateIMU wiring in Tracking
(/root/reference/src/Tracking.cc:1645-1819), the LocalMapping IMU init
schedule (/root/reference/src/LocalMapping.cc:181-242), InertialOptimization
scale/gravity/bias estimation (/root/reference/src/Optimizer.cc:3042) and
the per-frame visual-inertial pose optimization (:4491)."""

import numpy as np
import pytest

from xfeatslam_tpu.ops.camera import Pinhole
from xfeatslam_tpu.ops.imu import ImuCalib
from xfeatslam_tpu.slam.settings import Settings
from xfeatslam_tpu.slam.system import Sensor, System
from xfeatslam_tpu.utils import synthetic

BG_INJ = np.array([0.004, -0.003, 0.002], np.float32)
BA_INJ = np.array([0.03, -0.02, 0.04], np.float32)


def umeyama(src, dst, with_scale=False):
    """Least-squares similarity aligning src -> dst. Returns (s, R, t)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    X = src - mu_s
    Y = dst - mu_d
    cov = Y.T @ X / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (X * X).sum() / len(src)
    s = float((D * np.diagonal(S)).sum() / var) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def make_imu_settings(K, sensor_kind="rgbd"):
    calib = ImuCalib(
        noise_gyro=2e-4, noise_acc=2e-3, walk_gyro=1e-6, walk_acc=1e-5,
        R_bc=np.eye(3, dtype=np.float32), t_bc=np.zeros(3, np.float32),
    )
    return Settings(
        cam=Pinhole.from_list([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
        bf=40.0, th_depth=3.0, depth_map_factor=1.0,
        imu=calib, fps=10.0,
        imu_init_time=1.0, viba1_time=2.5, viba2_time=3.5,
    )


def run_vi(sensor: Sensor, n_frames: int, seed: int = 0,
           noise_gyro: float = 2e-4, noise_acc: float = 2e-3):
    seq = synthetic.make_vi_sequence(
        n_frames=n_frames, fps=10.0, imu_rate=200.0, seed=seed,
        bg=BG_INJ, ba=BA_INJ, noise_gyro=noise_gyro, noise_acc=noise_acc,
    )
    settings = make_imu_settings(seq["K"])
    system = System(settings, sensor, backend="orb",
                    enable_loop_closing=False)
    for i in range(n_frames):
        if sensor == Sensor.IMU_RGBD:
            system.track_rgbd(seq["images"][i], seq["depths"][i],
                              seq["timestamps"][i], imu=seq["imu"][i])
        else:
            system.track_monocular(seq["images"][i], seq["timestamps"][i],
                                   imu=seq["imu"][i])
    return seq, system


def kf_centers_vs_gt(system, seq):
    """(est KF camera centers, GT camera centers at the same timestamps)."""
    kfs = sorted(system.map.keyframes.values(), key=lambda k: k.timestamp)
    est, gt = [], []
    for kf in kfs:
        idx = int(round(kf.timestamp * 10.0))
        Rg, tg = seq["poses"][idx]
        est.append(kf.center())
        gt.append(-Rg.T @ tg)
    return np.asarray(est), np.asarray(gt), kfs


class TestImuRgbd:
    @pytest.fixture(scope="class")
    def run(self):
        return run_vi(Sensor.IMU_RGBD, n_frames=60)

    def test_imu_initializes_and_schedule_advances(self, run):
        _seq, system = run
        m = system.map
        assert m.imu_initialized
        assert m.imu_ba1  # viba1_time=2.5 s < 5.9 s sequence span
        assert m.imu_ba2  # viba2_time=3.5 s

    def test_gravity_aligned(self, run):
        """After init the map world's gravity must be (0,0,-9.81) even
        though the true gravity is tilted ~10 deg off the first camera's
        -z axis."""
        seq, system = run
        kfs = sorted(system.map.keyframes.values(), key=lambda k: k.timestamp)
        kf = kfs[-1]
        idx = int(round(kf.timestamp * 10.0))
        Rg, _tg = seq["poses"][idx]
        # map<-world rotation via the shared camera frame
        R_mw = kf.R.T @ Rg
        g_m = R_mw @ seq["g_w"]
        assert np.linalg.norm(g_m - np.array([0, 0, -9.81])) < 0.35, g_m

    def test_metric_ate_and_scale(self, run):
        seq, system = run
        est, gt, _ = kf_centers_vs_gt(system, seq)
        assert len(est) >= 6
        s, R, t = umeyama(est, gt, with_scale=True)
        assert abs(s - 1.0) < 0.03, s  # RGB-D is metric; IMU must not skew it
        ate = np.linalg.norm((est @ R.T) * s + t - gt, axis=1)
        assert ate.max() < 0.05, ate

    def test_velocities_and_biases(self, run):
        seq, system = run
        est, gt, kfs = kf_centers_vs_gt(system, seq)
        _s, R_mw_fit, _t = umeyama(est, gt)  # map -> world rotation
        for kf in kfs[-3:]:
            assert kf.vel is not None
            idx = int(round(kf.timestamp * 10.0))
            v_world_est = R_mw_fit @ kf.vel
            assert np.linalg.norm(v_world_est - seq["v_w"][idx]) < 0.08
        # injected biases recovered (shared-bias estimate on the map)
        assert np.linalg.norm(system.map.imu_bg - BG_INJ) < 2e-3, system.map.imu_bg
        assert np.linalg.norm(system.map.imu_ba - BA_INJ) < 4e-2, system.map.imu_ba

    def test_tracking_stays_ok(self, run):
        _seq, system = run
        states = [s for (_t, _R, _tr, s) in system.tracking.trajectory]
        assert all(st.name == "OK" for st in states[1:]), [
            st.name for st in states
        ]


class TestImuMonocular:
    @pytest.fixture(scope="class")
    def run(self):
        return run_vi(Sensor.IMU_MONOCULAR, n_frames=60)

    def test_scale_becomes_metric(self, run):
        """Monocular scale is unobservable visually; after IMU init the map
        must be metric (Umeyama scale vs ground truth ~ 1)."""
        seq, system = run
        assert system.map.imu_initialized
        est, gt, _ = kf_centers_vs_gt(system, seq)
        assert len(est) >= 6
        s, R, t = umeyama(est, gt, with_scale=True)
        assert abs(s - 1.0) < 0.08, s
        ate = np.linalg.norm((est @ R.T) * s + t - gt, axis=1)
        assert ate.max() < 0.08, ate

    def test_gravity_aligned(self, run):
        seq, system = run
        kfs = sorted(system.map.keyframes.values(), key=lambda k: k.timestamp)
        kf = kfs[-1]
        idx = int(round(kf.timestamp * 10.0))
        Rg, _tg = seq["poses"][idx]
        g_m = (kf.R.T @ Rg) @ seq["g_w"]
        assert np.linalg.norm(g_m - np.array([0, 0, -9.81])) < 0.5, g_m


class TestImuStereo:
    @pytest.fixture(scope="class")
    def run(self):
        """Stereo-inertial (IMU_STEREO): render rectified right views along
        the VI trajectory (baseline 0.08 m along camera +x) and track with
        IMU (Tracking.cc GrabImageStereo + inertial path)."""
        n_frames = 50
        seq = synthetic.make_vi_sequence(
            n_frames=n_frames, fps=10.0, imu_rate=200.0, seed=0,
            bg=BG_INJ, ba=BA_INJ, noise_gyro=2e-4, noise_acc=2e-3,
        )
        K = seq["K"]
        baseline = 0.08
        scene = synthetic.RoomScene(seed=0)
        settings = make_imu_settings(K)
        settings.bf = baseline * float(K[0, 0])
        system = System(settings, Sensor.IMU_STEREO, backend="orb",
                        enable_loop_closing=False)
        for i in range(n_frames):
            R, t = seq["poses"][i]
            t_r = (t - np.array([baseline, 0, 0], np.float32)).astype(
                np.float32)
            img_r, _ = scene.render(K, R, t_r, (480, 640))
            system.track_stereo(seq["images"][i], img_r,
                                seq["timestamps"][i], imu=seq["imu"][i])
        return seq, system

    def test_initializes_and_metric(self, run):
        seq, system = run
        assert system.map.imu_initialized
        est, gt, _ = kf_centers_vs_gt(system, seq)
        assert len(est) >= 6
        s, R, t = umeyama(est, gt, with_scale=True)
        assert abs(s - 1.0) < 0.03, s  # stereo is metric; IMU must not skew
        ate = np.linalg.norm((est @ R.T) * s + t - gt, axis=1)
        assert ate.max() < 0.06, ate

    def test_gravity_aligned(self, run):
        seq, system = run
        kfs = sorted(system.map.keyframes.values(), key=lambda k: k.timestamp)
        kf = kfs[-1]
        idx = int(round(kf.timestamp * 10.0))
        Rg, _tg = seq["poses"][idx]
        g_m = (kf.R.T @ Rg) @ seq["g_w"]
        assert np.linalg.norm(g_m - np.array([0, 0, -9.81])) < 0.4, g_m


class TestInertialSerialization:
    def test_atlas_roundtrip_preserves_imu_state(self, tmp_path):
        """Atlas save/load must carry the inertial state: per-KF velocity,
        biases, prev_kf chain and preintegration, plus the map's init
        flags/bias estimate (SerializationUtils + KeyFrame serialization
        role for the IMU members, reference include/KeyFrame.h:52-66)."""
        seq, system = run_vi(Sensor.IMU_RGBD, n_frames=30)
        assert system.map.imu_initialized
        path = str(tmp_path / "atlas_imu.zip")
        system.save_atlas(path)

        from xfeatslam_tpu.slam import serialization

        atlas = serialization.load_atlas(path)
        m2 = atlas.active
        m1 = system.map
        assert m2.imu_initialized == m1.imu_initialized
        assert m2.imu_ba1 == m1.imu_ba1 and m2.imu_ba2 == m1.imu_ba2
        np.testing.assert_allclose(m2.imu_bg, m1.imu_bg, atol=1e-7)
        np.testing.assert_allclose(m2.imu_ba, m1.imu_ba, atol=1e-7)
        for kid, kf in m1.keyframes.items():
            kf2 = m2.keyframes[kid]
            assert kf2.prev_kf == kf.prev_kf
            if kf.vel is not None:
                np.testing.assert_allclose(kf2.vel, kf.vel, atol=1e-6)
            if kf.pre_kf is not None:
                assert kf2.pre_kf is not None
                np.testing.assert_allclose(
                    np.asarray(kf2.pre_kf.dP), np.asarray(kf.pre_kf.dP),
                    atol=1e-6)
                np.testing.assert_allclose(
                    np.asarray(kf2.pre_kf.cov), np.asarray(kf.pre_kf.cov),
                    rtol=1e-5, atol=1e-8)
