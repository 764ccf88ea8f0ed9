"""Shipped example configs must parse under the STRICT (sensor-specific)
required-key semantics and carry the public dataset calibrations.

Role: the reference's per-dataset YAMLs under examples/{RGB-D,Monocular}
(SURVEY §2.4) — a switching user points our CLIs at these instead."""

import glob
import os

import numpy as np
import pytest

from xfeatslam_tpu.ops.camera import KannalaBrandt8, Pinhole
from xfeatslam_tpu.slam.settings import Settings

CFG = os.path.join(os.path.dirname(__file__), "..", "examples", "configs")

SENSOR_OF = {
    "tum1_rgbd.yaml": "RGBD",
    "tum2_rgbd.yaml": "RGBD",
    "tum3_rgbd.yaml": "RGBD",
    "euroc_mono.yaml": "MONOCULAR",
    "euroc_mono_inertial.yaml": "IMU_MONOCULAR",
    "tum_vi_mono.yaml": "MONOCULAR",
    "kitti00-02.yaml": "MONOCULAR",
    "kitti03.yaml": "MONOCULAR",
    "kitti04-12.yaml": "MONOCULAR",
}


def test_every_shipped_config_is_covered():
    shipped = {os.path.basename(p)
               for p in glob.glob(os.path.join(CFG, "*.yaml"))}
    assert shipped == set(SENSOR_OF), shipped ^ set(SENSOR_OF)


@pytest.mark.parametrize("name,sensor", sorted(SENSOR_OF.items()))
def test_parses_strict(name, sensor):
    s = Settings.from_yaml(os.path.join(CFG, name), sensor=sensor)
    assert s.n_features >= 1000
    assert s.fps in (10.0, 20.0, 30.0)
    if sensor == "RGBD":
        assert s.depth_map_factor >= 5000.0
        assert abs(s.bf - s.baseline * float(s.cam.fx)) < 1e-3
        assert 2.0 < s.th_depth < 4.0  # ThDepth=40 baselines
    if name.startswith("tum_vi"):
        assert isinstance(s.cam, KannalaBrandt8)
    else:
        assert isinstance(s.cam, Pinhole)


def test_tum1_matches_public_calibration():
    s = Settings.from_yaml(os.path.join(CFG, "tum1_rgbd.yaml"), sensor="RGBD")
    assert abs(float(s.cam.fx) - 517.306408) < 1e-4
    assert abs(float(s.cam.cy) - 255.313989) < 1e-4
    assert s.dist1[0] == pytest.approx(0.262383)
    assert len(s.dist1) == 5  # k3 present


def test_euroc_resize_scales_calibration():
    """newWidth/newHeight must rescale fx/cx (cols) and fy/cy (rows) like
    the reference's readImageInfo (Settings.cc:356-413)."""
    s = Settings.from_yaml(os.path.join(CFG, "euroc_mono.yaml"),
                           sensor="MONOCULAR")
    assert s.need_resize and s.new_width == 600 and s.new_height == 350
    sx, sy = 600 / 752, 350 / 480
    assert float(s.cam.fx) == pytest.approx(458.654 * sx, rel=1e-6)
    assert float(s.cam.cy) == pytest.approx(248.375 * sy, rel=1e-6)


def test_euroc_inertial_imu_section():
    s = Settings.from_yaml(os.path.join(CFG, "euroc_mono_inertial.yaml"),
                           sensor="IMU_MONOCULAR")
    assert s.imu is not None
    assert s.imu.noise_gyro == pytest.approx(1.7e-4)
    assert s.imu.walk_acc == pytest.approx(3.0e-3)
    assert s.imu_frequency == 200.0
    # T_b_c1 is a rigid transform
    R = s.imu.R_bc
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.norm(s.imu.t_bc) == pytest.approx(0.0690, abs=1e-3)


def test_configs_construct_system():
    """End check: a config boots a System facade for its sensor."""
    from xfeatslam_tpu.slam.system import Sensor, System

    s = Settings.from_yaml(os.path.join(CFG, "tum1_rgbd.yaml"), sensor="RGBD")
    sys_ = System(s, Sensor.RGBD, backend="orb")
    assert sys_.tracking is not None and sys_.local_mapping is not None
