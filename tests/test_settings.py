"""Settings parity tests: every reference example config must parse
unchanged, with the reference's sensor-aware required/optional semantics
(/root/reference/src/Settings.cc:36-638)."""

import glob
import os

import numpy as np
import pytest

from xfeatslam_tpu.slam.settings import Settings, SettingsError

REF_YAMLS = sorted(
    glob.glob("/root/reference/examples/*/*.yaml")
)


@pytest.mark.skipif(not REF_YAMLS, reason="reference configs not mounted")
class TestReferenceConfigs:
    @pytest.mark.parametrize("path", REF_YAMLS, ids=[
        os.path.join(os.path.basename(os.path.dirname(p)),
                     os.path.basename(p)) for p in REF_YAMLS
    ])
    def test_parses_unchanged(self, path):
        sensor = "RGBD" if "RGB-D" in path else "MONOCULAR"
        s = Settings.from_yaml(path, sensor=sensor)
        assert s.cam is not None
        assert s.width > 0 and s.height > 0 and s.fps > 0
        assert s.n_features > 0 and s.n_levels >= 1
        if sensor == "RGBD":
            assert s.depth_map_factor > 0
            assert s.bf > 0

    def test_tum1_values(self):
        path = "/root/reference/examples/RGB-D/TUM1.yaml"
        s = Settings.from_yaml(path, sensor="RGBD")
        assert abs(float(s.cam.fx) - 517.306408) < 1e-3
        assert s.dist1 is not None and len(s.dist1) == 5  # k1 k2 p1 p2 k3
        assert s.depth_map_factor == 5000.0
        assert s.n_features == 1000
        assert s.scale_factor == pytest.approx(1.2)
        assert s.n_levels == 8
        assert s.viewer.viewpoint_f == pytest.approx(500.0)

    def test_euroc_resize_scales_calibration(self):
        """EuRoC mono config resizes 752x480 -> 600x350; fx/cx scale by the
        column factor, fy/cy by the row factor (Settings.cc:364-409)."""
        path = "/root/reference/examples/Monocular/EuRoC.yaml"
        s = Settings.from_yaml(path, sensor="MONOCULAR")
        assert s.need_resize
        assert s.new_width == 600 and s.new_height == 350
        assert float(s.cam.fx) == pytest.approx(458.654 * 600 / 752, rel=1e-5)
        assert float(s.cam.cy) == pytest.approx(248.375 * 350 / 480, rel=1e-5)


class TestRequiredSemantics:
    def _write(self, tmp_path, text):
        p = tmp_path / "cfg.yaml"
        p.write_text("%YAML:1.0\n" + text)
        return str(p)

    def test_missing_required_key_raises_with_name(self, tmp_path):
        path = self._write(tmp_path, """
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 500.0
Camera1.fy: 500.0
Camera1.cx: 320.0
""")
        with pytest.raises(SettingsError, match="Camera1.cy"):
            Settings.from_yaml(path, sensor="MONOCULAR")

    def test_imu_sensor_requires_imu_section(self, tmp_path):
        path = self._write(tmp_path, """
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 500.0
Camera1.fy: 500.0
Camera1.cx: 320.0
Camera1.cy: 240.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
        with pytest.raises(SettingsError, match="IMU"):
            Settings.from_yaml(path, sensor="IMU_MONOCULAR")
        # same file is fine as plain monocular
        s = Settings.from_yaml(path, sensor="MONOCULAR")
        assert s.imu is None

    def test_lenient_mode_fills_defaults(self, tmp_path):
        path = self._write(tmp_path, """
Camera.fx: 517.3
Camera.fy: 516.5
Camera.cx: 318.6
Camera.cy: 255.3
""")
        s = Settings.from_yaml(path)  # no sensor -> no required errors
        assert float(s.cam.fx) == pytest.approx(517.3)
        assert s.n_features == 1000


class TestStereoRectification:
    def test_precompute_rectification_maps(self, tmp_path):
        """Unrectified pinhole stereo (EuRoC-style Camera2 + Stereo.T_c1_c2)
        precomputes rectification maps and updates calibration + bf
        (Settings.cc:485-541)."""
        T = np.eye(4)
        T[0, 3] = 0.11  # 11 cm baseline along +x of camera 1
        data = ", ".join(f"{v:.6f}" for v in T.reshape(-1))
        path = str(tmp_path / "stereo.yaml")
        with open(path, "w") as f:
            f.write(f"""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Stereo.ThDepth: 35.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [{data}]
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
        s = Settings.from_yaml(path, sensor="STEREO")
        assert s.need_rectify
        assert s.rect_maps is not None
        M1l = s.rect_maps[0]
        assert M1l.shape == (480, 752)
        assert s.baseline == pytest.approx(0.11, rel=1e-6)
        # bf updates to the rectified focal length
        assert s.bf == pytest.approx(0.11 * float(s.cam.fx), rel=1e-6)
        # rectify() remaps a stereo pair
        img = np.random.default_rng(0).integers(
            0, 255, (480, 752), np.uint8)
        l, r = s.rectify(img, img)
        assert l.shape == img.shape and r.shape == img.shape
