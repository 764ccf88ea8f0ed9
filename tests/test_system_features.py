"""System-level feature tests: atlas checkpoint/resume, trajectory formats,
localization mode, timing stats (roles: System.cc save/load + REGISTER_TIMES)."""

import os

import numpy as np
import pytest

from xfeatslam_tpu.ops.camera import Pinhole
from xfeatslam_tpu.slam.settings import Settings
from xfeatslam_tpu.slam.system import Sensor, System
from xfeatslam_tpu.utils import io as io_utils
from xfeatslam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def tracked_system():
    seq = synthetic.make_sequence(n_frames=8)
    K = seq["K"]
    settings = Settings(
        cam=Pinhole.from_list([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
        bf=40.0, th_depth=3.0, depth_map_factor=1.0,
    )
    system = System(settings, Sensor.RGBD, backend="orb")
    for i in range(8):
        system.track_rgbd(seq["images"][i], seq["depths"][i], seq["timestamps"][i])
    return system, seq


class TestCheckpoint:
    def test_atlas_roundtrip(self, tracked_system, tmp_path):
        system, seq = tracked_system
        path = str(tmp_path / "atlas.zip")
        system.save_atlas(path)
        assert os.path.getsize(path) > 1000

        from xfeatslam_tpu.slam import serialization

        atlas2 = serialization.load_atlas(path)
        m1, m2 = system.map, atlas2.active
        assert m2.num_keyframes() == m1.num_keyframes()
        assert m2.num_points() == m1.num_points()
        k = sorted(m1.keyframes)[0]
        np.testing.assert_allclose(m2.keyframes[k].R, m1.keyframes[k].R)
        np.testing.assert_array_equal(m2.keyframes[k].mp_ids, m1.keyframes[k].mp_ids)
        # covisibility rebuilt
        assert m2.covis.keys() == m1.covis.keys()

    def test_resume_relocalizes(self, tracked_system, tmp_path):
        system, seq = tracked_system
        path = str(tmp_path / "atlas2.zip")
        system.save_atlas(path)
        settings = system.settings
        fresh = System(settings, Sensor.RGBD, backend="orb")
        fresh.load_atlas(path)
        assert fresh.tracking.state.name == "LOST"
        state, pose = fresh.track_rgbd(seq["images"][4], seq["depths"][4],
                                       99.0)
        assert state.name == "OK", state
        Rg, tg = seq["poses"][4]
        err = np.linalg.norm(-pose[0].T @ pose[1] + Rg.T @ tg)
        assert err < 0.05, err


class TestTrajectoryFormats:
    def test_all_formats(self, tracked_system, tmp_path):
        system, _ = tracked_system
        tum = str(tmp_path / "t.txt")
        euroc = str(tmp_path / "e.csv")
        kitti = str(tmp_path / "k.txt")
        system.save_trajectory_tum(tum)
        system.save_trajectory_euroc(euroc)
        system.save_trajectory_kitti(kitti)
        n = len(system.tracking.trajectory)
        assert len(open(tum).readlines()) == n
        e_lines = open(euroc).readlines()
        assert len(e_lines) == n and e_lines[0].count(",") == 7
        k_lines = open(kitti).readlines()
        assert len(k_lines) == n and len(k_lines[0].split()) == 12

    def test_timing_dump(self, tracked_system, tmp_path):
        system, _ = tracked_system
        path = str(tmp_path / "ExecMean.txt")
        system.dump_timing(path)
        txt = open(path).read()
        assert "track:" in txt and "backend:" in txt


class TestLocalizationMode:
    def test_mapping_paused(self, tracked_system):
        system, seq = tracked_system
        system.activate_localization_mode()
        kfs_before = system.map.num_keyframes()
        mps_before = system.map.num_points()
        for i in range(4):
            system.track_rgbd(seq["images"][i], seq["depths"][i],
                              100.0 + i / 30.0)
        assert system.map.num_points() == mps_before
        system.deactivate_localization_mode()


class TestLiveViewer:
    def test_live_files_and_gif(self, tracked_system, tmp_path):
        """LiveViewer (utils/viewer.py, the reference Viewer-thread role):
        driving updates must atomically produce live_frame.png/live_map.png
        and close() must assemble session.gif from >=2 history frames."""
        from xfeatslam_tpu.utils.viewer import LiveViewer

        system, seq = tracked_system
        viz = str(tmp_path / "viz")
        v = LiveViewer(viz, every=1, max_history=10)
        for _ in range(3):
            v.update(seq["images"][0], system.tracking.last_frame,
                     system.map, trajectory=system.tracking.trajectory,
                     state_text="OK")
        assert os.path.exists(os.path.join(viz, "live_frame.png"))
        assert os.path.exists(os.path.join(viz, "live_map.png"))
        assert len(v._hist) == 3
        gif = v.close()
        assert gif is not None and os.path.getsize(gif) > 1000
