"""System: the public session facade.

Role of /root/reference/src/System.cc + include/System.h:105-193: construct
the pipeline (extractor, map, tracking, local mapping, loop closing), accept
frames, return poses, save trajectories. Where the reference spawns
LocalMapping/LoopClosing threads (System.cc:197,214), this design runs them
as budgeted synchronous steps after each tracked frame — deterministic, and
the heavy math inside (BA, Sim3) is already parallel on the TPU.
"""

from __future__ import annotations

import enum
import os
from typing import Optional, Tuple

import numpy as np

from ..models.extractor import XFeatExtractor
from ..ops import matching
from .frame import FramePipeline
from .map import SlamMap
from .settings import Settings
from .tracking import State, TrackerConfig, Tracking
from ..utils import io as io_utils


class Sensor(enum.Enum):
    """Sensor configurations (/root/reference/include/System.h:87-94)."""

    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4
    IMU_RGBD = 5


_INERTIAL = {Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO, Sensor.IMU_RGBD}
_MONO_LIKE = {Sensor.MONOCULAR, Sensor.IMU_MONOCULAR}


class System:
    def __init__(self, settings: Settings, sensor: Sensor = Sensor.RGBD,
                 extractor=None,
                 backend: Optional[str] = None,
                 enable_mapping: bool = True,
                 enable_loop_closing: bool = True,
                 viewer_dir: Optional[str] = None,
                 viewer_port: Optional[int] = None):
        """backend: "xfeat" (default) or "orb" — the USE_ORB switch of the
        reference (/root/reference/src/Tracking.cc:595-608, selected by env
        var there; an explicit argument here, with the env var honored when
        backend is None for CLI parity).

        viewer_dir: when set, a LiveViewer (utils/viewer.py) follows the
        session — live_frame.png / live_map.png atomically updated in that
        directory, session.gif assembled at shutdown (the reference's
        bUseViewer ctor flag, System.cc:90).

        viewer_port: additionally serve an interactive control panel on
        http://127.0.0.1:<port>/ (0 = pick a free port, read it back from
        system.viewer_server.port) — pause/step-by-step, follow-camera,
        top/side view, localization mode, reset, i.e. the menu surface of
        the reference's Pangolin viewer (Viewer.cc:176-308) re-designed
        for a display-less host. Requires viewer_dir."""
        if backend is None:
            backend = "orb" if os.environ.get("USE_ORB") else "xfeat"
        self.backend = backend
        from ..utils.timing import StageTimer

        self.timer = StageTimer()
        self._mapping_paused = False
        self._last_big_change_idx = 0
        self._is_shutdown = False
        self.settings = settings
        self.viewer = None
        self.viewer_controls = None
        self.viewer_server = None
        if viewer_dir is not None:
            from ..utils.viewer import LiveViewer

            self.viewer = LiveViewer(viewer_dir)
            if viewer_port is not None:
                from ..utils.viewer import ViewerControls, ViewerServer

                self.viewer_controls = ViewerControls()
                self.viewer_server = ViewerServer(
                    viewer_dir, self.viewer_controls, port=viewer_port)
        elif viewer_port is not None:
            raise ValueError("viewer_port requires viewer_dir")
        self.sensor = sensor
        if extractor is None:
            if backend == "orb":
                from ..models.orb import ORBExtractor

                extractor = ORBExtractor(nfeatures=settings.n_features)
            else:
                extractor = XFeatExtractor(nfeatures=settings.n_features)
        self.extractor = extractor
        profile = (matching.ORB_PROFILE if backend == "orb"
                   else matching.XFEAT_PROFILE)
        desc_dim = 256 if backend == "orb" else 64
        # pyramid geometry: ORB is 8 levels x 1.2 (ORBextractor defaults,
        # /root/reference/examples/RGB-D/TUM1.yaml); XFeat is single-scale
        n_levels = getattr(self.extractor, "n_levels", 8 if backend == "orb" else 1)
        scale_factor = getattr(self.extractor, "scale_factor", 1.2)
        from .atlas import Atlas

        self.atlas = Atlas(desc_dim=desc_dim, scale_factor=scale_factor,
                           n_levels=n_levels)
        self.map = self.atlas.active
        self.pipeline = FramePipeline(
            self.extractor, settings.cam, bf=settings.bf,
            depth_factor=settings.depth_map_factor,
        )
        cfg = TrackerConfig(fps=settings.fps, th_depth=settings.th_depth,
                            th_far_points=settings.th_far_points,
                            binary=profile.binary, th_high=profile.th_high,
                            th_low=profile.th_low,
                            n_levels=n_levels, scale_factor=scale_factor,
                            insert_kfs_when_lost=getattr(
                                settings, "insert_kfs_when_lost", True))
        # inertial calibration (required for IMU_* sensors)
        self.imu_calib = settings.imu if sensor in _INERTIAL else None
        if sensor in _INERTIAL and self.imu_calib is None:
            raise ValueError(
                f"sensor {sensor.name} requires an IMU section in the config "
                "(IMU.NoiseGyro/NoiseAcc/GyroWalk/AccWalk + IMU.T_b_c1)"
            )
        self.local_mapping = None
        self.loop_closing = None
        if enable_loop_closing and enable_mapping:
            from .loop_closing import LoopClosing

            self.loop_closing = LoopClosing(
                self.map, settings.cam, bf=settings.bf,
                # scale is observable for everything but pure mono (gravity
                # pins it in inertial modes once initialized)
                fix_scale=(sensor != Sensor.MONOCULAR),
                atlas=self.atlas,
            )
            # post-loop GBA runs budgeted under the System (robust stage at
            # the loop frame, remaining rounds one per frame via tick(),
            # spanning-propagated apply) — the reference's detached
            # abortable GBA thread (LoopClosing.cc:1199-1207)
            self.loop_closing.gba_budget_rounds = 3
        self.tracking = Tracking(
            self.pipeline, self.map, settings.cam, cfg,
            sensor="mono" if sensor in _MONO_LIKE else "rgbd",
            retrieval=self.loop_closing.retrieval if self.loop_closing else None,
            atlas=self.atlas,
            imu_calib=self.imu_calib,
        )
        if enable_mapping:
            from .local_mapping import LocalMapping

            self.local_mapping = LocalMapping(
                self.map, settings.cam, bf=settings.bf, profile=profile,
                imu_calib=self.imu_calib,
                mono=(sensor == Sensor.IMU_MONOCULAR),
                imu_init_time=settings.imu_init_time,
                viba1_time=settings.viba1_time,
                viba2_time=settings.viba2_time,
            )
            if self.loop_closing is not None and self.imu_calib is not None:
                # MergeInertialBA: after an inertial map weld, refine the
                # two temporal windows around the weld jointly with the IMU
                # chains (Optimizer.cc:3948). The hook fires mid-merge,
                # before _run_backend rebinds maps — point local_mapping at
                # the welded map first.
                def _welding_iba(kid, merge_kid):
                    self.local_mapping.map = self.loop_closing.map
                    self.local_mapping._ba_session = None
                    self.local_mapping.merge_inertial_ba(kid, merge_kid)

                self.loop_closing.welding_iba = _welding_iba

    def track_rgbd(self, gray: np.ndarray, depth_raw: np.ndarray,
                   timestamp: float, imu=None):
        """Returns (state, (R,t) world->camera or None). imu: list of
        (acc (3,), gyro (3,), t) samples since the previous frame
        (System::TrackRGBD vImuMeas, /root/reference/src/System.cc:235)."""
        self._apply_viewer_controls()
        with self.timer.span("track"):
            state, pose = self.tracking.grab_rgbd(gray, depth_raw, timestamp,
                                                  imu=imu)
        with self.timer.span("backend"):
            self._run_backend()
        self._update_viewer(gray, state)
        return state, pose

    def track_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray,
                     timestamp: float, imu=None):
        """Rectified stereo tracking (System::TrackStereo role)."""
        self._apply_viewer_controls()
        with self.timer.span("track"):
            state, pose = self.tracking.grab_stereo(gray_l, gray_r, timestamp,
                                                    imu=imu)
        with self.timer.span("backend"):
            self._run_backend()
        self._update_viewer(gray_l, state)
        return state, pose

    def track_monocular(self, gray: np.ndarray, timestamp: float, imu=None):
        """Monocular tracking (System::TrackMonocular role)."""
        self._apply_viewer_controls()
        with self.timer.span("track"):
            state, pose = self.tracking.grab_mono(gray, timestamp, imu=imu)
        with self.timer.span("backend"):
            self._run_backend()
        self._update_viewer(gray, state)
        return state, pose

    def _apply_viewer_controls(self):
        """Honor the interactive panel before processing a frame: block
        while paused (step releases one frame), then apply the menu
        toggles (Viewer.cc:176-308 / Tracking.cc step-by-step)."""
        c = self.viewer_controls
        if c is None or c.stopped:
            return
        c.gate()
        if c.consume_reset():
            self.reset()
        if c.localization != self.tracking.only_tracking:
            if c.localization:
                self.activate_localization_mode()
            else:
                self.deactivate_localization_mode()

    def _update_viewer(self, gray, state):
        if self.viewer is None or self.tracking.last_frame is None:
            return
        c = self.viewer_controls
        follow_center, view = None, "both"
        if c is not None:
            view = c.view
            lf = self.tracking.last_frame
            if c.follow and lf.R is not None:
                follow_center = -lf.R.T @ lf.t
        with self.timer.span("viewer"):
            self.viewer.update(gray, self.tracking.last_frame, self.map,
                               trajectory=self.tracking.trajectory,
                               state_text=f"{state.name} | "
                               f"{self.map.num_keyframes()} KFs | "
                               f"{self.map.num_points()} points",
                               follow_center=follow_center, view=view)

    def _sync_active_map(self):
        """Tracking may have switched/created a map (Atlas): re-point the
        backend workers at the active map."""
        if self.tracking.map is not self.map:
            self.map = self.tracking.map
            if self.local_mapping is not None:
                self.local_mapping.map = self.map
                self.local_mapping.recent_points.clear()
            if self.loop_closing is not None:
                # retrieval is atlas-wide (one KeyFrameDatabase across maps
                # like the reference) — keep the entries, just repoint
                self.loop_closing.map = self.map

    def _run_backend(self):
        self._sync_active_map()
        if self.local_mapping is None or self._mapping_paused:
            self.tracking.new_keyframes.clear()
            return
        ran = False
        while self.tracking.new_keyframes:
            kid = self.tracking.new_keyframes.pop(0)
            if kid not in self.map.keyframes:
                continue
            self.local_mapping.process_keyframe(kid)
            if self.loop_closing is not None:
                self.loop_closing.process_keyframe(kid)
            ran = True
        if not ran:
            # no KF this frame: advance ONE budgeted backend session by one
            # round (the "background thread" time slice) — local BA first,
            # else an in-flight post-loop GBA
            if self.local_mapping._ba_session is not None:
                self.local_mapping.tick()
                ran = True
            elif (self.loop_closing is not None
                    and self.loop_closing._gba_session is not None):
                self.loop_closing.tick()
                ran = True
        if ran:
            if (self.loop_closing is not None
                    and self.loop_closing.map is not self.map):
                # a map merge changed the active map underneath us
                self.map = self.loop_closing.map
                self.tracking.map = self.map
                if self.local_mapping is not None:
                    self.local_mapping.map = self.map
                    self.local_mapping.recent_points.clear()
                # keyframe ids were offset by the merge; the tracker's
                # reference must be re-resolved
                self.tracking.ref_kf = max(self.map.keyframes)
                self.tracking.last_kf_id = self.tracking.ref_kf
                self.tracking.next_kf_id = max(self.map.keyframes) + 1
                self.tracking._rel_pose = None
                if self.tracking.last_frame is not None:
                    lf = self.tracking.last_frame
                    kf = self.map.keyframes[self.tracking.ref_kf]
                    # the moved KF was created from the current frame; adopt
                    # its welded pose
                    lf.R = kf.R.copy()
                    lf.t = kf.t.copy()
                    lf.mp_ids = kf.mp_ids.copy()
                    lf.inlier = lf.mp_ids >= 0
                self.tracking.velocity = None
            # an IMU initialization rescaled/rotated the whole map: transform
            # the tracker's frame-local state the same way
            if (self.local_mapping is not None
                    and self.local_mapping.pending_map_transform is not None):
                s, R_wg = self.local_mapping.pending_map_transform
                self.local_mapping.pending_map_transform = None
                self.tracking.apply_map_transform(s, R_wg)
            # the backend may have moved keyframes (local BA): re-base the
            # tracker's last-frame pose on its reference KF
            self.tracking.reanchor_last_frame()

    def change_dataset(self):
        """System::ChangeDataset (/root/reference/src/System.cc:1279-1293):
        between back-to-back sequences in ONE run — a barely-grown active
        map (<12 KFs) is discarded and restarted, a grown one is frozen and
        a new active map starts (multi-session Atlas; a later loop
        detection can weld the sessions)."""
        keep = self.map.num_keyframes() >= 12
        self.tracking._switch_to_new_map(reset_current=not keep)
        self._sync_active_map()

    def activate_localization_mode(self):
        """Tracking-only: stop map growth (System::ActivateLocalizationMode,
        /root/reference/src/System.cc:478). Both halves of the reference
        contract: the backend pauses (LocalMapping::RequestStop) AND the
        tracker itself stops inserting keyframes / spawning depth points
        (mbOnlyTracking, Tracking.cc:1936-2050)."""
        self._mapping_paused = True
        self.tracking.only_tracking = True

    def deactivate_localization_mode(self):
        self._mapping_paused = False
        self.tracking.only_tracking = False
        self.tracking.vo_mode = False

    def reset(self):
        """System::Reset role: clear everything, restart with a fresh map."""
        self.atlas.maps.clear()
        self.atlas.create_new_map()
        self.map = self.atlas.active
        self.tracking.map = self.map
        self.tracking.state = State.NO_IMAGES
        self.tracking.last_frame = None
        self.tracking.velocity = None
        self.tracking.ref_kf = None
        self.tracking.trajectory.clear()
        self.tracking.traj_rel.clear()
        self.tracking.new_keyframes.clear()
        self._sync_active_map()

    def save_atlas(self, path: str):
        """Checkpoint the whole atlas (System::SaveAtlas role)."""
        from . import serialization

        serialization.save_atlas(self.atlas, path)

    def load_atlas(self, path: str):
        """Resume from a checkpoint (System::LoadAtlas role). Tracking
        restarts in LOST state and must relocalize into the loaded map."""
        from . import serialization

        self.atlas = serialization.load_atlas(path)
        self.map = self.atlas.active
        self.tracking.atlas = self.atlas
        self.tracking.map = self.map
        self.tracking.state = State.LOST
        self.tracking.lost_since = 0.0
        self.tracking.velocity = None
        self.tracking.ref_kf = None
        self._sync_active_map()
        # rebuild ONE retrieval index across ALL loaded maps, tagged by map
        # id (the reference re-links a single KeyFrameDatabase over the whole
        # atlas on load, /root/reference/src/System.cc:1445-1506) — this is
        # what makes post-resume relocalization into stored maps and
        # cross-map merging work
        if self.loop_closing is not None:
            self.loop_closing.map = self.map
            from .retrieval import global_desc_dim

            retr = type(self.loop_closing.retrieval)(
                dim=global_desc_dim(self.map.desc_dim)
            )
            for m in self.atlas.all_maps():
                for kid in sorted(m.keyframes):
                    retr.add(kid, m.keyframes[kid].global_desc,
                             map_id=m.map_id)
            self.loop_closing.retrieval = retr
            self.tracking.retrieval = retr
            # re-wire KF-removal eviction into the fresh atlas/maps
            self.atlas.kf_removed_hook = self.loop_closing._evict
            for m in self.atlas.all_maps():
                m.on_kf_removed = self.atlas._dispatch_kf_removed

    def refit_retrieval_codebook(self, max_descs: int = 100000):
        """Fit a data-derived (spherical k-means) VLAD codebook on the
        atlas's keyframe descriptors and re-aggregate every stored global
        descriptor + the retrieval index — the trained-vocabulary option
        (role of DBoW2's offline ORB vocabulary). Useful on self-similar
        workloads where the fixed random codebook's cross-scene pedestal
        rises."""
        from .retrieval import (aggregate_global_desc, fit_codebook,
                                global_desc_dim, use_codebook)

        descs = []
        for m in self.atlas.all_maps():
            for kf in m.keyframes.values():
                descs.append(kf.desc[kf.valid])
        if not descs:
            return
        d = np.concatenate(descs)
        if len(d) > max_descs:
            sel = np.random.default_rng(0).choice(len(d), max_descs,
                                                  replace=False)
            d = d[sel]
        use_codebook(fit_codebook(d))
        for m in self.atlas.all_maps():
            for kf in m.keyframes.values():
                kf.global_desc = aggregate_global_desc(kf.desc, kf.valid)
        if self.loop_closing is not None:
            retr = type(self.loop_closing.retrieval)(
                dim=global_desc_dim(self.map.desc_dim))
            for m in self.atlas.all_maps():
                for kid in sorted(m.keyframes):
                    retr.add(kid, m.keyframes[kid].global_desc,
                             map_id=m.map_id)
            self.loop_closing.retrieval = retr
            self.tracking.retrieval = retr

    def save_trajectory_euroc(self, path: str, map_id: int = None):
        """All three frame-trajectory savers re-base each frame onto the
        CURRENT pose of its reference keyframe (T_frame = T_rel * T_refKF)
        so corrections from local BA / loop closing / GBA reach the saved
        file (System::SaveTrajectory*, /root/reference/src/System.cc:569-627).
        map_id restricts output to frames logged in one atlas map
        (SaveTrajectoryEuRoC(filename, pMap), System.h:158)."""
        traj = self.tracking.resolved_trajectory()
        if map_id is not None:
            keep = {e[0] for e in self.tracking.traj_rel
                    if e[2] == map_id}
            traj = [t for t in traj if t[0] in keep]
        io_utils.save_trajectory_euroc(
            path, [t for (t, _R, _t, _s) in traj],
            [(R, tr) for (_t, R, tr, _s) in traj],
        )

    def save_trajectory_kitti(self, path: str):
        traj = self.tracking.resolved_trajectory()
        io_utils.save_trajectory_kitti(
            path, [(R, tr) for (_t, R, tr, _s) in traj]
        )

    def export_map_html(self, path: str, max_points: int = 60000) -> str:
        """Standalone interactive 3D map file (WebGL orbit/pan/zoom over
        points, keyframe frusta, covisibility graph, trajectory) — the
        offline artifact of the Pangolin map window role
        (/root/reference/src/MapDrawer.cc:29-185); the same scene is
        served live at the ViewerServer's /map3d endpoint."""
        from ..utils import map3d

        payload = map3d.map_payload(
            self.map, trajectory=self.tracking.trajectory,
            max_points=max_points,
            title=f"{self.map.num_keyframes()} KFs, "
                  f"{self.map.num_points()} points")
        return map3d.export_html(payload, path)

    def save_trajectory_tum(self, path: str):
        traj = self.tracking.resolved_trajectory()
        io_utils.save_trajectory_tum(
            path,
            [t for (t, _R, _t, _s) in traj],
            [(R, tr) for (_t, R, tr, _s) in traj],
        )

    def save_keyframe_trajectory_tum(self, path: str, map_id: int = None):
        kfs = self._kfs_for_save(map_id)
        io_utils.save_trajectory_tum(
            path, [k.timestamp for k in kfs], [(k.R, k.t) for k in kfs]
        )

    def save_keyframe_trajectory_euroc(self, path: str, map_id: int = None):
        """System::SaveKeyFrameTrajectoryEuRoC
        (/root/reference/include/System.h:156,159 — with the optional
        per-map variant)."""
        kfs = self._kfs_for_save(map_id)
        io_utils.save_trajectory_euroc(
            path, [k.timestamp for k in kfs], [(k.R, k.t) for k in kfs]
        )

    def _kfs_for_save(self, map_id=None):
        m = self.map if map_id is None else self.atlas.maps[map_id]
        return sorted(m.keyframes.values(), key=lambda k: k.timestamp)

    # --- tracked-state getters (System.h:176-187) ---

    def get_tracking_state(self):
        """Current tracker state enum (System::GetTrackingState)."""
        return self.tracking.state

    def get_tracked_map_points(self) -> np.ndarray:
        """Per-keypoint map-point ids of the last frame, -1 where unbound
        (System::GetTrackedMapPoints — ids instead of MapPoint*)."""
        lf = self.tracking.last_frame
        if lf is None:
            return np.empty(0, np.int64)
        return lf.mp_ids.copy()

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoint coordinates (K,2) of the last frame
        (System::GetTrackedKeyPointsUn; frames store undistorted kpts)."""
        lf = self.tracking.last_frame
        if lf is None:
            return np.empty((0, 2), np.float32)
        return np.asarray(lf.kpts).copy()

    def get_image_scale(self) -> float:
        """Input-resize factor applied by Settings (System::GetImageScale;
        Camera.newWidth / Camera.width when a resize is configured)."""
        s = self.settings
        if getattr(s, "need_resize", False) and s.new_width:
            return float(s.new_width) / float(s.width)
        return 1.0

    def map_changed(self) -> bool:
        """True once after each big map change — loop correction, GBA,
        IMU-init rescale (System::MapChanged,
        /root/reference/src/System.cc:490-501; maps bump change_index only
        on whole-map transforms). Summed over atlas maps so the count stays
        monotone across map switches."""
        cur = sum(m.change_index for m in self.atlas.all_maps())
        if cur > self._last_big_change_idx:
            self._last_big_change_idx = cur
            return True
        return False

    def is_shutdown(self) -> bool:
        """System::isShutDown (System.cc:564)."""
        return self._is_shutdown

    def is_lost(self) -> bool:
        """Inertial-mode loss flag: False until IMU initialization, then
        true in LOST (System::isLost, System.cc:1348-1359 — the
        RECENTLY_LOST clause is commented out upstream too)."""
        if not self.map.imu_initialized:
            return False
        from .tracking import State

        return self.tracking.state == State.LOST

    def get_time_from_imu_init(self) -> float:
        """Seconds of keyframe time elapsed since the inertial map began,
        0.0 before IMU initialization (System::GetTimeFromIMUInit,
        System.cc:1339-1346)."""
        if not self.map.imu_initialized or not self.map.keyframes:
            return 0.0
        ts = [k.timestamp for k in self.map.keyframes.values()]
        dt = max(ts) - min(ts)
        return float(dt) if dt > 0 else 0.0

    def dump_timing(self, path: str):
        """ExecMean.txt-style per-stage stats (REGISTER_TIMES role)."""
        self.timer.dump(path)

    def save_debug_data(self, init_idx: int, out_dir: str = "."):
        """System::SaveDebugData (/root/reference/src/System.cc:1265-1303):
        dump the inertial-initialization debug record — per init section,
        the init trajectory (EuRoC format), estimated scale, gravity
        direction, solver cost, and chain KF count — into
        init_{Frame,Scale,GDir,CompCost,KF}_* files."""
        import os

        lm = self.local_mapping
        if lm is None or not lm.init_debug:
            return
        sect = lm.init_debug[-1][0]
        self.save_trajectory_euroc(os.path.join(
            out_dir, f"init_FrameTrajectory_{sect}_{init_idx}.txt"))
        for name, col in (("Scale", 1), ("CompCost", 3), ("KF", 4)):
            with open(os.path.join(out_dir, f"init_{name}_{sect}.txt"),
                      "a") as f:
                for rec in lm.init_debug:
                    if rec[0] == sect:
                        f.write(f"{rec[col]}\n")
        with open(os.path.join(out_dir, f"init_GDir_{sect}.txt"), "a") as f:
            for rec in lm.init_debug:
                if rec[0] == sect:
                    R = rec[2]
                    for r in range(3):
                        f.write(",".join(f"{R[r, c]}" for c in range(3))
                                + "\n")

    def shutdown(self):
        self._is_shutdown = True
        if self.loop_closing is not None:
            self.loop_closing.flush()  # finish any in-flight budgeted GBA
        if self.viewer_server is not None:
            self.viewer_server.close()
        if self.viewer is not None:
            self.viewer.close()
        return {
            "keyframes": self.map.num_keyframes(),
            "map_points": self.map.num_points(),
            "maps": len(self.atlas.maps),
            "frames": len(self.tracking.trajectory),
            "loops_closed": len(self.loop_closing.closed) if self.loop_closing else 0,
            **self.tracking.stats,
        }
