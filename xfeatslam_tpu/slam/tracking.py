"""Tracking: the per-frame state machine.

Host-side re-design of /root/reference/src/Tracking.cc (4,185 LoC): states
NOT_INITIALIZED / OK / RECENTLY_LOST / LOST (Tracking.h:120-129), motion-model
prediction, projection matching + pose-only LM (device kernels), local-map
tracking, keyframe policy — with the device doing all batched math and the
host doing only control flow and map bookkeeping.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops import imu as imu_ops
from ..ops import lie
from ..ops import matching
from ..optim import pose_opt
from .frame import Frame, FramePipeline
from .map import KeyFrame, SlamMap

from ..optim.inertial import np_body_to_cam, np_cam_to_body

LOCAL_MP_BUCKET = 4096  # static shape for local-map snapshots


def resolve_trajectory(traj_rel, active_map, atlas=None):
    """Resolve a relative trajectory log against CURRENT keyframe poses:
    T_frame = T_rel * T_refKF (System::SaveTrajectoryTUM,
    /root/reference/src/System.cc:569-627). Culled references walk their
    recorded relative-to-parent chain (the mTcp walk, :589-596); merged maps
    are chased through the atlas remap records. Entries whose reference
    chain is unresolvable fall back to their track-time absolute pose.
    Returns [(timestamp, R, t, state)] world->camera."""
    out = []
    for (ts, state, map_id, ref_kid, R_rel, t_rel, R_abs, t_abs) in traj_rel:
        m = active_map if map_id == active_map.map_id else None
        if m is None and atlas is not None:
            m = atlas.maps.get(map_id)
            while m is None and map_id in atlas.remaps:
                map_id, off = atlas.remaps[map_id]
                if ref_kid >= 0:
                    ref_kid += off
                m = atlas.maps.get(map_id)
        R, t = R_abs, t_abs
        if m is not None and ref_kid >= 0 and R_rel is not None:
            Rr, tr = R_rel, t_rel
            kid = ref_kid
            hops = 0
            while kid not in m.keyframes and kid in m.culled and hops < 1000:
                parent, R_cp, t_cp = m.culled[kid]
                # T_frame = T_rel*T_kid, T_kid = T_cp*T_parent
                Rr, tr = Rr @ R_cp, Rr @ t_cp + tr
                if parent < 0:
                    # parentless anchor: (R_cp,t_cp) IS the culled pose
                    kid = -1
                    break
                kid = parent
                hops += 1
            kf = m.keyframes.get(kid)
            if kf is not None:
                R = Rr @ kf.R
                t = Rr @ kf.t + tr
            elif kid == -1:
                R, t = Rr, tr
        out.append((ts, lie.np_normalize_rotation(np.asarray(R)),
                    np.asarray(t, np.float32), state))
    return out


class State(enum.Enum):
    NO_IMAGES = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


@dataclass
class TrackerConfig:
    fps: float = 30.0
    th_depth: float = 3.0  # Stereo.ThDepth * baseline, meters (close-point cut)
    # System.thFarPoints (Settings.cc:479): depth readings beyond this never
    # become map points (noisy far depth pollutes RGB-D maps); None = off
    th_far_points: Optional[float] = None
    min_init_points: int = 300  # StereoInitialization gate (Tracking.cc:2362
    # gates N>500, but reference N counts PADDED slots == nfeatures, i.e. the
    # gate always passes there; 300 real detections is the honest analogue)
    motion_radius: float = 15.0  # SearchByProjection th (widened from 7 since
    # XFeat is single-octave; reference widens x2 on failure anyway)
    local_radius: float = 10.0
    min_inliers_motion: int = 20
    min_inliers_local: int = 30
    kf_ref_ratio: float = 0.75  # thRefRatio RGBD (Tracking.cc:3201)
    max_frames_between_kf: Optional[int] = None  # default fps
    recently_lost_seconds: float = 5.0
    # observation noise sigma in px (invSigma2 weights; reference uses
    # per-octave sigma with level-0 = 1px)
    obs_sigma: float = 1.0
    # extractor pyramid geometry (8 x 1.2 for ORB; 1 level for XFeat) —
    # enables octave-predicted search radii + scale gates in projection
    # matching (ORBmatcher.cc:92-131) and per-octave information weights
    n_levels: int = 1
    scale_factor: float = 1.2
    # creation-time duplicate suppression radius (px): no new depth point
    # within this distance of an existing local-map projection
    create_dedup_px: float = 2.0
    # matching profile (the USE_ORB switch, ORBmatcher.cc:34-35)
    binary: bool = False
    th_high: float = matching.TH_HIGH
    th_low: float = matching.TH_LOW
    # reference-KF matching threshold: generous for float descriptors
    # (SearchByBoW TH_LOW is tight for trained weights), raw th_low for ORB
    refkf_max_dist: Optional[float] = None
    # keep anchoring the inertial chain with keyframes while RECENTLY_LOST
    # (IMU.InsertKFsWhenLost, Settings.h:93 / Tracking.cc NeedNewKeyFrame
    # inertial branch)
    insert_kfs_when_lost: bool = True
    # relocalization acceptance (reference: >=50 inliers after the guided
    # widening ladder, Tracking.cc:3823)
    reloc_min_inliers: int = 50

    def __post_init__(self):
        if self.refkf_max_dist is None:
            self.refkf_max_dist = (
                self.th_high if self.binary else self.th_low * 7
            )


class Tracking:
    def __init__(self, pipeline: FramePipeline, slam_map: SlamMap,
                 cam: camera_ops.Pinhole, config: TrackerConfig = None,
                 sensor: str = "rgbd", retrieval=None, atlas=None,
                 imu_calib: Optional[imu_ops.ImuCalib] = None):
        self.pipeline = pipeline
        self.map = slam_map
        self.sensor = sensor
        # inertial state (GrabImuData/PreintegrateIMU,
        # /root/reference/src/Tracking.cc:1645-1760)
        self.imu_calib = imu_calib
        self.imu_queue: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._pre_from_kf = None  # Preintegrated: last KF -> last frame
        self._pre_cur = None  # Preintegrated: last KF -> current frame
        # marginalized last-frame prior (ConstraintPoseImu): (R_wb, p_wb,
        # v_w, bg, ba, sqrt-info L (15,15), map change_index at creation)
        self._frame_prior = None
        self._prior_pending = None
        self.last_kf_id: Optional[int] = None  # most recent created KF
        self.retrieval = retrieval  # shared with LoopClosing (reloc queries)
        self.atlas = atlas  # multi-map recovery (Atlas), optional
        self.cam = cam
        self.cfg = config or TrackerConfig()
        if self.cfg.max_frames_between_kf is None:
            self.cfg.max_frames_between_kf = int(self.cfg.fps)
        self.state = State.NO_IMAGES
        self.last_frame: Optional[Frame] = None
        self.velocity: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.ref_kf: Optional[int] = None
        self.last_kf_frame_id = 0
        self.next_kf_id = 0
        self.matches_inliers = 0
        self.lost_since: Optional[float] = None
        # localization-only mode (mbOnlyTracking,
        # /root/reference/src/Tracking.cc:1936-2050): pose tracking runs but
        # keyframe insertion / map growth is disabled
        self.only_tracking = False
        # mbVO (Tracking.cc:1996-2035): in localization mode, true when the
        # last pose solve held fewer than 10 MAP-point inliers — tracking
        # is dead-reckoning on temporal depth points off the mapped area
        self.vo_mode = False
        # track-time trajectory log (timestamp, R, t, state) — live
        # consumers (viewer); savers use resolved_trajectory() instead
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray, State]] = []
        # relative trajectory log for save-time re-basing
        # (mlRelativeFramePoses, /root/reference/src/Tracking.cc:2327-2347):
        # (timestamp, state, map_id, ref_kid, R_rel, t_rel, R_abs, t_abs)
        # with T_frame = T_rel * T_refKF re-resolved at save so loop/GBA
        # corrections reach the saved trajectory (System.cc:569-627)
        self.traj_rel: List[tuple] = []
        self.new_keyframes: List[int] = []  # queue for local mapping
        self.stats = {"motion_ok": 0, "refkf_ok": 0, "local_fail": 0, "kfs": 0}

    # ------------------------------------------------------------------ API

    def grab_rgbd(self, gray, depth_raw, timestamp, imu=None) -> Tuple[State, Optional[Tuple[np.ndarray, np.ndarray]]]:
        self._queue_imu(imu)
        frame = self._grab_rgbd_fused(gray, depth_raw, timestamp)
        if frame is None:
            frame = self.pipeline.build_rgbd(gray, depth_raw, timestamp)
        return self._track(frame)

    def _fused_grab_setup(self, timestamp):
        """Preconditions + speculative inputs shared by the whole-frame
        fused grabs: XFeat backend, pinhole camera, non-inertial, OK
        state, monotonic timestamp; motion-model pose prediction
        (_predict_pose non-inertial branch) and the stage-1/stage-2
        snapshots voted from the LAST frame's bindings."""
        last = self.last_frame
        if (self.state != State.OK or self.imu_calib is not None
                or self.only_tracking or last is None or last.R is None
                or self.cfg.binary
                or timestamp < last.timestamp  # would reset into a new map
                or type(self.cam) is not camera_ops.Pinhole
                or not hasattr(self.pipeline.extractor, "params")):
            return None
        ids = self._local_map_points(last)
        if ids is None or len(ids) == 0:
            return None
        if self.velocity is not None:
            Rv, tv = self.velocity
            R0 = lie.np_normalize_rotation(Rv @ last.R)
            t0 = (Rv @ last.t + tv).astype(np.float32)
        else:
            R0, t0 = last.R.copy(), last.t.copy()
        bound = (last.mp_ids >= 0) & last.inlier
        safe1 = np.where(bound, last.mp_ids, 0)
        valid1 = bound & self.map.points.alive[safe1]
        ids1 = np.where(valid1, last.mp_ids, -1)
        pos, desc, valid2, padded_ids = self.map.point_snapshot(
            ids, LOCAL_MP_BUCKET)
        safe2 = np.clip(padded_ids, 0, None)
        return (R0, t0, ids, ids1, safe1, valid1, pos, desc, valid2,
                padded_ids, safe2)

    def _grab_rgbd_fused(self, gray, depth_raw, timestamp) -> Optional[Frame]:
        """Speculative whole-frame fused grab: extraction + undistortion +
        depth gating + BOTH tracking stages in ONE device dispatch
        (optim/track_step.xfeat_rgbd_frame_step) — one launch (or tunnel
        round trip) per steady-state frame instead of two. depth_raw=None
        is the monocular configuration (every keypoint a mono observation,
        depth math compiled out). Returns a Frame with the two-stage
        result stashed for _track_frame_fused, or None when the
        single-dispatch preconditions don't hold (then the caller builds
        the frame the normal way and tracking dispatches as before — a
        pure fast-path, never a behavior change)."""
        from ..ops import image as image_ops
        from ..optim import track_step

        last = self.last_frame
        setup = self._fused_grab_setup(timestamp)
        if setup is None:
            return None
        (R0, t0, ids, ids1, safe1, valid1, pos, desc, valid2, padded_ids,
         safe2) = setup
        if depth_raw is None:
            depth_m = np.zeros((1, 1), np.float32)  # dummy, compiled out
        else:
            depth_m = np.asarray(depth_raw, np.float32)
            if self.pipeline.depth_factor != 1.0:
                depth_m = depth_m / self.pipeline.depth_factor
        out, r1, r2 = track_step.xfeat_rgbd_frame_step(
            self.pipeline.extractor.params,
            image_ops.to_float_image(gray), jnp.asarray(depth_m),
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(self.map.points.pos[safe1]),
            jnp.asarray(self.map.points.desc[safe1]),
            jnp.asarray(valid1),
            jnp.asarray(self.map.points.angle[safe1]),
            jnp.asarray(last.octave.astype(np.int32)),
            jnp.asarray(ids1.astype(np.int32)),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid2),
            jnp.asarray(self.map.points.angle[safe2]),
            jnp.asarray(self.map.points.octave[safe2].astype(np.int32)),
            jnp.asarray(padded_ids.astype(np.int32)),
            jnp.asarray(self.map.points.dmax[safe2]),
            self.cam, jnp.float32(self.pipeline.bf),
            jnp.float32(0.05),
            jnp.float32(1.0 / self.cfg.obs_sigma ** 2),
            jnp.float32(self.cfg.motion_radius),
            jnp.float32(self.cfg.local_radius),
            jnp.float32(self.cfg.th_high),
            jnp.float32(0.9), jnp.int32(self.cfg.min_inliers_motion),
            jnp.float32(self.cfg.scale_factor),
            jnp.float32(2.0 * float(self.cam.cx)),
            jnp.float32(2.0 * float(self.cam.cy)),
            num_keypoints=self.pipeline.extractor.nfeatures,
            n_levels=self.cfg.n_levels, has_depth=depth_raw is not None,
        )
        out, r1, r2 = jax.device_get((dict(out), r1, r2))
        frame = self.pipeline.assemble_rgbd(out, timestamp)
        frame.R, frame.t = R0, t0
        frame._fused_pending = (r1, r2, ids, ids1, padded_ids)
        self.stats["fused_grab"] = self.stats.get("fused_grab", 0) + 1
        return frame

    def grab_mono(self, gray, timestamp, imu=None) -> Tuple[State, Optional[Tuple[np.ndarray, np.ndarray]]]:
        self._queue_imu(imu)
        frame = self._grab_rgbd_fused(gray, None, timestamp)
        if frame is None:
            frame = self.pipeline.build_mono(gray, timestamp)
        return self._track(frame)

    def grab_stereo(self, gray_l, gray_r, timestamp, imu=None) -> Tuple[State, Optional[Tuple[np.ndarray, np.ndarray]]]:
        """Stereo tracking (GrabImageStereo role,
        /root/reference/src/Tracking.cc:1461): stereo depth drives the same
        RGB-D-style init/point-creation path."""
        self._queue_imu(imu)
        frame = self._grab_stereo_fused(gray_l, gray_r, timestamp)
        if frame is None:
            frame = self.pipeline.build_stereo(gray_l, gray_r, timestamp)
        return self._track(frame)

    def _grab_stereo_fused(self, gray_l, gray_r, timestamp) -> Optional[Frame]:
        """Speculative whole-frame fused STEREO grab: both views through
        one batched CNN pass + row-band stereo match + both tracking
        stages in ONE dispatch (optim/track_step.xfeat_stereo_frame_step).
        Same fallback contract as _grab_rgbd_fused."""
        from ..ops import image as image_ops
        from ..ops import matching
        from ..optim import track_step

        last = self.last_frame
        setup = self._fused_grab_setup(timestamp)
        if setup is None or gray_l.shape != gray_r.shape:
            return None
        (R0, t0, ids, ids1, safe1, valid1, pos, desc, valid2, padded_ids,
         safe2) = setup
        images = jnp.concatenate([image_ops.to_float_image(gray_l),
                                  image_ops.to_float_image(gray_r)], axis=0)
        out, r1, r2 = track_step.xfeat_stereo_frame_step(
            self.pipeline.extractor.params, images,
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(self.map.points.pos[safe1]),
            jnp.asarray(self.map.points.desc[safe1]),
            jnp.asarray(valid1),
            jnp.asarray(self.map.points.angle[safe1]),
            jnp.asarray(last.octave.astype(np.int32)),
            jnp.asarray(ids1.astype(np.int32)),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid2),
            jnp.asarray(self.map.points.angle[safe2]),
            jnp.asarray(self.map.points.octave[safe2].astype(np.int32)),
            jnp.asarray(padded_ids.astype(np.int32)),
            jnp.asarray(self.map.points.dmax[safe2]),
            self.cam, jnp.float32(self.pipeline.bf),
            jnp.float32(0.5), jnp.float32(192.0),
            jnp.float32((matching.TH_HIGH + matching.TH_LOW) / 2),
            jnp.float32(1.0 / self.cfg.obs_sigma ** 2),
            jnp.float32(self.cfg.motion_radius),
            jnp.float32(self.cfg.local_radius),
            jnp.float32(self.cfg.th_high),
            jnp.float32(0.9), jnp.int32(self.cfg.min_inliers_motion),
            jnp.float32(self.cfg.scale_factor),
            jnp.float32(2.0 * float(self.cam.cx)),
            jnp.float32(2.0 * float(self.cam.cy)),
            num_keypoints=self.pipeline.extractor.nfeatures,
            n_levels=self.cfg.n_levels,
        )
        out, r1, r2 = jax.device_get((dict(out), r1, r2))
        frame = self.pipeline.assemble_rgbd(out, timestamp)
        frame.R, frame.t = R0, t0
        frame._fused_pending = (r1, r2, ids, ids1, padded_ids)
        self.stats["fused_grab"] = self.stats.get("fused_grab", 0) + 1
        return frame

    def grab_imu(self, acc, gyro, timestamp: float):
        """GrabImuData (/root/reference/src/Tracking.cc:1645): enqueue one
        IMU sample (body-frame acc m/s^2, gyro rad/s)."""
        self.imu_queue.append((float(timestamp),
                               np.asarray(acc, np.float32),
                               np.asarray(gyro, np.float32)))

    def _queue_imu(self, imu):
        if imu:
            for (acc, gyro, t) in imu:
                self.grab_imu(acc, gyro, t)

    # ------------------------------------------------------------ internals

    def _current_bias(self):
        kf = self.map.keyframes.get(self.last_kf_id)
        if kf is not None and kf.bg is not None:
            return kf.bg, kf.ba
        return self.map.imu_bg, self.map.imu_ba

    def _preintegrate(self, frame: Frame):
        """PreintegrateIMU (/root/reference/src/Tracking.cc:1692): integrate
        queued samples in (t_last, t_cur] at the current bias estimate;
        maintain both the from-last-frame segment and the from-last-KF
        accumulation (mpImuPreintegratedFromLastKF)."""
        t_cur = frame.timestamp
        if self.last_frame is None:
            self.imu_queue = [s for s in self.imu_queue if s[0] > t_cur]
            frame.pre_last = None
            self._pre_cur = None
            return
        t_prev = self.last_frame.timestamp
        take = [s for s in self.imu_queue if t_prev < s[0] <= t_cur + 1e-9]
        self.imu_queue = [s for s in self.imu_queue if s[0] > t_cur + 1e-9]
        seg = None
        if take:
            bg, ba = self._current_bias()
            ts = np.array([s[0] for s in take])
            dts = np.diff(np.concatenate([[t_prev], ts])).astype(np.float32)
            seg = imu_ops.preintegrate_segment(
                np.stack([s[1] for s in take]),
                np.stack([s[2] for s in take]),
                dts, bg, ba, self.imu_calib,
            )
        frame.pre_last = seg
        if seg is not None:
            if self._pre_from_kf is None:
                self._pre_cur = seg
            else:
                merged = imu_ops.merge_previous(self._pre_from_kf, seg)
                self._pre_cur = imu_ops.Preintegrated(*jax.device_get(
                    tuple(merged)))
        else:
            self._pre_cur = self._pre_from_kf

    def _track(self, frame: Frame):
        if self._check_timestamp_jump(frame):
            self.last_frame = frame
            return self.state, None
        self._prior_pending = None  # only THIS frame's solve may set it
        if self.imu_calib is not None:
            self._preintegrate(frame)
        if self.state in (State.NO_IMAGES, State.NOT_INITIALIZED):
            self.state = State.NOT_INITIALIZED
            init = (self._initialize_rgbd(frame) if self.sensor == "rgbd"
                    else self._initialize_mono(frame))
            if init:
                self.state = State.OK
        elif self.state == State.LOST:
            # LOST ladder (Tracking.cc:2041-2059,2298-2316): reloc into any
            # map; else reset/new-map via Atlas
            if self._relocalization(frame):
                self.state = State.OK
                self._update_velocity(frame)
                self._store_relative_pose(frame)
            else:
                self._handle_lost_map(frame)
        else:
            ok = False
            local_done = False
            if self.state == State.OK:
                # fast path: both tracking stages in one dispatch; None
                # falls back to the split path below
                fused = self._track_frame_fused(frame)
                if fused:
                    ok = local_done = True
                else:
                    ok = self._track_with_motion_model(frame)
                    if ok:
                        self.stats["motion_ok"] += 1
                    else:
                        ok = self._track_reference_keyframe(frame)
                        if ok:
                            self.stats["refkf_ok"] += 1
            elif self.state == State.RECENTLY_LOST:
                ok = self._track_with_motion_model(frame)
                if not ok:
                    ok = self._track_reference_keyframe(frame)
                if not ok:
                    ok = self._relocalization(frame)
                    if ok:
                        self.stats["reloc_ok"] = self.stats.get("reloc_ok", 0) + 1

            if self.only_tracking and self.vo_mode:
                # mbVO (Tracking.cc:1996-2035): the map is unavailable —
                # dead-reckon on temporal points while ALSO trying to
                # relocalize every frame; a reloc success re-attaches
                mm = None
                if ok and frame.R is not None:
                    mm = (frame.R.copy(), frame.t.copy(),
                          frame.mp_ids.copy(), frame.inlier.copy(),
                          self.map)
                if self._relocalization(frame):
                    self.vo_mode = False
                    ok = True
                elif mm is not None:
                    # keep the motion-model result — a failed reloc attempt
                    # mutates the frame mid-flight (the reference restores
                    # TcwMM the same way, Tracking.cc:2012-2023)
                    frame.R, frame.t, frame.mp_ids, frame.inlier, m_mm = mm
                    if self.map is not m_mm and self.atlas is not None:
                        self.atlas.change_map(m_mm.map_id)
                        self.map = m_mm
            if ok and not local_done and not (self.only_tracking
                                              and self.vo_mode):
                ok = self._track_local_map(frame)
                if not ok:
                    self.stats["local_fail"] += 1

            if ok:
                self.state = State.OK
                self.lost_since = None
                self._update_velocity(frame)
                # localization mode never inserts keyframes or map points
                # (mbOnlyTracking skips NeedNewKeyFrame entirely,
                # /root/reference/src/Tracking.cc:2095-2150)
                if not self.only_tracking and self._need_new_keyframe(frame):
                    self._create_keyframe(frame)
                self._store_relative_pose(frame)
            else:
                if self.state == State.OK:
                    self.state = State.RECENTLY_LOST
                    self.lost_since = frame.timestamp
                elif self.state == State.RECENTLY_LOST:
                    if (frame.timestamp - self.lost_since
                            > self.cfg.recently_lost_seconds):
                        self.state = State.LOST
                # hold the last pose for the trajectory while lost — the
                # reference attempts relocalization rather than integrating
                # velocity open-loop (which runs away, Tracking.cc:2041-2059)
                if frame.R is None and self.last_frame is not None:
                    frame.R = self.last_frame.R.copy()
                    frame.t = self.last_frame.t.copy()
                self.velocity = None
                # inertial: keep anchoring the preintegration chain with
                # keyframes at the IMU-predicted pose so the map can absorb
                # the dead-reckoned stretch once tracking recovers
                # (InsertKFsWhenLost, Tracking.cc NeedNewKeyFrame inertial)
                last_kf = self.map.keyframes.get(self.last_kf_id)
                if (self.state == State.RECENTLY_LOST
                        and self.cfg.insert_kfs_when_lost
                        and not self.only_tracking
                        and self.imu_calib is not None
                        and self.map.imu_initialized
                        and frame.R is not None
                        and self._pre_cur is not None
                        and last_kf is not None
                        and frame.timestamp - last_kf.timestamp >= 0.25):
                    self._create_keyframe(frame)

        if frame.R is not None:
            self.trajectory.append(
                (frame.timestamp, frame.R.copy(), frame.t.copy(), self.state)
            )
            self._log_relative_pose(frame)
        self.last_frame = frame
        if self.imu_calib is not None:
            # roll the from-last-KF accumulation forward (None right after a
            # KF was created from this frame — the accumulator restarts)
            self._pre_from_kf = self._pre_cur
        # promote this frame's marginalized posterior to be the next
        # frame's ConstraintPoseImu prior; a failed frame breaks the chain
        self._frame_prior = (getattr(self, "_prior_pending", None)
                             if self.state == State.OK else None)
        pose = (frame.R, frame.t) if frame.R is not None else None
        return self.state, pose

    # -- initialization ------------------------------------------------------

    def _initialize_rgbd(self, frame: Frame) -> bool:
        """StereoInitialization (/root/reference/src/Tracking.cc:2362): needs
        >500 valid keypoints; every depth-carrying keypoint becomes a map
        point; frame pose = identity."""
        has_depth = frame.valid & (frame.depth > 0)
        if self.cfg.th_far_points is not None:
            has_depth &= frame.depth < self.cfg.th_far_points
        if frame.n_valid <= self.cfg.min_init_points or has_depth.sum() < 100:
            return False
        frame.R = np.eye(3, dtype=np.float32)
        frame.t = np.zeros(3, np.float32)
        kf = self._make_keyframe(frame)
        ray = np.asarray(camera_ops.pinhole_unproject(self.cam, jnp.asarray(frame.kpts_un)))
        for slot in np.nonzero(has_depth)[0]:
            X = ray[slot] * frame.depth[slot]
            mp = self.map.create_point(X.astype(np.float32), frame.desc[slot],
                                       kf.kid, float(frame.angle[slot]),
                                       octave=int(frame.octave[slot]),
                                       dist_ref=float(np.linalg.norm(X)))
            self.map.add_observation(mp, kf.kid, int(slot), update_links=False)
            frame.mp_ids[slot] = mp
        self.map.update_connections(kf.kid)
        frame.inlier = frame.mp_ids >= 0
        self.ref_kf = kf.kid
        self.last_kf_frame_id = frame.fid
        return True

    # -- pose tracking -------------------------------------------------------

    def _imu_anchor(self):
        """The inertial anchor state: the most recent keyframe with a
        velocity estimate (mpLastKeyFrame). Returns (kf, R_wb, p_wb) or
        None before IMU initialization."""
        if not (self.imu_calib is not None and self.map.imu_initialized):
            return None
        kf = self.map.keyframes.get(self.last_kf_id)
        if kf is None or kf.vel is None or self._pre_cur is None:
            return None
        cal = self.imu_calib
        R_wb, p_wb = np_cam_to_body(kf.R, kf.t, cal.R_bc, cal.t_bc)
        return kf, R_wb, p_wb

    def _predict_pose(self, frame: Frame):
        anchor = self._imu_anchor()
        if anchor is not None:
            # PredictStateIMU (/root/reference/src/Tracking.cc:1765):
            # propagate the last KF's state through the accumulated
            # preintegration at the KF's bias
            kf, R_wb, p_wb = anchor
            cal = self.imu_calib
            pre = jax.tree_util.tree_map(jnp.asarray, self._pre_cur)
            R_nb, p_nb, v_nb = imu_ops.predict_state(
                jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(kf.vel),
                pre, jnp.asarray(kf.bg), jnp.asarray(kf.ba),
            )
            R_nb = lie.np_normalize_rotation(np.asarray(R_nb))
            frame.R, frame.t = np_body_to_cam(
                R_nb, np.asarray(p_nb), cal.R_bc, cal.t_bc
            )
            frame.v_w = np.asarray(v_nb, np.float32)
            frame.bg = kf.bg.copy()
            frame.ba = kf.ba.copy()
            return
        if self.velocity is not None:
            Rv, tv = self.velocity
            # SO3 projection here is load-bearing: without it the velocity
            # feedback loop compounds float32 orthonormality error
            # geometrically (see lie.np_normalize_rotation)
            frame.R = lie.np_normalize_rotation(Rv @ self.last_frame.R)
            frame.t = (Rv @ self.last_frame.t + tv).astype(np.float32)
        else:
            frame.R = self.last_frame.R.copy()
            frame.t = self.last_frame.t.copy()

    def _project_points(self, R, t, pos, dmin=None, dmax=None, normal=None):
        """Host-side frustum check + pixel prediction (Frame::isInFrustum,
        /root/reference/src/Frame.cc:705). Returns (uv (M,2), visible (M,))."""
        Xc = pos @ R.T + t
        z = Xc[:, 2]
        ok = z > 0.05
        zs = np.where(ok, z, 1.0)
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        u = fx * Xc[:, 0] / zs + cx
        v = fy * Xc[:, 1] / zs + cy
        ok &= (u >= -20) & (u < cx * 2 + 20) & (v >= -20) & (v < cy * 2 + 20)
        if dmin is not None:
            C = -R.T @ t
            d = np.linalg.norm(pos - C, axis=-1)
            ok &= (d >= 0.8 * dmin) & (d <= 1.2 * dmax)
            if normal is not None:
                view = (pos - C) / np.maximum(d[:, None], 1e-9)
                ok &= np.sum(view * normal, axis=-1) > 0.5
        return np.stack([u, v], -1).astype(np.float32), ok

    def _pose_optimize(self, frame: Frame, visual_only: bool = False) -> int:
        bound = frame.mp_ids >= 0
        ids = np.where(bound, frame.mp_ids, 0)
        Xw = self.map.points.pos[ids]
        alive = self.map.points.alive[ids]
        valid = bound & frame.valid & alive
        is_stereo = valid & (frame.ur > 0)
        # per-octave information: sigma^2 scales with the detection level's
        # pyramid factor squared (Optimizer::PoseOptimization invSigma2,
        # /root/reference/src/Optimizer.cc:899-905)
        sigma2 = self.cfg.obs_sigma ** 2 * (
            self.cfg.scale_factor ** (2.0 * frame.octave.astype(np.float32))
        )
        inv_s2 = jnp.asarray((1.0 / sigma2).astype(np.float32))
        anchor = None if visual_only else self._imu_anchor()
        if anchor is not None:
            return self._pose_optimize_inertial(
                frame, anchor, jnp.asarray(Xw), inv_s2,
                jnp.asarray(is_stereo), jnp.asarray(valid),
            )
        res = pose_opt.pose_optimization(
            jnp.asarray(frame.R), jnp.asarray(frame.t),
            jnp.asarray(Xw), jnp.asarray(frame.kpts_un),
            jnp.asarray(frame.ur),
            inv_s2,
            jnp.asarray(is_stereo),
            jnp.asarray(valid),
            self.cam, jnp.float32(self.pipeline.bf),
        )
        res = jax.device_get(res)
        frame.R = lie.np_normalize_rotation(res.R)
        frame.t = np.asarray(res.t)
        frame.inlier = res.inliers
        # drop outlier bindings (reference clears mvpMapPoints for outliers)
        frame.mp_ids = np.where(frame.inlier, frame.mp_ids, -1)
        return int(res.num_inliers)

    def _pose_optimize_inertial(self, frame: Frame, anchor, Xw, inv_s2,
                                is_stereo, valid) -> int:
        """PoseInertialOptimization (/root/reference/src/Optimizer.cc:4491,
        4875): joint 15-D body state from reprojection edges plus an
        inertial edge. When the map has NOT changed since the previous frame
        solved, the LastFrame variant runs — the previous frame enters as a
        free state under its marginalized prior (ConstraintPoseImu) and is
        Schur-eliminated after, chaining posteriors frame to frame.
        Otherwise (map updated, no prior) the solve anchors to the last
        keyframe — the reference's mbMapUpdated switch (Tracking.cc:2948)."""
        from ..optim import inertial as in_opt

        kf, R_wb_i, p_wb_i = anchor
        cal = self.imu_calib
        R_wb_j, p_wb_j = np_cam_to_body(frame.R, frame.t, cal.R_bc, cal.t_bc)
        v_j = frame.v_w if frame.v_w is not None else kf.vel
        prior = getattr(self, "_frame_prior", None)
        use_prior = (
            prior is not None
            and frame.pre_last is not None
            and float(frame.pre_last.dt) > 0
            and self.map.change_index == prior[-1]
        )
        if use_prior:
            (Rp, pp, vp, bgp, bap, Lp, _chg) = prior
            res = in_opt.pose_inertial_optimization_last_frame(
                jnp.asarray(R_wb_j), jnp.asarray(p_wb_j), jnp.asarray(v_j),
                jnp.asarray(bgp), jnp.asarray(bap),
                jnp.asarray(Rp), jnp.asarray(pp), jnp.asarray(vp),
                jnp.asarray(bgp), jnp.asarray(bap), jnp.asarray(Lp),
                jax.tree_util.tree_map(jnp.asarray, frame.pre_last),
                Xw, jnp.asarray(frame.kpts_un), jnp.asarray(frame.ur),
                inv_s2, is_stereo, valid,
                self.cam, jnp.float32(self.pipeline.bf),
                jnp.asarray(cal.R_bc), jnp.asarray(cal.t_bc),
            )
        else:
            # re-linearize the accumulated preintegration at the anchor's
            # bias so the bias-walk edge measures drift from the KF's bias
            pre = imu_ops.relinearize(
                jax.tree_util.tree_map(jnp.asarray, self._pre_cur),
                jnp.asarray(kf.bg), jnp.asarray(kf.ba),
            )
            res = in_opt.pose_inertial_optimization(
                jnp.asarray(R_wb_j), jnp.asarray(p_wb_j), jnp.asarray(v_j),
                jnp.asarray(kf.bg), jnp.asarray(kf.ba),
                jnp.asarray(R_wb_i), jnp.asarray(p_wb_i), jnp.asarray(kf.vel),
                pre,
                Xw, jnp.asarray(frame.kpts_un), jnp.asarray(frame.ur),
                inv_s2, is_stereo, valid,
                self.cam, jnp.float32(self.pipeline.bf),
                jnp.asarray(cal.R_bc), jnp.asarray(cal.t_bc),
            )
        res = jax.device_get(res)
        R_wb = lie.np_normalize_rotation(res.R_wb)
        frame.R, frame.t = np_body_to_cam(
            R_wb, res.p_wb, cal.R_bc, cal.t_bc
        )
        frame.v_w = np.asarray(res.v_w, np.float32)
        frame.bg = np.asarray(res.bg, np.float32)
        frame.ba = np.asarray(res.ba, np.float32)
        frame.inlier = res.inliers
        frame.mp_ids = np.where(frame.inlier, frame.mp_ids, -1)
        # stash the solved posterior as the NEXT frame's marginalized prior
        # (promoted at frame end — a second solve within this frame must
        # still see the PREVIOUS frame's prior)
        H = np.asarray(res.H, np.float64)
        try:
            L = np.linalg.cholesky(
                0.5 * (H + H.T) + 1e-4 * np.eye(15)).astype(np.float32)
            self._prior_pending = (
                R_wb.copy(), np.asarray(res.p_wb, np.float32),
                frame.v_w.copy(), frame.bg.copy(), frame.ba.copy(), L,
                self.map.change_index,
            )
        except np.linalg.LinAlgError:
            self._prior_pending = None
        return int(res.num_inliers)

    def _match_against(self, frame: Frame, pos, desc, ids, valid_mp,
                       radius: float, keep_existing: bool,
                       mp_angle=None, radius_scale=None,
                       oct_lo=None, oct_hi=None) -> int:
        """Project map points, match into frame slots, bind mp_ids.

        radius_scale: optional (M,) per-point multiplier on `radius` (the
        reference scales the window by the predicted octave's pyramid
        factor, ORBmatcher.cc:92-105). oct_lo/oct_hi: optional (M,) octave
        windows gating candidate keypoints (ORBmatcher.cc:122-131)."""
        uv, vis = self._project_points(frame.R, frame.t, pos)
        valid_mp = valid_mp & vis
        kpt_free = frame.mp_ids < 0 if keep_existing else np.ones(
            len(frame.kpts_un), bool
        )
        r = jnp.float32(radius) if radius_scale is None else jnp.asarray(
            (radius * radius_scale).astype(np.float32)
        )
        oct_kw = {}
        if oct_lo is not None:
            oct_kw = dict(
                kpt_octave=jnp.asarray(frame.octave.astype(np.int32)),
                oct_lo=jnp.asarray(oct_lo.astype(np.int32)),
                oct_hi=jnp.asarray(oct_hi.astype(np.int32)),
            )
        res = matching.search_by_projection(
            jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(valid_mp),
            jnp.asarray(frame.kpts_un), jnp.asarray(frame.desc),
            jnp.asarray(frame.valid),
            radius=r,
            # TH_HIGH for both backends (reference projection search,
            # ORBmatcher.cc:196,1954). The earlier TH_LOW-only ORB gating
            # guarded against the generated pattern's wrong-match tail
            # creating secondary pose-cost minima; with the octave scale
            # gates + rotation-consistency filter now in this path the
            # regression no longer reproduces (A/B on the 40-frame
            # sequence: TH_HIGH max 0.21 cm vs TH_LOW 0.16 cm, all OK —
            # tools/learn_brief_pattern.py measurements, round 5)
            max_dist=jnp.float32(self.cfg.th_high), ratio=0.9,
            kpt_free=jnp.asarray(kpt_free), binary=self.cfg.binary,
            **oct_kw,
        )
        idx, mask = jax.device_get((res.idx, res.mask))
        if mp_angle is not None:
            mask = matching.rotation_consistency_filter(
                mp_angle, frame.angle, np.clip(idx, 0, None), mask
            )
        n = 0
        for m in np.nonzero(mask)[0]:
            slot = idx[m]
            if keep_existing and frame.mp_ids[slot] >= 0:
                continue
            frame.mp_ids[slot] = ids[m]
            n += 1
        return n

    def _inv_sigma2(self, frame: Frame):
        sigma2 = self.cfg.obs_sigma ** 2 * (
            self.cfg.scale_factor ** (2.0 * frame.octave.astype(np.float32))
        )
        return (1.0 / sigma2).astype(np.float32)

    def _fused_step(self, frame: Frame, pos, desc, valid_mp, mp_angle,
                    mp_octave, ids, radius, widen_below,
                    dmin=None, dmax=None, normal=None,
                    keep_existing=False, scale_gate=False) -> int:
        """Run the single-dispatch fused match+pose step
        (optim/track_step.py) and apply bindings/pose on the host. Returns
        pose-opt inlier count; also records the new-match count in
        self._last_n_matched.

        dmax feeds the predicted-scale gate even when the distance-band
        gate is off (band gating iff dmin is given)."""
        from ..optim import track_step

        M = len(pos)
        zeros_m = np.zeros(M, np.float32)
        if keep_existing:
            bound = frame.mp_ids >= 0
            safe = np.where(bound, frame.mp_ids, 0)
            prev_Xw = self.map.points.pos[safe].astype(np.float32)
            prev_valid = bound & self.map.points.alive[safe]
            kpt_free = ~bound
        else:
            prev_Xw = np.zeros((len(frame.kpts_un), 3), np.float32)
            prev_valid = np.zeros(len(frame.kpts_un), bool)
            kpt_free = np.ones(len(frame.kpts_un), bool)
        res = track_step.match_pose_step(
            jnp.asarray(frame.R), jnp.asarray(frame.t),
            jnp.asarray(pos.astype(np.float32)),
            jnp.asarray(desc.astype(np.float32) if not self.cfg.binary
                        else desc),
            jnp.asarray(valid_mp), jnp.asarray(mp_angle.astype(np.float32)),
            jnp.asarray(mp_octave.astype(np.int32)),
            jnp.asarray(zeros_m if dmin is None else dmin.astype(np.float32)),
            jnp.asarray(zeros_m + 1e9 if dmax is None else dmax.astype(np.float32)),
            jnp.asarray(np.zeros((M, 3), np.float32) if normal is None
                        else normal.astype(np.float32)),
            jnp.asarray(frame.kpts_un), jnp.asarray(frame.desc),
            jnp.asarray(frame.valid), jnp.asarray(frame.angle),
            jnp.asarray(frame.octave.astype(np.int32)),
            jnp.asarray(frame.ur), jnp.asarray(self._inv_sigma2(frame)),
            jnp.asarray(kpt_free),
            jnp.asarray(prev_Xw), jnp.asarray(prev_valid),
            self.cam, jnp.float32(self.pipeline.bf),
            jnp.float32(radius),
            jnp.float32(self.cfg.th_high),  # see _match_against TH_HIGH note
            jnp.float32(0.9), jnp.int32(widen_below),
            jnp.float32(self.cfg.scale_factor),
            jnp.float32(2.0 * float(self.cam.cx)),
            jnp.float32(2.0 * float(self.cam.cy)),
            binary=self.cfg.binary, scale_gate=scale_gate,
            band_gate=dmin is not None, n_levels=self.cfg.n_levels,
            widen=widen_below > 0,
        )
        res = jax.device_get(res)  # one batched transfer for all outputs
        slot_mp = res.slot_mp
        inlier = res.inlier
        new = slot_mp >= 0
        if keep_existing:
            new &= frame.mp_ids < 0
        frame.mp_ids = np.where(new, ids[np.clip(slot_mp, 0, None)],
                                frame.mp_ids)
        frame.R = lie.np_normalize_rotation(res.R)
        frame.t = np.asarray(res.t)
        frame.inlier = inlier
        frame.mp_ids = np.where(inlier, frame.mp_ids, -1)
        self._last_n_matched = int(res.n_matched)
        return int(res.n_inliers)

    def _track_frame_fused(self, frame: Frame) -> Optional[bool]:
        """Speculative single-dispatch frame tracking: TrackWithMotionModel
        AND TrackLocalMap in one XLA graph (optim/track_step.py
        two_stage_track_step). The local-map snapshot is voted from the
        LAST frame's bindings — consecutive frames share almost all of
        them, and any shortfall is caught by the acceptance gates below.

        Returns True on success, None to fall back to the split
        (two-dispatch) path — which re-derives everything, so the fused
        path can never change behavior, only save a device round trip.
        Disabled for inertial mode (its pose solve is visual-inertial) and
        localization mode (temporal VO candidates + per-frame reloc)."""
        from ..optim import track_step

        pend = getattr(frame, "_fused_pending", None)
        if pend is not None:
            # the whole-frame speculative grab (_grab_rgbd_fused) already
            # ran BOTH stages in the extraction dispatch — just gate+apply
            frame._fused_pending = None
            return self._apply_fused_two_stage(frame, *pend)
        last = self.last_frame
        if (self.imu_calib is not None or self.only_tracking
                or last is None or last.R is None):
            return None
        ids = self._local_map_points(last)
        if ids is None or len(ids) == 0:
            return None
        self._predict_pose(frame)
        bound = (last.mp_ids >= 0) & last.inlier
        safe1 = np.where(bound, last.mp_ids, 0)
        valid1 = bound & self.map.points.alive[safe1]
        ids1 = np.where(valid1, last.mp_ids, -1)
        pos, desc, valid2, padded_ids = self.map.point_snapshot(
            ids, LOCAL_MP_BUCKET)
        safe2 = np.clip(padded_ids, 0, None)
        r1, r2 = track_step.two_stage_track_step(
            jnp.asarray(frame.R), jnp.asarray(frame.t),
            jnp.asarray(self.map.points.pos[safe1]),
            jnp.asarray(self.map.points.desc[safe1]),
            jnp.asarray(valid1),
            jnp.asarray(self.map.points.angle[safe1]),
            jnp.asarray(last.octave.astype(np.int32)),
            jnp.asarray(ids1.astype(np.int32)),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid2),
            jnp.asarray(self.map.points.angle[safe2]),
            jnp.asarray(self.map.points.octave[safe2].astype(np.int32)),
            jnp.asarray(padded_ids.astype(np.int32)),
            jnp.asarray(self.map.points.dmax[safe2]),
            jnp.asarray(frame.kpts_un), jnp.asarray(frame.desc),
            jnp.asarray(frame.valid), jnp.asarray(frame.angle),
            jnp.asarray(frame.octave.astype(np.int32)),
            jnp.asarray(frame.ur), jnp.asarray(self._inv_sigma2(frame)),
            self.cam, jnp.float32(self.pipeline.bf),
            jnp.float32(self.cfg.motion_radius),
            jnp.float32(self.cfg.local_radius),
            jnp.float32(self.cfg.th_low if self.cfg.binary
                        else self.cfg.th_high),
            jnp.float32(0.9), jnp.int32(self.cfg.min_inliers_motion),
            jnp.float32(self.cfg.scale_factor),
            jnp.float32(2.0 * float(self.cam.cx)),
            jnp.float32(2.0 * float(self.cam.cy)),
            binary=self.cfg.binary, n_levels=self.cfg.n_levels,
        )
        r1, r2 = jax.device_get((r1, r2))
        return self._apply_fused_two_stage(frame, r1, r2, ids, ids1,
                                           padded_ids)

    def _apply_fused_two_stage(self, frame: Frame, r1, r2, ids, ids1,
                               padded_ids) -> Optional[bool]:
        """Gate + apply a fetched two-stage result (shared by the
        track-time fused path and the whole-frame speculative grab)."""
        # acceptance gates: exactly the split path's motion + local criteria
        if (int(r1.n_matched) < self.cfg.min_inliers_motion
                or int(r1.n_inliers) < 10
                or int(r2.n_inliers) < self.cfg.min_inliers_local):
            return None
        bound1 = (r1.slot_mp >= 0) & r1.inlier
        new2 = (r2.slot_mp >= 0) & ~bound1
        mp = np.where(
            new2, padded_ids[np.clip(r2.slot_mp, 0, None)],
            np.where(bound1, ids1[np.clip(r1.slot_mp, 0, None)], -1))
        frame.mp_ids = np.where(r2.inlier, mp, -1)
        frame.R = lie.np_normalize_rotation(r2.R)
        frame.t = np.asarray(r2.t)
        frame.inlier = r2.inlier
        # bookkeeping parity with the split path
        self._last_local_ids = np.asarray(ids)
        self.map.points.visible[ids[self.map.points.alive[ids]]] += 1
        found = frame.mp_ids[(frame.mp_ids >= 0) & frame.inlier]
        self.map.points.found[found] += 1
        self.matches_inliers = int(r2.n_inliers)
        self.stats["motion_ok"] += 1
        return True

    def _track_with_motion_model(self, frame: Frame) -> bool:
        """TrackWithMotionModel (/root/reference/src/Tracking.cc:2892):
        const-velocity predict, project last frame's points, widen x2 on
        failure, pose-optimize, require >=10 inlier map matches.

        Non-inertial: the whole step (project+match+rotation check+widen+
        pose LM) is ONE fused dispatch (optim/track_step.py). Inertial mode
        keeps the split path — its pose solve is the visual-inertial one."""
        if self.last_frame is None or self.last_frame.R is None:
            return False
        self._predict_pose(frame)
        last = self.last_frame
        if self.imu_calib is None:
            bound = (last.mp_ids >= 0) & last.inlier
            ids = np.where(bound, last.mp_ids, 0)
            valid_mp = bound & self.map.points.alive[ids]
            pos = self.map.points.pos[ids]
            desc_c = self.map.points.desc[ids]
            angle_c = self.map.points.angle[ids]
            if self.only_tracking:
                vo = self._vo_candidates(last, ~valid_mp)
                if vo is not None:
                    vo_mask, vo_pos = vo
                    pos = np.where(vo_mask[:, None], vo_pos, pos)
                    desc_c = np.where(vo_mask[:, None], last.desc, desc_c)
                    angle_c = np.where(vo_mask, last.angle, angle_c)
                    valid_mp = valid_mp | vo_mask
            frame.mp_ids = np.full_like(frame.mp_ids, -1)
            inl = self._fused_step(
                frame, pos, desc_c,
                valid_mp, angle_c, last.octave,
                np.where(bound, last.mp_ids, -1),
                radius=self.cfg.motion_radius,
                widen_below=self.cfg.min_inliers_motion,
            )
            if self.only_tracking:
                # mbVO: fewer than 10 of the inliers are real MAP points —
                # the solve is riding temporal depth points
                # (TrackWithMotionModel, Tracking.cc:2963-2970)
                self.vo_mode = int(
                    ((frame.mp_ids >= 0) & frame.inlier).sum()) < 10
            if self._last_n_matched < self.cfg.min_inliers_motion:
                return False
            return inl >= 10
        bound = (last.mp_ids >= 0) & last.inlier
        ids = last.mp_ids.copy()
        pos = self.map.points.pos[np.where(bound, ids, 0)]
        alive = self.map.points.alive[np.where(bound, ids, 0)]
        valid_mp = bound & alive
        desc = self.map.points.desc[np.where(bound, ids, 0)]

        frame.mp_ids[:] = -1
        mp_angle = self.map.points.angle[np.where(bound, ids, 0)]
        # scale gates from the LAST observation's octave (frame-to-frame
        # SearchByProjection, ORBmatcher.cc:1861-2030: radius scaled by the
        # last octave's factor; candidates within [oct-1, oct+1])
        oct_kw = {}
        if self.cfg.n_levels > 1:
            lo = last.octave.astype(np.int32)
            oct_kw = dict(
                radius_scale=self.cfg.scale_factor ** lo.astype(np.float32),
                oct_lo=lo - 1, oct_hi=lo + 1,
            )
        n = self._match_against(frame, pos, desc, ids, valid_mp,
                                self.cfg.motion_radius, keep_existing=False,
                                mp_angle=mp_angle, **oct_kw)
        if n < 20:
            frame.mp_ids[:] = -1
            n = self._match_against(frame, pos, desc, ids, valid_mp,
                                    self.cfg.motion_radius * 2,
                                    keep_existing=False, mp_angle=mp_angle,
                                    **oct_kw)
        if n < self.cfg.min_inliers_motion:
            return False
        inl = self._pose_optimize(frame)
        return inl >= 10

    def _vo_candidates(self, last: Frame, free: np.ndarray):
        """Visual-odometry temporal points for localization mode: last-frame
        slots with measured depth but no surviving map binding become
        one-shot 3D candidates, unprojected at the last pose — the
        reference's mlpTemporalPoints (UpdateLastFrame,
        /root/reference/src/Tracking.cc:2861-2890). They enter the
        motion-model candidate set with map id -1: they steer the pose
        solve off the mapped area but never bind into the map. Returns
        (slot mask, world positions) or None."""
        if last.R is None or self.sensor not in ("rgbd", "stereo"):
            return None
        vo_mask = (free & last.valid & (last.depth > 0)
                   & (last.depth < self.cfg.th_depth))
        if not vo_mask.any():
            return None
        z = last.depth
        x = (last.kpts_un[:, 0] - self.cam.cx) / self.cam.fx * z
        y = (last.kpts_un[:, 1] - self.cam.cy) / self.cam.fy * z
        Xc = np.stack([x, y, z], -1).astype(np.float32)
        Xw = (Xc - last.t) @ last.R  # R_cw^T (Xc - t_cw), row form
        return vo_mask, Xw.astype(np.float32)

    def _track_reference_keyframe(self, frame: Frame) -> bool:
        """TrackReferenceKeyFrame (/root/reference/src/Tracking.cc:2747):
        descriptor matching vs the reference KF (BoW in the reference; full
        matrix match here), pose starts from last frame's pose."""
        if self.ref_kf is None or self.ref_kf not in self.map.keyframes:
            return False
        kf = self.map.keyframes[self.ref_kf]
        frame.R = self.last_frame.R.copy()
        frame.t = self.last_frame.t.copy()
        bound = kf.mp_ids >= 0
        ids = np.where(bound, kf.mp_ids, 0)
        alive = self.map.points.alive[ids]
        valid_kf = bound & kf.valid & alive
        res = matching.match_general(
            jnp.asarray(kf.desc), jnp.asarray(valid_kf),
            jnp.asarray(frame.desc), jnp.asarray(frame.valid),
            max_dist=jnp.float32(self.cfg.refkf_max_dist), ratio=0.7,
            binary=self.cfg.binary,
        )
        idx, mask = jax.device_get((res.idx, res.mask))
        mask = matching.rotation_consistency_filter(
            kf.angle, frame.angle, np.clip(idx, 0, None), mask
        )
        if mask.sum() < 15:
            return False
        frame.mp_ids[:] = -1
        frame.mp_ids[idx[mask]] = kf.mp_ids[mask]
        inl = self._pose_optimize(frame)
        return inl >= 10

    def _local_map_points(self, frame: Frame):
        """UpdateLocalKeyFrames/Points (/root/reference/src/Tracking.cc:3505,
        3475): KFs sharing observations with the frame (+ best covisible
        neighbors), then the union of their map points."""
        votes = {}
        for mp in frame.mp_ids[frame.mp_ids >= 0]:
            for kid in self.map.obs.get(int(mp), {}):
                votes[kid] = votes.get(kid, 0) + 1
        if not votes:
            return None
        local_kfs = sorted(votes, key=votes.get, reverse=True)[:40]
        self.ref_kf = local_kfs[0]
        neighbors = []
        for kid in local_kfs[:10]:
            neighbors.extend(self.map.covisible_kfs(kid, 10))
        seen = set()
        mp_ids = []
        for kid in local_kfs + neighbors:
            kf = self.map.keyframes.get(kid)
            if kf is None or kid in seen:
                continue
            seen.add(kid)
            for mp in kf.mp_ids[kf.mp_ids >= 0]:
                mp = int(mp)
                if (mp + 10 ** 9) not in seen and self.map.points.alive[mp]:
                    seen.add(mp + 10 ** 9)  # avoid clash with kf ids
                    mp_ids.append(mp)
        # de-dup preserving order, cap to bucket
        uniq = list(dict.fromkeys(mp_ids))
        if len(uniq) > LOCAL_MP_BUCKET:
            from ..utils import verbose

            verbose.print_mess(
                f"local map snapshot cap hit: {LOCAL_MP_BUCKET} of "
                f"{len(uniq)} points", verbose.Level.VERBOSE)
            uniq = uniq[:LOCAL_MP_BUCKET]
        return np.asarray(uniq, np.int64)

    def _track_local_map(self, frame: Frame) -> bool:
        """TrackLocalMap (/root/reference/src/Tracking.cc:2987)."""
        ids = self._local_map_points(frame)
        if ids is None or len(ids) == 0:
            return False
        self._last_local_ids = np.asarray(ids)  # for creation-time dedup
        pos, desc, valid, padded_ids = self.map.point_snapshot(ids, LOCAL_MP_BUCKET)
        if self.imu_calib is None:
            # fused single-dispatch step: frustum/band/scale gates + match +
            # pose LM in one graph; existing bindings ride along as pose
            # edges (keep_existing)
            bound_set = set(frame.mp_ids[frame.mp_ids >= 0].tolist())
            fresh = np.array(
                [i >= 0 and int(i) not in bound_set for i in padded_ids], bool
            )
            self.map.points.visible[ids[self.map.points.alive[ids]]] += 1
            safe_ids = np.clip(padded_ids, 0, None)
            # NOTE: distance-band/viewing-angle gates (dmin/dmax/normal) are
            # intentionally not passed — parity with the validated split
            # path, which projects without bands (predicted-scale gates
            # below carry the scale discrimination)
            inl = self._fused_step(
                frame, pos, desc, valid & fresh,
                self.map.points.angle[safe_ids],
                self.map.points.octave[safe_ids], padded_ids,
                radius=self.cfg.local_radius, widen_below=0,
                dmax=self.map.points.dmax[safe_ids],
                keep_existing=True, scale_gate=True,
            )
            found = frame.mp_ids[(frame.mp_ids >= 0) & frame.inlier]
            self.map.points.found[found] += 1
            self.matches_inliers = inl
            return inl >= self.cfg.min_inliers_local
        # skip points already matched in the frame
        bound_set = set(frame.mp_ids[frame.mp_ids >= 0].tolist())
        fresh = np.array(
            [i >= 0 and int(i) not in bound_set for i in padded_ids], bool
        )
        self.map.points.visible[ids[self.map.points.alive[ids]]] += 1
        mp_angle = self.map.points.angle[np.clip(padded_ids, 0, None)]
        # predicted-scale gates (SearchByProjection vs local MPs,
        # ORBmatcher.cc:92-131: radius by PredictScale's pyramid factor,
        # candidate octave within [pred-1, pred])
        oct_kw = {}
        if self.cfg.n_levels > 1:
            safe_ids = np.clip(padded_ids, 0, None)
            C = -frame.R.T @ frame.t
            dist = np.linalg.norm(self.map.points.pos[safe_ids] - C, axis=-1)
            pred = self.map.predict_scale(safe_ids, dist)
            oct_kw = dict(
                radius_scale=self.cfg.scale_factor ** pred.astype(np.float32),
                oct_lo=pred - 1, oct_hi=pred,
            )
        self._match_against(frame, pos, desc, padded_ids, valid & fresh,
                            self.cfg.local_radius, keep_existing=True,
                            mp_angle=mp_angle, **oct_kw)
        inl = self._pose_optimize(frame)
        found = frame.mp_ids[(frame.mp_ids >= 0) & frame.inlier]
        self.map.points.found[found] += 1
        self.matches_inliers = inl
        return inl >= self.cfg.min_inliers_local

    def _log_relative_pose(self, frame: Frame):
        """Append one save-time-rebasable trajectory entry: the frame pose
        RELATIVE to its reference keyframe (mlRelativeFramePoses push,
        /root/reference/src/Tracking.cc:2327-2347). The absolute pose rides
        along as the fallback for frames whose reference chain is lost."""
        kf = self.map.keyframes.get(self.ref_kf)
        if kf is not None:
            R_rel = (frame.R @ kf.R.T).astype(np.float32)
            t_rel = (frame.t - R_rel @ kf.t).astype(np.float32)
            ref_kid = self.ref_kf
        else:
            R_rel = t_rel = None
            ref_kid = -1
        self.traj_rel.append(
            (frame.timestamp, self.state, self.map.map_id, ref_kid,
             R_rel, t_rel, frame.R.copy(), frame.t.copy())
        )

    def resolved_trajectory(self):
        """Re-base every logged frame onto the CURRENT pose of its reference
        keyframe — T_frame = T_rel * T_refKF — so loop corrections and GBA
        reach the saved trajectory (System::SaveTrajectoryTUM,
        /root/reference/src/System.cc:569-627)."""
        return resolve_trajectory(self.traj_rel, self.map, self.atlas)

    def _store_relative_pose(self, frame: Frame):
        """Remember T_frame_ref = Tcw_frame * Twc_refkf so the frame pose can
        be re-anchored after the backend moves keyframes (the reference keeps
        mlRelativeFramePoses and re-bases on map-change,
        /root/reference/src/Tracking.cc:1917-1923,2327-2347)."""
        kf = self.map.keyframes.get(self.ref_kf)
        if kf is None:
            self._rel_pose = None
            return
        R_rel = frame.R @ kf.R.T
        t_rel = frame.t - R_rel @ kf.t
        self._rel_pose = (self.ref_kf, R_rel.astype(np.float32),
                          t_rel.astype(np.float32))

    def reanchor_last_frame(self):
        """Re-base the last frame's pose onto its (possibly BA-moved)
        reference keyframe. Called by System after the backend runs — without
        this the next motion-model step matches against a map that moved
        underneath it."""
        if self.last_frame is None or getattr(self, "_rel_pose", None) is None:
            return
        kid, R_rel, t_rel = self._rel_pose
        kf = self.map.keyframes.get(kid)
        if kf is None:
            return
        self.last_frame.R = lie.np_normalize_rotation(R_rel @ kf.R)
        self.last_frame.t = (R_rel @ kf.t + t_rel).astype(np.float32)

    def apply_map_transform(self, s: float, R_wg: np.ndarray):
        """The backend rescaled/rotated the map (IMU initialization,
        Map::ApplyScaledRotation): transform the tracker's frame-local state
        the same way so the next motion step matches the moved map."""
        lf = self.last_frame
        if lf is not None and lf.R is not None:
            lf.R = lie.np_normalize_rotation(lf.R @ R_wg)
            lf.t = (s * lf.t).astype(np.float32)
            if lf.v_w is not None:
                lf.v_w = (s * (R_wg.T @ lf.v_w)).astype(np.float32)
        if getattr(self, "_rel_pose", None) is not None:
            kid, R_rel, t_rel = self._rel_pose
            self._rel_pose = (kid, R_rel, (s * t_rel).astype(np.float32))
        self.velocity = None  # scale changed; constant-velocity is stale
        self._frame_prior = None  # prior mean is in the pre-transform frame

    def _update_velocity(self, frame: Frame):
        lf = self.last_frame
        if lf is not None and lf.R is not None:
            R_lw, t_lw = lf.R, lf.t
            R_wl, t_wl = R_lw.T, -R_lw.T @ t_lw
            Rv = lie.np_normalize_rotation(frame.R @ R_wl)
            tv = frame.R @ t_wl + frame.t
            self.velocity = (Rv, tv.astype(np.float32))

    # -- keyframes -----------------------------------------------------------

    def _make_keyframe(self, frame: Frame) -> KeyFrame:
        kf = KeyFrame(
            kid=self.next_kf_id,
            frame_id=frame.fid,
            timestamp=frame.timestamp,
            kpts_un=frame.kpts_un.copy(),
            desc=frame.desc.copy(),
            valid=frame.valid.copy(),
            ur=frame.ur.copy(),
            depth=frame.depth.copy(),
            angle=frame.angle.copy(),
            octave=frame.octave.copy(),
            R=frame.R.copy(),
            t=frame.t.copy(),
            mp_ids=frame.mp_ids.copy(),
        )
        if self.imu_calib is not None:
            # inertial chain bookkeeping (CreateNewKeyFrame,
            # /root/reference/src/Tracking.cc:3254: mpImuPreintegratedFromLastKF
            # moves onto the KF; the tracker's accumulator restarts here)
            kf.prev_kf = self.last_kf_id if self.last_kf_id is not None else -1
            kf.pre_kf = self._pre_cur
            kf.vel = None if frame.v_w is None else frame.v_w.copy()
            bg, ba = self._current_bias()
            kf.bg = (frame.bg if frame.bg is not None else bg).copy()
            kf.ba = (frame.ba if frame.ba is not None else ba).copy()
            self._pre_from_kf = None
            self._pre_cur = None
        self.next_kf_id += 1
        self.last_kf_id = kf.kid
        self.map.add_keyframe(kf)
        self.new_keyframes.append(kf.kid)
        self.stats["kfs"] += 1
        return kf

    def _need_new_keyframe(self, frame: Frame) -> bool:
        """NeedNewKeyFrame RGB-D policy (/root/reference/src/Tracking.cc:3102):
        reference ratio + close-point pressure + max interval."""
        if self.ref_kf is None:
            return False
        ref = self.map.keyframes.get(self.ref_kf)
        if ref is None:
            return False
        # nRefMatches counts ref-KF points with >= minObs observations
        # (KeyFrame::TrackedMapPoints, minObs=3 once the map has >2 KFs —
        # Tracking.cc:3148-3152); counting all bound slots would defer KF
        # insertion until tracking has already degraded.
        min_obs = 3 if self.map.num_keyframes() > 2 else 2
        ratio = self.cfg.kf_ref_ratio if self.map.num_keyframes() >= 2 else 0.4
        if self.sensor == "mono" and self.map.num_keyframes() >= 2:
            # mono redundancy drops slowly — the reference demands a higher
            # ratio (thRefRatio=0.9, Tracking.cc:3180-3190; IMU_MONOCULAR
            # relaxes to 0.75 only above 350 local-map inliers)
            ratio = 0.75 if (self.imu_calib is not None
                             and self.matches_inliers > 350) else 0.9
        ref_mps = ref.mp_ids[ref.mp_ids >= 0]
        n_ref = int((self.map.points.n_obs[ref_mps] >= min_obs).sum()) if len(ref_mps) else 0
        tracked = (frame.mp_ids >= 0) & frame.inlier
        n_tracked = int(tracked.sum())
        close = frame.valid & (frame.depth > 0) & (frame.depth < self.cfg.th_depth)
        tracked_close = int((close & tracked).sum())
        untracked_close = int((close & ~tracked).sum())
        need_close = tracked_close < 100 and untracked_close > 70

        c1a = frame.fid >= self.last_kf_frame_id + self.cfg.max_frames_between_kf
        c1b = frame.fid >= self.last_kf_frame_id + 3  # mild throttle: sync mapping is always idle, and per-frame KF bursts ratchet pose error into the map
        c1c = n_tracked < n_ref * 0.25 or need_close
        c2 = (n_tracked < n_ref * ratio or need_close) and n_tracked > 15
        # c3: temporal condition for inertial modes — the preintegration
        # chain must stay dense regardless of visual redundancy (>=0.5 s
        # since the last KF, Tracking.cc:3206-3220)
        c3 = False
        if self.imu_calib is not None:
            last_kf = self.map.keyframes.get(self.last_kf_id)
            if last_kf is not None and frame.timestamp - last_kf.timestamp >= 0.5:
                c3 = True
        # c4: weakly-tracked mono-inertial frames anchor a KF immediately
        # (Tracking.cc:3222-3226)
        c4 = (self.imu_calib is not None and self.sensor == "mono"
              and 15 < n_tracked < 75)
        return ((c1a or c1b or c1c) and c2) or c3 or c4

    def _create_keyframe(self, frame: Frame):
        """CreateNewKeyFrame (/root/reference/src/Tracking.cc:3254): bind
        tracked points, then create new close map points from depth.

        Creation-time dedup: a slot whose pixel sits within ~2 px of an
        existing local-map point's projection spawns NO new landmark — at a
        slightly drifted pose a fresh depth point there would duplicate the
        existing one AND bake the drift into the map (the proven per-KF
        error ratchet; the reference avoids most of this via Fuse, but
        not creating the duplicate is cheaper and strictly safer)."""
        kf = self._make_keyframe(frame)
        ray = np.asarray(camera_ops.pinhole_unproject(self.cam, jnp.asarray(frame.kpts_un)))
        R_wc, t_wc = frame.R.T, -frame.R.T @ frame.t
        free = frame.valid & (frame.mp_ids < 0) & (frame.depth > 0)
        if self.cfg.th_far_points is not None:
            free &= frame.depth < self.cfg.th_far_points

        # project the last local-map snapshot; suppress creation near any
        # existing (even currently unmatched) landmark projection
        local_ids = getattr(self, "_last_local_ids", None)
        if local_ids is not None and len(local_ids):
            alive = self.map.points.alive[local_ids]
            pts = self.map.points.pos[local_ids[alive]]
            if len(pts):
                uv, vis = self._project_points(frame.R, frame.t, pts)
                uv = uv[vis]
                if len(uv):
                    d2 = (
                        (frame.kpts_un[:, None, 0] - uv[None, :, 0]) ** 2
                        + (frame.kpts_un[:, None, 1] - uv[None, :, 1]) ** 2
                    )
                    near = d2.min(axis=1) < self.cfg.create_dedup_px ** 2
                    free &= ~near

        depths = np.where(free, frame.depth, np.inf)
        order = np.argsort(depths)
        created = 0
        for slot in order:
            if not free[slot]:
                break
            d = frame.depth[slot]
            if d >= self.cfg.th_depth and created >= 100:
                break
            Xc = ray[slot] * d
            Xw = (R_wc @ Xc + t_wc).astype(np.float32)
            mp = self.map.create_point(Xw, frame.desc[slot], kf.kid,
                                       float(frame.angle[slot]),
                                       octave=int(frame.octave[slot]),
                                       dist_ref=float(np.linalg.norm(Xc)))
            self.map.add_observation(mp, kf.kid, int(slot), update_links=False)
            frame.mp_ids[slot] = mp
            kf.mp_ids[slot] = mp
            created += 1
        self.map.update_connections(kf.kid)
        self.ref_kf = kf.kid
        self.last_kf_frame_id = frame.fid

    # -- monocular initialization ---------------------------------------------

    def _initialize_mono(self, frame: Frame) -> bool:
        """MonocularInitialization + CreateInitialMapMonocular
        (/root/reference/src/Tracking.cc:2475,2553-2686): hold a reference
        frame, window-match against it, two-view H/F RANSAC reconstruction,
        spawn two keyframes + triangulated map points, normalize by median
        scene depth, refine with a global BA."""
        import jax

        from ..optim import local_ba as ba_mod
        from ..optim import two_view

        if frame.n_valid <= 100:
            self._mono_init_frame = None
            return False
        ref = getattr(self, "_mono_init_frame", None)
        if ref is None or ref.n_valid <= 100:
            self._mono_init_frame = frame
            return False

        res = matching.search_window(
            jnp.asarray(ref.kpts_un), jnp.asarray(ref.desc), jnp.asarray(ref.valid),
            jnp.asarray(frame.kpts_un), jnp.asarray(frame.desc), jnp.asarray(frame.valid),
            radius=100.0,
            max_dist=jnp.float32(self.cfg.th_low if self.cfg.binary
                                 else self.cfg.th_low * 6),
            ratio=0.9, binary=self.cfg.binary,
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        mask = matching.rotation_consistency_filter(
            ref.angle, frame.angle, np.clip(idx, 0, None), mask
        )
        if mask.sum() < 100:  # reference requires >=100 matches (Tracking.cc:2523)
            self._mono_init_frame = frame
            return False

        uv1 = np.where(mask[:, None], ref.kpts_un, 0).astype(np.float32)
        uv2 = np.where(mask[:, None], frame.kpts_un[np.clip(idx, 0, None)], 0).astype(np.float32)
        K = np.asarray(self.cam.K, np.float32)
        tv = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
            jnp.asarray(K), jax.random.PRNGKey(frame.fid),
        )
        if not bool(tv.success):
            return False

        good = np.asarray(tv.good) & mask
        X = np.asarray(tv.points)
        # median-depth normalization (CreateInitialMapMonocular :2653-2686)
        med_depth = float(np.median(X[good][:, 2]))
        if med_depth <= 0:
            return False
        X = X / med_depth
        R2 = np.asarray(tv.R)
        t2 = np.asarray(tv.t) / med_depth

        ref.R = np.eye(3, dtype=np.float32)
        ref.t = np.zeros(3, np.float32)
        frame.R = R2.astype(np.float32)
        frame.t = t2.astype(np.float32)

        kf1 = self._make_keyframe(ref)
        kf2 = self._make_keyframe(frame)
        if self.imu_calib is not None:
            # the chain starts at kf1; the kf1->kf2 edge is the current
            # frame's from-last-frame segment (ref IS the previous frame:
            # _mono_init_frame advances every round)
            kf1.pre_kf = None
            kf1.prev_kf = -1
            kf2.pre_kf = frame.pre_last
            kf2.prev_kf = kf1.kid
        for slot1 in np.nonzero(good)[0]:
            slot2 = int(idx[slot1])
            mp = self.map.create_point(
                X[slot1].astype(np.float32), ref.desc[slot1], kf1.kid,
                float(ref.angle[slot1]),
            )
            self.map.add_observation(mp, kf1.kid, int(slot1), update_links=False)
            self.map.add_observation(mp, kf2.kid, slot2, update_links=False)
            self.map.update_point(mp)
            frame.mp_ids[slot2] = mp
        self.map.update_connections(kf1.kid)
        self.map.update_connections(kf2.kid)
        frame.inlier = frame.mp_ids >= 0

        # global BA over the 2-KF map (GlobalBundleAdjustemnt(20), :2621)
        self._initial_gba(kf1, kf2)
        self.ref_kf = kf2.kid
        self.last_kf_frame_id = frame.fid
        self._mono_init_frame = None
        return True

    def _initial_gba(self, kf1, kf2):
        from ..optim import local_ba as ba_mod

        pt_ids = [int(m) for m in kf2.mp_ids[kf2.mp_ids >= 0]]
        if len(pt_ids) < 20:
            return
        P = 1024
        O = 2048
        if len(pt_ids) > P:
            from ..utils import verbose

            verbose.print_mess(
                f"mono-init GBA point cap hit: {P} of {len(pt_ids)} points",
                verbose.Level.VERBOSE)
        obs_cam, obs_pt, uv = [], [], []
        pt_index = {mp: i for i, mp in enumerate(pt_ids[:P])}
        for mp, i in pt_index.items():
            for kid, slot in self.map.obs.get(mp, {}).items():
                kf = self.map.keyframes[kid]
                obs_cam.append(0 if kid == kf1.kid else 1)
                obs_pt.append(i)
                uv.append(kf.kpts_un[slot])
        n_obs = len(obs_cam)

        def pad(a, n, fill=0, dtype=None):
            a = np.asarray(a, dtype)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        prob = ba_mod.BAProblem(
            R=jnp.asarray(np.stack([kf1.R, kf2.R] + [np.eye(3, dtype=np.float32)] * 2)),
            t=jnp.asarray(np.stack([kf1.t, kf2.t] + [np.zeros(3, np.float32)] * 2)),
            fixed=jnp.asarray([True, False, True, True]),
            cam_valid=jnp.asarray([True, True, False, False]),
            X=jnp.asarray(pad(self.map.points.pos[pt_ids[:P]], P)),
            p_valid=jnp.asarray(pad(np.ones(len(pt_index), bool), P, False)),
            obs_cam=jnp.asarray(pad(obs_cam, O, 0, np.int32)),
            obs_pt=jnp.asarray(pad(obs_pt, O, 0, np.int32)),
            uv=jnp.asarray(pad(uv, O, 0.0, np.float32)),
            ur=jnp.zeros(O, jnp.float32),
            stereo=jnp.zeros(O, bool),
            valid=jnp.asarray(pad(np.ones(n_obs, bool), O, False)),
            inv_sigma2=jnp.full(O, 1.0 / self.cfg.obs_sigma ** 2, jnp.float32),
        )
        res = ba_mod.bundle_adjust(prob, self.cam, jnp.float32(0.0),
                                   stage_iters=(10, 10))
        kf2.R = np.asarray(res.R[1])
        kf2.t = np.asarray(res.t[1])
        self.map.points.pos[pt_ids[:P]] = np.asarray(res.X[: len(pt_index)])

    # -- relocalization -------------------------------------------------------

    def _relocalization(self, frame: Frame) -> bool:
        """Relocalization (/root/reference/src/Tracking.cc:3657-3836):
        retrieval candidates -> descriptor matching vs candidate KF map
        points -> PnP RANSAC -> pose optimization -> accept with enough
        inliers. Searches the active map; with an Atlas, stored maps are
        tried too and tracking switches into the map that relocalizes."""
        import jax

        from ..optim import pnp

        maps = [self.map]
        if self.atlas is not None:
            maps = [self.atlas.active] + [
                m for m in self.atlas.all_maps() if m is not self.atlas.active
            ]
        if int(frame.valid.sum()) < 30:
            return False
        from .retrieval import aggregate_global_desc

        g = aggregate_global_desc(frame.desc, frame.valid)

        for m in maps:
            cands = []
            if self.retrieval is not None and m is self.map:
                # covisibility-group scoring with a relative cutoff
                # (DetectRelocalizationCandidates role,
                # /root/reference/src/KeyFrameDatabase.cc:733-857)
                cands = [k for k, _s in self.retrieval.query_grouped(
                    g, set(), covisibles=m.covisible_kfs, top_n=5,
                    min_score=0.3, map_id=m.map_id,
                )]
            if not cands:
                # fallback: brute-force cosine over the map's KFs
                kfs = list(m.keyframes.values())
                if not kfs:
                    continue
                sims = [(float(k.global_desc @ g), k.kid) for k in kfs]
                sims.sort(reverse=True)
                cands = [kid for _s, kid in sims[:3]]
            for kid in cands:
                kf = m.keyframes.get(kid)
                if kf is None:
                    continue
                bound = kf.mp_ids >= 0
                valid_kf = bound & kf.valid & m.points.alive[np.where(bound, kf.mp_ids, 0)]
                res = matching.match_general(
                    jnp.asarray(kf.desc), jnp.asarray(valid_kf),
                    jnp.asarray(frame.desc), jnp.asarray(frame.valid),
                    max_dist=jnp.float32(self.cfg.refkf_max_dist), ratio=0.75,
                    binary=self.cfg.binary,
                )
                idx = np.asarray(res.idx)
                mask = np.asarray(res.mask)
                mask = matching.rotation_consistency_filter(
                    kf.angle, frame.angle, np.clip(idx, 0, None), mask
                )
                if mask.sum() < 15:
                    continue
                mp_ids = np.where(mask, kf.mp_ids, 0)
                Xw = m.points.pos[mp_ids]
                uv = frame.kpts_un[np.clip(idx, 0, None)]
                pr = pnp.pnp_ransac(
                    jnp.asarray(np.where(mask[:, None], Xw, 0).astype(np.float32)),
                    jnp.asarray(np.where(mask[:, None], uv, 0).astype(np.float32)),
                    jnp.asarray(mask), self.cam,
                    jax.random.PRNGKey(frame.fid), min_inliers=12,
                )
                if not bool(pr.success):
                    continue
                frame.R = np.asarray(pr.R)
                frame.t = np.asarray(pr.t)
                frame.mp_ids[:] = -1
                keep = mask & np.asarray(pr.inliers)
                frame.mp_ids[idx[keep]] = kf.mp_ids[keep]
                if self.atlas is not None and m is not self.map:
                    self.atlas.change_map(m.map_id)
                    self.map = m
                # pure-visual optimization: the reference's Relocalization
                # runs PoseOptimization without inertial edges — the IMU
                # anchor is dead-reckoned from the LOST drift and would drag
                # the candidate pose back toward it (Tracking.cc:3721)
                inl = self._pose_optimize(frame, visual_only=True)
                # guided widening ladder (Tracking.cc:3747-3820): when the
                # first optimization is short of 50 inliers, re-search the
                # candidate's neighborhood by projection with a wide window
                # and re-optimize; a second narrow round runs when close
                if inl < 50:
                    added = self._reloc_widen(frame, m, kid, radius=10.0,
                                              dist_scale=2.0)
                    if added:
                        inl = self._pose_optimize(frame, visual_only=True)
                    if 30 <= inl < 50:
                        if self._reloc_widen(frame, m, kid, radius=3.0,
                                             dist_scale=1.28):
                            inl = self._pose_optimize(frame,
                                                      visual_only=True)
                if inl >= self.cfg.reloc_min_inliers:
                    self.ref_kf = kid
                    self.lost_since = None
                    return True
        return False

    def _reloc_widen(self, frame: Frame, m, kid: int, radius: float,
                     dist_scale: float) -> bool:
        """One guided re-search round of the relocalization ladder
        (ORBmatcher::SearchByProjection Frame-vs-KF form, used at
        Tracking.cc:3758,3791): project the candidate keyframe
        neighborhood's map points into the current pose estimate and bind
        matches into FREE keypoint slots. Returns True if anything bound."""
        import jax.numpy as jnp

        kf = m.keyframes.get(kid)
        if kf is None:
            return False
        mp_ids = [int(x) for x in kf.mp_ids[kf.mp_ids >= 0]]
        for ck in m.covisible_kfs(kid, 10):
            ckf = m.keyframes.get(ck)
            if ckf is not None:
                mp_ids.extend(int(x) for x in ckf.mp_ids[ckf.mp_ids >= 0])
        mp_ids = [mp for mp in dict.fromkeys(mp_ids) if m.points.alive[mp]]
        if len(mp_ids) > 2048:
            from ..utils import verbose

            verbose.print_mess(
                f"reloc widen cap hit: 2048 of {len(mp_ids)} candidates",
                verbose.Level.VERBOSE)
            mp_ids = mp_ids[:2048]
        if not mp_ids:
            return False
        pos = m.points.pos[mp_ids]
        Xc = pos @ frame.R.T + frame.t
        z = Xc[:, 2]
        vis = z > 0.05
        zs = np.where(vis, z, 1.0)
        u = float(self.cam.fx) * Xc[:, 0] / zs + float(self.cam.cx)
        v = float(self.cam.fy) * Xc[:, 1] / zs + float(self.cam.cy)
        uv = np.stack([u, v], -1).astype(np.float32)
        already = set(int(x) for x in frame.mp_ids[frame.mp_ids >= 0])
        cand_ok = vis & np.array([mp not in already for mp in mp_ids])
        # pad to the fixed bucket: every reloc attempt has a different
        # candidate count, and an unpadded call would recompile the jitted
        # matcher per unique M (tens of seconds each through the tunnel)
        M = len(mp_ids)
        uv = np.concatenate([uv, np.zeros((2048 - M, 2), np.float32)])
        desc_pad = np.zeros((2048, m.points.desc.shape[1]), np.float32)
        desc_pad[:M] = m.points.desc[mp_ids]
        cand_ok = np.concatenate([cand_ok, np.zeros(2048 - M, bool)])
        res = matching.search_by_projection(
            jnp.asarray(uv), jnp.asarray(desc_pad),
            jnp.asarray(cand_ok),
            jnp.asarray(frame.kpts_un), jnp.asarray(frame.desc),
            jnp.asarray(frame.valid),
            radius=jnp.float32(radius),
            max_dist=jnp.float32(self.cfg.th_low * dist_scale),
            ratio=0.9, kpt_free=jnp.asarray(frame.mp_ids < 0),
            binary=self.cfg.binary,
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        bound = False
        for i in np.nonzero(mask)[0]:
            slot = int(idx[i])
            if frame.mp_ids[slot] < 0:
                frame.mp_ids[slot] = mp_ids[i]
                bound = True
        return bound

    def _check_timestamp_jump(self, frame: Frame) -> bool:
        """Timestamp-anomaly handling (Tracking.cc:1845-1882): an
        older-than-previous timestamp always starts a new map; a gap >1 s in
        inertial mode resets the active map (pre-VIBA2) or freezes it and
        starts a new one (post-VIBA2). Returns True when the frame was
        consumed by a reset."""
        if self.state in (State.NO_IMAGES, State.NOT_INITIALIZED) or \
                self.last_frame is None or self.atlas is None:
            return False
        if self.last_frame.timestamp > frame.timestamp:
            self.imu_queue.clear()
            self._switch_to_new_map(reset_current=False)
            return True
        if (self.imu_calib is not None
                and frame.timestamp > self.last_frame.timestamp + 1.0):
            keep = self.map.imu_initialized and self.map.imu_ba2
            self._switch_to_new_map(reset_current=not keep)
            return True
        return False

    def _switch_to_new_map(self, reset_current: bool):
        """CreateMapInAtlas / ResetActiveMap (Tracking.cc:2298-2347)."""
        if reset_current:
            self.atlas.remove_map(self.map.map_id)
        self.map = self.atlas.create_new_map()
        self.state = State.NOT_INITIALIZED
        self.velocity = None
        self.ref_kf = None
        self._mono_init_frame = None
        self._frame_prior = None
        # inertial chain does not cross maps
        self._pre_from_kf = None
        self._pre_cur = None
        self.last_kf_id = None
        self.stats["map_resets"] = self.stats.get("map_resets", 0) + 1

    def _handle_lost_map(self, frame: Frame):
        """LOST with no reloc: small maps are reset, mature maps are frozen
        and a new one starts (Tracking.cc:2298-2316 + CreateMapInAtlas)."""
        if self.atlas is None:
            # keep trying reloc forever without an atlas
            if frame.R is None and self.last_frame is not None:
                frame.R = self.last_frame.R.copy()
                frame.t = self.last_frame.t.copy()
            return
        self._switch_to_new_map(reset_current=self.map.num_keyframes() < 10)
