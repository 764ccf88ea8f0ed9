"""Inertial optimizer tests on synthetic trajectories with consistent IMU.

Behavior targets: Optimizer::InertialOptimization (scale/gravity/bias,
/root/reference/src/Optimizer.cc:3042), PoseInertialOptimization*
(:4491,4875), LocalInertialBA (:2383)."""

import numpy as np
import jax
import jax.numpy as jnp

from xfeatslam_tpu.ops import imu, lie
from xfeatslam_tpu.ops.camera import Pinhole
from xfeatslam_tpu.optim import inertial
from xfeatslam_tpu.utils.synthetic import make_imu_trajectory

CAM = Pinhole.from_list([517.3, 516.5, 318.6, 255.3])
I3 = np.eye(3, dtype=np.float32)


def preintegrate_segments(traj, bg=None, ba=None):
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba)
    pres = []
    for seg in traj["imu"]:
        n = len(seg["acc"])
        pres.append(imu.preintegrate(
            jnp.asarray(seg["acc"]), jnp.asarray(seg["gyro"]),
            jnp.asarray(seg["dts"]), jnp.ones(n, bool), bg, ba,
            noise_gyro=1e-3, noise_acc=1e-2,
        ))
    return pres


def stack_pres(pres):
    f = lambda name: jnp.stack([getattr(p, name) for p in pres])
    return dict(dts=f("dt"), dR=f("dR"), dV=f("dV"), dP=f("dP"),
                JRg=f("JRg"), JVg=f("JVg"), JVa=f("JVa"), JPg=f("JPg"),
                JPa=f("JPa"), cov9=jnp.stack([p.cov[:9, :9] for p in pres]),
                walk_cov=jnp.stack([p.cov[9:, 9:] for p in pres]))


class TestInertialInit:
    def test_recovers_scale_gravity_velocity(self):
        """Mono-inertial init: visual poses are UNSCALED (x 1/s) and the
        world gravity is tilted; the optimizer must find s, g-dir, v."""
        traj = make_imu_trajectory(n_kf=16)
        pres = preintegrate_segments(traj)
        s_true = 2.5
        p_vis = traj["p_wb"] / s_true  # visual map scale ambiguity
        st = stack_pres(pres)
        res = inertial.inertial_init(
            jnp.asarray(traj["R_wb"]), jnp.asarray(p_vis),
            st["dts"], st["dR"], st["dV"], st["dP"],
            st["JRg"], st["JVg"], st["JVa"], st["JPg"], st["JPa"],
            st["cov9"], jnp.ones(15, bool),
        )
        assert abs(float(res.scale) - s_true) / s_true < 0.02, float(res.scale)
        g_est = np.asarray(res.R_wg) @ np.array([0, 0, -9.81])
        cos = g_est @ traj["g_w"] / (np.linalg.norm(g_est) * 9.81)
        assert cos > 0.999, (g_est, traj["g_w"])
        v_err = np.linalg.norm(np.asarray(res.vel) - traj["v_w"], axis=-1)
        assert v_err.max() < 0.05, v_err

    def test_recovers_biases(self):
        bg_t = np.array([0.02, -0.015, 0.01], np.float32)
        ba_t = np.array([0.05, 0.08, -0.06], np.float32)
        traj = make_imu_trajectory(n_kf=16, bg=bg_t, ba=ba_t)
        pres = preintegrate_segments(traj)  # linearized at zero bias
        st = stack_pres(pres)
        res = inertial.inertial_init(
            jnp.asarray(traj["R_wb"]), jnp.asarray(traj["p_wb"]),
            st["dts"], st["dR"], st["dV"], st["dP"],
            st["JRg"], st["JVg"], st["JVa"], st["JPg"], st["JPa"],
            st["cov9"], jnp.ones(15, bool),
            prior_a=1e2, fix_scale=True,
        )
        np.testing.assert_allclose(np.asarray(res.bg), bg_t, atol=3e-3)
        np.testing.assert_allclose(np.asarray(res.ba), ba_t, atol=3e-2)


def _visual_edges(rng, R_wb, p_wb, n=200, noise=0.3):
    """Random landmarks projected into the camera at the given body state."""
    R_cw, t_cw = inertial.body_to_cam(
        jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(I3), jnp.zeros(3))
    R_cw, t_cw = np.asarray(R_cw), np.asarray(t_cw)
    C = -R_cw.T @ t_cw
    # points 2-6 m in front of the camera
    dirs = rng.standard_normal((n, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    depth = rng.uniform(2.0, 6.0, n)[:, None]
    Xc = dirs * depth
    Xw = Xc @ R_cw + C  # R_cw^T @ Xc + C
    uv = np.stack([
        517.3 * Xc[:, 0] / Xc[:, 2] + 318.6,
        516.5 * Xc[:, 1] / Xc[:, 2] + 255.3,
    ], -1) + noise * rng.standard_normal((n, 2))
    return Xw.astype(np.float32), uv.astype(np.float32)


class TestPoseInertial:
    def test_tracks_frame_with_imu_and_vision(self, rng):
        traj = make_imu_trajectory(n_kf=3)
        pres = preintegrate_segments(traj)
        k = 1  # anchor = KF1, current = KF2
        pre = imu.merge_previous(pres[0], pres[1]) if False else pres[k]
        Xw, uv = _visual_edges(rng, traj["R_wb"][k + 1], traj["p_wb"][k + 1])
        n = len(Xw)
        # initial guess: IMU-predicted state (exact dynamics, so perturb)
        Rp, pp, vp = imu.predict_state(
            jnp.asarray(traj["R_wb"][k]), jnp.asarray(traj["p_wb"][k]),
            jnp.asarray(traj["v_w"][k]), pre,
            gravity=jnp.asarray(traj["g_w"]))
        res = inertial.pose_inertial_optimization(
            Rp, pp + jnp.asarray([0.05, -0.03, 0.04]), vp,
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(traj["R_wb"][k]), jnp.asarray(traj["p_wb"][k]),
            jnp.asarray(traj["v_w"][k]), pre,
            jnp.asarray(Xw), jnp.asarray(uv), jnp.zeros(n),
            jnp.ones(n), jnp.zeros(n, bool), jnp.ones(n, bool),
            CAM, jnp.float32(0.0), jnp.asarray(I3), jnp.zeros(3),
            gravity=jnp.asarray(traj["g_w"]),
        )
        p_err = np.linalg.norm(np.asarray(res.p_wb) - traj["p_wb"][k + 1])
        v_err = np.linalg.norm(np.asarray(res.v_w) - traj["v_w"][k + 1])
        assert p_err < 0.01, p_err
        assert v_err < 0.1, v_err
        assert int(res.num_inliers) > 150


class TestFramePriorChaining:
    def test_prior_chain_beats_kf_anchored_on_long_gap(self, rng):
        """PoseInertialOptimizationLastFrame + ConstraintPoseImu
        (/root/reference/src/Optimizer.cc:4875, G2oTypes.h:706), VERDICT
        round-2 Missing #4: across a 2-s keyframe-less stretch with noisy
        IMU and weak per-frame vision, chaining marginalized posteriors
        frame-to-frame must beat re-anchoring every frame to the old KF
        through one long re-integrated edge."""
        n = 9  # KF at state 0, frames at states 1..8 (2 s at 0.25 s)
        traj = make_imu_trajectory(n_kf=n, seed=3,
                                   noise_gyro=0.004, noise_acc=0.06)
        pres = preintegrate_segments(traj)

        def frame_obs(k, n_pts=20, noise=1.0):
            Xw, uv = _visual_edges(rng, traj["R_wb"][k], traj["p_wb"][k],
                                   n=n_pts, noise=noise)
            m = len(Xw)
            return (jnp.asarray(Xw), jnp.asarray(uv), jnp.zeros(m),
                    jnp.ones(m), jnp.zeros(m, bool), jnp.ones(m, bool))

        obs = [frame_obs(k) for k in range(1, n)]
        g = jnp.asarray(traj["g_w"])
        common = dict(cam=CAM, bf=jnp.float32(0.0), R_bc=jnp.asarray(I3),
                      t_bc=jnp.zeros(3), gravity=g)
        R0 = jnp.asarray(traj["R_wb"][0])
        p0 = jnp.asarray(traj["p_wb"][0])
        v0 = jnp.asarray(traj["v_w"][0])

        # (a) KF-anchored: every frame re-integrates from state 0
        errs_kf = []
        pre_acc = pres[0]
        state = None
        for k in range(1, n):
            Rp, pp, vp = imu.predict_state(R0, p0, v0, pre_acc,
                                           gravity=g)
            Xw, uv, ur, s2, st, va = obs[k - 1]
            res = inertial.pose_inertial_optimization(
                Rp, pp, vp, jnp.zeros(3), jnp.zeros(3),
                R0, p0, v0, pre_acc, Xw, uv, ur, s2, st, va, **common)
            errs_kf.append(float(np.linalg.norm(
                np.asarray(res.p_wb) - traj["p_wb"][k])))
            if k < n - 1:
                pre_acc = imu.merge_previous(pre_acc, pres[k])

        # (b) frame-prior chain: first frame KF-anchored (builds the prior),
        # then the LastFrame variant with one segment per step
        errs_chain = []
        Xw, uv, ur, s2, st, va = obs[0]
        Rp, pp, vp = imu.predict_state(R0, p0, v0, pres[0], gravity=g)
        res = inertial.pose_inertial_optimization(
            Rp, pp, vp, jnp.zeros(3), jnp.zeros(3),
            R0, p0, v0, pres[0], Xw, uv, ur, s2, st, va, **common)
        errs_chain.append(float(np.linalg.norm(
            np.asarray(res.p_wb) - traj["p_wb"][1])))
        H = np.asarray(res.H, np.float64)
        L = np.linalg.cholesky(0.5 * (H + H.T) + 1e-4 * np.eye(15))
        Ri, pi, vi = res.R_wb, res.p_wb, res.v_w
        bgi, bai = res.bg, res.ba
        for k in range(2, n):
            Rp, pp, vp = imu.predict_state(Ri, pi, vi, pres[k - 1],
                                           gravity=g)
            Xw, uv, ur, s2, st, va = obs[k - 1]
            res = inertial.pose_inertial_optimization_last_frame(
                Rp, pp, vp, bgi, bai,
                Ri, pi, vi, bgi, bai, jnp.asarray(L.astype(np.float32)),
                pres[k - 1], Xw, uv, ur, s2, st, va, **common)
            errs_chain.append(float(np.linalg.norm(
                np.asarray(res.p_wb) - traj["p_wb"][k])))
            H = np.asarray(res.H, np.float64)
            L = np.linalg.cholesky(0.5 * (H + H.T) + 1e-4 * np.eye(15))
            Ri, pi, vi = res.R_wb, res.p_wb, res.v_w
            bgi, bai = res.bg, res.ba

        tail_kf = float(np.mean(errs_kf[-3:]))
        tail_chain = float(np.mean(errs_chain[-3:]))
        assert tail_chain < tail_kf, (errs_chain, errs_kf)


class TestFullInertialBA:
    def test_whole_chain_beats_windowed(self, rng):
        """FullInertialBA (/root/reference/src/Optimizer.cc:392-737) frees
        EVERY chain keyframe. VERDICT round-2 Missing #3: on a 40-KF
        mono-inertial chain with a uniform visual scale error, the
        whole-chain solve must pull the OLD section onto the IMU, while the
        16-KF-windowed variant provably freezes its scale error."""
        from xfeatslam_tpu.ops.imu import ImuCalib, Preintegrated
        from xfeatslam_tpu.slam.local_mapping import (
            IBA_MAX_KFS_TOTAL, LocalMapping)
        from xfeatslam_tpu.slam.map import KeyFrame, SlamMap

        n_kf = 40
        # map-aligned gravity: the VIBA chain edges assume (0,0,-9.81)
        traj = make_imu_trajectory(n_kf=n_kf, g_dir=np.array([0, 0, -1.0]))
        pres = preintegrate_segments(traj)
        # residual scale error after the InertialOptimization scale/gravity
        # fit (FIBA's production input is the percent-level remainder, not
        # the raw mono ambiguity)
        s = 1.02

        # landmark banks shared by consecutive keyframes (visual edges tie
        # neighbors together; projections are scale-invariant so the scaled
        # map is visually self-consistent and only the IMU disagrees)
        banks = []
        for k in range(n_kf - 1):
            Xg, _uv = _visual_edges(rng, traj["R_wb"][k], traj["p_wb"][k],
                                    n=60, noise=0.0)
            banks.append(Xg)

        def project(Xw, R_wb, p_wb):
            R_cw, t_cw = inertial.np_body_to_cam(R_wb, p_wb, I3,
                                                 np.zeros(3, np.float32))
            Xc = Xw @ R_cw.T + t_cw
            z = np.maximum(Xc[:, 2], 1e-6)
            return np.stack([517.3 * Xc[:, 0] / z + 318.6,
                             516.5 * Xc[:, 1] / z + 255.3], -1), Xc[:, 2] > 0.2

        def build_map():
            m = SlamMap(desc_dim=64)
            m.imu_initialized = True
            K_slots = 128
            mp_of = {}  # (bank, j) -> mp id
            for k in range(n_kf):
                # this KF observes bank k-1 and bank k
                obs_uv, obs_key = [], []
                for b in ([k - 1] if k > 0 else []) + ([k] if k < n_kf - 1 else []):
                    uv, vis = project(banks[b], traj["R_wb"][k],
                                      traj["p_wb"][k])
                    for j in np.nonzero(vis)[0]:
                        if len(obs_uv) >= K_slots:
                            break
                        obs_uv.append(uv[j])
                        obs_key.append((b, int(j)))
                kpts = np.zeros((K_slots, 2), np.float32)
                valid = np.zeros(K_slots, bool)
                kpts[: len(obs_uv)] = np.asarray(obs_uv, np.float32)
                valid[: len(obs_uv)] = True
                R_cw, t_cw = inertial.np_body_to_cam(
                    traj["R_wb"][k], (s * traj["p_wb"][k]).astype(np.float32),
                    I3, np.zeros(3, np.float32))
                kf = KeyFrame(
                    kid=k, frame_id=k, timestamp=float(traj["t_kf"][k]),
                    kpts_un=kpts,
                    desc=np.zeros((K_slots, 64), np.float32),
                    valid=valid,
                    ur=np.full(K_slots, -1.0, np.float32),
                    depth=np.zeros(K_slots, np.float32),
                    R=R_cw, t=t_cw,
                )
                kf.prev_kf = k - 1
                if k > 0:
                    kf.pre_kf = Preintegrated(
                        *[np.asarray(f) for f in pres[k - 1]])
                kf.vel = (s * traj["v_w"][k]).astype(np.float32)
                m.keyframes[k] = kf
                m.covis.setdefault(k, {})
                if m.kf_origin is None:
                    m.kf_origin = k
                for slot, key in enumerate(obs_key):
                    if key not in mp_of:
                        Xvis = (s * banks[key[0]][key[1]]).astype(np.float32)
                        mp_of[key] = m.create_point(
                            Xvis, np.zeros(64, np.float32), k)
                    m.add_observation(mp_of[key], k, slot, update_links=False)
                m.update_connections(k)
            return m

        calib = ImuCalib(noise_gyro=1e-3, noise_acc=1e-2, walk_gyro=1e-6,
                         walk_acc=1e-5, R_bc=I3, t_bc=np.zeros(3, np.float32))

        def max_err(m, kids):
            """Max old-section position error after rigid SE3 alignment of
            the WHOLE chain to ground truth — the solve has a free global
            translation/yaw gauge (LM damping pins it arbitrarily); scale
            error is what must not survive. R_bc=I: center == body pos."""
            est = np.stack([m.keyframes[k].center() for k in range(n_kf)])
            gtp = traj["p_wb"][:n_kf]
            mu_e, mu_g = est.mean(0), gtp.mean(0)
            U, _S, Vt = np.linalg.svd((gtp - mu_g).T @ (est - mu_e))
            D = np.eye(3)
            if np.linalg.det(U @ Vt) < 0:
                D[2, 2] = -1
            R = U @ D @ Vt
            al = (est - mu_e) @ R.T + mu_g
            return max(np.linalg.norm(al[k] - gtp[k]) for k in kids)

        old = range(0, n_kf - IBA_MAX_KFS_TOTAL)
        m_full = build_map()
        lm = LocalMapping(m_full, CAM, bf=0.0, imu_calib=calib, mono=True)
        lm._local_inertial_ba(n_kf - 1, fix_anchor=False, full_chain=True)
        m_win = build_map()
        lm2 = LocalMapping(m_win, CAM, bf=0.0, imu_calib=calib, mono=True)
        lm2._local_inertial_ba(n_kf - 1, window=IBA_MAX_KFS_TOTAL,
                               fix_anchor=False)
        err0 = (s - 1.0) * np.abs(traj["p_wb"][: n_kf - 16]).max()
        full_old = max_err(m_full, old)
        win_old = max_err(m_win, old)
        # windowed: the old section never entered the solve — scale error
        # frozen; whole-chain: pulled metric
        assert win_old > 0.5 * err0, (win_old, err0)
        assert full_old < 0.4 * win_old, (full_old, win_old)


class TestMergeInertialBA:
    """MergeInertialBA (/root/reference/src/Optimizer.cc:3948): two temporal
    windows around a map weld — Nd=6 back from the current KF, Nd/2 before
    the merge KF extended with next-KFs — all free, one fixed anchor per
    window, coupled through shared welding-region landmarks."""

    def _dummy_kf(self, kid, prev):
        from xfeatslam_tpu.slam.map import KeyFrame

        z4 = np.zeros(4, np.float32)
        kf = KeyFrame(
            kid=kid, frame_id=kid, timestamp=float(kid),
            kpts_un=np.zeros((4, 2), np.float32),
            desc=np.zeros((4, 64), np.float32),
            valid=np.zeros(4, bool), ur=z4 - 1.0, depth=z4,
            R=I3.copy(), t=np.zeros(3, np.float32),
        )
        kf.prev_kf = prev
        return kf

    def test_window_structure(self):
        """The free chain must be [Nd/2 window at the merge KF + forward
        extension] + [Nd window at the current KF], with the predecessor of
        each window fixed (Optimizer.cc:3962-4034)."""
        from xfeatslam_tpu.ops.imu import ImuCalib
        from xfeatslam_tpu.slam.local_mapping import LocalMapping
        from xfeatslam_tpu.slam.map import SlamMap

        calib = ImuCalib(noise_gyro=1e-3, noise_acc=1e-2, walk_gyro=1e-6,
                         walk_acc=1e-5, R_bc=I3, t_bc=np.zeros(3, np.float32))
        m = SlamMap(desc_dim=64)
        # old-map chain 0..7, moved-map chain 8..19 (disjoint after a weld)
        for k in range(8):
            m.keyframes[k] = self._dummy_kf(k, k - 1)
        for k in range(8, 20):
            m.keyframes[k] = self._dummy_kf(k, -1 if k == 8 else k - 1)
        lm = LocalMapping(m, CAM, bf=0.0, imu_calib=calib, mono=True)
        calls = []
        lm._local_inertial_ba = lambda kid, **kw: calls.append((kid, kw))

        lm.merge_inertial_ba(19, 7)
        (kid, kw), = calls
        assert kid == 19
        assert kw["chain_override"] == [5, 6, 7, 14, 15, 16, 17, 18, 19]
        assert kw["force_fixed"] == [4, 13]
        assert kw["fix_anchor"] is False

        # merge KF mid-chain: the merge window extends forward with
        # next-KFs (pMergeKF->mNextKF walk, Optimizer.cc:4017-4033)
        calls.clear()
        lm.merge_inertial_ba(19, 4)
        (kid, kw), = calls
        assert kw["chain_override"] == [2, 3, 4, 5, 6, 7,
                                        14, 15, 16, 17, 18, 19]
        assert kw["force_fixed"] == [1, 13]

        # chain with no predecessor: the oldest state is demoted to a
        # fixed pose anchor (Optimizer.cc:4010-4014)
        calls.clear()
        lm.merge_inertial_ba(13, 2)
        (kid, kw), = calls
        assert kw["chain_override"] == [1, 2, 3, 4, 5, 9, 10, 11, 12, 13]
        assert kw["force_fixed"] == [0, 8]

    def test_weld_refinement(self, rng):
        """Functional: a welded 13-KF scene whose moved-side states carry a
        residual gravity-consistent misalignment (yaw + translation — what
        survives the Sim3 weld). The two-window solve must pull the moved
        side back onto the welding-region landmarks through the fixed
        anchor + IMU edges."""
        from xfeatslam_tpu.ops.imu import ImuCalib, Preintegrated
        from xfeatslam_tpu.slam.local_mapping import LocalMapping
        from xfeatslam_tpu.slam.map import KeyFrame, SlamMap

        n_kf = 13
        split = 6  # KFs 0..5 = old map; 6..12 = moved map (chain cut at 6)
        traj = make_imu_trajectory(n_kf=n_kf, g_dir=np.array([0, 0, -1.0]))
        pres = preintegrate_segments(traj)

        banks = []
        for k in range(n_kf - 1):
            Xg, _uv = _visual_edges(rng, traj["R_wb"][k], traj["p_wb"][k],
                                    n=60, noise=0.0)
            banks.append(Xg)

        def project(Xw, R_wb, p_wb):
            R_cw, t_cw = inertial.np_body_to_cam(R_wb, p_wb, I3,
                                                 np.zeros(3, np.float32))
            Xc = Xw @ R_cw.T + t_cw
            z = np.maximum(Xc[:, 2], 1e-6)
            return np.stack([517.3 * Xc[:, 0] / z + 318.6,
                             516.5 * Xc[:, 1] / z + 255.3], -1), Xc[:, 2] > 0.2

        # residual weld error: 3 deg yaw (gravity-invariant) + 8 cm, on
        # the moved FREE states (7..12); anchor 6 holds the welded frame
        yaw = np.deg2rad(3.0)
        cz, sz = np.cos(yaw), np.sin(yaw)
        R_off = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
        t_off = np.array([0.08, -0.05, 0.03], np.float32)
        c0 = traj["p_wb"][7].astype(np.float32)

        def perturbed(k):
            if k < 7:
                return (traj["R_wb"][k].astype(np.float32),
                        traj["p_wb"][k].astype(np.float32),
                        traj["v_w"][k].astype(np.float32))
            R = (R_off @ traj["R_wb"][k]).astype(np.float32)
            p = (R_off @ (traj["p_wb"][k] - c0) + c0 + t_off).astype(
                np.float32)
            v = (R_off @ traj["v_w"][k]).astype(np.float32)
            return R, p, v

        m = SlamMap(desc_dim=64)
        m.imu_initialized = True
        K_slots = 128
        mp_of = {}
        for k in range(n_kf):
            obs_uv, obs_key = [], []
            for b in ([k - 1] if k > 0 else []) + (
                    [k] if k < n_kf - 1 else []):
                uv, vis = project(banks[b], traj["R_wb"][k],
                                  traj["p_wb"][k])
                for j in np.nonzero(vis)[0]:
                    if len(obs_uv) >= K_slots:
                        break
                    obs_uv.append(uv[j])
                    obs_key.append((b, int(j)))
            kpts = np.zeros((K_slots, 2), np.float32)
            valid = np.zeros(K_slots, bool)
            kpts[: len(obs_uv)] = np.asarray(obs_uv, np.float32)
            valid[: len(obs_uv)] = True
            R_wb, p_wb, v_w = perturbed(k)
            R_cw, t_cw = inertial.np_body_to_cam(R_wb, p_wb, I3,
                                                 np.zeros(3, np.float32))
            kf = KeyFrame(
                kid=k, frame_id=k, timestamp=float(traj["t_kf"][k]),
                kpts_un=kpts, desc=np.zeros((K_slots, 64), np.float32),
                valid=valid, ur=np.full(K_slots, -1.0, np.float32),
                depth=np.zeros(K_slots, np.float32), R=R_cw, t=t_cw,
            )
            kf.prev_kf = -1 if k in (0, split) else k - 1
            if k not in (0, split):
                kf.pre_kf = Preintegrated(
                    *[np.asarray(f) for f in pres[k - 1]])
            kf.vel = v_w
            m.keyframes[k] = kf
            m.covis.setdefault(k, {})
            if m.kf_origin is None:
                m.kf_origin = k
            for slot, key in enumerate(obs_key):
                if key not in mp_of:
                    mp_of[key] = m.create_point(
                        banks[key[0]][key[1]].astype(np.float32),
                        np.zeros(64, np.float32), k)
                m.add_observation(mp_of[key], k, slot, update_links=False)
            m.update_connections(k)

        calib = ImuCalib(noise_gyro=1e-3, noise_acc=1e-2, walk_gyro=1e-6,
                         walk_acc=1e-5, R_bc=I3, t_bc=np.zeros(3, np.float32))
        lm = LocalMapping(m, CAM, bf=0.0, imu_calib=calib, mono=True)

        moved = range(7, n_kf)
        err0 = max(np.linalg.norm(m.keyframes[k].center() - traj["p_wb"][k])
                   for k in moved)
        lm.merge_inertial_ba(n_kf - 1, split - 1)
        err1 = max(np.linalg.norm(m.keyframes[k].center() - traj["p_wb"][k])
                   for k in moved)
        assert err0 > 0.05  # the perturbation was real
        assert err1 < 0.5 * err0, (err0, err1)


class TestLocalInertialBA:
    def test_improves_perturbed_window(self, rng):
        traj = make_imu_trajectory(n_kf=6)
        pres = preintegrate_segments(traj)
        st = stack_pres(pres)
        K = 6
        # perturb all but the anchor
        p0 = traj["p_wb"].copy()
        p_pert = p0 + np.where(
            np.arange(K)[:, None] > 0,
            0.04 * rng.standard_normal((K, 3)).astype(np.float32), 0)
        v_pert = traj["v_w"] + np.where(
            np.arange(K)[:, None] > 0,
            0.1 * rng.standard_normal((K, 3)).astype(np.float32), 0)
        # visual edges for each KF
        obs_cam, Xw, uv = [], [], []
        for k in range(K):
            Xk, uvk = _visual_edges(rng, traj["R_wb"][k], traj["p_wb"][k],
                                    n=120)
            obs_cam.extend([k] * len(Xk))
            Xw.append(Xk)
            uv.append(uvk)
        Xw = np.concatenate(Xw)
        uv = np.concatenate(uv)
        O = len(Xw)
        fixed = np.zeros(K, bool)
        fixed[0] = True
        R, p, v, bg, ba = inertial.local_inertial_ba_states(
            jnp.asarray(traj["R_wb"]), jnp.asarray(p_pert),
            jnp.asarray(v_pert), jnp.zeros((K, 3)), jnp.zeros((K, 3)),
            jnp.asarray(fixed),
            st["dts"], st["dR"], st["dV"], st["dP"],
            st["JRg"], st["JVg"], st["JVa"], st["JPg"], st["JPa"],
            st["cov9"], st["walk_cov"], jnp.ones(K - 1, bool),
            jnp.asarray(np.asarray(obs_cam, np.int32)), jnp.asarray(Xw),
            jnp.asarray(uv), jnp.zeros(O), jnp.ones(O),
            jnp.zeros(O, bool), jnp.ones(O, bool),
            CAM, jnp.float32(0.0), jnp.asarray(I3), jnp.zeros(3),
            gravity=jnp.asarray(traj["g_w"]),
        )
        err_before = np.linalg.norm(p_pert - traj["p_wb"], axis=-1)
        err_after = np.linalg.norm(np.asarray(p) - traj["p_wb"], axis=-1)
        assert err_after.max() < 0.25 * err_before.max(), (
            err_before, err_after)
        v_err = np.linalg.norm(np.asarray(v) - traj["v_w"], axis=-1)
        assert v_err.max() < 0.1, v_err
