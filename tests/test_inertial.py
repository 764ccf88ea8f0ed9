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
