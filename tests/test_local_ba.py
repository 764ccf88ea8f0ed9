"""Bundle-adjustment solver tests on synthetic problems (behavior target:
Optimizer::LocalBundleAdjustment /root/reference/src/Optimizer.cc:1116)."""

import numpy as np
import jax.numpy as jnp

from xfeatslam_tpu.ops import camera, lie
from xfeatslam_tpu.optim import local_ba

CAM = camera.Pinhole.from_list([517.3, 516.5, 318.6, 255.3])


def make_ba_problem(rng, n_cams=6, n_pts=300, noise_px=0.4,
                    pose_noise=0.02, point_noise=0.05, outlier_frac=0.0,
                    pad_cams=8, pad_pts=512, pad_obs=4096):
    # ground truth: cameras along a small arc, points in front
    X_true = rng.uniform(-2.5, 2.5, (n_pts, 3)).astype(np.float32)
    X_true[:, 2] = rng.uniform(3.0, 8.0, n_pts)
    R_true, t_true = [], []
    for i in range(n_cams):
        xi = np.array(
            [0.12 * i, 0.02 * i, 0.01 * i, 0.01 * i, 0.03 * i, 0.005 * i],
            np.float32,
        )
        R, t = lie.se3_exp(jnp.asarray(xi))
        R_true.append(np.asarray(R))
        t_true.append(np.asarray(t))
    R_true, t_true = np.stack(R_true), np.stack(t_true)

    obs_cam, obs_pt, uv = [], [], []
    for c in range(n_cams):
        Xc = X_true @ R_true[c].T + t_true[c]
        u = 517.3 * Xc[:, 0] / Xc[:, 2] + 318.6
        v = 516.5 * Xc[:, 1] / Xc[:, 2] + 255.3
        vis = (u >= 0) & (u < 640) & (v >= 0) & (v < 480) & (Xc[:, 2] > 0.1)
        for p in np.nonzero(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(p)
            uv.append([u[p], v[p]])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    uv = np.array(uv, np.float32) + rng.normal(0, noise_px, (len(obs_cam), 2)).astype(np.float32)
    n_obs = len(obs_cam)
    if outlier_frac > 0:
        sel = rng.choice(n_obs, int(outlier_frac * n_obs), replace=False)
        uv[sel] += rng.uniform(20, 60, (len(sel), 2)).astype(np.float32)
    is_outlier = np.zeros(n_obs, bool)
    if outlier_frac > 0:
        is_outlier[sel] = True

    # perturb initial estimates (cam 0 fixed as gauge)
    R0, t0 = [R_true[0]], [t_true[0]]
    for c in range(1, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(xi))
        R0.append(np.asarray(dR) @ R_true[c])
        t0.append(np.asarray(dR) @ t_true[c] + np.asarray(dt))
    R0, t0 = np.stack(R0), np.stack(t0)
    X0 = X_true + rng.normal(0, point_noise, X_true.shape).astype(np.float32)

    def pad(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    fixed = np.zeros(pad_cams, bool)
    fixed[0] = True
    prob = local_ba.BAProblem(
        R=jnp.asarray(pad(R0, pad_cams)),
        t=jnp.asarray(pad(t0, pad_cams)),
        fixed=jnp.asarray(fixed),
        cam_valid=jnp.asarray(pad(np.ones(n_cams, bool), pad_cams, False)),
        X=jnp.asarray(pad(X0, pad_pts)),
        p_valid=jnp.asarray(pad(np.ones(n_pts, bool), pad_pts, False)),
        obs_cam=jnp.asarray(pad(obs_cam, pad_obs)),
        obs_pt=jnp.asarray(pad(obs_pt, pad_obs)),
        uv=jnp.asarray(pad(uv, pad_obs)),
        ur=jnp.zeros(pad_obs, jnp.float32),
        stereo=jnp.zeros(pad_obs, bool),
        valid=jnp.asarray(pad(np.ones(n_obs, bool), pad_obs, False)),
        inv_sigma2=jnp.ones(pad_obs, jnp.float32),
    )
    return prob, (R_true, t_true, X_true), is_outlier, n_obs


def pose_errors(R, t, R_true, t_true, n):
    rot, tr = [], []
    for c in range(n):
        dR = np.asarray(R[c]) @ R_true[c].T
        rot.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        tr.append(np.linalg.norm(np.asarray(t[c]) - t_true[c]))
    return np.array(rot), np.array(tr)


class TestBundleAdjust:
    def test_clean_convergence(self, rng):
        prob, (R_true, t_true, X_true), _, n_obs = make_ba_problem(
            rng, noise_px=0.0, pose_noise=0.03, point_noise=0.08
        )
        res = local_ba.bundle_adjust(prob, CAM)
        rot, tr = pose_errors(res.R, res.t, R_true, t_true, 6)
        # mono-only edges + one fixed camera leave the scale gauge free
        # (same as the reference's monocular local BA), so allow a small
        # gauge drift on top of f32 solver accuracy
        assert rot.max() < 0.06, rot
        assert tr.max() < 3e-3, tr
        # median point error (max is dominated by low-parallax points whose
        # depth is legitimately unobservable from mono edges)
        Xe = np.median(np.linalg.norm(np.asarray(res.X[:300]) - X_true, axis=-1))
        assert Xe < 1e-2, Xe
        # the fit itself must be exact: residual chi2 ~ 0
        assert float(np.where(np.asarray(prob.valid), np.asarray(res.chi2), 0).sum()) < 1e-3

    def test_noisy(self, rng):
        prob, (R_true, t_true, X_true), _, n_obs = make_ba_problem(
            rng, noise_px=0.5, pose_noise=0.03, point_noise=0.08
        )
        res = local_ba.bundle_adjust(prob, CAM)
        rot, tr = pose_errors(res.R, res.t, R_true, t_true, 6)
        assert rot.max() < 0.1, rot
        assert tr.max() < 2e-2, tr

    def test_outlier_pruning(self, rng):
        prob, (R_true, t_true, X_true), is_out, n_obs = make_ba_problem(
            rng, noise_px=0.4, pose_noise=0.02, point_noise=0.05,
            outlier_frac=0.15,
        )
        res = local_ba.bundle_adjust(prob, CAM)
        rot, tr = pose_errors(res.R, res.t, R_true, t_true, 6)
        assert rot.max() < 0.15, rot
        assert tr.max() < 3e-2, tr
        inl = np.asarray(res.inlier)[:n_obs]
        assert not inl[is_out].any() or inl[is_out].mean() < 0.05
        assert inl[~is_out].mean() > 0.9

    def test_fixed_cameras_stay_fixed(self, rng):
        prob, (R_true, t_true, X_true), _, _ = make_ba_problem(rng)
        res = local_ba.bundle_adjust(prob, CAM)
        np.testing.assert_array_equal(np.asarray(res.R[0]), np.asarray(prob.R[0]))
        np.testing.assert_array_equal(np.asarray(res.t[0]), np.asarray(prob.t[0]))
