"""Pose-only LM tests on synthetic scenes (behavior target:
Optimizer::PoseOptimization /root/reference/src/Optimizer.cc:814-1114)."""

import numpy as np
import jax.numpy as jnp

from xfeatslam_tpu.ops import camera, lie
from xfeatslam_tpu.optim import pose_opt

CAM = camera.Pinhole.from_list([517.3, 516.5, 318.6, 255.3])
BF = 40.0


def make_problem(rng, n=200, noise_px=0.3, outlier_frac=0.0, stereo=False):
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(2.0, 8.0, n)
    xi_true = np.array([0.1, -0.05, 0.02, 0.04, -0.06, 0.03], np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi_true))
    Xc = lie.se3_apply(R, t, jnp.asarray(X))
    uv = np.asarray(camera.pinhole_project(CAM, Xc))
    z = np.asarray(Xc)[:, 2]
    ur = uv[:, 0] - BF / z
    uv = uv + rng.normal(0, noise_px, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    is_outlier = np.zeros(n, bool)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        uv[sel] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        is_outlier[sel] = True
    return X, uv, ur.astype(np.float32), (np.asarray(R), np.asarray(t)), is_outlier


def run(X, uv, ur, R_init, t_init, stereo=False):
    n = len(X)
    return pose_opt.pose_optimization(
        jnp.asarray(R_init), jnp.asarray(t_init),
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(ur),
        jnp.ones(n, jnp.float32),
        jnp.full(n, stereo),
        jnp.ones(n, bool),
        CAM, jnp.float32(BF),
    )


def pose_err(res, R_true, t_true):
    dR = np.asarray(res.R) @ R_true.T
    rot_err = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    t_err = np.linalg.norm(np.asarray(res.t) - t_true)
    return rot_err, t_err


class TestPoseOptimization:
    def test_converges_from_identity(self, rng):
        X, uv, ur, (R_true, t_true), _ = make_problem(rng, noise_px=0.0)
        res = run(X, uv, ur, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        rot_err, t_err = pose_err(res, R_true, t_true)
        assert rot_err < 1e-4, rot_err
        assert t_err < 1e-3, t_err
        assert int(res.num_inliers) == len(X)

    def test_noise(self, rng):
        X, uv, ur, (R_true, t_true), _ = make_problem(rng, noise_px=0.5)
        res = run(X, uv, ur, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        rot_err, t_err = pose_err(res, R_true, t_true)
        assert rot_err < 2e-3, rot_err
        assert t_err < 2e-2, t_err

    def test_outlier_rejection(self, rng):
        X, uv, ur, (R_true, t_true), is_out = make_problem(
            rng, noise_px=0.3, outlier_frac=0.25
        )
        res = run(X, uv, ur, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        rot_err, t_err = pose_err(res, R_true, t_true)
        assert rot_err < 5e-3, rot_err
        assert t_err < 3e-2, t_err
        inl = np.asarray(res.inliers)
        # all injected outliers classified out
        assert not inl[is_out].any()
        # most true inliers kept
        assert inl[~is_out].mean() > 0.95

    def test_stereo_edges(self, rng):
        X, uv, ur, (R_true, t_true), _ = make_problem(rng, noise_px=0.2, stereo=True)
        res = run(X, uv, ur, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), stereo=True)
        rot_err, t_err = pose_err(res, R_true, t_true)
        assert rot_err < 2e-3
        assert t_err < 1e-2

    def test_padding_invariance(self, rng):
        X, uv, ur, (R_true, t_true), _ = make_problem(rng, n=100, noise_px=0.2)
        n, pad = 100, 60
        Xp = np.concatenate([X, np.zeros((pad, 3), np.float32)])
        uvp = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
        urp = np.concatenate([ur, np.zeros(pad, np.float32)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        res = pose_opt.pose_optimization(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(urp),
            jnp.ones(n + pad, jnp.float32), jnp.zeros(n + pad, bool),
            jnp.asarray(valid), CAM, jnp.float32(BF),
        )
        res_ref = run(X, uv, ur, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(res_ref.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(res_ref.t), atol=1e-4)
        assert int(res.num_inliers) == int(res_ref.num_inliers)
