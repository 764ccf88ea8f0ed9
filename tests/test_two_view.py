"""Two-view reconstruction tests (behavior target:
/root/reference/src/TwoViewReconstruction.cc)."""

import numpy as np
import jax
import jax.numpy as jnp

from xfeatslam_tpu.optim import two_view
from xfeatslam_tpu.ops import lie

K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)


def project(K, X):
    uvw = X @ K.T
    return uvw[:, :2] / uvw[:, 2:]


def make_pair(rng, planar=False, n=300, noise=0.5, baseline=0.3):
    if planar:
        X = np.stack([
            rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
            np.full(n, 4.0) + 0.001 * rng.standard_normal(n)
        ], -1).astype(np.float32)
    else:
        X = np.stack([
            rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
            rng.uniform(2.0, 8.0, n)
        ], -1).astype(np.float32)
    xi = np.array([baseline, 0.05, 0.02, 0.02, -0.12, 0.01], np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    R, t = np.asarray(R), np.asarray(t)
    uv1 = project(K, X) + rng.normal(0, noise, (n, 2)).astype(np.float32)
    uv2 = project(K, X @ R.T + t) + rng.normal(0, noise, (n, 2)).astype(np.float32)
    inb = lambda uv: (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
    valid = inb(uv1) & inb(uv2)
    return uv1.astype(np.float32), uv2.astype(np.float32), valid, (R, t), X


def pose_err(res, R_true, t_true):
    dR = np.asarray(res.R) @ R_true.T
    rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_est = np.asarray(res.t)
    t_dir = t_true / np.linalg.norm(t_true)
    terr = np.degrees(np.arccos(np.clip(np.abs(t_est @ t_dir), -1, 1)))
    return rot, terr


class TestTwoView:
    def test_general_scene_f_model(self, rng):
        uv1, uv2, valid, (R, t), X = make_pair(rng, planar=False)
        res = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(0),
        )
        assert bool(res.success), (int(res.good.sum()), bool(res.used_h))
        rot, terr = pose_err(res, R, t)
        assert rot < 0.5, rot
        assert terr < 2.0, terr
        # triangulated points match scale-normalized truth
        good = np.asarray(res.good)
        scale = np.median(X[good][:, 2] / np.asarray(res.points)[good][:, 2])
        err = np.linalg.norm(np.asarray(res.points)[good] * scale - X[good], axis=-1)
        assert np.median(err) < 0.12, np.median(err)  # DLT depth noise ~ z^2/(b f) * px

    def test_planar_scene(self, rng):
        """Planar scenes: F fits a plane exactly too, and its 1-D epipolar
        score dominates, so RH = SH/(SH+SF) rarely exceeds the reference's
        0.5 cut (TwoViewReconstruction.cc:114-119) — the faithful behavior
        is 'succeed with an accurate pose or fail gracefully', exactly like
        the reference's famously-picky planar monocular init."""
        uv1, uv2, valid, (R, t), X = make_pair(rng, planar=True)
        res = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(1),
        )
        if bool(res.success):
            rot, terr = pose_err(res, R, t)
            assert rot < 1.0, rot
            assert terr < 3.0, terr

    def test_homography_decomposition(self, rng):
        """Direct unit test of the Faugeras H->motion path: exact synthetic
        homography of a plane must contain the true (R, t/d) among the 8
        hypotheses."""
        n_pl = np.array([0.0, 0.0, 1.0])
        d = 4.0
        xi = np.array([0.3, 0.05, 0.02, 0.02, -0.12, 0.01], np.float32)
        from xfeatslam_tpu.ops import lie as lie_ops

        R, t = lie_ops.se3_exp(jnp.asarray(xi))
        R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
        Hn = R + np.outer(t, n_pl) / d
        H = K.astype(np.float64) @ Hn @ np.linalg.inv(K.astype(np.float64))
        Rs, ts = two_view._motions_from_h(jnp.asarray(H, jnp.float32), jnp.asarray(K))
        rot_errs, t_errs = [], []
        t_dir = t / np.linalg.norm(t)
        for i in range(8):
            dR = np.asarray(Rs[i]) @ R.T
            rot_errs.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
            t_errs.append(np.degrees(np.arccos(np.clip(abs(np.asarray(ts[i]) @ t_dir), -1, 1))))
        best = int(np.argmin(np.array(rot_errs) + np.array(t_errs)))
        assert rot_errs[best] < 0.5, (rot_errs, t_errs)
        assert t_errs[best] < 1.0, (rot_errs, t_errs)

    def test_outliers(self, rng):
        uv1, uv2, valid, (R, t), X = make_pair(rng, planar=False)
        n_out = 60
        sel = rng.choice(len(uv1), n_out, replace=False)
        uv2[sel] = rng.uniform(0, 640, (n_out, 2)).astype(np.float32) * [1, 0.75]
        res = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(2),
        )
        assert bool(res.success)
        rot, terr = pose_err(res, R, t)
        assert rot < 1.0, rot
        assert terr < 3.0, terr

    def test_degenerate_no_motion(self, rng):
        uv1, uv2, valid, _, _ = make_pair(rng, baseline=0.0, noise=0.3)
        res = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv1.copy()), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(3),
        )
        # zero baseline: must not report a confident reconstruction
        assert not bool(res.success)
