"""Tests for PnP RANSAC, Sim3 Horn RANSAC + refinement, and Sim3 pose-graph
optimization (roles: MLPnPsolver.cpp, Sim3Solver.cc, Optimizer::OptimizeSim3
and ::OptimizeEssentialGraph)."""

import numpy as np
import jax
import jax.numpy as jnp

from xfeatslam_tpu.ops import camera, lie
from xfeatslam_tpu.optim import pnp, pose_graph, sim3

CAM = camera.Pinhole.from_list([517.3, 516.5, 318.6, 255.3])


class TestPnP:
    def make(self, rng, n=150, outlier_frac=0.3, noise=0.5):
        X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(2, 6, n)
        xi = np.array([0.2, -0.1, 0.3, 0.1, -0.2, 0.15], np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Xc = np.asarray(lie.se3_apply(R, t, jnp.asarray(X)))
        uv = np.array(camera.pinhole_project(CAM, jnp.asarray(Xc)))
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
        n_out = int(outlier_frac * n)
        sel = rng.choice(n, n_out, replace=False)
        uv[sel] += rng.uniform(30, 120, (n_out, 2)).astype(np.float32)
        is_out = np.zeros(n, bool)
        is_out[sel] = True
        return X, uv.astype(np.float32), (np.asarray(R), np.asarray(t)), is_out

    def test_with_outliers(self, rng):
        X, uv, (R, t), is_out = self.make(rng)
        res = pnp.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X), bool), CAM,
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        inl = np.asarray(res.inliers)
        assert inl[~is_out].mean() > 0.85  # minimal-model inliers; pose_opt refines after
        assert inl[is_out].mean() < 0.1
        dR = np.asarray(res.R) @ R.T
        rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert rot < 1.0, rot
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05

    def test_degenerate_too_few(self, rng):
        X, uv, _, _ = self.make(rng, n=8, outlier_frac=0.9)
        res = pnp.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(8, bool), CAM,
            jax.random.PRNGKey(1), min_inliers=10,
        )
        assert not bool(res.success)


class TestSim3:
    def make(self, rng, n=100, s_true=1.3, outlier_frac=0.2):
        # points in KF2 camera frame
        Xc2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        Xc2[:, 2] = rng.uniform(2, 6, n)
        xi = np.array([0.3, -0.2, 0.1, 0.1, 0.2, -0.1], np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        R, t = np.asarray(R), np.asarray(t)
        Xc1 = s_true * Xc2 @ R.T + t
        uv1 = np.asarray(camera.pinhole_project(CAM, jnp.asarray(Xc1)))
        uv2 = np.asarray(camera.pinhole_project(CAM, jnp.asarray(Xc2)))
        n_out = int(outlier_frac * n)
        sel = rng.choice(n, n_out, replace=False)
        Xc2 = Xc2.copy()
        Xc2[sel] += rng.uniform(0.5, 2.0, (n_out, 3)).astype(np.float32)
        return Xc1, Xc2, uv1.astype(np.float32), uv2.astype(np.float32), (s_true, R, t), sel

    def test_ransac(self, rng):
        Xc1, Xc2, uv1, uv2, (s, R, t), out_sel = self.make(rng)
        res = sim3.sim3_ransac(
            jnp.asarray(Xc1), jnp.asarray(Xc2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(len(Xc1), bool), CAM,
            jax.random.PRNGKey(0),
        )
        assert bool(res.success), int(res.num_inliers)
        assert abs(float(res.s) - s) < 0.02, float(res.s)
        dR = np.asarray(res.R) @ R.T
        rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert rot < 0.5
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05

    def test_refinement(self, rng):
        Xc1, Xc2, uv1, uv2, (s, R, t), _ = self.make(rng, outlier_frac=0.1)
        # perturb the initial guess
        dxi = np.zeros(7, np.float32)
        dxi[:3] = 0.05
        dxi[6] = 0.05
        ds, dR, dt = lie.sim3_exp(jnp.asarray(dxi))
        s0 = float(ds) * s
        R0 = np.asarray(dR) @ R
        t0 = float(ds) * (np.asarray(dR) @ t) + np.asarray(dt)
        s1, R1, t1, inl, n = sim3.optimize_sim3(
            jnp.float32(s0), jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray(Xc1), jnp.asarray(Xc2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(len(Xc1), bool), CAM,
        )
        assert abs(float(s1) - s) < 0.01, float(s1)
        dRm = np.asarray(R1) @ R.T
        rot = np.degrees(np.arccos(np.clip((np.trace(dRm) - 1) / 2, -1, 1)))
        assert rot < 0.3, rot

    def test_fix_scale(self, rng):
        Xc1, Xc2, uv1, uv2, (s, R, t), _ = self.make(rng, s_true=1.0,
                                                     outlier_frac=0.1)
        res = sim3.sim3_ransac(
            jnp.asarray(Xc1), jnp.asarray(Xc2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(len(Xc1), bool), CAM,
            jax.random.PRNGKey(0), fix_scale=True,
        )
        assert float(res.s) == 1.0


class TestPoseGraph:
    def test_loop_correction(self, rng):
        """Classic drift scenario: chain of keyframes with accumulated drift,
        one loop-closure edge back to the start; pose-graph optimization must
        distribute the correction (OptimizeEssentialGraph role)."""
        C = 12
        # ground truth: poses on a circle (world->camera)
        s_gt, R_gt, t_gt = [], [], []
        for i in range(C):
            ang = 2 * np.pi * i / C
            xi = np.array([np.sin(ang), 0.0, np.cos(ang) - 1.0,
                           0.0, ang if ang < np.pi else ang - 2 * np.pi, 0.0],
                          np.float32)
            R, t = lie.se3_exp(jnp.asarray(xi))
            s_gt.append(1.0)
            R_gt.append(np.asarray(R))
            t_gt.append(np.asarray(t))
        s_gt = np.array(s_gt, np.float32)
        R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

        # odometry measurements m(i->j) = S_j * S_i^{-1} (edge convention
        # of optim/pose_graph.py)
        def rel(i, j):
            si, Ri, ti = s_gt[i], R_gt[i], t_gt[i]
            sj, Rj, tj = s_gt[j], R_gt[j], t_gt[j]
            inv = lie.sim3_inverse(jnp.float32(si), jnp.asarray(Ri), jnp.asarray(ti))
            return lie.sim3_compose(jnp.float32(sj), jnp.asarray(Rj), jnp.asarray(tj), *inv)

        edges = [(i, i + 1) for i in range(C - 1)] + [(0, C - 1)]
        m_s, m_R, m_t, ei, ej = [], [], [], [], []
        drift = np.array([0.01, 0.004, -0.008, 0.002, 0.004, -0.002, 0.004],
                         np.float32)
        for k, (i, j) in enumerate(edges):
            ms, mR, mt = rel(i, j)
            if k < C - 1:  # drift on odometry edges only
                ds, dR, dt = lie.sim3_exp(jnp.asarray(drift))
                ms, mR, mt = lie.sim3_compose(ds, dR, dt, ms, mR, mt)
            m_s.append(float(ms))
            m_R.append(np.asarray(mR))
            m_t.append(np.asarray(mt))
            ei.append(i)
            ej.append(j)

        # initial estimates: integrate the drifty odometry from vertex 0
        # (S_{k+1} = m(k->k+1) * S_k)
        s0 = [1.0]
        R0 = [R_gt[0]]
        t0 = [t_gt[0]]
        for k in range(C - 1):
            ms, mR, mt = m_s[k], m_R[k], m_t[k]
            sc, Rc, tc = lie.sim3_compose(
                jnp.float32(ms), jnp.asarray(mR), jnp.asarray(mt),
                jnp.float32(s0[-1]), jnp.asarray(R0[-1]), jnp.asarray(t0[-1]),
            )
            s0.append(float(sc))
            R0.append(np.asarray(Rc))
            t0.append(np.asarray(tc))
        s0 = np.array(s0, np.float32)
        R0, t0 = np.stack(R0), np.stack(t0)
        drift_before = np.linalg.norm(t0[-1] - t_gt[-1])

        fixed = np.zeros(C, bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            s=jnp.asarray(s0), R=jnp.asarray(R0), t=jnp.asarray(t0),
            fixed=jnp.asarray(fixed), cam_valid=jnp.ones(C, bool),
            edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
            m_s=jnp.asarray(m_s), m_R=jnp.asarray(np.stack(m_R)),
            m_t=jnp.asarray(np.stack(m_t)),
            e_valid=jnp.ones(len(ei), bool),
        )
        s1, R1, t1 = pose_graph.optimize_pose_graph(prob)
        err_after = np.linalg.norm(np.asarray(t1) - t_gt, axis=-1)
        # the loop edge redistributes drift: end-of-chain error much reduced
        assert err_after[-1] < 0.3 * drift_before, (err_after[-1], drift_before)
        assert err_after.max() < drift_before

    def test_loop_correction_4dof(self, rng):
        """Inertial essential graph (OptimizeEssentialGraph4DoF,
        /root/reference/src/Optimizer.cc:5292): same drift scenario but
        updates restricted to yaw+translation — the correction must still
        be distributed, and every vertex's roll/pitch (gravity direction)
        must remain exactly as initialized."""
        C = 12
        R_gt, t_gt = [], []
        for i in range(C):
            ang = 2 * np.pi * i / C
            xi = np.array([np.sin(ang), 0.0, np.cos(ang) - 1.0,
                           0.0, ang if ang < np.pi else ang - 2 * np.pi, 0.0],
                          np.float32)
            R, t = lie.se3_exp(jnp.asarray(xi))
            R_gt.append(np.asarray(R))
            t_gt.append(np.asarray(t))
        R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

        def rel(i, j):
            inv = lie.sim3_inverse(jnp.float32(1.0), jnp.asarray(R_gt[i]),
                                   jnp.asarray(t_gt[i]))
            return lie.sim3_compose(jnp.float32(1.0), jnp.asarray(R_gt[j]),
                                    jnp.asarray(t_gt[j]), *inv)

        edges = [(i, i + 1) for i in range(C - 1)] + [(0, C - 1)]
        # drift: yaw (world-z) + translation only, so the 4DoF manifold can
        # reach the ground truth
        drift = np.array([0.0, 0.012, -0.008, 0.002, 0.0, -0.006, 0.0],
                         np.float32)
        m_s, m_R, m_t, ei, ej = [], [], [], [], []
        for k, (i, j) in enumerate(edges):
            ms, mR, mt = rel(i, j)
            if k < C - 1:
                ds, dR, dt = lie.sim3_exp(jnp.asarray(drift))
                ms, mR, mt = lie.sim3_compose(ds, dR, dt, ms, mR, mt)
            m_s.append(float(ms))
            m_R.append(np.asarray(mR))
            m_t.append(np.asarray(mt))
            ei.append(i)
            ej.append(j)

        R0 = [R_gt[0]]
        t0 = [t_gt[0]]
        for k in range(C - 1):
            _, Rc, tc = lie.sim3_compose(
                jnp.float32(m_s[k]), jnp.asarray(m_R[k]), jnp.asarray(m_t[k]),
                jnp.float32(1.0), jnp.asarray(R0[-1]), jnp.asarray(t0[-1]),
            )
            R0.append(np.asarray(Rc))
            t0.append(np.asarray(tc))
        R0, t0 = np.stack(R0), np.stack(t0)
        drift_before = np.linalg.norm(t0[-1] - t_gt[-1])

        fixed = np.zeros(C, bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            s=jnp.ones(C, jnp.float32), R=jnp.asarray(R0), t=jnp.asarray(t0),
            fixed=jnp.asarray(fixed), cam_valid=jnp.ones(C, bool),
            edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
            m_s=jnp.asarray(m_s), m_R=jnp.asarray(np.stack(m_R)),
            m_t=jnp.asarray(np.stack(m_t)),
            e_valid=jnp.ones(len(ei), bool),
        )
        s1, R1, t1 = pose_graph.optimize_pose_graph(prob, mode="4dof")
        s1, R1, t1 = np.asarray(s1), np.asarray(R1), np.asarray(t1)
        assert np.allclose(s1, 1.0)  # scale untouched in 4DoF mode
        err_after = np.linalg.norm(t1 - t_gt, axis=-1)
        assert err_after[-1] < 0.3 * drift_before, (err_after[-1], drift_before)
        # every update must be a pure world-z rotation: R_wc1 @ R_wc0^T has
        # axis e_z (gravity direction in camera frames untouched)
        for i in range(C):
            dW = R1[i].T @ R0[i]
            assert abs(dW[2, 2] - 1.0) < 1e-5, (i, dW)
            assert np.abs([dW[0, 2], dW[1, 2], dW[2, 0], dW[2, 1]]).max() < 1e-4
