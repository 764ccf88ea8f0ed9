"""IMU preintegration tests (behavior target: /root/reference/src/ImuTypes.cc
IntegrateNewMeasurement / GetDelta* / bias Jacobians)."""

import numpy as np
import jax.numpy as jnp

from xfeatslam_tpu.ops import imu, lie


def simulate(rng, n=200, dt=0.005, bg=None, ba=None):
    """Simulate a smooth trajectory; produce perfect IMU measurements
    (body-frame specific force + angular rate) plus optional bias."""
    bg = np.zeros(3, np.float32) if bg is None else bg
    ba = np.zeros(3, np.float32) if ba is None else ba
    g = np.array([0.0, 0.0, -9.81])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.3, 0.1, 0.0])
    accs, gyros = [], []
    Rs, ps, vs = [R.copy()], [p.copy()], [v.copy()]
    for k in range(n):
        t = k * dt
        w_world = np.array([0.2 * np.sin(t), 0.3, 0.1 * np.cos(t)])
        a_world = np.array([0.5 * np.cos(2 * t), -0.2, 0.4 * np.sin(t)])
        w_body = R.T @ w_world
        a_body = R.T @ (a_world - g)  # specific force
        accs.append(a_body + ba)
        gyros.append(w_body + bg)
        # integrate ground truth (same discretization as preintegration)
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return (np.array(accs, np.float32), np.array(gyros, np.float32),
            np.full(n, dt, np.float32), Rs, ps, vs)


class TestPreintegration:
    def test_predicts_state(self, rng):
        accs, gyros, dts, Rs, ps, vs = simulate(rng)
        pre = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(len(accs), bool), jnp.zeros(3), jnp.zeros(3),
        )
        R_pred, p_pred, v_pred = imu.predict_state(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(vs[0].astype(np.float32)), pre
        )
        assert np.abs(np.asarray(R_pred) - Rs[-1]).max() < 1e-3
        assert np.linalg.norm(np.asarray(v_pred) - vs[-1]) < 1e-2
        assert np.linalg.norm(np.asarray(p_pred) - ps[-1]) < 1e-2

    def test_padding_mask(self, rng):
        accs, gyros, dts, Rs, ps, vs = simulate(rng, n=100)
        pad = 60
        accs_p = np.concatenate([accs, np.ones((pad, 3), np.float32) * 99])
        gyros_p = np.concatenate([gyros, np.ones((pad, 3), np.float32) * 99])
        dts_p = np.concatenate([dts, np.full(pad, 0.005, np.float32)])
        valid = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
        pre_p = imu.preintegrate(
            jnp.asarray(accs_p), jnp.asarray(gyros_p), jnp.asarray(dts_p),
            jnp.asarray(valid), jnp.zeros(3), jnp.zeros(3),
        )
        pre = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(100, bool), jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(pre_p.dR), np.asarray(pre.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre_p.dP), np.asarray(pre.dP), atol=1e-6)
        np.testing.assert_allclose(float(pre_p.dt), float(pre.dt), atol=1e-6)

    def test_bias_jacobians(self, rng):
        """First-order bias correction must match re-integration with the
        new bias (GetDeltaRotation/Velocity/Position semantics)."""
        bg_t = np.array([0.02, -0.01, 0.015], np.float32)
        ba_t = np.array([0.05, 0.03, -0.04], np.float32)
        accs, gyros, dts, *_ = simulate(rng, bg=bg_t, ba=ba_t)
        # integrate at zero linearization bias
        pre0 = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(len(accs), bool), jnp.zeros(3), jnp.zeros(3),
        )
        # corrected via jacobians to the true bias
        dR_c, dV_c, dP_c = imu.delta_with_bias(
            pre0, jnp.asarray(bg_t), jnp.asarray(ba_t)
        )
        # re-integrated directly at the true bias
        pre1 = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(len(accs), bool), jnp.asarray(bg_t), jnp.asarray(ba_t),
        )
        assert np.abs(np.asarray(dR_c) - np.asarray(pre1.dR)).max() < 5e-3
        assert np.linalg.norm(np.asarray(dV_c) - np.asarray(pre1.dV)) < 2e-2
        assert np.linalg.norm(np.asarray(dP_c) - np.asarray(pre1.dP)) < 2e-2

    def test_residual_zero_at_truth(self, rng):
        accs, gyros, dts, Rs, ps, vs = simulate(rng)
        pre = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(len(accs), bool), jnp.zeros(3), jnp.zeros(3),
        )
        r = imu.inertial_residual(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(vs[0].astype(np.float32)),
            jnp.asarray(Rs[-1].astype(np.float32)),
            jnp.asarray(ps[-1].astype(np.float32)),
            jnp.asarray(vs[-1].astype(np.float32)),
            jnp.zeros(3), jnp.zeros(3), pre,
        )
        assert np.abs(np.asarray(r)).max() < 2e-2, np.asarray(r)

    def test_covariance_grows(self, rng):
        accs, gyros, dts, *_ = simulate(rng, n=50)
        pre_short = imu.preintegrate(
            jnp.asarray(accs[:10]), jnp.asarray(gyros[:10]), jnp.asarray(dts[:10]),
            jnp.ones(10, bool), jnp.zeros(3), jnp.zeros(3),
        )
        pre_long = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(50, bool), jnp.zeros(3), jnp.zeros(3),
        )
        assert float(jnp.trace(pre_long.cov)) > float(jnp.trace(pre_short.cov))
        # symmetric PSD-ish
        c = np.asarray(pre_long.cov)
        np.testing.assert_allclose(c, c.T, atol=1e-10)


class TestMergeAndCovariance:
    def test_cov_is_15x15_with_bias_walk(self, rng):
        import jax.numpy as jnp
        from xfeatslam_tpu.ops import imu

        N = 50
        acc = np.tile(np.array([0.0, 0.0, 9.81], np.float32), (N, 1))
        gyro = np.zeros((N, 3), np.float32)
        dts = np.full(N, 0.005, np.float32)
        pre = imu.preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                               jnp.asarray(dts), jnp.ones(N, bool),
                               jnp.zeros(3), jnp.zeros(3))
        c = np.asarray(pre.cov)
        assert c.shape == (15, 15)
        # bias random-walk accumulates linearly in time on the diagonal
        assert (np.diag(c)[9:] > 0).all()
        pre2 = imu.preintegrate(jnp.asarray(np.tile(acc, (2, 1))),
                                jnp.asarray(np.tile(gyro, (2, 1))),
                                jnp.asarray(np.tile(dts, 2)),
                                jnp.ones(2 * N, bool),
                                jnp.zeros(3), jnp.zeros(3))
        c2 = np.asarray(pre2.cov)
        np.testing.assert_allclose(np.diag(c2)[9:], 2 * np.diag(c)[9:],
                                   rtol=1e-4)

    def test_merge_previous_matches_one_shot(self, rng):
        import jax.numpy as jnp
        from xfeatslam_tpu.ops import imu

        N = 80
        t = np.arange(N) * 0.005
        acc = np.stack([0.3 * np.sin(3 * t), 0.2 * np.cos(2 * t),
                        9.81 + 0.1 * np.sin(t)], -1).astype(np.float32)
        gyro = np.stack([0.1 * np.cos(t), 0.05 * np.sin(2 * t),
                         0.2 * np.ones(N)], -1).astype(np.float32)
        dts = np.full(N, 0.005, np.float32)
        bg = jnp.zeros(3)
        ba = jnp.zeros(3)

        pre_all = imu.preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                                   jnp.asarray(dts), jnp.ones(N, bool), bg, ba)
        pre_a = imu.preintegrate(jnp.asarray(acc[:40]), jnp.asarray(gyro[:40]),
                                 jnp.asarray(dts[:40]), jnp.ones(40, bool), bg, ba)
        pre_b = imu.preintegrate(jnp.asarray(acc[40:]), jnp.asarray(gyro[40:]),
                                 jnp.asarray(dts[40:]), jnp.ones(40, bool), bg, ba)
        merged = imu.merge_previous(pre_a, pre_b)

        np.testing.assert_allclose(float(merged.dt), float(pre_all.dt), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(merged.dR), np.asarray(pre_all.dR),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(merged.dV), np.asarray(pre_all.dV),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(merged.dP), np.asarray(pre_all.dP),
                                   atol=1e-4)
        # bias Jacobians chain too: check against one-shot by finite-diff use
        db = np.array([0.01, -0.02, 0.015], np.float32)
        dRm, dVm, dPm = imu.delta_with_bias(merged, jnp.asarray(db), jnp.asarray(db))
        dRo, dVo, dPo = imu.delta_with_bias(pre_all, jnp.asarray(db), jnp.asarray(db))
        np.testing.assert_allclose(np.asarray(dVm), np.asarray(dVo), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dPm), np.asarray(dPo), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dRm), np.asarray(dRo), atol=2e-3)
