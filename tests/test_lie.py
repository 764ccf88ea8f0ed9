"""Lie-group property tests (mirrors the role of Sophus's own test suite,
/root/reference/thirdparty/Sophus/test/core/test_{so3,se3,sim3}.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from xfeatslam_tpu.ops import lie


def random_phi(rng, n, scale=2.0):
    """Random rotation tangents with |phi| < 0.95*pi (log principal branch)."""
    phi = rng.standard_normal((n, 3)) * scale
    norm = np.linalg.norm(phi, axis=-1, keepdims=True)
    cap = 0.95 * np.pi
    phi = np.where(norm > cap, phi / norm * cap, phi)
    return phi.astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = random_phi(rng, 64, scale=1.0)
        R = lie.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=2e-5)

    def test_exp_is_rotation(self, rng):
        phi = random_phi(rng, 32)
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)
        out = np.asarray(lie.so3_log(R))
        assert np.all(np.isfinite(out))

    def test_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0.6, 0.8, 0.0]), np.array([0.36, 0.48, 0.8])]:
            phi = (axis * (np.pi - 1e-4)).astype(np.float32)[None]
            R = lie.so3_exp(jnp.asarray(phi))
            phi2 = np.asarray(lie.so3_log(R))
            # log may return the antipodal representation; compare rotations
            R2 = np.asarray(lie.so3_exp(jnp.asarray(phi2)))
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)

    def test_left_jacobian_inverse(self, rng):
        phi = random_phi(rng, 16, scale=1.5)
        J = np.asarray(lie.so3_left_jacobian(jnp.asarray(phi)))
        Jinv = np.asarray(lie.so3_left_jacobian_inv(jnp.asarray(phi)))
        eye = np.einsum("nij,njk->nik", J, Jinv)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = (rng.standard_normal((64, 6)) * 1.0).astype(np.float32)
        xi[:, 3:] = random_phi(rng, 64, scale=1.0)
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=5e-5)

    def test_compose_inverse(self, rng):
        xi = (rng.standard_normal((8, 6))).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = rng.standard_normal((4, 6)).astype(np.float32)
        x = rng.standard_normal((4, 3)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        y = np.asarray(lie.se3_apply(R, t, jnp.asarray(x)))
        T = np.asarray(lie.se3_matrix(R, t))
        xh = np.concatenate([x, np.ones((4, 1), np.float32)], -1)
        y2 = np.einsum("nij,nj->ni", T, xh)[:, :3]
        np.testing.assert_allclose(y, y2, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.standard_normal((64, 7)).astype(np.float32)
        xi[:, 3:6] = random_phi(rng, 64, scale=1.0)
        xi[:, 6] *= 0.5  # keep scale sane
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-4, rtol=1e-4)

    def test_sigma_zero_matches_se3(self, rng):
        xi6 = rng.standard_normal((16, 6)).astype(np.float32)
        xi7 = np.concatenate([xi6, np.zeros((16, 1), np.float32)], -1)
        s, R, t = lie.sim3_exp(jnp.asarray(xi7))
        R2, t2 = lie.se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = rng.standard_normal((8, 7)).astype(np.float32) * 0.7
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=2e-5)

    def test_apply(self, rng):
        xi = rng.standard_normal((4, 7)).astype(np.float32) * 0.5
        x = rng.standard_normal((4, 3)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        y = np.asarray(lie.sim3_apply(s, R, t, jnp.asarray(x)))
        y2 = np.asarray(s)[:, None] * np.einsum("nij,nj->ni", np.asarray(R), x) + np.asarray(t)
        np.testing.assert_allclose(y, y2, atol=1e-5)
