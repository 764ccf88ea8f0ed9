"""Camera model tests: project/unproject consistency, distortion round trips,
Jacobians vs autodiff (parity targets: /root/reference/src/CameraModels/)."""

import numpy as np
import jax
import jax.numpy as jnp

from xfeatslam_tpu.ops import camera


TUM1 = camera.Pinhole.from_list(
    [517.306408, 516.469215, 318.643040, 255.313989,
     0.262383, -0.953104, -0.005358, 0.002628, 1.163314]
)  # TUM1.yaml intrinsics (examples/RGB-D/TUM1.yaml in the reference)

KB8 = camera.KannalaBrandt8.from_list(
    [190.978477, 190.973307, 254.931706, 256.897442,
     0.003482389402, 0.000715034845, -0.002053236141, 0.000202936736]
)  # TUM-VI 512 fisheye intrinsics


class TestPinhole:
    def test_project_unproject(self, rng):
        X = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(0.5, 5.0, 100)
        uv = camera.pinhole_project(TUM1, jnp.asarray(X))
        ray = camera.pinhole_unproject(TUM1, uv)
        Xn = np.asarray(ray) * X[:, 2:3]
        np.testing.assert_allclose(Xn, X, atol=1e-3)

    def test_jacobian_vs_autodiff(self, rng):
        X = rng.uniform(0.2, 2.0, (16, 3)).astype(np.float32)
        X[:, 2] += 1.0
        J = np.asarray(camera.pinhole_project_jac(TUM1, jnp.asarray(X)))
        J_ad = np.asarray(jax.vmap(jax.jacfwd(lambda x: camera.pinhole_project(TUM1, x)))(jnp.asarray(X)))
        np.testing.assert_allclose(J, J_ad, atol=1e-3, rtol=1e-3)

    def test_undistort_roundtrip(self, rng):
        # sample normalized coords in the image interior, distort, undistort
        x = rng.uniform(-0.3, 0.3, (200,)).astype(np.float32)
        y = rng.uniform(-0.25, 0.25, (200,)).astype(np.float32)
        xy = jnp.stack([jnp.asarray(x), jnp.asarray(y)], -1)
        xyd = camera.distort_normalized(TUM1, xy)
        uvd = jnp.stack(
            [TUM1.fx * xyd[..., 0] + TUM1.cx, TUM1.fy * xyd[..., 1] + TUM1.cy], -1
        )
        uv_un = np.asarray(camera.undistort_points(TUM1, uvd))
        uv_true = np.stack([np.asarray(TUM1.fx) * x + np.asarray(TUM1.cx),
                            np.asarray(TUM1.fy) * y + np.asarray(TUM1.cy)], -1)
        np.testing.assert_allclose(uv_un, uv_true, atol=0.05)  # < 0.05 px


class TestKB8:
    def test_project_unproject(self, rng):
        X = rng.uniform(-1.5, 1.5, (100, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(0.5, 4.0, 100)
        uv = camera.kb8_project(KB8, jnp.asarray(X))
        ray = np.asarray(camera.kb8_unproject(KB8, uv))
        # rays are scale-free: compare directions
        dir_true = X / np.linalg.norm(X, axis=-1, keepdims=True)
        dir_est = ray / np.linalg.norm(ray, axis=-1, keepdims=True)
        np.testing.assert_allclose(dir_est, dir_true, atol=1e-3)

    def test_jacobian_vs_autodiff(self, rng):
        X = rng.uniform(0.1, 1.0, (16, 3)).astype(np.float32)
        X[:, 2] += 0.5
        J = np.asarray(camera.kb8_project_jac(KB8, jnp.asarray(X)))
        J_ad = np.asarray(jax.vmap(jax.jacfwd(lambda x: camera.kb8_project(KB8, x)))(jnp.asarray(X)))
        np.testing.assert_allclose(J, J_ad, atol=1e-3, rtol=2e-3)


class TestGeometry:
    def test_triangulate(self, rng):
        from xfeatslam_tpu.ops import geometry, lie

        X = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(2.0, 6.0, 50)
        K = np.asarray(TUM1.K)
        R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        xi = np.array([0.3, 0.05, 0.02, 0.01, 0.2, 0.03], np.float32)
        R2, t2 = lie.se3_exp(jnp.asarray(xi))
        P1 = geometry.projection_matrix(jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1))
        P2 = geometry.projection_matrix(jnp.asarray(K), R2, t2)
        uv1 = camera.pinhole_project(TUM1, jnp.asarray(X))
        X2 = lie.se3_apply(R2, t2, jnp.asarray(X))
        uv2 = camera.pinhole_project(TUM1, X2)
        Xt = np.asarray(geometry.triangulate_dlt(uv1, uv2, P1, P2))
        np.testing.assert_allclose(Xt, X, atol=5e-2, rtol=1e-3)

    def test_epipolar(self, rng):
        from xfeatslam_tpu.ops import geometry, lie

        X = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(2.0, 6.0, 30)
        K = jnp.asarray(np.asarray(TUM1.K))
        xi = np.array([0.1, -0.2, 0.05, 0.04, -0.1, 0.02], np.float32)
        R2, t2 = lie.se3_exp(jnp.asarray(xi))
        R1 = jnp.eye(3)
        t1 = jnp.zeros(3)
        uv1 = camera.pinhole_project(TUM1, jnp.asarray(X))
        uv2 = camera.pinhole_project(TUM1, lie.se3_apply(R2, t2, jnp.asarray(X)))
        F12 = geometry.fundamental_from_poses(K, R1, t1, K, R2, t2)
        d = np.asarray(geometry.epipolar_dist_sq(uv1, uv2, F12))
        np.testing.assert_allclose(d, 0.0, atol=1e-2)
