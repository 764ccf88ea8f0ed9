"""KB8 stereo-fisheye: batched TriangulateMatches kernel + the two-camera
frame builder on a rendered fisheye rig
(/root/reference/src/CameraModels/KannalaBrandt8.cpp:222-433,
/root/reference/src/Frame.cc:1227-1391)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xfeatslam_tpu.ops import camera as camera_ops
from xfeatslam_tpu.ops.camera import KannalaBrandt8, stereo_triangulate_matches
from xfeatslam_tpu.utils import synthetic

# EuRoC/TUM-VI-like fisheye intrinsics
KB1 = KannalaBrandt8.from_list(
    [190.98, 190.97, 254.93, 256.9, 0.0034823894, 0.0007150348,
     -0.0020532361, 0.00020293673])
KB2 = KannalaBrandt8.from_list(
    [190.44, 190.44, 252.59, 254.65, 0.0034003171, 0.0007233193,
     -0.0020532361, 0.00020293673])
HW = (512, 512)


def make_rig():
    """T_c1_c2: camera 2 is 11 cm to the right with a slight yaw."""
    yaw = 0.02
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T[0, 3] = 0.11
    return T


class TestTriangulateMatchesKernel:
    def test_recovers_points(self):
        rng = np.random.default_rng(0)
        N = 256
        X = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.0, 1.0, N),
                      rng.uniform(0.5, 4.0, N)], -1).astype(np.float32)
        T = make_rig()
        R12, t12 = T[:3, :3], T[:3, 3]
        # camera-2 coords: X2 = R12^T (X - t12)
        X2 = (X - t12) @ R12
        uv1 = np.asarray(camera_ops.kb8_project(KB1, jnp.asarray(X)))
        uv2 = np.asarray(camera_ops.kb8_project(KB2, jnp.asarray(X2)))
        inb = ((uv1 > 2) & (uv1 < 509)).all(-1) & ((uv2 > 2) & (uv2 < 509)).all(-1)
        Xr, z1, ok = stereo_triangulate_matches(
            KB1, KB2, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(R12), jnp.asarray(t12))
        Xr, z1, ok = np.asarray(Xr), np.asarray(z1), np.asarray(ok)
        sel = ok & inb
        assert sel.sum() > 0.8 * inb.sum()
        err = np.linalg.norm(Xr[sel] - X[sel], axis=-1)
        assert np.median(err) < 5e-3, np.median(err)
        np.testing.assert_allclose(z1[sel], X[sel][:, 2], rtol=2e-2)

    def test_parallax_gate_rejects_distant_points(self):
        """An 11 cm baseline gives < 0.0115 rad of parallax beyond ~10 m —
        under the 0.9998 cos gate those must be rejected (reference returns
        -1, KannalaBrandt8.cpp:318)."""
        T = make_rig()
        R12, t12 = T[:3, :3], T[:3, 3]
        X = np.array([[0.2, 0.1, 40.0], [-0.3, 0.2, 60.0]], np.float32)
        X2 = (X - t12) @ R12
        uv1 = np.asarray(camera_ops.kb8_project(KB1, jnp.asarray(X)))
        uv2 = np.asarray(camera_ops.kb8_project(KB2, jnp.asarray(X2)))
        _X, _z, ok = stereo_triangulate_matches(
            KB1, KB2, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(R12), jnp.asarray(t12))
        assert not np.asarray(ok).any()

    def test_reprojection_gate_rejects_bad_matches(self):
        rng = np.random.default_rng(1)
        N = 64
        X = np.stack([rng.uniform(-1, 1, N), rng.uniform(-0.8, 0.8, N),
                      rng.uniform(0.8, 3.0, N)], -1).astype(np.float32)
        T = make_rig()
        R12, t12 = T[:3, :3], T[:3, 3]
        X2 = (X - t12) @ R12
        uv1 = np.asarray(camera_ops.kb8_project(KB1, jnp.asarray(X)))
        uv2 = np.asarray(camera_ops.kb8_project(KB2, jnp.asarray(X2)))
        # scramble the right-image correspondence (wrong matches)
        uv2_bad = uv2[rng.permutation(N)]
        _X, _z, ok_good = stereo_triangulate_matches(
            KB1, KB2, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(R12), jnp.asarray(t12))
        _X, _z, ok_bad = stereo_triangulate_matches(
            KB1, KB2, jnp.asarray(uv1), jnp.asarray(uv2_bad),
            jnp.asarray(R12), jnp.asarray(t12))
        assert np.asarray(ok_good).mean() > 0.8
        assert np.asarray(ok_bad).mean() < 0.1

    def test_works_for_pinhole_too(self):
        from xfeatslam_tpu.ops.camera import Pinhole

        cam = Pinhole.from_list([500.0, 500.0, 320.0, 240.0])
        rng = np.random.default_rng(2)
        N = 64
        X = np.stack([rng.uniform(-0.8, 0.8, N), rng.uniform(-0.6, 0.6, N),
                      rng.uniform(1.0, 3.0, N)], -1).astype(np.float32)
        t12 = np.array([0.1, 0, 0], np.float32)
        R12 = np.eye(3, dtype=np.float32)
        X2 = X - t12
        uv1 = np.asarray(camera_ops.pinhole_project(cam, jnp.asarray(X)))
        uv2 = np.asarray(camera_ops.pinhole_project(cam, jnp.asarray(X2)))
        Xr, z1, ok = stereo_triangulate_matches(
            cam, cam, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(R12), jnp.asarray(t12))
        sel = np.asarray(ok)
        assert sel.mean() > 0.9
        np.testing.assert_allclose(np.asarray(Xr)[sel], X[sel], atol=5e-3)


def fisheye_rays(cam, hw):
    H, W = hw
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    uv = np.stack([u, v], -1).reshape(-1, 2)
    rays = np.asarray(camera_ops.kb8_unproject(cam, jnp.asarray(uv)))
    return rays.reshape(H, W, 3)


class TestFisheyeFrame:
    def test_rendered_rig_depth(self):
        """Render the room corner through both fisheye cameras of a real
        rig geometry, build the two-camera frame, and check the triangulated
        keypoint depths against the rendered ground truth."""
        from xfeatslam_tpu.models.orb import ORBExtractor
        from xfeatslam_tpu.slam.frame import FramePipeline

        scene = synthetic.RoomScene(seed=3)
        T = make_rig()
        # camera 1 at a gentle pose looking +z
        R1 = np.eye(3, dtype=np.float32)
        t1 = np.array([0.0, 0.0, 0.0], np.float32)
        # camera 2 pose: Tcw2 = T_c2_c1 * Tcw1 = inv(T_c1_c2) * Tcw1
        T21 = np.linalg.inv(T)
        R2 = (T21[:3, :3] @ R1).astype(np.float32)
        t2 = (T21[:3, :3] @ t1 + T21[:3, 3]).astype(np.float32)
        rays1 = fisheye_rays(KB1, HW)
        rays2 = fisheye_rays(KB2, HW)
        img1, dep1 = scene.render(None, R1, t1, HW, rays_c=rays1)
        img2, _ = scene.render(None, R2, t2, HW, rays_c=rays2)

        pipe = FramePipeline(ORBExtractor(nfeatures=1000), KB1, bf=21.0,
                             depth_factor=1.0)
        f = pipe.build_stereo_fisheye(
            img1, img2, 0.0, KB2, T,
            lapping1=(0, 511), lapping2=(0, 511),
        )
        sel = f.valid & (f.depth > 0)
        assert sel.sum() >= 100, sel.sum()
        xi = np.clip(np.round(f.kpts[sel, 0]).astype(int), 0, HW[1] - 1)
        yi = np.clip(np.round(f.kpts[sel, 1]).astype(int), 0, HW[0] - 1)
        gt = dep1[yi, xi]
        good = gt > 0
        rel = np.abs(f.depth[sel][good] - gt[good]) / gt[good]
        assert np.median(rel) < 0.05, np.median(rel)
