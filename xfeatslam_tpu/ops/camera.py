"""Camera models (pinhole + Kannala-Brandt fisheye) as pure JAX functions.

TPU-native replacement for the polymorphic GeometricCamera hierarchy in the
reference (/root/reference/include/CameraModels/GeometricCamera.h:61-86,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp).

All functions broadcast over leading batch dims. Points `Xc` are in the
camera frame; pixels `uv` are (u, v).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-9


class Pinhole(NamedTuple):
    """Pinhole intrinsics + OpenCV radial-tangential distortion.

    Matches the parameterization read from the YAML settings
    (/root/reference/src/Settings.cc readCamera1: fx fy cx cy [k1 k2 p1 p2 [k3]]).
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray = jnp.float32(0.0)
    k2: jnp.ndarray = jnp.float32(0.0)
    p1: jnp.ndarray = jnp.float32(0.0)
    p2: jnp.ndarray = jnp.float32(0.0)
    k3: jnp.ndarray = jnp.float32(0.0)

    @staticmethod
    def from_list(vals):
        vals = [jnp.float32(v) for v in vals] + [jnp.float32(0.0)] * (9 - len(vals))
        return Pinhole(*vals[:9])

    def params_list(self):
        return [float(p) for p in self]

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


class KannalaBrandt8(NamedTuple):
    """KB8 fisheye: theta-polynomial model
    (/root/reference/src/CameraModels/KannalaBrandt8.cpp:28-144)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k0: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray

    @staticmethod
    def from_list(vals):
        return KannalaBrandt8(*[jnp.float32(v) for v in vals])

    def params_list(self):
        return [float(p) for p in self]

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


# ---------------------------------------------------------------------------
# Pinhole (undistorted projection — used by the optimizers; keypoints are
# undistorted once at frame construction, mirroring Frame::UndistortKeyPoints)
# ---------------------------------------------------------------------------

def pinhole_project(cam: Pinhole, Xc):
    """Camera-frame points (...,3) -> pixels (...,2). No distortion."""
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(cam: Pinhole, uv):
    """Pixels (...,2) -> unit-plane bearing (...,3) with z=1. No distortion."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(cam: Pinhole, Xc):
    """d(uv)/d(Xc): (...,2,3). Matches Pinhole::projectJac
    (/root/reference/src/CameraModels/Pinhole.cpp:66-82)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Distortion (for undistorting measured keypoints at frame build time,
# replacing cv::undistortPoints used at /root/reference/src/Frame.cc:940)
# ---------------------------------------------------------------------------

def distort_normalized(cam: Pinhole, xy):
    """Apply radial-tangential distortion to normalized coords (...,2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy_prod = 2.0 * x * y
    xd = x * radial + cam.p1 * xy_prod + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p2 * xy_prod + cam.p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Pinhole, uv, iters: int = 8):
    """Iteratively undistort pixel keypoints (...,2) -> undistorted pixels.

    Fixed-point iteration identical in spirit to cv::undistortPoints: start
    from the distorted normalized coords and repeatedly remove the estimated
    distortion. 8 iterations is beyond OpenCV's default (5).
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)

    def body(i, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy_prod = 2.0 * x * y
        dx = cam.p1 * xy_prod + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p2 * xy_prod + cam.p1 * (r2 + 2.0 * y * y)
        inv_r = 1.0 / jnp.where(jnp.abs(radial) < _EPS, _EPS, radial)
        xn = (xy0[..., 0] - dx) * inv_r
        yn = (xy0[..., 1] - dy) * inv_r
        return jnp.stack([xn, yn], axis=-1)

    xy = xy0
    for i in range(iters):
        xy = body(i, xy)
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 fisheye
# ---------------------------------------------------------------------------

def kb8_project(cam: KannalaBrandt8, Xc):
    """theta-polynomial projection
    (/root/reference/src/CameraModels/KannalaBrandt8.cpp:28-60)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + _EPS * _EPS)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (cam.k0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * cam.k3))))
    scale = jnp.where(r < 1e-6, jnp.ones_like(r), theta_d / r)
    u = cam.fx * scale * x + cam.cx
    v = cam.fy * scale * y + cam.cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(cam: KannalaBrandt8, uv, iters: int = 10):
    """Newton inversion of the theta polynomial
    (/root/reference/src/CameraModels/KannalaBrandt8.cpp:111-144)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    theta_d = jnp.sqrt(mx * mx + my * my + _EPS * _EPS)
    theta_d = jnp.clip(theta_d, -jnp.pi / 2.0, jnp.pi / 2.0)

    theta = theta_d

    for _ in range(iters):
        t2 = theta * theta
        t4, t6, t8 = t2 * t2, t2 * t2 * t2, t2 * t2 * t2 * t2
        k0t, k1t, k2t, k3t = cam.k0 * t2, cam.k1 * t4, cam.k2 * t6, cam.k3 * t8
        f = theta * (1.0 + k0t + k1t + k2t + k3t) - theta_d
        fp = 1.0 + 3.0 * k0t + 5.0 * k1t + 7.0 * k2t + 9.0 * k3t
        theta = theta - f / jnp.where(jnp.abs(fp) < _EPS, _EPS, fp)

    scale = jnp.where(jnp.abs(theta_d) < 1e-8, jnp.ones_like(theta),
                      jnp.tan(theta) / theta_d)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(cam: KannalaBrandt8, Xc):
    """Analytic d(uv)/dXc (...,2,3)
    (/root/reference/src/CameraModels/KannalaBrandt8.cpp:145-214)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + _EPS * _EPS)
    R2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    t4, t6, t8 = t2 * t2, t2 * t2 * t2, t2 * t2 * t2 * t2

    f = theta * (1.0 + cam.k0 * t2 + cam.k1 * t4 + cam.k2 * t6 + cam.k3 * t8)
    fd = 1.0 + 3.0 * cam.k0 * t2 + 5.0 * cam.k1 * t4 + 7.0 * cam.k2 * t6 + 9.0 * cam.k3 * t8

    inv_r = 1.0 / r
    inv_r2 = inv_r * inv_r
    dtheta_dx = x * z / (R2 * r)
    dtheta_dy = y * z / (R2 * r)
    dtheta_dz = -r / R2
    # d(f/r)/d* = (fd * dtheta * r - f * dr)/r^2
    dr_dx, dr_dy = x * inv_r, y * inv_r
    g = f * inv_r
    dg_dx = (fd * dtheta_dx - g * dr_dx) * inv_r
    dg_dy = (fd * dtheta_dy - g * dr_dy) * inv_r
    dg_dz = fd * dtheta_dz * inv_r
    del inv_r2

    du_dx = cam.fx * (g + x * dg_dx)
    du_dy = cam.fx * x * dg_dy
    du_dz = cam.fx * x * dg_dz
    dv_dx = cam.fy * y * dg_dx
    dv_dy = cam.fy * (g + y * dg_dy)
    dv_dz = cam.fy * y * dg_dz
    row0 = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row1 = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# Generic dispatch helpers ---------------------------------------------------

def stereo_triangulate_matches(cam1, cam2, uv1, uv2, R12, t12,
                               sigma2_1=1.0, sigma2_2=1.0,
                               min_parallax_cos: float = 0.9998):
    """Batched KannalaBrandt8::TriangulateMatches
    (/root/reference/src/CameraModels/KannalaBrandt8.cpp:309-375): for N
    matched keypoint pairs of a (possibly fisheye) stereo rig with extrinsic
    T12 (camera1<-camera2), unproject both rays, gate by parallax,
    triangulate (DLT on normalized coordinates, camera-1 frame), and gate by
    chirality + chi2 reprojection in both views.

    Where the reference loops matches calling a scalar routine, this is one
    vectorized graph over all N pairs (works for Pinhole too).

    Returns (X (N,3) points in camera-1 frame, depth (N,) z in camera 1,
    ok (N,) bool).
    """
    r1 = unproject(cam1, uv1)  # (N,3), z=1-normalized
    r2 = unproject(cam2, uv2)
    r21 = r2 @ R12.T
    cosp = jnp.sum(r1 * r21, -1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r21, axis=-1) + _EPS
    )
    ok = cosp <= min_parallax_cos

    # DLT in normalized image coordinates: P1 = [I|0], P2 = [R21|-R21 t12]
    R21 = R12.T
    t2 = -R21 @ t12
    x1, y1 = r1[..., 0], r1[..., 1]
    x2, y2 = r2[..., 0], r2[..., 1]
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    P2 = jnp.concatenate([R21, t2[:, None]], 1)
    rows = jnp.stack([
        x1[..., None] * P1[2] - P1[0],
        y1[..., None] * P1[2] - P1[1],
        x2[..., None] * P2[2] - P2[0],
        y2[..., None] * P2[2] - P2[1],
    ], -2)  # (N,4,4)
    _u, _s, vh = jnp.linalg.svd(rows)
    Xh = vh[..., -1, :]
    X = Xh[..., :3] / jnp.where(jnp.abs(Xh[..., 3:]) < _EPS, _EPS, Xh[..., 3:])

    z1 = X[..., 2]
    X2 = X @ R21.T + t2
    z2 = X2[..., 2]
    ok &= (z1 > 0) & (z2 > 0)
    e1 = project(cam1, X) - uv1
    e2 = project(cam2, X2) - uv2
    ok &= jnp.sum(e1 * e1, -1) <= 5.991 * sigma2_1
    ok &= jnp.sum(e2 * e2, -1) <= 5.991 * sigma2_2
    return X, z1, ok


def project(cam, Xc):
    if isinstance(cam, Pinhole):
        return pinhole_project(cam, Xc)
    return kb8_project(cam, Xc)


def unproject(cam, uv):
    if isinstance(cam, Pinhole):
        return pinhole_unproject(cam, uv)
    return kb8_unproject(cam, uv)


def project_jac(cam, Xc):
    if isinstance(cam, Pinhole):
        return pinhole_project_jac(cam, Xc)
    return kb8_project_jac(cam, Xc)
