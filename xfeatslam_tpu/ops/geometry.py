"""Multi-view geometry kernels: triangulation, fundamental/essential matrices.

TPU-native replacement for /root/reference/src/GeometricTools.cc (ComputeF12,
Triangulate) plus shared helpers for the two-view initializer and local
mapping. All batched over leading dims.
"""

from __future__ import annotations

import functools as _functools

import jax as _jax
import jax.numpy as jnp

from .lie import so3_hat


def triangulate_dlt(uv1, uv2, P1, P2):
    """Linear (DLT) triangulation of matched normalized/pixel points.

    Args:
      uv1, uv2: (...,2) observations in image 1 / 2 (same convention as the
        projection rows of P1/P2).
      P1, P2: (...,3,4) projection matrices (K[R|t] for pixel obs, [R|t] for
        normalized obs).
    Returns:
      X: (...,3) triangulated points (homogeneous solve via the eigenvector
      of A^T A — equivalent to the JacobiSVD in GeometricTools::Triangulate,
      /root/reference/src/GeometricTools.cc:Triangulate, but uses a 4x4
      symmetric eigendecomposition which XLA batches well on TPU).
    """
    rows = [
        uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (...,4,4)
    # Row-normalize for f32 conditioning (pixel-scale projection rows).
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    # smallest eigenvector of symmetric AtA
    w, v = jnp.linalg.eigh(AtA)
    Xh = v[..., :, 0]
    # two inverse-iteration refinement steps sharpen the f32 eigenvector
    lam = w[..., 0]
    eye = jnp.eye(4, dtype=A.dtype)
    M = AtA - (lam[..., None, None] - 1e-6) * eye
    for _ in range(2):
        Xh = jnp.linalg.solve(M, Xh[..., :, None])[..., 0]
        Xh = Xh / (jnp.linalg.norm(Xh, axis=-1, keepdims=True) + 1e-12)
    w_last = Xh[..., 3]
    safe = jnp.where(jnp.abs(w_last) < 1e-12, 1e-12, w_last)
    return Xh[..., :3] / safe[..., None]


def projection_matrix(K, R, t):
    """K (...,3,3), R (...,3,3), t (...,3) -> P = K [R|t] (...,3,4)."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def fundamental_from_poses(K1, R1w, t1w, K2, R2w, t2w):
    """F12 such that x1^T F12 x2 = 0 for corresponding pixels, matching
    GeometricTools::ComputeF12 (/root/reference/src/GeometricTools.cc)."""
    R12 = R1w @ jnp.swapaxes(R2w, -1, -2)
    t12 = t1w - jnp.einsum("...ij,...j->...i", R12, t2w)
    t12x = so3_hat(t12)
    K1_inv_T = jnp.swapaxes(jnp.linalg.inv(K1), -1, -2)
    K2_inv = jnp.linalg.inv(K2)
    return K1_inv_T @ t12x @ R12 @ K2_inv


def essential_from_pose(R12, t12):
    """E = [t]_x R for relative pose from cam2 to cam1."""
    return so3_hat(t12) @ R12


def epipolar_dist_sq(uv1, uv2, F12):
    """Squared distance of x2 to the epipolar line F12^T x1 (pixel units).

    Mirrors the per-pair check in Pinhole::epipolarConstrain
    (/root/reference/src/CameraModels/Pinhole.cpp:107-128).
    """
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], axis=-1)
    line = jnp.einsum("...ji,...j->...i", F12, x1)  # F^T x1: line in image 2
    num = jnp.einsum("...i,...i->...", line, x2)
    den = line[..., 0] ** 2 + line[..., 1] ** 2
    return num * num / jnp.where(den < 1e-12, 1e-12, den)


def parallax_cos(X, c1, c2):
    """Cosine of the parallax angle at point X between camera centers c1,c2."""
    d1 = X - c1
    d2 = X - c2
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    return jnp.sum(d1 * d2, axis=-1) / jnp.where(n1 * n2 < 1e-12, 1e-12, n1 * n2)


@_functools.partial(_jax.jit, static_argnames=("binary",))
def triangulation_search_batched(
    K, R1, t1, uv1, desc1, free1, depth1,
    R2s, t2s, uv2s, desc2s, free2s, depth2s, nb_valid,
    fx, fy, cx, cy, bf, max_dist, ratio: float = 0.8,
    binary: bool = False,
):
    """Epipolar-gated matching + DLT triangulation + RGB-D depth fallback +
    acceptance gates against a STACK of covisible neighbors, one dispatch.

    The CreateNewMapPoints inner loop (/root/reference/src/LocalMapping.cc:
    388-713 with SearchForTriangulation ORBmatcher.cc:1092) runs per
    neighbor; as separate device calls it was ~1.4 jitted dispatches per
    tracked frame plus a swarm of eager geometry ops (bench.py --mode
    online call-site audit). Everything per-neighbor now vmaps inside one
    jitted graph; the host keeps only the create-point bookkeeping.

    Args:
      K, R1, t1, uv1 (N1,2), desc1, free1, depth1: the new keyframe.
      R2s..depth2s: (Nn, ...) stacked neighbor keyframes (pad to a bucket).
      nb_valid: (Nn,) bool — False rows are padding.
    Returns per-neighbor (idx (Nn,N1) matched slot in neighbor or -1,
      ok (Nn,N1) acceptance mask, X (Nn,N1,3) world points).
    """
    from . import matching as m

    C1 = -R1.T @ t1
    P1 = projection_matrix(K, R1, t1)
    ray1 = jnp.concatenate(
        [(uv1 - jnp.stack([cx, cy])) / jnp.stack([fx, fy]),
         jnp.ones_like(uv1[:, :1])], -1)

    def one(R2, t2, uv2, desc2, free2, depth2, nv):
        F12 = fundamental_from_poses(K, R1, t1, K, R2, t2)
        epi_d2 = epipolar_dist_sq(uv1[:, None, :], uv2[None, :, :], F12)
        pair_ok = epi_d2 < 3.84  # chi2(1) at 95%
        res = m.match_general(desc1, free1, desc2, free2 & nv,
                              max_dist=max_dist, ratio=ratio,
                              pair_mask=pair_ok, binary=binary)
        idx = jnp.clip(res.idx, 0, None)
        uv2m = uv2[idx]
        P2 = projection_matrix(K, R2, t2)
        X = triangulate_dlt(uv1, uv2m, P1, P2)
        C2 = -R2.T @ t2
        cosp = parallax_cos(X, C1, C2)
        # RGB-D rule (LocalMapping.cc:550-620): triangulate only when ray
        # parallax beats the parallax a depth measurement would give;
        # otherwise unproject from depth, or skip at near-zero parallax
        d1 = depth1
        d2 = depth2[idx]
        half = bf / fx / 2.0
        cs1 = jnp.where(d1 > 0, jnp.cos(
            2.0 * jnp.arctan2(half, jnp.maximum(d1, 1e-3))), 2.0)
        cs2 = jnp.where(d2 > 0, jnp.cos(
            2.0 * jnp.arctan2(half, jnp.maximum(d2, 1e-3))), 2.0)
        good_tri = (cosp > 0) & (cosp < 0.9998) & (cosp < jnp.minimum(cs1, cs2))
        Xd1 = (ray1 * d1[:, None] - t1) @ R1
        ray2 = jnp.concatenate(
            [(uv2m - jnp.stack([cx, cy])) / jnp.stack([fx, fy]),
             jnp.ones_like(uv2m[:, :1])], -1)
        Xd2 = (ray2 * d2[:, None] - t2) @ R2
        use_d1 = ~good_tri & (d1 > 0) & (cs1 <= cs2)
        use_d2 = ~good_tri & ~use_d1 & (d2 > 0)
        X = jnp.where(use_d1[:, None], Xd1,
                      jnp.where(use_d2[:, None], Xd2, X))
        Xc1 = X @ R1.T + t1
        Xc2 = X @ R2.T + t2
        ok = res.mask & (Xc1[:, 2] > 0.05) & (Xc2[:, 2] > 0.05)
        ok &= good_tri | use_d1 | use_d2
        for Xc, uv in ((Xc1, uv1), (Xc2, uv2m)):
            z = jnp.maximum(Xc[:, 2], 1e-6)
            u = fx * Xc[:, 0] / z + cx
            v = fy * Xc[:, 1] / z + cy
            err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
            ok &= err2 < 5.991
        return res.idx, ok & nv, X

    return _jax.vmap(one)(R2s, t2s, uv2s, desc2s, free2s, depth2s, nb_valid)
