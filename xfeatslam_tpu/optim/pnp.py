"""PnP RANSAC for relocalization.

Role of /root/reference/src/MLPnPsolver.cpp (1,056 LoC, Urban's ML-PnP inside
RANSAC, used by Tracking::Relocalization :3657). TPU-native design: all
RANSAC hypotheses are solved in one batched pass — a 6-point DLT for the
projection matrix per hypothesis (12x12 SVD, batched), decomposed to (R,t),
scored by reprojection chi2 against all correspondences at once. The winner
is refined by the robust pose LM (optim/pose_opt.py), mirroring the
reference's solve -> refine -> pose-optimize ladder.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.camera import Pinhole

CHI2_INLIER = 5.991


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray  # (3,3)
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray


def _dlt_pose(X, xn):
    """Batched 6+ point DLT for P=[R|t] from world points X (B,6,3) and
    normalized image coords xn (B,6,2). Returns (R (B,3,3), t (B,3))."""
    B, n, _ = X.shape
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], -1)  # (B,6,4)
    z = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([Xh, z, -u * Xh], -1)  # (B,6,12)
    r2 = jnp.concatenate([z, Xh, -v * Xh], -1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B,12,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[:, -1].reshape(B, 3, 4)
    M = P[:, :, :3]
    # orthonormalize M -> R with scale; sign by chirality (det>0)
    det = jnp.linalg.det(M)
    P = P * jnp.sign(det)[:, None, None]
    M = P[:, :, :3]
    u_, s_, vt_ = jnp.linalg.svd(M)
    R = u_ @ vt_
    scale = jnp.mean(s_, axis=-1)
    t = P[:, :, 3] / jnp.maximum(scale, 1e-12)[:, None]
    return R, t


def _reproj_chi2(R, t, X, uv, cam: Pinhole):
    """(B,3,3),(B,3),(N,3),(N,2) -> (B,N) chi2."""
    Xc = jnp.einsum("bij,nj->bni", R, X) + t[:, None, :]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * Xc[..., 0] / zs + cam.cx
    v = cam.fy * Xc[..., 1] / zs + cam.cy
    chi2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    return jnp.where(z > 0.01, chi2, 1e12)


@functools.partial(jax.jit, static_argnames=("iters",))
def pnp_ransac(Xw, uv, valid, cam: Pinhole, key, iters: int = 128,
               min_inliers: int = 10):
    """Batched-RANSAC PnP.

    Args:
      Xw: (N,3) world points; uv: (N,2) observed undistorted pixels;
      valid: (N,) bool.
    """
    N = Xw.shape[0]
    w = valid.astype(jnp.float32) + 1e-6
    logits = jnp.log(w)[None, None, :].repeat(iters, 1).reshape(iters, 1, N).repeat(6, 1)
    idx = jax.random.categorical(key, logits, axis=-1)  # (iters,6)

    xn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1
    )
    R_all, t_all = _dlt_pose(Xw[idx], xn[idx])
    chi2 = _reproj_chi2(R_all, t_all, Xw, uv, cam)  # (iters,N)
    inl = (chi2 < CHI2_INLIER) & valid[None, :]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    inliers = inl[best]
    n = counts[best]
    success = n >= min_inliers
    return PnPResult(success, R_all[best], t_all[best], inliers, n)
