"""Two-view reconstruction: batched H/F RANSAC monocular initializer.

TPU-native replacement for /root/reference/src/TwoViewReconstruction.cc
(929 LoC): the reference runs 200 RANSAC iterations of 8-point F and 4-point
H sequentially on CPU threads (:41-140), scores both models, picks H if
SH/(SH+SF) > 0.5 (:120-139), then disambiguates motion hypotheses with
chirality/parallax checks (ReconstructH Faugeras 8-motion / ReconstructF
4-motion).

Here ALL RANSAC hypotheses are evaluated in one batched pass (200 models x
N correspondences = a handful of einsums), and the motion disambiguation
triangulates all candidate (R,t) in parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import geometry, lie

SIGMA = 1.0
CHI2_H = 5.991
CHI2_F = 3.841
N_ITERS = 200


class TwoViewResult(NamedTuple):
    success: jnp.ndarray  # () bool
    R: jnp.ndarray  # (3,3) cam1->cam2
    t: jnp.ndarray  # (3,) unit norm
    points: jnp.ndarray  # (N,3) triangulated in cam1 frame
    good: jnp.ndarray  # (N,) bool triangulated inlier
    used_h: jnp.ndarray  # () bool which model won


def _normalize_points(x, valid):
    """Hartley normalization (TwoViewReconstruction::Normalize)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (x * w[:, None]).sum(0) / n
    d = jnp.abs(x - mean) * w[:, None]
    md = jnp.maximum(d.sum(0) / n, 1e-6)
    s = 1.0 / md
    xn = (x - mean) * s
    T = jnp.array(
        [[s[0], 0, -mean[0] * s[0]], [0, s[1], -mean[1] * s[1]], [0, 0, 1.0]]
    )
    return xn, T


def _dlt_h(p1, p2):
    """4+ point homography DLT. p1,p2: (B,4,2) -> (B,3,3)."""
    B, n, _ = p1.shape
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B,2n,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[:, -1].reshape(B, 3, 3)


def _eight_point_f(p1, p2):
    """8-point fundamental. p1,p2: (B,8,2) -> (B,3,3) rank-2."""
    B = p1.shape[0]
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1
    )  # (B,8,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[:, -1].reshape(B, 3, 3)
    # enforce rank 2
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[:, 2].set(0.0)
    return u @ (s[..., None] * vt2)


def _score_h(H, p1, p2, valid):
    """Symmetric transfer error score (CheckHomography)."""
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)  # (N,3)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], -1)
    Hx1 = jnp.einsum("bij,nj->bni", H, x1)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hx2 = jnp.einsum("bij,nj->bni", Hinv, x2)
    e12 = jnp.sum(
        (Hx1[..., :2] / jnp.where(jnp.abs(Hx1[..., 2:]) < 1e-9, 1e-9, Hx1[..., 2:]) - p2) ** 2,
        -1,
    ) / (SIGMA ** 2)
    e21 = jnp.sum(
        (Hx2[..., :2] / jnp.where(jnp.abs(Hx2[..., 2:]) < 1e-9, 1e-9, Hx2[..., 2:]) - p1) ** 2,
        -1,
    ) / (SIGMA ** 2)
    in12 = (e12 < CHI2_H) & valid
    in21 = (e21 < CHI2_H) & valid
    score = jnp.where(in12, CHI2_H - e12, 0.0) + jnp.where(in21, CHI2_H - e21, 0.0)
    return score.sum(-1), in12 & in21


def _score_f(F, p1, p2, valid):
    """Epipolar distance score (CheckFundamental)."""
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], -1)
    l2 = jnp.einsum("bij,nj->bni", F, x1)  # line in image 2
    l1 = jnp.einsum("bji,nj->bni", F, x2)  # line in image 1
    d2 = jnp.einsum("ni,bni->bn", x2, l2) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    ) / (SIGMA ** 2)
    d1 = jnp.einsum("ni,bni->bn", x1, l1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    ) / (SIGMA ** 2)
    in2 = (d2 < CHI2_F) & valid
    in1 = (d1 < CHI2_F) & valid
    # reference scores with thScore=5.991 even for F (CheckFundamental)
    score = jnp.where(in2, CHI2_H - d2, 0.0) + jnp.where(in1, CHI2_H - d1, 0.0)
    return score.sum(-1), in1 & in2


def _check_rt(R, t, p1n, p2n, inlier):
    """Triangulate with (R|t), count points passing chirality/parallax/
    reprojection (CheckRT, /root/reference/src/TwoViewReconstruction.cc).
    Works in normalized camera coords. Returns (count, X (N,3), good (N,))."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    P2 = jnp.concatenate([R, t[:, None]], -1)
    X = geometry.triangulate_dlt(p1n, p2n, P1, P2)
    z1 = X[..., 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[..., 2]
    C2 = -R.T @ t
    cosp = geometry.parallax_cos(X, jnp.zeros(3), C2)
    ok = (z1 > 0) & (z2 > 0) & (cosp < 0.99998) & inlier
    # reprojection in normalized coords (threshold ~4 sigma / f)
    e1 = jnp.sum((X[..., :2] / jnp.maximum(z1[..., None], 1e-9) - p1n) ** 2, -1)
    e2 = jnp.sum((Xc2[..., :2] / jnp.maximum(z2[..., None], 1e-9) - p2n) ** 2, -1)
    thr = (4.0 / 500.0) ** 2
    ok = ok & (e1 < thr) & (e2 < thr)
    return ok.sum(), X, ok


def _motions_from_f(F, K):
    """E = K^T F K -> 4 motion hypotheses (DecomposeE)."""
    E = jnp.swapaxes(K, 0, 1) @ F @ K
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _motions_from_h(H, K):
    """Faugeras SVD decomposition of a homography into 8 hypotheses
    (ReconstructH). Implemented via the standard Malis-Vargas/Faugeras
    construction on Hn = K^-1 H K."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    u, s, vt = jnp.linalg.svd(A)
    d1, d2, d3 = s[0], s[1], s[2]
    s_det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    # x1/x3 components (Faugeras)
    eps = 1e-9
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' = d2 (positive)
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 + d3) * d2, eps)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    for i in range(4):
        st = sin_t * jnp.sign(x1s[i] * x3s[i] + eps)
        Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = jnp.array(
            [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]]
        )
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        R = s_det * u @ Rp @ vt
        t = u @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), eps))
    # case d' = -d2
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 - d3) * d2, eps)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    for i in range(4):
        sp = sin_p * jnp.sign(x1s[i] * x3s[i] + eps)
        Rp = jnp.array(
            [[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]]
        )
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        R = s_det * u @ Rp @ vt
        t = u @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), eps))
    return jnp.stack(Rs), jnp.stack(ts)


@functools.partial(jax.jit, static_argnames=())
def reconstruct_two_views(uv1, uv2, valid, K, key):
    """Full monocular initializer on matched keypoints.

    Args:
      uv1, uv2: (N,2) matched undistorted pixels (frame1 -> frame2).
      valid: (N,) bool.
      K: (3,3) intrinsics.
      key: PRNG for RANSAC minimal sets.

    Returns TwoViewResult (R,t maps cam1 coords to cam2: X2 = R X1 + t).
    Success criteria follow ReconstructF/H: enough triangulated points,
    clear best hypothesis (Tracking::MonocularInitialization requirements).
    """
    N = uv1.shape[0]
    p1n_h, T1 = _normalize_points(uv1, valid)
    p2n_h, T2 = _normalize_points(uv2, valid)

    # RANSAC minimal sets: (ITERS, 8) indices among valid (sample from all,
    # invalid draws are tolerated: models scored against valid mask anyway)
    w = valid.astype(jnp.float32) + 1e-6
    idx = jax.random.categorical(
        key, jnp.log(w)[None, None, :].repeat(N_ITERS, 1).reshape(N_ITERS, 1, N).repeat(8, 1),
        axis=-1,
    )  # (ITERS, 8)

    s1 = p1n_h[idx]  # (ITERS,8,2)
    s2 = p2n_h[idx]

    H_n = _dlt_h(s1[:, :4], s2[:, :4])
    F_n = _eight_point_f(s1, s2)
    # denormalize: H = T2^-1 Hn T1; F = T2^T Fn T1
    T2inv = jnp.linalg.inv(T2)
    H_all = T2inv[None] @ H_n @ T1[None]
    F_all = jnp.swapaxes(T2, 0, 1)[None] @ F_n @ T1[None]

    sh, in_h = _score_h(H_all, uv1, uv2, valid)
    sf, in_f = _score_f(F_all, uv1, uv2, valid)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)
    SH, SF = sh[bh], sf[bf]
    inliers_h = in_h[bh]
    inliers_f = in_f[bf]

    # refit each winning model on ALL its inliers (weighted DLT rows) —
    # minimal-sample models carry ~1 deg pose noise that the refit removes
    def weighted_refit_f(inl):
        x1, y1 = p1n_h[:, 0], p1n_h[:, 1]
        x2, y2 = p2n_h[:, 0], p2n_h[:, 1]
        o = jnp.ones_like(x1)
        A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1)
        A = A * inl[:, None]
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        F = vt[-1].reshape(3, 3)
        u, s, vt2 = jnp.linalg.svd(F)
        s = s.at[2].set(0.0)
        return u @ (s[:, None] * vt2)

    def weighted_refit_h(inl):
        x1, y1 = p1n_h[:, 0], p1n_h[:, 1]
        x2, y2 = p2n_h[:, 0], p2n_h[:, 1]
        z = jnp.zeros_like(x1)
        o = jnp.ones_like(x1)
        r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
        r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
        A = jnp.concatenate([r1 * inl[:, None], r2 * inl[:, None]], axis=0)
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        return vt[-1].reshape(3, 3)

    F_best = jnp.swapaxes(T2, 0, 1) @ weighted_refit_f(
        inliers_f.astype(jnp.float32)
    ) @ T1
    H_best = T2inv @ weighted_refit_h(inliers_h.astype(jnp.float32)) @ T1
    # rescore after refit (inlier sets may grow)
    _, in_h2 = _score_h(H_best[None], uv1, uv2, valid)
    _, in_f2 = _score_f(F_best[None], uv1, uv2, valid)
    inliers_h = in_h2[0]
    inliers_f = in_f2[0]

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.5

    # normalized camera coords for triangulation
    Kinv = jnp.linalg.inv(K)
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], -1) @ Kinv.T
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], -1) @ Kinv.T
    p1n = x1[..., :2]
    p2n = x2[..., :2]

    Rs_f, ts_f = _motions_from_f(F_best, K)
    Rs_h, ts_h = _motions_from_h(H_best, K)
    Rs = jnp.concatenate([Rs_h, Rs_f[:4]])  # (12,3,3): 8 H + 4 F
    ts = jnp.concatenate([ts_h, ts_f[:4]])
    # mask hypotheses by which model won
    hyp_valid = jnp.concatenate(
        [jnp.repeat(use_h, 8), jnp.repeat(~use_h, 4)]
    )
    inlier_mask = jnp.where(use_h, inliers_h, inliers_f)

    counts, Xs, goods = jax.vmap(
        lambda R, t: _check_rt(R, t, p1n, p2n, inlier_mask)
    )(Rs, ts)
    counts = jnp.where(hyp_valid, counts, -1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_total = jnp.maximum(inlier_mask.sum(), 1)
    # second best must be clearly worse (ReconstructF: secondBest < 0.75*best)
    counts_sorted = jnp.sort(counts)
    second = counts_sorted[-2]
    success = (
        (n_best > 50)
        & (second < 0.75 * n_best)
        & (n_best > 0.75 * n_total)
    )
    return TwoViewResult(
        success=success,
        R=Rs[best],
        t=ts[best],
        points=Xs[best],
        good=goods[best],
        used_h=use_h,
    )
