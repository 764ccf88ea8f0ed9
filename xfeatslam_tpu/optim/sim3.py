"""Sim3 estimation: batched Horn closed-form alignment inside RANSAC, plus
robust Sim3 refinement for loop verification.

Roles of /root/reference/src/Sim3Solver.cc (RANSAC Horn on matched map-point
pairs, :149-311) and Optimizer::OptimizeSim3 (g2o Sim3 vertex + paired
forward/inverse reprojection edges, /root/reference/src/Optimizer.cc:2115).
All RANSAC hypotheses are solved/scored in one batched pass; refinement is a
small LM on the 7-dof tangent with autodiff Jacobians.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie
from ..ops.camera import Pinhole

CHI2 = 9.210  # 2-dof 99% like the reference's Sim3 inlier check


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray  # (3,3): maps frame-2 coords into frame-1 coords
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def horn_sim3(X1, X2, fix_scale: bool = False):
    """Closed-form Sim3 (s,R,t) with X1 ~ s R X2 + t.

    X1, X2: (...,M,3) matched point sets (M>=3). Horn's method via SVD of
    the cross-covariance (equivalent to the quaternion method in
    Sim3Solver::ComputeSim3, /root/reference/src/Sim3Solver.cc:311).
    """
    mu1 = X1.mean(-2, keepdims=True)
    mu2 = X2.mean(-2, keepdims=True)
    Y1 = X1 - mu1
    Y2 = X2 - mu2
    C = jnp.einsum("...mi,...mj->...ij", Y1, Y2)  # (3,3)
    u, sv, vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(u @ vt)
    D = jnp.ones(u.shape[:-1])
    D = D.at[..., -1].set(jnp.sign(det))
    R = u @ (D[..., :, None] * vt)
    if fix_scale:
        s = jnp.ones(X1.shape[:-2])
    else:
        # s = sum(Y1 . R Y2) / sum(|Y2|^2)
        num = jnp.einsum("...mi,...mi->...", Y1, jnp.einsum("...ij,...mj->...mi", R, Y2))
        den = jnp.maximum(jnp.einsum("...mi,...mi->...", Y2, Y2), 1e-12)
        s = num / den
    t = mu1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu2[..., 0, :])
    return s, R, t


def _project(cam: Pinhole, Xc):
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    return jnp.stack(
        [cam.fx * Xc[..., 0] / z + cam.cx, cam.fy * Xc[..., 1] / z + cam.cy],
        -1,
    ), Xc[..., 2]


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def sim3_ransac(Xc1, Xc2, uv1, uv2, valid, cam: Pinhole, key,
                iters: int = 128, min_inliers: int = 15,
                fix_scale: bool = False):
    """RANSAC Horn Sim3 between matched map points seen by two keyframes.

    Args:
      Xc1, Xc2: (N,3) matched points in CAMERA coords of KF1 / KF2
        (the reference transforms to camera frames, Sim3Solver.cc:90-110).
      uv1, uv2: (N,2) observed pixels in KF1 / KF2 for the dual
        reprojection check (CheckInliers :58).
    Returns Sim3 S12 with Xc1 ~ s R Xc2 + t.
    """
    N = Xc1.shape[0]
    w = valid.astype(jnp.float32) + 1e-6
    logits = jnp.log(w)[None, None, :].repeat(iters, 1).reshape(iters, 1, N).repeat(3, 1)
    idx = jax.random.categorical(key, logits, axis=-1)  # (iters,3)

    s_all, R_all, t_all = horn_sim3(Xc1[idx], Xc2[idx], fix_scale=fix_scale)

    # dual reprojection scoring
    X2in1 = s_all[:, None, None] * jnp.einsum("bij,nj->bni", R_all, Xc2) + t_all[:, None, :]
    uv1_pred, z1 = _project(cam, X2in1)
    s_inv = 1.0 / jnp.maximum(s_all, 1e-9)
    Rt = jnp.swapaxes(R_all, -1, -2)
    X1in2 = s_inv[:, None, None] * jnp.einsum(
        "bij,bnj->bni", Rt, Xc1[None, :, :] - t_all[:, None, :]
    )
    uv2_pred, z2 = _project(cam, X1in2)
    e1 = jnp.sum((uv1_pred - uv1[None]) ** 2, -1)
    e2 = jnp.sum((uv2_pred - uv2[None]) ** 2, -1)
    inl = (e1 < CHI2) & (e2 < CHI2) & (z1 > 0) & (z2 > 0) & valid[None]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    n = counts[best]
    # refit on inliers of the best hypothesis (masked Horn via weights)
    m = inl[best].astype(jnp.float32)
    nw = jnp.maximum(m.sum(), 3.0)
    mu1 = (Xc1 * m[:, None]).sum(0) / nw
    mu2 = (Xc2 * m[:, None]).sum(0) / nw
    Y1 = (Xc1 - mu1) * m[:, None]
    Y2 = (Xc2 - mu2) * m[:, None]
    C = Y1.T @ Y2
    u, sv, vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(u @ vt)
    D = jnp.ones(3).at[-1].set(jnp.sign(det))
    R = u @ (D[:, None] * vt)
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        num = jnp.sum(Y1 * (Y2 @ R.T))
        den = jnp.maximum(jnp.sum(Y2 * Y2), 1e-12)
        s = num / den
    t = mu1 - s * (R @ mu2)
    return Sim3Result(n >= min_inliers, s, R, t, inl[best], n)


def _sim3_reproj_residuals(s, R, t, Xc1, Xc2, uv1, uv2, cam: Pinhole):
    X2in1 = s * (Xc2 @ R.T) + t
    uv1_pred, _ = _project(cam, X2in1)
    X1in2 = (1.0 / s) * ((Xc1 - t) @ R)
    uv2_pred, _ = _project(cam, X1in2)
    return uv1 - uv1_pred, uv2 - uv2_pred


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(s0, R0, t0, Xc1, Xc2, uv1, uv2, valid, cam: Pinhole,
                  iters: int = 20, fix_scale: bool = False):
    """Robust LM refinement of a Sim3 (OptimizeSim3 role: paired forward and
    inverse reprojection edges with Huber, Optimizer.cc:2115). Autodiff
    Jacobians on the 7-dof tangent; returns refined Sim3 + inlier count.

    fix_scale freezes the scale tangent component (the reference's
    VertexSim3Expmap _fix_scale, /root/reference/src/Optimizer.cc:2135:
    vSim3->_fix_scale = bFixScale) — RGB-D/stereo loops must not let the
    optimizer trade scale against reprojection noise."""
    delta2 = jnp.float32(CHI2)
    # tangent layout [rho(3), phi(3), sigma(1)] (ops/lie.sim3_exp)
    dof_mask = jnp.ones(7).at[6].set(0.0) if fix_scale else jnp.ones(7)

    def residual_all(xi):
        ds, dR, dt = lie.sim3_exp(xi)
        s = s0 * ds
        R = dR @ R0
        t = ds * (dR @ t0) + dt
        e1, e2 = _sim3_reproj_residuals(s, R, t, Xc1, Xc2, uv1, uv2, cam)
        return e1, e2

    def weights(e1, e2):
        c = jnp.sum(e1 * e1, -1) + jnp.sum(e2 * e2, -1)
        w = jnp.where(c <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(c, 1e-12)))
        return w * valid

    def cost_at(xi):
        e1, e2 = residual_all(xi)
        c = jnp.sum(e1 * e1, -1) + jnp.sum(e2 * e2, -1)
        rho = jnp.where(c <= delta2, c, 2.0 * jnp.sqrt(delta2 * jnp.maximum(c, 0.0)) - delta2)
        return jnp.sum(rho * valid)

    def lm_iter(_, state):
        xi, lam, _ = state
        e1, e2 = residual_all(xi)
        w = weights(e1, e2)
        J = jax.jacfwd(lambda d: jnp.concatenate(
            [x.reshape(-1) for x in residual_all(xi + d)]
        ))(jnp.zeros(7))  # (4N, 7)
        J = J * dof_mask[None, :]  # frozen dofs contribute nothing
        e = jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])
        wr = jnp.concatenate([jnp.repeat(w, 2), jnp.repeat(w, 2)])
        Jw = J * wr[:, None]
        H = Jw.T @ J
        b = -(Jw.T @ e)
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-8 * jnp.eye(7)
        sc = jax.lax.rsqrt(jnp.diagonal(Hd) + 1e-12)
        dx = jnp.linalg.solve(Hd * sc[:, None] * sc[None, :], b * sc) * sc
        dx = dx * dof_mask
        c0 = cost_at(xi)
        c1 = cost_at(xi + dx)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(dx))
        xi = jnp.where(ok, xi + dx, xi)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return xi, lam, jnp.where(ok, c1, c0)

    xi0 = jnp.zeros(7)
    xi, _, _ = lax.fori_loop(0, iters, lm_iter, (xi0, jnp.float32(1e-3), jnp.float32(jnp.inf)))
    ds, dR, dt = lie.sim3_exp(xi)
    s = s0 * ds
    R = dR @ R0
    t = ds * (dR @ t0) + dt
    e1, e2 = _sim3_reproj_residuals(s, R, t, Xc1, Xc2, uv1, uv2, cam)
    c = jnp.sum(e1 * e1, -1) + jnp.sum(e2 * e2, -1)
    inl = (c <= delta2) & valid
    return s, R, t, inl, inl.sum()
