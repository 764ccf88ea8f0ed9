"""Inertial optimizers: IMU initialization, visual-inertial pose tracking,
and local inertial BA.

TPU-native re-design of the reference's inertial optimizer family
(/root/reference/src/Optimizer.cc): `InertialOptimization` x3
(:3042,3227,3389 — scale/gravity/bias/velocity estimation on fixed poses),
`PoseInertialOptimizationLastKeyFrame/LastFrame` (:4491,4875 — per-frame
visual+IMU state estimation with a marginalized prior), and
`LocalInertialBA` (:2383). Where g2o builds per-edge vertex graphs, these
solvers stack ALL residuals (whitened by the preintegration covariance)
into one autodiff LM over a flat parameter vector — problems are small
(tens of states) and dense LM on padded static shapes is one XLA graph.

Frames: body states (R_wb, p_wb, v_w) live in the map's world frame; the
camera pose used for reprojection is T_cw = (T_wb * T_bc)^{-1} with T_bc
the body<-camera extrinsic (ImuTypes.h Calib).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie
from ..ops.camera import Pinhole, pinhole_project
from ..ops.imu import GRAVITY, Preintegrated, delta_with_bias

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


# --------------------------------------------------------------------------
# frame conversions
# --------------------------------------------------------------------------

def cam_to_body(R_cw, t_cw, R_bc, t_bc):
    """T_cw (world->camera) -> body state (R_wb, p_wb)."""
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    C_w = -jnp.einsum("...ij,...j->...i", R_wc, t_cw)
    R_wb = R_wc @ jnp.swapaxes(R_bc, -1, -2)
    p_wb = C_w - jnp.einsum("...ij,...j->...i", R_wb, t_bc)
    return R_wb, p_wb


def np_cam_to_body(R_cw, t_cw, R_bc, t_bc):
    """Host-numpy mirror of cam_to_body for the tracker/mapper control
    plane (single poses, no device dispatch)."""
    import numpy as np

    R_wc = R_cw.T
    C_w = -R_wc @ t_cw
    R_wb = R_wc @ R_bc.T
    p_wb = C_w - R_wb @ t_bc
    return R_wb.astype(np.float32), p_wb.astype(np.float32)


def np_body_to_cam(R_wb, p_wb, R_bc, t_bc):
    """Host-numpy mirror of body_to_cam."""
    import numpy as np

    R_wc = R_wb @ R_bc
    C_w = p_wb + R_wb @ t_bc
    R_cw = R_wc.T
    t_cw = -R_cw @ C_w
    return R_cw.astype(np.float32), t_cw.astype(np.float32)


def body_to_cam(R_wb, p_wb, R_bc, t_bc):
    """Body state -> T_cw (world->camera) for reprojection."""
    R_wc = R_wb @ R_bc
    C_w = p_wb + jnp.einsum("...ij,...j->...i", R_wb, t_bc)
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("...ij,...j->...i", R_cw, C_w)
    return R_cw, t_cw


def _whitener9(cov9):
    """L with L @ e whitening a 9-D residual (info = L^T L)."""
    info = jnp.linalg.inv(cov9 + 1e-12 * jnp.eye(9))
    # cholesky of info (symmetrize first)
    info = 0.5 * (info + info.T)
    return jnp.linalg.cholesky(info)


def _dense_lm(residual_fn, x0, iters: int = 15):
    """Small dense LM: residual_fn(x) -> (r,) stacked whitened residuals."""

    def body(_, state):
        x, lam, _c = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = J.T @ J
        g = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-8 * jnp.eye(x.shape[0])
        s = lax.rsqrt(jnp.diagonal(Hd) + 1e-12)
        dx = -(jnp.linalg.solve(Hd * s[:, None] * s[None, :], g * s) * s)
        x_new = x + dx
        c0 = jnp.sum(r * r)
        r1 = residual_fn(x_new)
        c1 = jnp.sum(r1 * r1)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(dx))
        x = jnp.where(ok, x_new, x)
        lam = jnp.where(ok, lam * 0.5, lam * 5.0)
        return x, lam, jnp.where(ok, c1, c0)

    x, _, _ = lax.fori_loop(0, iters, body, (x0, jnp.float32(1e-3),
                                             jnp.float32(jnp.inf)))
    return x


# --------------------------------------------------------------------------
# IMU initialization: scale / gravity / bias / velocities on fixed poses
# --------------------------------------------------------------------------

class InitResult(NamedTuple):
    scale: jnp.ndarray  # ()
    R_wg: jnp.ndarray  # (3,3) world<-gravity frame (g_world = R_wg @ e_g)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    vel: jnp.ndarray  # (K,3) body velocities (metric)
    cost: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def inertial_init(R_wb, p_wb, dts, dR, dV, dP, JRg, JVg, JVa, JPg, JPa,
                  cov9, e_valid, prior_g: float = 1e2, prior_a: float = 1e6,
                  fix_scale: bool = False):
    """InertialOptimization (/root/reference/src/Optimizer.cc:3042): with
    keyframe poses FIXED (from the visual map, arbitrary scale/orientation),
    estimate the map scale, gravity direction, one shared gyro/acc bias and
    per-keyframe velocities, from the preintegrations between consecutive
    keyframes.

    Args:
      R_wb, p_wb: (K,3,3), (K,3) body poses in the (unscaled) visual world.
      dts/dR/dV/dP/J*: (K-1, ...) preintegration between KF k and k+1, all
        linearized at zero bias.
      cov9: (K-1,9,9) preintegration covariance (rot/vel/pos block).
      e_valid: (K-1,) mask.
      prior_g/prior_a: bias priors (reference's priorG/priorA).
      fix_scale: True for stereo/RGB-D-inertial (scale observable already).

    Returns InitResult. The caller applies: p_metric = s * p_visual, rotates
    the world by R_wg^T so gravity becomes (0,0,-G).
    """
    K = R_wb.shape[0]
    E = K - 1
    Ls = jax.vmap(_whitener9)(cov9)
    w = e_valid.astype(jnp.float32)

    g_mag = 9.81

    def unpack(x):
        dg = x[0:2]
        log_s = x[2]
        bg = x[3:6]
        ba = x[6:9]
        vel = x[9:].reshape(K, 3)
        # gravity direction: rotate nominal -z by exp([dg, 0])
        R_wg = lie.so3_exp(jnp.concatenate([dg, jnp.zeros(1)]))
        g = R_wg @ jnp.array([0.0, 0.0, -g_mag])
        s = jnp.where(fix_scale, 1.0, jnp.exp(log_s))
        return s, g, bg, ba, vel, R_wg

    def residuals(x):
        s, g, bg, ba, vel, _ = unpack(x)

        def edge(k):
            Ri, Rj = R_wb[k], R_wb[k + 1]
            pi, pj = p_wb[k], p_wb[k + 1]
            vi, vj = vel[k], vel[k + 1]
            t = dts[k]
            dbg = bg
            dba = ba
            dR_c = dR[k] @ lie.so3_exp(JRg[k] @ dbg)
            dV_c = dV[k] + JVg[k] @ dbg + JVa[k] @ dba
            dP_c = dP[k] + JPg[k] @ dbg + JPa[k] @ dba
            e_R = lie.so3_log(dR_c.T @ (Ri.T @ Rj))
            e_v = Ri.T @ (vj - vi - g * t) - dV_c
            e_p = Ri.T @ (s * (pj - pi) - vi * t - 0.5 * g * t * t) - dP_c
            e = jnp.concatenate([e_R, e_v, e_p])
            return (Ls[k] @ e) * w[k]

        r = jax.vmap(edge)(jnp.arange(E)).reshape(-1)
        r_prior = jnp.concatenate([
            jnp.sqrt(prior_g) * bg, jnp.sqrt(prior_a) * ba,
        ])
        return jnp.concatenate([r, r_prior])

    # --- coarse initialization -------------------------------------------
    # Scale can be orders of magnitude from 1 (mono maps are median-depth
    # normalized), and LM from (s=1, v=0) stalls in that regime. Grid-search
    # log_s with velocities set to finite differences of the (scaled) poses,
    # start LM from the best candidate.
    dt_safe = jnp.where(e_valid, dts, 1.0)

    def fd_vel(s):
        dv = (p_wb[1:] - p_wb[:-1]) * s / dt_safe[:, None]
        dv = jnp.where(e_valid[:, None], dv, 0.0)
        # v_k from the outgoing edge; last state reuses the incoming edge
        return jnp.concatenate([dv, dv[-1:]], axis=0)

    def seed(log_s):
        s = jnp.where(fix_scale, 0.0, log_s)
        x = jnp.zeros(9 + 3 * K)
        x = x.at[2].set(s)
        x = x.at[9:].set(fd_vel(jnp.exp(s)).reshape(-1))
        return x

    if fix_scale:
        x0 = seed(jnp.float32(0.0))
    else:
        cands = jnp.linspace(-2.5, 2.5, 21)
        seeds = jax.vmap(seed)(cands)
        costs = jax.vmap(lambda x: jnp.sum(residuals(x) ** 2))(seeds)
        x0 = seeds[jnp.argmin(costs)]
    x = _dense_lm(residuals, x0, iters=60)
    s, g, bg, ba, vel, R_wg = unpack(x)
    r = residuals(x)
    return InitResult(s, R_wg, bg, ba, vel, jnp.sum(r * r))


# --------------------------------------------------------------------------
# per-frame visual-inertial pose optimization
# --------------------------------------------------------------------------

class PoseInertialResult(NamedTuple):
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inliers: jnp.ndarray  # (N,) visual edge classification
    num_inliers: jnp.ndarray
    # (15,15) information (J^T J at the solution) of the estimated state —
    # the recoverH output the reference uses to build ConstraintPoseImu
    # (/root/reference/src/Optimizer.cc:4491 `bRecInit`, G2oTypes.h:706)
    H: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_inertial_optimization(
    # current state initial values (body frame)
    R_j, p_j, v_j, bg_j, ba_j,
    # anchor (last KF or last frame) state — FIXED
    R_i, p_i, v_i,
    # preintegration anchor->current (linearized at anchor's bias)
    pre: Preintegrated,
    # visual edges (camera obs of the CURRENT frame)
    Xw, obs_uv, obs_ur, inv_sigma2, is_stereo, valid,
    cam: Pinhole, bf, R_bc, t_bc,
    gravity=GRAVITY,
    rounds: int = 3, iters: int = 8,
):
    """PoseInertialOptimizationLastKeyFrame/LastFrame role
    (/root/reference/src/Optimizer.cc:4491,4875): jointly estimate the
    current frame's body pose, velocity and biases from reprojection edges
    plus the inertial edge to the (fixed) anchor state and bias random-walk
    edges. The anchor is held fixed (the reference instead carries a
    marginalized prior on the last frame; fixing is the conservative limit
    of that prior).

    Huber on visual edges with chi2 reclassification between rounds, like
    the visual-only pose optimizer.
    """
    L9 = _whitener9(pre.cov[:9, :9])
    # bias random-walk whitening from the walk block
    walk_info = jnp.linalg.inv(pre.cov[9:, 9:] + 1e-10 * jnp.eye(6))
    Lb = jnp.linalg.cholesky(0.5 * (walk_info + walk_info.T))

    def unpack(x, base):
        R0, p0, v0, bg0, ba0 = base
        dR, dp = lie.se3_exp(x[0:6])
        R = R0 @ lie.so3_exp(x[0:3])
        p = p0 + x[3:6]
        v = v0 + x[6:9]
        bg = bg0 + x[9:12]
        ba = ba0 + x[12:15]
        del dR, dp
        return R, p, v, bg, ba

    def visual_residuals(R, p):
        R_cw, t_cw = body_to_cam(R, p, R_bc, t_bc)
        Xc = Xw @ R_cw.T + t_cw
        uv = pinhole_project(cam, Xc)
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        ur_pred = uv[..., 0] - bf * inv_z
        e_uv = obs_uv - uv
        e_ur = jnp.where(is_stereo, obs_ur - ur_pred, 0.0)
        return e_uv, e_ur

    def edge_chi2(e_uv, e_ur):
        return (jnp.sum(e_uv * e_uv, -1) + e_ur * e_ur) * inv_sigma2

    def robust_w(chi2, active):
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        w = jnp.where(chi2 <= delta2, 1.0,
                      jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        return w * active

    base = (R_j, p_j, v_j, bg_j, ba_j)

    def residual_fn(x, active, w_cached):
        R, p, v, bg, ba = unpack(x, base)
        e_uv, e_ur = visual_residuals(R, p)
        wv = jnp.sqrt(w_cached * inv_sigma2)
        r_vis = jnp.concatenate(
            [e_uv * wv[:, None], (e_ur * wv)[:, None]], axis=-1
        ).reshape(-1)
        # inertial edge to anchor
        dRc, dVc, dPc = delta_with_bias(pre, bg, ba)
        t = pre.dt
        e_R = lie.so3_log(dRc.T @ (R_i.T @ R))
        e_v = R_i.T @ (v - v_i - gravity * t) - dVc
        e_p = R_i.T @ (p - p_i - v_i * t - 0.5 * gravity * t * t) - dPc
        r_imu = L9 @ jnp.concatenate([e_R, e_v, e_p])
        # bias random walk vs the preintegration's linearization bias
        r_bias = Lb @ jnp.concatenate([bg - pre.bg, ba - pre.ba])
        return jnp.concatenate([r_vis, r_imu, r_bias])

    x = jnp.zeros(15)
    active = valid.astype(jnp.float32)
    for rnd in range(rounds):
        R, p, _v, _bg, _ba = unpack(x, base)
        e_uv, e_ur = visual_residuals(R, p)
        chi2 = edge_chi2(e_uv, e_ur)
        w_huber = robust_w(chi2, active)
        fn = lambda xx: residual_fn(xx, active, w_huber)  # noqa: E731
        x = _dense_lm(fn, x, iters=iters)
        R, p, _v, _bg, _ba = unpack(x, base)
        e_uv, e_ur = visual_residuals(R, p)
        chi2 = edge_chi2(e_uv, e_ur)
        thresh = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        active = (valid & (chi2 <= thresh)).astype(jnp.float32)

    R, p, v, bg, ba = unpack(x, base)
    R = lie.normalize_rotation(R)
    inl = valid & (edge_chi2(*visual_residuals(R, p)) <= jnp.where(
        is_stereo, CHI2_STEREO, CHI2_MONO))
    # information of the solved state for the next frame's marginalized
    # prior (recoverH role)
    J = jax.jacfwd(lambda xx: residual_fn(xx, active, robust_w(
        edge_chi2(*visual_residuals(R, p)), active)))(x)
    H = J.T @ J
    return PoseInertialResult(R, p, v, bg, ba, inl,
                              jnp.sum(inl.astype(jnp.int32)),
                              0.5 * (H + H.T))


class PoseInertialFrameResult(NamedTuple):
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    # (15,15) MARGINAL information of the current state after Schur-
    # eliminating the last frame — the next frame's ConstraintPoseImu
    H: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_inertial_optimization_last_frame(
    # current state initial values (body frame)
    R_j, p_j, v_j, bg_j, ba_j,
    # LAST FRAME state (the prior's mean) — optimized jointly
    R_i, p_i, v_i, bg_i, ba_i,
    # (15,15) sqrt-information of the last-frame prior (L @ delta whitens)
    prior_L,
    # preintegration last frame -> current (at the last frame's bias)
    pre: Preintegrated,
    # visual edges of the CURRENT frame
    Xw, obs_uv, obs_ur, inv_sigma2, is_stereo, valid,
    cam: Pinhole, bf, R_bc, t_bc,
    gravity=GRAVITY,
    rounds: int = 3, iters: int = 8,
):
    """PoseInertialOptimizationLastFrame
    (/root/reference/src/Optimizer.cc:4875): between keyframes, the
    per-frame solve chains POSTERIORS — the last frame enters as a free
    15-D state held by its marginalized prior (EdgePriorPoseImu /
    ConstraintPoseImu, G2oTypes.h:706), the inertial + bias-walk edges
    couple it to the current frame, and the last frame is Schur-eliminated
    afterwards to produce the next prior. Without this, a long KF-less
    stretch (RECENTLY_LOST dead-reckoning, localization mode) re-integrates
    one long noisy edge instead of accumulating information."""
    L9 = _whitener9(pre.cov[:9, :9])
    walk_info = jnp.linalg.inv(pre.cov[9:, 9:] + 1e-10 * jnp.eye(6))
    Lb = jnp.linalg.cholesky(0.5 * (walk_info + walk_info.T))

    def unpack(x):
        xi, xj = x[:15], x[15:]
        Ri = R_i @ lie.so3_exp(xi[0:3])
        pi = p_i + xi[3:6]
        vi = v_i + xi[6:9]
        bgi = bg_i + xi[9:12]
        bai = ba_i + xi[12:15]
        Rj = R_j @ lie.so3_exp(xj[0:3])
        pj = p_j + xj[3:6]
        vj = v_j + xj[6:9]
        bgj = bg_j + xj[9:12]
        baj = ba_j + xj[12:15]
        return (Ri, pi, vi, bgi, bai), (Rj, pj, vj, bgj, baj)

    def visual_residuals(R, p):
        R_cw, t_cw = body_to_cam(R, p, R_bc, t_bc)
        Xc = Xw @ R_cw.T + t_cw
        uv = pinhole_project(cam, Xc)
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        ur_pred = uv[..., 0] - bf * inv_z
        e_uv = obs_uv - uv
        e_ur = jnp.where(is_stereo, obs_ur - ur_pred, 0.0)
        return e_uv, e_ur

    def edge_chi2(e_uv, e_ur):
        return (jnp.sum(e_uv * e_uv, -1) + e_ur * e_ur) * inv_sigma2

    def robust_w(chi2, active):
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        w = jnp.where(chi2 <= delta2, 1.0,
                      jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        return w * active

    def residual_fn(x, w_cached):
        (Ri, pi, vi, bgi, bai), (Rj, pj, vj, bgj, baj) = unpack(x)
        e_uv, e_ur = visual_residuals(Rj, pj)
        wv = jnp.sqrt(w_cached * inv_sigma2)
        r_vis = jnp.concatenate(
            [e_uv * wv[:, None], (e_ur * wv)[:, None]], axis=-1
        ).reshape(-1)
        # inertial edge i->j at i's bias
        dRc, dVc, dPc = delta_with_bias(pre, bgi, bai)
        t = pre.dt
        e_R = lie.so3_log(dRc.T @ (Ri.T @ Rj))
        e_v = Ri.T @ (vj - vi - gravity * t) - dVc
        e_p = Ri.T @ (pj - pi - vi * t - 0.5 * gravity * t * t) - dPc
        r_imu = L9 @ jnp.concatenate([e_R, e_v, e_p])
        r_bias = Lb @ jnp.concatenate([bgj - bgi, baj - bai])
        # prior on the last frame (mean = its initial state => delta = xi)
        r_prior = prior_L @ x[:15]
        return jnp.concatenate([r_vis, r_imu, r_bias, r_prior])

    x = jnp.zeros(30)
    active = valid.astype(jnp.float32)
    for rnd in range(rounds):
        _si, (Rj, pj, _v, _bg, _ba) = unpack(x)
        chi2 = edge_chi2(*visual_residuals(Rj, pj))
        w_huber = robust_w(chi2, active)
        fn = lambda xx: residual_fn(xx, w_huber)  # noqa: E731
        x = _dense_lm(fn, x, iters=iters)
        _si, (Rj, pj, _v, _bg, _ba) = unpack(x)
        chi2 = edge_chi2(*visual_residuals(Rj, pj))
        thresh = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        active = (valid & (chi2 <= thresh)).astype(jnp.float32)

    _si, (Rj, pj, vj, bgj, baj) = unpack(x)
    Rj = lie.normalize_rotation(Rj)
    inl = valid & (edge_chi2(*visual_residuals(Rj, pj)) <= jnp.where(
        is_stereo, CHI2_STEREO, CHI2_MONO))
    # marginalize the last frame: H_jj - H_ji H_ii^-1 H_ij
    J = jax.jacfwd(lambda xx: residual_fn(xx, robust_w(
        edge_chi2(*visual_residuals(Rj, pj)), active)))(x)
    H = J.T @ J
    H_ii = H[:15, :15] + 1e-6 * jnp.eye(15)
    H_ij = H[:15, 15:]
    H_jj = H[15:, 15:]
    Hm = H_jj - H_ij.T @ jnp.linalg.solve(H_ii, H_ij)
    return PoseInertialFrameResult(Rj, pj, vj, bgj, baj, inl,
                                   jnp.sum(inl.astype(jnp.int32)),
                                   0.5 * (Hm + Hm.T))


# --------------------------------------------------------------------------
# local inertial BA: window keyframe states + inertial chain
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters",))
def local_inertial_ba_states(
    R_wb, p_wb, v_w, bg, ba,  # (K, ...) window body states, index 0 = anchor
    fixed,  # (K,) bool — at least the anchor True
    # inertial chain k -> k+1 (K-1 entries, zero-bias linearization)
    dts, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, cov9, walk_cov, e_valid,
    # visual edges: obs_cam (O,) index into window, Xw (O,3) FIXED points
    obs_cam, Xw, obs_uv, obs_ur, inv_sigma2, is_stereo, obs_valid,
    cam: Pinhole, bf, R_bc, t_bc,
    gravity=GRAVITY, iters: int = 20,
):
    """State half of LocalInertialBA (/root/reference/src/Optimizer.cc:2383):
    optimize the window's body states (pose+velocity+biases, 15 per KF) with
    reprojection edges to (temporarily fixed) landmarks plus the inertial
    and bias-walk chain. The caller alternates with a landmark-only visual
    BA pass (optim/local_ba.py with all cameras fixed), which together
    cover the reference's joint optimization.
    """
    K = R_wb.shape[0]
    E = K - 1
    Ls = jax.vmap(_whitener9)(cov9)
    w_info = jax.vmap(lambda c: jnp.linalg.inv(c + 1e-10 * jnp.eye(6)))(walk_cov)
    Lb = jax.vmap(lambda i: jnp.linalg.cholesky(0.5 * (i + i.T)))(w_info)
    we = e_valid.astype(jnp.float32)
    free = (~fixed).astype(jnp.float32)[:, None]

    def unpack(x):
        d = x.reshape(K, 15) * free
        R = R_wb @ jax.vmap(lie.so3_exp)(d[:, 0:3])
        p = p_wb + d[:, 3:6]
        v = v_w + d[:, 6:9]
        bgx = bg + d[:, 9:12]
        bax = ba + d[:, 12:15]
        return R, p, v, bgx, bax

    def residual_fn(x, w_huber):
        R, p, v, bgx, bax = unpack(x)
        # visual
        Rc, tc = body_to_cam(R, p, R_bc, t_bc)
        Rcam = Rc[obs_cam]
        tcam = tc[obs_cam]
        Xc = jnp.einsum("oij,oj->oi", Rcam, Xw) + tcam
        uv = pinhole_project(cam, Xc)
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        ur_pred = uv[..., 0] - bf * inv_z
        e_uv = obs_uv - uv
        e_ur = jnp.where(is_stereo, obs_ur - ur_pred, 0.0)
        wv = jnp.sqrt(w_huber * inv_sigma2)
        r_vis = jnp.concatenate(
            [e_uv * wv[:, None], (e_ur * wv)[:, None]], -1
        ).reshape(-1)

        def edge(k):
            Ri, Rj = R[k], R[k + 1]
            pi, pj = p[k], p[k + 1]
            vi, vj = v[k], v[k + 1]
            t = dts[k]
            dbg = bgx[k]
            dba = bax[k]
            dR_c = dR[k] @ lie.so3_exp(JRg[k] @ dbg)
            dV_c = dV[k] + JVg[k] @ dbg + JVa[k] @ dba
            dP_c = dP[k] + JPg[k] @ dbg + JPa[k] @ dba
            e_R = lie.so3_log(dR_c.T @ (Ri.T @ Rj))
            e_v = Ri.T @ (vj - vi - gravity * t) - dV_c
            e_p = Ri.T @ (pj - pi - vi * t - 0.5 * gravity * t * t) - dP_c
            r_imu = (Ls[k] @ jnp.concatenate([e_R, e_v, e_p])) * we[k]
            r_b = (Lb[k] @ jnp.concatenate(
                [bgx[k + 1] - bgx[k], bax[k + 1] - bax[k]])) * we[k]
            return jnp.concatenate([r_imu, r_b])

        r_chain = jax.vmap(edge)(jnp.arange(E)).reshape(-1)
        return jnp.concatenate([r_vis, r_chain])

    def vis_chi2(x):
        R, p, _v, _bg, _ba = unpack(x)
        Rc, tc = body_to_cam(R, p, R_bc, t_bc)
        Xc = jnp.einsum("oij,oj->oi", Rc[obs_cam], Xw) + tc[obs_cam]
        uv = pinhole_project(cam, Xc)
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        ur_pred = uv[..., 0] - bf * inv_z
        e_uv = obs_uv - uv
        e_ur = jnp.where(is_stereo, obs_ur - ur_pred, 0.0)
        return (jnp.sum(e_uv * e_uv, -1) + e_ur * e_ur) * inv_sigma2

    x = jnp.zeros(K * 15)
    active = obs_valid.astype(jnp.float32)
    for _ in range(2):
        chi2 = vis_chi2(x)
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        w_h = jnp.where(chi2 <= delta2, 1.0,
                        jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))) * active
        fn = lambda xx: residual_fn(xx, w_h)  # noqa: E731
        x = _dense_lm(fn, x, iters=iters // 2)
        chi2 = vis_chi2(x)
        active = (obs_valid & (chi2 <= delta2)).astype(jnp.float32)

    R, p, v, bgx, bax = unpack(x)
    R = jax.vmap(lie.normalize_rotation)(R)
    return R, p, v, bgx, bax
