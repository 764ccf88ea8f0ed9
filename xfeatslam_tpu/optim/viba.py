"""Joint visual-inertial local bundle adjustment (LocalInertialBA).

TPU-native replacement for /root/reference/src/Optimizer.cc:2383
LocalInertialBA: a temporal window of body states (pose, velocity, gyro/acc
bias — 15-D each) PLUS the window's landmarks, optimized jointly against
reprojection edges, the preintegration chain, and bias random-walk edges.

Joint optimization is load-bearing: an alternating scheme (states with
fixed landmarks, then landmarks with fixed states) diverges whenever the
visual map disagrees with the IMU at the percent level — the chi2
reclassification drops every visual edge, the chain drifts along its gauge
freedom, and the landmark pass drags the map after it (a proven scale
death-spiral on mono-inertial). Solving both blocks together keeps the
visual edges active and resolves the disagreement by moving the map.

Solver design mirrors optim/local_ba.py: matrix-free damped normal
equations by block-Jacobi PCG — visual H.v products as per-observation
einsums + segment-sums (15-D body blocks, 3-D point blocks); the inertial
chain contributes through per-edge 15x30 Jacobians obtained by forward-mode
autodiff of the whitened edge function (E is small, the vmap is cheap).
Static padded shapes: one XLA graph for every window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie
from ..ops.camera import Pinhole, pinhole_project_jac
from ..ops.imu import GRAVITY

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class VIBAProblem(NamedTuple):
    """Padded joint visual-inertial BA problem.

    K body states, P points, O visual observations, E = K-1 chain slots.
    """

    # body states (world frame)
    R_wb: jnp.ndarray  # (K,3,3)
    p_wb: jnp.ndarray  # (K,3)
    v_w: jnp.ndarray  # (K,3)
    bg: jnp.ndarray  # (K,3)
    ba: jnp.ndarray  # (K,3)
    fixed: jnp.ndarray  # (K,) bool — anchor / boundary observers
    state_valid: jnp.ndarray  # (K,) bool — padding mask
    # landmarks
    X: jnp.ndarray  # (P,3)
    p_valid: jnp.ndarray  # (P,)
    # visual edges
    obs_cam: jnp.ndarray  # (O,) int32 -> body state index
    obs_pt: jnp.ndarray  # (O,) int32
    uv: jnp.ndarray  # (O,2)
    ur: jnp.ndarray  # (O,)
    stereo: jnp.ndarray  # (O,)
    valid: jnp.ndarray  # (O,)
    inv_sigma2: jnp.ndarray  # (O,)
    # inertial chain: edge e connects state e -> e+1 (zero-padded masked)
    dts: jnp.ndarray  # (E,)
    dR: jnp.ndarray  # (E,3,3) preintegrated deltas at lin. bias (bg0,ba0)
    dV: jnp.ndarray  # (E,3)
    dP: jnp.ndarray  # (E,3)
    JRg: jnp.ndarray  # (E,3,3)
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    L9: jnp.ndarray  # (E,9,9) whitener of the 9-D inertial residual
    Lb: jnp.ndarray  # (E,6,6) whitener of the bias walk
    e_valid: jnp.ndarray  # (E,)


class VIBAResult(NamedTuple):
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    X: jnp.ndarray
    inlier: jnp.ndarray  # (O,)
    chi2: jnp.ndarray  # (O,)


def _apply_delta(prob: VIBAProblem, d):
    """d: (K,15) [phi, dp, dv, dbg, dba] right-perturbation deltas."""
    R = prob.R_wb @ jax.vmap(lie.so3_exp)(d[:, 0:3])
    p = prob.p_wb + d[:, 3:6]
    v = prob.v_w + d[:, 6:9]
    bg = prob.bg + d[:, 9:12]
    ba = prob.ba + d[:, 12:15]
    return R, p, v, bg, ba


def _visual_residuals(prob: VIBAProblem, R, p, X, cam: Pinhole, bf,
                     R_bc, t_bc):
    """e (O,3), J_body (O,3,6) wrt [phi,dp], J_pt (O,3,3)."""
    Rb = R[prob.obs_cam]  # (O,3,3) body rotations
    pb = p[prob.obs_cam]
    Xw = X[prob.obs_pt]
    Xb = jnp.einsum("oji,oj->oi", Rb, Xw - pb)  # R_wb^T (Xw - p)
    Xc = (Xb - t_bc) @ R_bc  # R_bc^T (Xb - t_bc)
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    ur_pred = u - bf * inv_z
    e = jnp.stack(
        [prob.uv[..., 0] - u, prob.uv[..., 1] - v, prob.ur - ur_pred], -1
    )
    Jproj = pinhole_project_jac(cam, Xc)  # (O,2,3)
    dur = Jproj[:, 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * inv_z * inv_z], -1
    )
    Jall = jnp.concatenate([Jproj, dur[:, None, :]], 1)  # (O,3,3) d/dXc
    # dXc/dphi = R_bc^T hat(Xb); dXc/dp = -R_bc^T R_wb^T; dXc/dXw = +R_bc^T R_wb^T
    RbcT = R_bc.T
    dXc_dphi = jnp.einsum("ij,ojk->oik", RbcT, lie.so3_hat(Xb))
    RcwT = jnp.einsum("ij,okj->oik", RbcT, Rb)  # R_bc^T R_wb^T (O,3,3)
    Jb = -(jnp.concatenate([Jall @ dXc_dphi, Jall @ (-RcwT)], axis=-1))
    Jp = -(Jall @ RcwT)
    return e, Jb, Jp


def _chain_residual(prob: VIBAProblem, e_idx, di, dj, gravity):
    """Whitened 15-D residual of chain edge e (9 inertial + 6 bias walk),
    as a function of the two adjacent state deltas (for autodiff)."""
    k = e_idx
    Ri = prob.R_wb[k] @ lie.so3_exp(di[0:3])
    pi = prob.p_wb[k] + di[3:6]
    vi = prob.v_w[k] + di[6:9]
    bgi = prob.bg[k] + di[9:12]
    bai = prob.ba[k] + di[12:15]
    Rj = prob.R_wb[k + 1] @ lie.so3_exp(dj[0:3])
    pj = prob.p_wb[k + 1] + dj[3:6]
    vj = prob.v_w[k + 1] + dj[6:9]
    bgj = prob.bg[k + 1] + dj[9:12]
    baj = prob.ba[k + 1] + dj[12:15]
    t = prob.dts[k]
    # bias-corrected deltas (linearization bias folded into dR/dV/dP by the
    # builder, so bgi/bai here are deltas from it)
    dR_c = prob.dR[k] @ lie.so3_exp(prob.JRg[k] @ bgi)
    dV_c = prob.dV[k] + prob.JVg[k] @ bgi + prob.JVa[k] @ bai
    dP_c = prob.dP[k] + prob.JPg[k] @ bgi + prob.JPa[k] @ bai
    e_R = lie.so3_log(dR_c.T @ (Ri.T @ Rj))
    e_v = Ri.T @ (vj - vi - gravity * t) - dV_c
    e_p = Ri.T @ (pj - pi - vi * t - 0.5 * gravity * t * t) - dP_c
    r9 = prob.L9[k] @ jnp.concatenate([e_R, e_v, e_p])
    r6 = prob.Lb[k] @ jnp.concatenate([bgj - bgi, baj - bai])
    return jnp.concatenate([r9, r6]) * prob.e_valid[k]


@functools.partial(jax.jit, static_argnames=("stage_iters", "cg_iters"))
def local_inertial_ba(prob: VIBAProblem, cam: Pinhole, R_bc, t_bc,
                      bf=jnp.float32(0.0),
                      gravity=GRAVITY, stage_iters=(5, 10),
                      cg_iters: int = 40):
    """Two-stage robust LM with chi2 prune between stages (the
    LocalInertialBA schedule), PCG inner solver."""
    prob_Rbc = R_bc
    prob_tbc = t_bc
    K = prob.R_wb.shape[0]
    P = prob.X.shape[0]
    E = K - 1

    row3 = jnp.stack(
        [jnp.ones_like(prob.inv_sigma2), jnp.ones_like(prob.inv_sigma2),
         prob.stereo.astype(jnp.float32)], -1,
    )
    free_s = (~prob.fixed) & prob.state_valid  # (K,)

    def vis_chi2(e):
        e2 = e * e
        mono = (e2[..., 0] + e2[..., 1]) * prob.inv_sigma2
        return jnp.where(prob.stereo, mono + e2[..., 2] * prob.inv_sigma2,
                         mono)

    def robust_w(chi2, use_huber):
        d2 = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
        w = jnp.where(chi2 <= d2, 1.0,
                      jnp.sqrt(d2 / jnp.maximum(chi2, 1e-12)))
        return jnp.where(use_huber, w, 1.0)

    def chain_all(d):
        """(E,15) whitened chain residuals at state deltas d (K,15)."""
        return jax.vmap(
            lambda k: _chain_residual(prob, k, d[k], d[k + 1], gravity)
        )(jnp.arange(E))

    def chain_jacs(d):
        """(E,15,30) d r_e / d [d_i; d_j] at current deltas."""
        def one(k):
            f = lambda dd: _chain_residual(  # noqa: E731
                prob, k, dd[:15], dd[15:], gravity)
            return jax.jacfwd(f)(jnp.concatenate([d[k], d[k + 1]]))
        return jax.vmap(one)(jnp.arange(E))

    def total_cost(d, X, active, use_huber):
        R, p, _v, _bg, _ba = _apply_delta(prob, d)
        e, _, _ = _visual_residuals(prob, R, p, X, cam, bf,
                                    prob_Rbc, prob_tbc)
        c = vis_chi2(e)
        d2 = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
        rho = jnp.where(c <= d2, c,
                        2.0 * jnp.sqrt(d2 * jnp.maximum(c, 0.0)) - d2)
        vis = jnp.sum(jnp.where(active, jnp.where(use_huber, rho, c), 0.0))
        rc = chain_all(d)
        return vis + jnp.sum(rc * rc), c

    def lm_stage(d, X, active, n_iters, use_huber):
        def lm_iter(_, state):
            d, X, lam, _ = state
            R, p, _v, _bg, _ba = _apply_delta(prob, d)
            e, Jb6, Jp = _visual_residuals(prob, R, p, X, cam, bf,
                                           prob_Rbc, prob_tbc)
            chi2 = vis_chi2(e)
            w = robust_w(chi2, use_huber) * prob.inv_sigma2 * active
            W = (w[:, None] * row3)[..., None]
            # body Jacobian in the 15-D state (visual touches first 6 only)
            JbW = Jb6 * W  # (O,3,6)
            g_s6 = jax.ops.segment_sum(
                jnp.einsum("ori,or->oi", JbW, e), prob.obs_cam,
                num_segments=K)  # (K,6)
            g_s = jnp.concatenate([g_s6, jnp.zeros((K, 9))], -1)
            JpW = Jp * W
            g_p = jax.ops.segment_sum(
                jnp.einsum("ori,or->oi", JpW, e), prob.obs_pt,
                num_segments=P)
            # chain contribution (residual is whitened: J^T r, J^T J)
            rc = chain_all(d)  # (E,15)
            Jc = chain_jacs(d)  # (E,15,30)
            Ji = Jc[:, :, :15]
            Jj = Jc[:, :, 15:]
            gc_i = jnp.einsum("eri,er->ei", Ji, rc)
            gc_j = jnp.einsum("eri,er->ei", Jj, rc)
            g_s = g_s + jnp.zeros_like(g_s).at[:E].add(gc_i).at[1:E + 1].add(gc_j)
            g_s = g_s * free_s[:, None]
            g_p = g_p * prob.p_valid[:, None]

            # block diagonals
            Hss6 = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", JbW, Jb6), prob.obs_cam,
                num_segments=K)  # (K,6,6)
            Hss = jnp.zeros((K, 15, 15)).at[:, :6, :6].set(Hss6)
            Hii = jnp.einsum("eri,erj->eij", Ji, Ji)
            Hjj = jnp.einsum("eri,erj->eij", Jj, Jj)
            Hss = Hss.at[:E].add(Hii).at[1:E + 1].add(Hjj)
            Hpp = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", JpW, Jp), prob.obs_pt,
                num_segments=P)

            def damp(Hb, dim, valid_mask):
                diag = jnp.diagonal(Hb, axis1=-2, axis2=-1)
                Hd = Hb + (lam * diag + 1e-6)[..., None] * jnp.eye(dim)
                eye = jnp.broadcast_to(jnp.eye(dim), Hb.shape)
                return jnp.where(valid_mask[:, None, None], Hd, eye)

            Ms_inv = jnp.linalg.inv(damp(Hss, 15, free_s))
            Mp_inv = jnp.linalg.inv(damp(Hpp, 3, prob.p_valid))
            ds = jnp.diagonal(Hss, axis1=-2, axis2=-1)
            dp_ = jnp.diagonal(Hpp, axis1=-2, axis2=-1)

            def Hv(vs, vp):
                vs_m = vs * free_s[:, None]
                vp_m = vp * prob.p_valid[:, None]
                # visual
                rv = (
                    jnp.einsum("orj,oj->or", Jb6, vs_m[prob.obs_cam, :6])
                    + jnp.einsum("orj,oj->or", Jp, vp_m[prob.obs_pt])
                )
                rv = rv * (w[:, None] * row3)
                hs6 = jax.ops.segment_sum(
                    jnp.einsum("ori,or->oi", Jb6, rv), prob.obs_cam,
                    num_segments=K)
                hs = jnp.concatenate([hs6, jnp.zeros((K, 9))], -1)
                hp = jax.ops.segment_sum(
                    jnp.einsum("ori,or->oi", Jp, rv), prob.obs_pt,
                    num_segments=P)
                # chain
                rce = (jnp.einsum("erj,ej->er", Ji, vs_m[:E])
                       + jnp.einsum("erj,ej->er", Jj, vs_m[1:E + 1]))
                hs = hs.at[:E].add(jnp.einsum("eri,er->ei", Ji, rce))
                hs = hs.at[1:E + 1].add(jnp.einsum("eri,er->ei", Jj, rce))
                hs = hs + (lam * ds + 1e-6) * vs
                hp = hp + (lam * dp_ + 1e-6) * vp
                return hs * free_s[:, None], hp * prob.p_valid[:, None]

            def precond(rs, rp):
                return (
                    jnp.einsum("kij,kj->ki", Ms_inv, rs) * free_s[:, None],
                    jnp.einsum("pij,pj->pi", Mp_inv, rp) * prob.p_valid[:, None],
                )

            bs, bp = -g_s, -g_p

            def cg_step(i, s):
                xs, xp, rs, rp, zs, zp, ps, pp, rz = s
                Aps, App = Hv(ps, pp)
                pAp = jnp.sum(ps * Aps) + jnp.sum(pp * App)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1e-12, pAp)
                xs = xs + alpha * ps
                xp = xp + alpha * pp
                rs = rs - alpha * Aps
                rp = rp - alpha * App
                zs, zp = precond(rs, rp)
                rz_new = jnp.sum(rs * zs) + jnp.sum(rp * zp)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
                return (xs, xp, rs, rp, zs, zp, zs + beta * ps,
                        zp + beta * pp, rz_new)

            zs0, zp0 = precond(bs, bp)
            rz0 = jnp.sum(bs * zs0) + jnp.sum(bp * zp0)
            s0 = (jnp.zeros((K, 15)), jnp.zeros((P, 3)), bs, bp, zs0, zp0,
                  zs0, zp0, rz0)
            xs, xp, *_ = lax.fori_loop(0, cg_iters, cg_step, s0)

            d_new = d + xs * free_s[:, None]
            X_new = jnp.where(prob.p_valid[:, None], X + xp, X)
            cost0, _ = total_cost(d, X, active, use_huber)
            cost1, _ = total_cost(d_new, X_new, active, use_huber)
            ok = (cost1 < cost0) & jnp.all(jnp.isfinite(xs)) & jnp.all(
                jnp.isfinite(xp))
            d = jnp.where(ok, d_new, d)
            X = jnp.where(ok, X_new, X)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (d, X, lam, jnp.where(ok, cost1, cost0))

        state = (d, X, jnp.float32(1e-4), jnp.float32(jnp.inf))
        d, X, _, _ = lax.fori_loop(0, n_iters, lm_iter, state)
        return d, X

    d = jnp.zeros((K, 15))
    X = prob.X
    active = prob.valid
    d, X = lm_stage(d, X, active, stage_iters[0], jnp.asarray(True))
    _, chi2 = total_cost(d, X, active, jnp.asarray(False))
    thr = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
    active = active & (chi2 <= thr)
    d, X = lm_stage(d, X, active, stage_iters[1], jnp.asarray(True))

    R, p, v, bg, ba = _apply_delta(prob, d)
    _, chi2 = total_cost(d, X, prob.valid, jnp.asarray(False))
    inlier = prob.valid & (chi2 <= thr)
    R = jax.vmap(lie.normalize_rotation)(R)
    return VIBAResult(R, p, v, bg, ba, X, inlier, chi2)
