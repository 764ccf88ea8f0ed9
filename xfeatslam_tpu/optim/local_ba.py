"""Bundle adjustment: robust Levenberg-Marquardt over cameras + points.

TPU-native replacement for g2o sparse BA as used by
Optimizer::LocalBundleAdjustment (/root/reference/src/Optimizer.cc:1116-1500)
and GlobalBundleAdjustemnt (:52-391): covisible keyframes + their map points
with fixed boundary keyframes, Huber kernels, 2-stage schedule (5 iters,
prune chi2 outliers, 10 iters), then write back.

Design: where g2o eliminates landmarks via an explicit Schur complement on
sparse block matrices, this solver is MATRIX-FREE: the damped normal
equations (H + lam*D) dx = -g are solved by block-Jacobi preconditioned
conjugate gradients, with H-vector products evaluated as per-observation
einsums + segment-sums. Every shape is static (pad cameras/points/obs and
mask), so one XLA graph covers every local-BA window; the per-iteration
cost is O(obs) dense math that vectorizes perfectly on the VPU/MXU — no
sparse bookkeeping at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie
from ..ops.camera import Pinhole, pinhole_project_jac

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Padded bundle-adjustment problem.

    C cameras, P points, O observations (all static).
    """

    R: jnp.ndarray  # (C,3,3) world->camera
    t: jnp.ndarray  # (C,3)
    fixed: jnp.ndarray  # (C,) bool — gauge/boundary cameras
    cam_valid: jnp.ndarray  # (C,) bool — padding mask
    X: jnp.ndarray  # (P,3)
    p_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray  # (O,) int32
    obs_pt: jnp.ndarray  # (O,) int32
    uv: jnp.ndarray  # (O,2)
    ur: jnp.ndarray  # (O,)
    stereo: jnp.ndarray  # (O,) bool
    valid: jnp.ndarray  # (O,) bool
    inv_sigma2: jnp.ndarray  # (O,)


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    inlier: jnp.ndarray  # (O,) bool
    chi2: jnp.ndarray  # (O,)


def _residuals(prob: BAProblem, R, t, X, cam: Pinhole, bf):
    """Per-obs residuals e (O,3) and Jacobians Jc (O,3,6), Jp (O,3,3)."""
    Rc = R[prob.obs_cam]  # (O,3,3)
    tc = t[prob.obs_cam]
    Xw = X[prob.obs_pt]
    Xc = jnp.einsum("oij,oj->oi", Rc, Xw) + tc
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    ur_pred = u - bf * inv_z
    e = jnp.stack(
        [prob.uv[..., 0] - u, prob.uv[..., 1] - v, prob.ur - ur_pred], axis=-1
    )

    Jproj = pinhole_project_jac(cam, Xc)  # (O,2,3)
    dur = Jproj[:, 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * inv_z * inv_z], axis=-1
    )
    Jall = jnp.concatenate([Jproj, dur[:, None, :]], axis=1)  # (O,3,3) d/dXc

    dXc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3)), -lie.so3_hat(Xc)],
        axis=-1,
    )  # (O,3,6)
    Jc = -(Jall @ dXc_dxi)  # (O,3,6)
    Jp = -(Jall @ Rc)  # (O,3,3): dXc/dXw = R
    return e, Jc, Jp


def _chi2(e, inv_sigma2, stereo):
    e2 = e * e
    mono = (e2[..., 0] + e2[..., 1]) * inv_sigma2
    st = mono + e2[..., 2] * inv_sigma2
    return jnp.where(stereo, st, mono)


@functools.partial(
    jax.jit, static_argnames=("stage_iters", "cg_iters")
)
def bundle_adjust(prob: BAProblem, cam: Pinhole, bf=jnp.float32(0.0),
                  stage_iters=(5, 10), cg_iters: int = 40,
                  huber: bool = True):
    """Run the two-stage robust LM schedule of LocalBundleAdjustment.

    Returns BAResult with updated poses/points and the final observation
    inlier classification (chi2 <= 5.991 / 7.815 and positive depth, the
    prune rule at /root/reference/src/Optimizer.cc:1352-1403).
    """
    C = prob.R.shape[0]
    P = prob.X.shape[0]

    row3 = jnp.stack(
        [jnp.ones_like(prob.inv_sigma2), jnp.ones_like(prob.inv_sigma2),
         prob.stereo.astype(jnp.float32)], axis=-1,
    )  # (O,3) masks the ur row for mono obs
    free_cam = (~prob.fixed) & prob.cam_valid

    def robust_w(chi2, use_huber):
        d2 = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
        w = jnp.where(chi2 <= d2, 1.0, jnp.sqrt(d2 / jnp.maximum(chi2, 1e-12)))
        return jnp.where(use_huber, w, 1.0)

    def robust_cost(chi2, use_huber):
        d2 = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
        rho = jnp.where(chi2 <= d2, chi2,
                        2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2)
        return jnp.where(use_huber, rho, chi2)

    def total_cost(R, t, X, active, use_huber):
        e, _, _ = _residuals(prob, R, t, X, cam, bf)
        c = _chi2(e, prob.inv_sigma2, prob.stereo)
        return jnp.sum(jnp.where(active, robust_cost(c, use_huber), 0.0)), c

    def lm_stage(R, t, X, active, n_iters, use_huber):
        def lm_iter(_, state):
            R, t, X, lam, _ = state
            e, Jc, Jp = _residuals(prob, R, t, X, cam, bf)
            chi2 = _chi2(e, prob.inv_sigma2, prob.stereo)
            w = robust_w(chi2, use_huber) * prob.inv_sigma2 * active  # (O,)
            W = (w[:, None] * row3)[..., None]  # (O,3,1) row weights

            # gradient g = J^T W e  (negated later)
            JcW = Jc * W  # (O,3,6)
            JpW = Jp * W  # (O,3,3)
            g_c = jax.ops.segment_sum(
                jnp.einsum("ori,or->oi", JcW, e), prob.obs_cam, num_segments=C
            )  # (C,6)
            g_p = jax.ops.segment_sum(
                jnp.einsum("ori,or->oi", JpW, e), prob.obs_pt, num_segments=P
            )  # (P,3)
            g_c = g_c * free_cam[:, None]
            g_p = g_p * prob.p_valid[:, None]

            # block-diagonal of H for damping + preconditioner
            Hcc = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", JcW, Jc), prob.obs_cam, num_segments=C
            )  # (C,6,6)
            Hpp = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", JpW, Jp), prob.obs_pt, num_segments=P
            )  # (P,3,3)

            # damped blocks (Marquardt scaling) + identity floor for padding
            def damp(Hb, dim, valid_mask):
                diag = jnp.diagonal(Hb, axis1=-2, axis2=-1)
                Hd = Hb + (lam * diag + 1e-6)[..., None] * jnp.eye(dim)
                eye = jnp.broadcast_to(jnp.eye(dim), Hb.shape)
                return jnp.where(valid_mask[:, None, None], Hd, eye)

            Hcc_d = damp(Hcc, 6, free_cam)
            Hpp_d = damp(Hpp, 3, prob.p_valid)
            Mc_inv = jnp.linalg.inv(Hcc_d)
            Mp_inv = jnp.linalg.inv(Hpp_d)

            lam_b = lam  # close over

            def Hv(vc, vp):
                """(H + lam D) v, matrix-free over observations."""
                rv = (
                    jnp.einsum("orj,oj->or", Jc, vc[prob.obs_cam] * free_cam[prob.obs_cam][:, None])
                    + jnp.einsum("orj,oj->or", Jp, vp[prob.obs_pt] * prob.p_valid[prob.obs_pt][:, None])
                )  # (O,3)
                rv = rv * (w[:, None] * row3)
                hc = jax.ops.segment_sum(
                    jnp.einsum("ori,or->oi", Jc, rv), prob.obs_cam, num_segments=C
                )
                hp = jax.ops.segment_sum(
                    jnp.einsum("ori,or->oi", Jp, rv), prob.obs_pt, num_segments=P
                )
                # damping via block diagonals
                dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
                dp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
                hc = hc + (lam_b * dc + 1e-6) * vc
                hp = hp + (lam_b * dp + 1e-6) * vp
                hc = hc * free_cam[:, None]
                hp = hp * prob.p_valid[:, None]
                return hc, hp

            def precond(rc, rp):
                return (
                    jnp.einsum("cij,cj->ci", Mc_inv, rc) * free_cam[:, None],
                    jnp.einsum("pij,pj->pi", Mp_inv, rp) * prob.p_valid[:, None],
                )

            # PCG solve (H + lam D) dx = -g
            bc, bp = -g_c, -g_p

            def cg_step(i, s):
                xc, xp, rc, rp, zc, zp, pc, pp, rz = s
                Apc, App = Hv(pc, pp)
                pAp = jnp.sum(pc * Apc) + jnp.sum(pp * App)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1e-12, pAp)
                xc = xc + alpha * pc
                xp = xp + alpha * pp
                rc = rc - alpha * Apc
                rp = rp - alpha * App
                zc, zp = precond(rc, rp)
                rz_new = jnp.sum(rc * zc) + jnp.sum(rp * zp)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
                pc = zc + beta * pc
                pp = zp + beta * pp
                return (xc, xp, rc, rp, zc, zp, pc, pp, rz_new)

            xc0 = jnp.zeros((C, 6))
            xp0 = jnp.zeros((P, 3))
            zc0, zp0 = precond(bc, bp)
            rz0 = jnp.sum(bc * zc0) + jnp.sum(bp * zp0)
            s0 = (xc0, xp0, bc, bp, zc0, zp0, zc0, zp0, rz0)
            xc, xp, *_ = lax.fori_loop(0, cg_iters, cg_step, s0)

            # candidate update
            dR, dt = lie.se3_exp(xc)  # (C,3,3),(C,3)
            Rn = jnp.where(free_cam[:, None, None], dR @ R, R)
            tn = jnp.where(
                free_cam[:, None],
                jnp.einsum("cij,cj->ci", dR, t) + dt,
                t,
            )
            Xn = jnp.where(prob.p_valid[:, None], X + xp, X)

            cost0, _ = total_cost(R, t, X, active, use_huber)
            cost1, _ = total_cost(Rn, tn, Xn, active, use_huber)
            finite = (
                jnp.all(jnp.isfinite(xc)) & jnp.all(jnp.isfinite(xp))
            )
            accept = (cost1 < cost0) & finite
            R = jnp.where(accept, Rn, R)
            t = jnp.where(accept, tn, t)
            X = jnp.where(accept, Xn, X)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (R, t, X, lam, jnp.where(accept, cost1, cost0))

        state = (R, t, X, jnp.float32(1e-4), jnp.float32(jnp.inf))
        R, t, X, _, _ = lax.fori_loop(0, n_iters, lm_iter, state)
        return R, t, X

    R, t, X = prob.R, prob.t, prob.X
    active = prob.valid

    # stage 1: robust
    R, t, X = lm_stage(R, t, X, active, stage_iters[0], jnp.asarray(huber))
    # prune outliers (chi2 or negative depth) like Optimizer.cc:1352-1360
    e, _, _ = _residuals(prob, R, t, X, cam, bf)
    chi2 = _chi2(e, prob.inv_sigma2, prob.stereo)
    thr = jnp.where(prob.stereo, CHI2_STEREO, CHI2_MONO)
    Xc_z = (
        jnp.einsum("oij,oj->oi", R[prob.obs_cam], X[prob.obs_pt]) + t[prob.obs_cam]
    )[..., 2]
    active = active & (chi2 <= thr) & (Xc_z > 0)

    # stage 2: tightened
    R, t, X = lm_stage(R, t, X, active, stage_iters[1], jnp.asarray(huber))

    e, _, _ = _residuals(prob, R, t, X, cam, bf)
    chi2 = _chi2(e, prob.inv_sigma2, prob.stereo)
    Xc_z = (
        jnp.einsum("oij,oj->oi", R[prob.obs_cam], X[prob.obs_pt]) + t[prob.obs_cam]
    )[..., 2]
    inlier = prob.valid & (chi2 <= thr) & (Xc_z > 0)
    return BAResult(R, t, X, inlier, chi2)
