"""Pose-only optimization: robust Levenberg-Marquardt on SE3.

TPU-native replacement for Optimizer::PoseOptimization
(/root/reference/src/Optimizer.cc:814-1114): one SE3 vertex, unary mono
(2D) / stereo (u,v,uR) reprojection edges, Huber kernels
delta=sqrt(5.991)/sqrt(7.815), information 1/sigma^2 per octave, 4 rounds of
10 LM iterations with chi^2 inlier/outlier reclassification between rounds
and the robust kernel dropped for the last two rounds (g2o loop
Optimizer.cc:999-1104).

Design: all N edges are evaluated batched (pad + `valid` mask); the 6x6
normal equations are reduced on device; rounds/iters are static so the whole
solver is one XLA graph. Updates are left-multiplicative:
T <- exp([rho,phi]) * T.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie
from ..ops.camera import Pinhole, pinhole_project, pinhole_project_jac

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseOptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray  # (N,) bool — edge classified inlier at the end
    num_inliers: jnp.ndarray  # scalar int32
    chi2: jnp.ndarray  # (N,) final per-edge chi2


def _residuals(R, t, Xw, obs_uv, obs_ur, cam: Pinhole, bf):
    """Batched mono+stereo residuals and Jacobians wrt [rho, phi].

    Returns e (N,3), J (N,3,6), with the third row zeroed for mono edges by
    the caller's weighting. Stereo virtual-right residual: uR = u - bf/z
    (reference Frame::ComputeStereoFromRGBD /root/reference/src/Frame.cc:1177).
    """
    Xc = lie.se3_apply(R, t, Xw)
    uv = pinhole_project(cam, Xc)
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    ur_pred = uv[..., 0] - bf * inv_z

    e_uv = obs_uv - uv
    e_ur = obs_ur - ur_pred
    e = jnp.concatenate([e_uv, e_ur[..., None]], axis=-1)  # (N,3)

    Jproj = pinhole_project_jac(cam, Xc)  # (N,2,3)
    # d ur/dXc = du/dXc + [0,0,bf/z^2]
    dur = Jproj[:, 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * inv_z * inv_z], axis=-1
    )
    Jc = jnp.concatenate([Jproj, dur[:, None, :]], axis=1)  # (N,3,3)

    # dXc/d[rho,phi] = [I | -hat(Xc)]
    dXc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3)), -lie.so3_hat(Xc)],
        axis=-1,
    )  # (N,3,6)
    J = -(Jc @ dXc)  # (N,3,6)
    return e, J


def _edge_chi2(e, inv_sigma2, is_stereo):
    """Per-edge chi2 = e^T Omega e with the third row masked for mono."""
    e2 = e * e
    chi_mono = (e2[..., 0] + e2[..., 1]) * inv_sigma2
    chi_stereo = (e2[..., 0] + e2[..., 1] + e2[..., 2]) * inv_sigma2
    return jnp.where(is_stereo, chi_stereo, chi_mono)


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(
    R0, t0, Xw, obs_uv, obs_ur, inv_sigma2, is_stereo, valid, cam: Pinhole,
    bf=jnp.float32(0.0), rounds: int = 4, iters: int = 10,
):
    """Run the 4x10 robust LM schedule of the reference.

    Args:
      R0, t0: initial camera pose Tcw (world->camera).
      Xw: (N,3) map-point world positions (padded).
      obs_uv: (N,2) undistorted keypoint observations.
      obs_ur: (N,) right-u for stereo/RGB-D edges (ignored for mono).
      inv_sigma2: (N,) information weights (1.0 for XFeat octave 0).
      is_stereo: (N,) bool.
      valid: (N,) bool (padding + has-map-point mask).
    """
    row_mask3 = jnp.stack(
        [jnp.ones_like(inv_sigma2), jnp.ones_like(inv_sigma2), is_stereo.astype(jnp.float32)],
        axis=-1,
    )  # (N,3)

    def robust_weight(chi2, use_huber, dscale):
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO) * dscale
        w = jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        return jnp.where(use_huber, w, 1.0)

    def robust_cost(chi2, use_huber, dscale):
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO) * dscale
        rho = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2
        )
        return jnp.where(use_huber, rho, chi2)

    def total_cost(R, t, active, use_huber, dscale=jnp.float32(1.0)):
        e, _ = _residuals(R, t, Xw, obs_uv, obs_ur, cam, bf)
        chi2 = _edge_chi2(e, inv_sigma2, is_stereo)
        return jnp.sum(
            jnp.where(active, robust_cost(chi2, use_huber, dscale), 0.0)
        ), chi2

    def build_normal_eq(R, t, active, use_huber, dscale):
        e, J = _residuals(R, t, Xw, obs_uv, obs_ur, cam, bf)
        chi2 = _edge_chi2(e, inv_sigma2, is_stereo)
        w = robust_weight(chi2, use_huber, dscale) * inv_sigma2 * active
        wr = (w[:, None] * row_mask3)[..., None]  # (N,3,1)
        Jw = J * wr
        H = jnp.einsum("nri,nrj->ij", Jw, J)
        b = -jnp.einsum("nri,nr->i", Jw, e)  # solve H dx = -J^T W e
        return H, b

    def lm_round(R, t, active, use_huber, dscale=jnp.float32(1.0)):
        def body(_, state):
            R, t, lam, _cost = state
            H, b = build_normal_eq(R, t, active, use_huber, dscale)
            # Marquardt scaling: lam*diag(H) is invariant to the wildly
            # different scales of the rotation vs translation blocks
            # (lam*I with a trace-derived lam0 over-damps translation and
            # the solver cannot move within its iteration budget)
            Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-6 * jnp.eye(6, dtype=H.dtype)
            # Jacobi preconditioning: the raw 6x6 system mixes px^2/rad^2 and
            # px^2/m^2 scales (condition number ~1e7) — a plain f32 solve
            # loses the step entirely and LM stalls at a false minimum
            s = lax.rsqrt(jnp.diagonal(Hd) + 1e-12)
            Hs = Hd * s[:, None] * s[None, :]
            dx = jnp.linalg.solve(Hs, b * s) * s
            dR, dt = lie.se3_exp(dx)
            Rn, tn = lie.se3_compose(dR, dt, R, t)
            cost0, _ = total_cost(R, t, active, use_huber, dscale)
            cost1, _ = total_cost(Rn, tn, active, use_huber, dscale)
            accept = (cost1 < cost0) & jnp.all(jnp.isfinite(dx))
            R = jnp.where(accept, Rn, R)
            t = jnp.where(accept, tn, t)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return R, t, lam, jnp.where(accept, cost1, cost0)

        lam0 = jnp.float32(1e-3)
        R, t, _, _ = lax.fori_loop(0, iters, body, (R, t, lam0, jnp.float32(jnp.inf)))
        return R, t

    thresh = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def schedule(dscales, huber_flags):
        R, t = R0, t0
        active = valid
        for rnd in range(rounds):
            R, t = lm_round(R, t, active, jnp.asarray(huber_flags[rnd]),
                            jnp.float32(dscales[rnd]))
            _, chi2 = total_cost(R, t, valid, jnp.asarray(False))
            active = valid & (chi2 <= thresh * dscales[min(rnd + 1, rounds - 1)])
        return R, t

    # candidate A: the reference's schedule (Huber for 2 rounds, then plain)
    Ra, ta = schedule((1.0,) * rounds, (True, True) + (False,) * (rounds - 2))
    # candidate B: graduated non-convexity rescue — restart from the same
    # prediction with progressively tightening Huber widths. The robust cost
    # landscape has proven secondary minima 2-3 cm from the truth (created
    # by structured wrong-match tails); the widened kernel smooths them away
    # early so LM lands in the true basin, which has the LOWER final robust
    # cost — selection below is by that cost.
    gnc = ((25.0, 9.0, 3.0) + (1.0,) * max(rounds - 3, 0))[:rounds]
    Rb, tb = schedule(gnc, (True,) * rounds)

    cost_a, _ = total_cost(Ra, ta, valid, jnp.asarray(True))
    cost_b, _ = total_cost(Rb, tb, valid, jnp.asarray(True))
    pick_b = (cost_b < cost_a) & jnp.all(jnp.isfinite(tb))
    R = jnp.where(pick_b, Rb, Ra)
    t = jnp.where(pick_b, tb, ta)

    _, chi2 = total_cost(R, t, valid, jnp.asarray(False))
    active = valid & (chi2 <= thresh)
    num = jnp.sum(active.astype(jnp.int32))
    return PoseOptResult(R, t, active, num, chi2)
