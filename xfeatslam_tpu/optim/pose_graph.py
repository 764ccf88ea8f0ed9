"""Sim3 pose-graph (essential graph) optimization.

Role of Optimizer::OptimizeEssentialGraph (/root/reference/src/Optimizer.cc:
1501-1785): after a loop is detected and a corrected Sim3 is known for the
current keyframe, optimize all keyframe Sim3 poses over the essential graph
(spanning tree + loop edges + strong covisibility edges >= 100), then
rescale/transform map points by their reference keyframe's correction.

TPU-native design: per-edge residuals r = log_sim3(S_meas_ji * S_i * S_j^-1)
with autodiff Jacobians (g2o uses numeric diff for these edges), assembled
into block-diagonal-preconditioned CG normal equations via segment-sums —
the same matrix-free pattern as optim/local_ba.py, fully static shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import lie


class PoseGraphProblem(NamedTuple):
    s: jnp.ndarray  # (C,)
    R: jnp.ndarray  # (C,3,3) world->camera Sim3
    t: jnp.ndarray  # (C,3)
    fixed: jnp.ndarray  # (C,) bool
    cam_valid: jnp.ndarray  # (C,)
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,)
    # measurement m = S_j * S_i^{-1} (g2o EdgeSim3 convention: residual
    # log(m * S_i * S_j^{-1}) vanishes when consistent; m maps vertex-i
    # camera coords into vertex-j camera coords)
    m_s: jnp.ndarray  # (E,)
    m_R: jnp.ndarray  # (E,3,3)
    m_t: jnp.ndarray  # (E,3)
    e_valid: jnp.ndarray  # (E,) bool


def _edge_residual(si, Ri, ti, sj, Rj, tj, ms, mR, mt):
    """r = log( S_ji * S_i * S_j^{-1} )  (7,)"""
    inv_s, inv_R, inv_t = lie.sim3_inverse(sj, Rj, tj)
    cs, cR, ct = lie.sim3_compose(si, Ri, ti, inv_s, inv_R, inv_t)
    es, eR, et = lie.sim3_compose(ms, mR, mt, cs, cR, ct)
    return lie.sim3_log(es, eR, et)


# sqrt information for 4DoF edges: the reference weights the two
# gravity-constrained rotation axes 1e3 (matLambda, Optimizer.cc:5363-5366).
# numpy (not jnp) so importing this module never initializes a JAX backend.
import numpy as _np

_W4 = _np.array([31.622776, 31.622776, 1.0, 1.0, 1.0, 1.0], _np.float32)


def _edge_residual_4dof(si, Ri, ti, sj, Rj, tj, ms, mR, mt):
    """SE3 edge residual in this module's m = T_j * T_i^{-1} convention:
    E = m * T_i * T_j^{-1}, r = [log_so3(E_R); E_t] — the Edge4DoF error
    (/root/reference/include/G2oTypes.h:817-837, which states it with the
    inverse measurement convention), whitened by the reference's matLambda.
    Scale args are ignored (SE3)."""
    del si, sj, ms
    Rij = Ri @ Rj.T  # T_i * T_j^{-1}
    tij = ti - Rij @ tj
    eR = lie.so3_log(mR @ Rij)
    et = mt + mR @ tij
    return jnp.concatenate([eR, et]) * _W4


def _apply_delta_4dof(R, t, d):
    """4-D world-frame update [dyaw, dt]: yaw about the gravity-aligned
    world +z only (roll/pitch pinned by the IMU), world translation
    (VertexPose4DoF::oplusImpl + ImuCamPose::UpdateW,
    /root/reference/include/G2oTypes.h:155-189)."""
    dR = lie.so3_exp(jnp.array([0.0, 0.0, 1.0]) * d[0])
    R_wc = R.T
    C = -(R_wc @ t)
    R2 = (dR @ R_wc).T
    t2 = -(R2 @ (C + d[1:4]))
    return R2, t2


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters", "mode"))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        cg_iters: int = 50, mode: str = "sim3"):
    """LM over all free vertices. Returns (s, R, t) optimized.

    mode="sim3": 7-DoF Sim3 vertices (OptimizeEssentialGraph).
    mode="4dof": yaw+translation vertices with scale/roll/pitch frozen —
    the inertial essential graph (Optimizer::OptimizeEssentialGraph4DoF,
    /root/reference/src/Optimizer.cc:5292); gravity has pinned roll/pitch
    and the IMU has pinned scale, so only 4 DoF per KF remain free.
    """
    C = prob.s.shape[0]
    D = 7 if mode == "sim3" else 4
    RD = 7 if mode == "sim3" else 6
    free = (~prob.fixed) & prob.cam_valid
    edge_res = _edge_residual if mode == "sim3" else _edge_residual_4dof

    def residuals(s, R, t):
        si, Ri, ti = s[prob.edge_i], R[prob.edge_i], t[prob.edge_i]
        sj, Rj, tj = s[prob.edge_j], R[prob.edge_j], t[prob.edge_j]
        return jax.vmap(edge_res)(si, Ri, ti, sj, Rj, tj,
                                  prob.m_s, prob.m_R, prob.m_t)

    def apply_one(s, R, t, dx):
        if mode == "sim3":
            ds, dR, dt = lie.sim3_exp(dx)
            return lie.sim3_compose(ds, dR, dt, s, R, t)
        R2, t2 = _apply_delta_4dof(R, t, dx)
        return s, R2, t2

    def apply_delta(s, R, t, dx):
        """dx: (C,D) tangent, applied on free vertices."""
        s2, R2, t2 = jax.vmap(apply_one)(s, R, t, dx)
        keep = free[:, None]
        s = jnp.where(free, s2, s)
        R = jnp.where(keep[..., None], R2, R)
        t = jnp.where(keep, t2, t)
        return s, R, t

    def edge_jacobians(s, R, t):
        """J_i, J_j: (E,RD,D) wrt the delta of vertex i / j (autodiff)."""
        si, Ri, ti = s[prob.edge_i], R[prob.edge_i], t[prob.edge_i]
        sj, Rj, tj = s[prob.edge_j], R[prob.edge_j], t[prob.edge_j]

        def res_of_deltas(di, dj, si, Ri, ti, sj, Rj, tj, ms, mR, mt):
            si2, Ri2, ti2 = apply_one(si, Ri, ti, di)
            sj2, Rj2, tj2 = apply_one(sj, Rj, tj, dj)
            return edge_res(si2, Ri2, ti2, sj2, Rj2, tj2, ms, mR, mt)

        zero = jnp.zeros(D)
        Ji = jax.vmap(
            lambda si, Ri, ti, sj, Rj, tj, ms, mR, mt: jax.jacfwd(
                lambda d: res_of_deltas(d, zero, si, Ri, ti, sj, Rj, tj, ms, mR, mt)
            )(zero)
        )(si, Ri, ti, sj, Rj, tj, prob.m_s, prob.m_R, prob.m_t)
        Jj = jax.vmap(
            lambda si, Ri, ti, sj, Rj, tj, ms, mR, mt: jax.jacfwd(
                lambda d: res_of_deltas(zero, d, si, Ri, ti, sj, Rj, tj, ms, mR, mt)
            )(zero)
        )(si, Ri, ti, sj, Rj, tj, prob.m_s, prob.m_R, prob.m_t)
        return Ji, Jj

    w_e = prob.e_valid.astype(jnp.float32)

    def total_cost(s, R, t):
        r = residuals(s, R, t)
        return jnp.sum(w_e * jnp.sum(r * r, -1))

    def lm_iter(_, state):
        s, R, t, lam, _ = state
        r = residuals(s, R, t)  # (E,7)
        Ji, Jj = edge_jacobians(s, R, t)  # (E,7,7)
        Jiw = Ji * w_e[:, None, None]
        Jjw = Jj * w_e[:, None, None]

        g = jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Jiw, r), prob.edge_i, num_segments=C
        ) + jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Jjw, r), prob.edge_j, num_segments=C
        )
        g = -g * free[:, None]

        Hii = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", Jiw, Ji), prob.edge_i, num_segments=C
        ) + jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", Jjw, Jj), prob.edge_j, num_segments=C
        )

        diag = jnp.diagonal(Hii, axis1=-2, axis2=-1)
        Hd = Hii + (lam * diag + 1e-6)[..., None] * jnp.eye(D)
        eye = jnp.broadcast_to(jnp.eye(D), Hd.shape)
        Hd = jnp.where(free[:, None, None], Hd, eye)
        M_inv = jnp.linalg.inv(Hd)

        def Hv(v):
            vi = v[prob.edge_i]
            vj = v[prob.edge_j]
            rv = (
                jnp.einsum("erj,ej->er", Ji, vi) + jnp.einsum("erj,ej->er", Jj, vj)
            ) * w_e[:, None]
            hi = jax.ops.segment_sum(
                jnp.einsum("eri,er->ei", Ji, rv), prob.edge_i, num_segments=C
            ) + jax.ops.segment_sum(
                jnp.einsum("eri,er->ei", Jj, rv), prob.edge_j, num_segments=C
            )
            hi = hi + (lam * diag + 1e-6) * v
            return hi * free[:, None]

        def precond(r_):
            return jnp.einsum("cij,cj->ci", M_inv, r_) * free[:, None]

        def cg_step(i, st):
            x, rr, z, p, rz = st
            Ap = Hv(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1e-12, pAp)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz2 = jnp.sum(rr * z)
            beta = rz2 / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            p = z + beta * p
            return x, rr, z, p, rz2

        x0 = jnp.zeros((C, D))
        z0 = precond(g)
        st0 = (x0, g, z0, z0, jnp.sum(g * z0))
        dx, *_ = lax.fori_loop(0, cg_iters, cg_step, st0)

        s2, R2, t2 = apply_delta(s, R, t, dx)
        c0 = total_cost(s, R, t)
        c1 = total_cost(s2, R2, t2)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(dx))
        s = jnp.where(ok, s2, s)
        R = jnp.where(ok, R2, R)
        t = jnp.where(ok, t2, t)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return s, R, t, lam, jnp.where(ok, c1, c0)

    s, R, t = prob.s, prob.R, prob.t
    s, R, t, _, _ = lax.fori_loop(
        0, iters, lm_iter, (s, R, t, jnp.float32(1e-4), jnp.float32(jnp.inf))
    )
    return s, R, t
