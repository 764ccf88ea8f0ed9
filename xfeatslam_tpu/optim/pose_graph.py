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


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        cg_iters: int = 50):
    """LM over all free Sim3 vertices. Returns (s, R, t) optimized."""
    C = prob.s.shape[0]
    free = (~prob.fixed) & prob.cam_valid

    def residuals(s, R, t):
        si, Ri, ti = s[prob.edge_i], R[prob.edge_i], t[prob.edge_i]
        sj, Rj, tj = s[prob.edge_j], R[prob.edge_j], t[prob.edge_j]
        return jax.vmap(_edge_residual)(si, Ri, ti, sj, Rj, tj,
                                        prob.m_s, prob.m_R, prob.m_t)

    def apply_delta(s, R, t, dx):
        """dx: (C,7) tangent; S <- exp(dx) * S on free vertices."""
        ds, dR, dt = lie.sim3_exp(dx)
        s2, R2, t2 = lie.sim3_compose(ds, dR, dt, s, R, t)
        keep = free[:, None]
        s = jnp.where(free, s2, s)
        R = jnp.where(keep[..., None], R2, R)
        t = jnp.where(keep, t2, t)
        return s, R, t

    def edge_jacobians(s, R, t):
        """J_i, J_j: (E,7,7) wrt left-tangent of vertex i / j (autodiff)."""
        si, Ri, ti = s[prob.edge_i], R[prob.edge_i], t[prob.edge_i]
        sj, Rj, tj = s[prob.edge_j], R[prob.edge_j], t[prob.edge_j]

        def res_of_deltas(di, dj, si, Ri, ti, sj, Rj, tj, ms, mR, mt):
            dsi, dRi, dti = lie.sim3_exp(di)
            si2, Ri2, ti2 = lie.sim3_compose(dsi, dRi, dti, si, Ri, ti)
            dsj, dRj, dtj = lie.sim3_exp(dj)
            sj2, Rj2, tj2 = lie.sim3_compose(dsj, dRj, dtj, sj, Rj, tj)
            return _edge_residual(si2, Ri2, ti2, sj2, Rj2, tj2, ms, mR, mt)

        zero = jnp.zeros(7)
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
        Hd = Hii + (lam * diag + 1e-6)[..., None] * jnp.eye(7)
        eye = jnp.broadcast_to(jnp.eye(7), Hd.shape)
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

        x0 = jnp.zeros((C, 7))
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
