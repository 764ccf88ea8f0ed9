"""IMU preintegration (Forster-style) as a JAX scan.

Role of /root/reference/src/ImuTypes.cc (421 LoC): `Preintegrated` holds
dR/dV/dP deltas between keyframes, a 15x15 covariance, and bias Jacobians
JRg/JVg/JVa/JPg/JPa updated measurement-by-measurement
(IntegrateNewMeasurement :177-281), plus bias-corrected getters (:283-312)
and Reintegrate/MergePrevious.

TPU-native design: a whole measurement window integrates as one lax.scan
(static max length, padded + masked), so preintegrating between keyframes is
one device call, and re-integration after a bias update is the same call
with new bias — no incremental mutation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import lie

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class ImuCalib(NamedTuple):
    """Noise densities (continuous) and bias random walk, Tbc extrinsics
    (ImuTypes.h:92-126 Calib)."""

    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    R_bc: jnp.ndarray = None  # body<-camera
    t_bc: jnp.ndarray = None


class Preintegrated(NamedTuple):
    """Deltas over [t_i, t_j], at linearization bias (bg, ba)."""

    dt: jnp.ndarray  # () total time
    dR: jnp.ndarray  # (3,3)
    dV: jnp.ndarray  # (3,)
    dP: jnp.ndarray  # (3,)
    # (15,15) [rot, vel, pos, bg, ba] covariance: the 9x9 preintegration
    # block propagated per sample plus bias random-walk blocks
    # (ImuTypes.cc:202-245 propagates the full 15x15 with C.block<6,6>(9,9)
    # accumulating the walk)
    cov: jnp.ndarray
    # bias Jacobians (ImuTypes.cc:238-245)
    JRg: jnp.ndarray  # (3,3) d dR / d bg
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    bg: jnp.ndarray  # (3,) linearization gyro bias
    ba: jnp.ndarray  # (3,) linearization acc bias


def _right_jacobian(phi):
    """Right Jacobian of SO3 (ImuTypes.cc:64 RightJacobianSO3)."""
    theta2 = jnp.sum(phi * phi)
    theta = jnp.sqrt(theta2 + 1e-20)
    Phi = lie.so3_hat(phi)
    Phi2 = Phi @ Phi
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    return jnp.eye(3) - a * Phi + b * Phi2


@functools.partial(jax.jit, static_argnames=())
def preintegrate(acc, gyro, dts, valid, bg, ba,
                 noise_gyro=1.7e-4, noise_acc=2.0e-3,
                 walk_gyro=1.9e-5, walk_acc=3.0e-3):
    """Integrate a padded window of IMU samples.

    Args:
      acc, gyro: (N,3) measurements; dts: (N,) per-sample intervals;
      valid: (N,) bool mask (padding); bg, ba: (3,) linearization biases.
    Returns Preintegrated (IntegrateNewMeasurement semantics as a scan)
    with the full 15x15 covariance [rot, vel, pos, bg, ba]: the 9x9 block
    propagated through the A/B system and the bias block accumulating the
    random walk (ImuTypes.cc:202-245).
    """
    ng2 = noise_gyro * noise_gyro
    na2 = noise_acc * noise_acc
    wg2 = walk_gyro * walk_gyro
    wa2 = walk_acc * walk_acc

    def step(carry, x):
        dR, dV, dP, cov, JRg, JVg, JVa, JPg, JPa, T = carry
        a, w, dt, v = x
        dt = jnp.where(v, dt, 0.0)
        a_c = a - ba
        w_c = w - bg

        # position/velocity update with current rotation (ImuTypes.cc:191-200)
        acc_w = dR @ a_c
        dP_new = dP + dV * dt + 0.5 * acc_w * dt * dt
        dV_new = dV + acc_w * dt

        # covariance propagation A/B blocks (ImuTypes.cc:202-235)
        a_hat = lie.so3_hat(a_c)
        phi = w_c * dt
        dRi = lie.so3_exp(phi)
        Jr = _right_jacobian(phi)

        A = jnp.eye(9)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ a_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ a_hat * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Nga = jnp.diag(jnp.array([ng2, ng2, ng2, na2, na2, na2])) / jnp.maximum(dt, 1e-6)
        c9 = A @ cov[:9, :9] @ A.T + B @ Nga @ B.T
        # bias random walk accumulates in the (9:15, 9:15) block
        # (ImuTypes.cc:233-235: C.block<6,6>(9,9) += NgaWalk)
        walk = jnp.diag(jnp.array([wg2, wg2, wg2, wa2, wa2, wa2])) * jnp.maximum(dt, 0.0)
        cov_new = cov.at[:9, :9].set(c9)
        cov_new = cov_new.at[9:, 9:].add(walk)
        cov_new = jnp.where(v, cov_new, cov)

        # bias jacobians (ImuTypes.cc:238-245)
        JPa_new = JPa + JVa * dt - 0.5 * dR * dt * dt
        JPg_new = JPg + JVg * dt - 0.5 * dR @ a_hat @ JRg * dt * dt
        JVa_new = JVa - dR * dt
        JVg_new = JVg - dR @ a_hat @ JRg * dt
        JRg_new = dRi.T @ JRg - Jr * dt

        dR_new = dR @ dRi

        out = tuple(
            jnp.where(v, n, o)
            for n, o in [
                (dR_new, dR), (dV_new, dV), (dP_new, dP), (cov_new, cov),
                (JRg_new, JRg), (JVg_new, JVg), (JVa_new, JVa),
                (JPg_new, JPg), (JPa_new, JPa), (T + dt, T),
            ]
        )
        return out, None

    init = (jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros((15, 15)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.float32(0.0))
    (dR, dV, dP, cov, JRg, JVg, JVa, JPg, JPa, T), _ = lax.scan(
        step, init, (acc, gyro, dts, valid)
    )
    dR = lie.normalize_rotation(dR)
    return Preintegrated(T, dR, dV, dP, cov, JRg, JVg, JVa, JPg, JPa, bg, ba)


def preintegrate_segment(acc, gyro, dts, bg, ba,
                         calib: ImuCalib = None) -> Preintegrated:
    """Host-side convenience: preintegrate a variable-length numpy sample
    window by padding to a power-of-two bucket (bounds jit recompiles of the
    scan to one per bucket size). Returns a Preintegrated of numpy arrays."""
    import numpy as np

    n = len(acc)
    bucket = 8
    while bucket < n:
        bucket *= 2
    pad = bucket - n

    def padded(a):
        a = np.asarray(a, np.float32)
        return np.concatenate([a, np.zeros((pad,) + a.shape[1:], np.float32)])

    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    kw = {}
    if calib is not None:
        kw = dict(noise_gyro=calib.noise_gyro, noise_acc=calib.noise_acc,
                  walk_gyro=calib.walk_gyro, walk_acc=calib.walk_acc)
    pre = preintegrate(padded(acc), padded(gyro), padded(dts), valid,
                       jnp.asarray(np.asarray(bg, np.float32)),
                       jnp.asarray(np.asarray(ba, np.float32)), **kw)
    return Preintegrated(*[np.asarray(f) for f in pre])


def relinearize(pre: Preintegrated, bg_new, ba_new) -> Preintegrated:
    """Re-express a preintegration at a new linearization bias (first-order
    via the stored Jacobians). Deltas move, Jacobians/covariance stay — the
    standard approximation the reference applies implicitly whenever it
    calls the GetDelta* getters at an updated bias."""
    dR, dV, dP = delta_with_bias(pre, bg_new, ba_new)
    return pre._replace(dR=lie.normalize_rotation(dR), dV=dV, dP=dP,
                        bg=jnp.asarray(bg_new), ba=jnp.asarray(ba_new))


def merge_previous(prev: Preintegrated, cur: Preintegrated) -> Preintegrated:
    """Concatenate two consecutive preintegrations (MergePrevious role,
    /root/reference/src/ImuTypes.cc): combined delta over [t0, t2] at the
    CURRENT segment's linearization bias.

    Composition rules (both re-expressed at bias (cur.bg, cur.ba)):
      dR = dR1 dR2;  dV = dV1 + dR1 dV2;  dP = dP1 + dV1*dt2 + dR1 dP2.
    Covariance: second segment's 9x9 transported through the composition
    Jacobian of the first; bias Jacobians chain accordingly.
    """
    dR1, dV1, dP1 = delta_with_bias(prev, cur.bg, cur.ba)
    dR2, dV2, dP2 = cur.dR, cur.dV, cur.dP
    t2 = cur.dt
    dR = lie.normalize_rotation(dR1 @ dR2)
    dV = dV1 + dR1 @ dV2
    dP = dP1 + dV1 * t2 + dR1 @ dP2

    # transport: state_2 = F @ state_1 + G @ state_seg2
    F = jnp.eye(15)
    F = F.at[0:3, 0:3].set(dR2.T)
    F = F.at[3:6, 3:6].set(jnp.eye(3))
    F = F.at[6:9, 3:6].set(jnp.eye(3) * t2)
    G = jnp.eye(15)
    G = G.at[3:6, 3:6].set(dR1)
    G = G.at[6:9, 6:9].set(dR1)
    cov = F @ prev.cov @ F.T + G @ cur.cov @ G.T
    # keep the larger bias-walk block only once (G already carried cur's)
    cov = cov.at[9:, 9:].set(prev.cov[9:, 9:] + cur.cov[9:, 9:])

    # chained bias Jacobians
    JRg = dR2.T @ prev.JRg + cur.JRg
    JVg = prev.JVg + dR1 @ cur.JVg - dR1 @ lie.so3_hat(dV2) @ prev.JRg
    JVa = prev.JVa + dR1 @ cur.JVa
    JPg = (prev.JPg + prev.JVg * t2 + dR1 @ cur.JPg
           - dR1 @ lie.so3_hat(dP2) @ prev.JRg)
    JPa = prev.JPa + prev.JVa * t2 + dR1 @ cur.JPa
    return Preintegrated(prev.dt + cur.dt, dR, dV, dP, cov,
                         JRg, JVg, JVa, JPg, JPa, cur.bg, cur.ba)


def delta_with_bias(pre: Preintegrated, bg_new, ba_new):
    """Bias-corrected deltas (GetDeltaRotation/Velocity/Position,
    ImuTypes.cc:283-312): first-order update via the stored Jacobians."""
    dbg = bg_new - pre.bg
    dba = ba_new - pre.ba
    dR = pre.dR @ lie.so3_exp(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    return dR, dV, dP


def predict_state(R_wb, p_wb, v_w, pre: Preintegrated, bg_new=None, ba_new=None,
                  gravity=GRAVITY):
    """Propagate a body state through a preintegrated delta
    (Tracking::PredictStateIMU role, /root/reference/src/Tracking.cc:1765)."""
    if bg_new is None:
        bg_new = pre.bg
    if ba_new is None:
        ba_new = pre.ba
    dR, dV, dP = delta_with_bias(pre, bg_new, ba_new)
    t = pre.dt
    R_new = R_wb @ dR
    v_new = v_w + gravity * t + R_wb @ dV
    p_new = p_wb + v_w * t + 0.5 * gravity * t * t + R_wb @ dP
    return R_new, p_new, v_new


def inertial_residual(R_i, p_i, v_i, R_j, p_j, v_j, bg, ba,
                      pre: Preintegrated, gravity=GRAVITY):
    """9-D preintegration residual (EdgeInertial,
    /root/reference/include/G2oTypes.h:495): [e_R, e_v, e_p]."""
    dR, dV, dP = delta_with_bias(pre, bg, ba)
    t = pre.dt
    e_R = lie.so3_log(dR.T @ (R_i.T @ R_j))
    e_v = R_i.T @ (v_j - v_i - gravity * t) - dV
    e_p = R_i.T @ (p_j - p_i - v_i * t - 0.5 * gravity * t * t) - dP
    return jnp.concatenate([e_R, e_v, e_p])
