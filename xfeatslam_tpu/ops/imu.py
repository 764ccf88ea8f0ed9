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
    cov: jnp.ndarray  # (9,9) [rot, vel, pos] preintegration covariance
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
                 noise_gyro=1.7e-4, noise_acc=2.0e-3):
    """Integrate a padded window of IMU samples.

    Args:
      acc, gyro: (N,3) measurements; dts: (N,) per-sample intervals;
      valid: (N,) bool mask (padding); bg, ba: (3,) linearization biases.
    Returns Preintegrated (IntegrateNewMeasurement semantics as a scan).
    """
    ng2 = noise_gyro * noise_gyro
    na2 = noise_acc * noise_acc

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
        cov_new = A @ cov @ A.T + B @ Nga @ B.T
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

    init = (jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros((9, 9)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.float32(0.0))
    (dR, dV, dP, cov, JRg, JVg, JVa, JPg, JPa, T), _ = lax.scan(
        step, init, (acc, gyro, dts, valid)
    )
    dR = lie.normalize_rotation(dR)
    return Preintegrated(T, dR, dV, dP, cov, JRg, JVg, JVa, JPg, JPa, bg, ba)


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
