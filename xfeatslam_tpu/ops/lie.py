"""SO3 / SE3 / Sim3 Lie-group operations as pure JAX functions.

TPU-native replacement for the Sophus usage in the reference
(/root/reference/thirdparty/Sophus/sophus/{so3,se3,sim3}.hpp, used for all
pose storage, e.g. /root/reference/include/Frame.h and g2o vertex types).

Conventions:
  * Rotations are 3x3 matrices (MXU-friendly; no quaternion bookkeeping).
  * An SE3 element is the pair (R, t): x_out = R @ x + t.
  * An Sim3 element is the triple (s, R, t): x_out = s * R @ x + t.
  * Tangent vectors: so3 = phi(3); se3 = [rho(3), phi(3)];
    sim3 = [rho(3), phi(3), sigma(1)] (translation first, like Sophus).
  * All functions broadcast over arbitrary leading batch dimensions and are
    jit/vmap/grad-safe (small-angle branches via jnp.where with safe args).

Everything is float32 by default (TPU native); float64 works on CPU when
jax_enable_x64 is on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_div(num, den, eps=_EPS):
    """num/den with den clamped away from zero (sign-preserving)."""
    safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / safe


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_hat(phi):
    """(...,3) -> (...,3,3) skew-symmetric matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(Phi):
    """(...,3,3) skew matrix -> (...,3)."""
    return jnp.stack(
        [Phi[..., 2, 1], Phi[..., 0, 2], Phi[..., 1, 0]], axis=-1
    )


def so3_exp(phi):
    """Rodrigues formula with Taylor fallback. (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)  # safe sqrt; exact branch below
    small = theta2 < 1e-8

    # sin(t)/t and (1-cos t)/t^2 with Taylor expansions near zero
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)

    Phi = so3_hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a[..., None, None] * Phi + b[..., None, None] * Phi2


def rotation_to_quaternion(R):
    """(...,3,3) -> unit quaternion (w,x,y,z) with w >= 0.

    Branchless Shepperd extraction: compute all four candidate quaternions
    (one per dominant component) and select the numerically best, so the
    result is accurate for every rotation angle including theta ~ pi.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    t0 = 1.0 + r00 + r11 + r22  # 4w^2
    t1 = 1.0 + r00 - r11 - r22  # 4x^2
    t2 = 1.0 - r00 + r11 - r22  # 4y^2
    t3 = 1.0 - r00 - r11 + r22  # 4z^2
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)

    def cand0():
        s = jnp.sqrt(jnp.clip(t0, _EPS, None)) * 2.0  # 4w
        return jnp.stack([0.25 * s, (r21 - r12) / s, (r02 - r20) / s, (r10 - r01) / s], -1)

    def cand1():
        s = jnp.sqrt(jnp.clip(t1, _EPS, None)) * 2.0  # 4x
        return jnp.stack([(r21 - r12) / s, 0.25 * s, (r01 + r10) / s, (r02 + r20) / s], -1)

    def cand2():
        s = jnp.sqrt(jnp.clip(t2, _EPS, None)) * 2.0  # 4y
        return jnp.stack([(r02 - r20) / s, (r01 + r10) / s, 0.25 * s, (r12 + r21) / s], -1)

    def cand3():
        s = jnp.sqrt(jnp.clip(t3, _EPS, None)) * 2.0  # 4z
        return jnp.stack([(r10 - r01) / s, (r02 + r20) / s, (r12 + r21) / s, 0.25 * s], -1)

    cands = jnp.stack([cand0(), cand1(), cand2(), cand3()], axis=-2)  # (...,4,4)
    best = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical sign: w >= 0 so the log angle lands in [0, pi]
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_rotation(q):
    """Unit quaternion (w,x,y,z) (...,4) -> (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def so3_log(R):
    """Matrix log of SO3 via quaternion. (...,3,3) -> (...,3).

    Accurate for all angles (theta=2*atan2(|v|,w) avoids the arccos/near-pi
    catastrophic cancellation of the direct inverse-Rodrigues formula).
    """
    q = rotation_to_quaternion(R)
    w = q[..., 0]
    v = q[..., 1:]
    # safe norm: jnp.linalg.norm has a NaN gradient at v=0, which poisons
    # autodiff Jacobians of zero-residual pose-graph edges
    nv2 = jnp.sum(v * v, axis=-1)
    small = nv2 < 1e-12
    nv_safe = jnp.sqrt(jnp.where(small, 1.0, nv2))
    theta = 2.0 * jnp.arctan2(jnp.where(small, 0.0, nv_safe), w)
    # phi = theta * v/|v|; small |v|: theta/|v| ~ 2/w * (1 - |v|^2/(3 w^2))
    scale = jnp.where(
        small,
        2.0 / jnp.clip(w, 0.5, None) * (1.0 - nv2 / (3.0 * jnp.clip(w * w, 0.25, None))),
        theta / nv_safe,
    )
    return scale[..., None] * v


def so3_left_jacobian(phi):
    """Left Jacobian J_l of SO3: exp(hat(J_l rho)) relation. (...,3)->(...,3,3).

    J_l = I + b*Phi + c*Phi^2 with b=(1-cos)/t^2, c=(t-sin)/t^3.
    (This is the SE3 'V' matrix used to map tangent translation to t.)
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    Phi = so3_hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + b[..., None, None] * Phi + c[..., None, None] * Phi2


def so3_left_jacobian_inv(phi):
    """Inverse of the SO3 left Jacobian. (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = 0.5 * theta
    # coefficient of Phi^2: (1/t^2)(1 - t sin / (2(1-cos))) ; Taylor: 1/12 + t^2/720
    cot = _safe_div(jnp.cos(half), jnp.sin(half))
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        _safe_div(1.0 - 0.5 * theta * cot, theta2),
    )
    Phi = so3_hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + c[..., None, None] * Phi2


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """se3 tangent [rho, phi] (...,6) -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """(R, t) -> tangent [rho, phi] (...,6)."""
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(a ∘ b): first apply b, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Transform points x (...,3). Broadcasts (R,t) against x."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_matrix(R, t):
    """(R,t) -> homogeneous (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def normalize_rotation(R):
    """Project a near-rotation matrix to SO3 via SVD (like Sophus/IMU use,
    /root/reference/src/ImuTypes.cc NormalizeRotation)."""
    u, _, vt = jnp.linalg.svd(R)
    Rn = u @ vt
    # fix possible reflection
    det = jnp.linalg.det(Rn)
    u_fixed = u.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    return jnp.where(det[..., None, None] > 0, Rn, u_fixed @ vt)


def np_normalize_rotation(R):
    """Host-side (numpy) SO3 projection for the tracking/map boundaries.

    Rotation chains composed in float32 lose orthonormality MULTIPLICATIVELY
    through the motion-model feedback loop (velocity = F_k * F_{k-1}^T, then
    prediction = velocity * F_k): the deviation roughly doubles per frame and
    reaches 1e-2 within ~15 frames, at which point the det<1 'rotation'
    absorbs scene scale and pose optimization converges centimeters off (the
    round-1 'drift ratchet'). Every host-side write of a frame/keyframe
    rotation must pass through this projection. The reference never hits
    this because Sophus stores SO3 as a normalized quaternion."""
    import numpy as _np

    u, _, vt = _np.linalg.svd(_np.asarray(R, _np.float64))
    Rn = u @ vt
    if _np.linalg.det(Rn) < 0:
        u[..., :, 2] *= -1.0
        Rn = u @ vt
    return Rn.astype(_np.float32)


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def _sim3_W(phi, sigma):
    """The Sim3 'W' matrix: t = W @ rho for exp([rho, phi, sigma]).

    W = C*I + (A/theta)*Phi + (Bc/theta^2)*Phi^2 where
      C  = int_0^1 e^{sigma u} du
      A  = int_0^1 e^{sigma u} sin(theta u) du
      Bc = int_0^1 e^{sigma u} (1 - cos(theta u)) du
    computed in closed form with Taylor fallbacks.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sigma2 = sigma * sigma
    small_sigma = jnp.abs(sigma) < 1e-4
    small_theta = theta2 < 1e-8

    C = jnp.where(small_sigma, 1.0 + 0.5 * sigma + sigma2 / 6.0, _safe_div(s - 1.0, sigma))

    denom = sigma2 + theta2
    # closed forms (valid when denom > 0):
    A_cf = _safe_div(s * (sigma * jnp.sin(theta) - theta * jnp.cos(theta)) + theta, denom)
    D_cf = _safe_div(s * (sigma * jnp.cos(theta) + theta * jnp.sin(theta)) - sigma, denom)
    Bc_cf = C - D_cf

    # Taylor in theta (small theta), any sigma:
    #   A ~ theta * int e^{su} u du = theta * E1,  E1=(s(sigma-1)+1)/sigma^2
    #   Bc ~ theta^2/2 * int e^{su} u^2 du = theta^2/2 * E2,
    #   E2 = (s(sigma^2-2sigma+2)-2)/sigma^3
    E1 = jnp.where(
        small_sigma,
        0.5 + sigma / 3.0 + sigma2 / 8.0,
        _safe_div(s * (sigma - 1.0) + 1.0, sigma2),
    )
    E2 = jnp.where(
        small_sigma,
        1.0 / 3.0 + sigma / 4.0 + sigma2 / 10.0,
        _safe_div(s * (sigma2 - 2.0 * sigma + 2.0) - 2.0, sigma2 * sigma),
    )
    A_t = theta * E1
    Bc_t = 0.5 * theta2 * E2

    A = jnp.where(small_theta, A_t, A_cf)
    Bc = jnp.where(small_theta, Bc_t, Bc_cf)

    coef1 = _safe_div(A, theta)
    coef2 = _safe_div(Bc, theta2)
    # exact small-theta limits of the coefficients:
    coef1 = jnp.where(small_theta, E1, coef1)
    coef2 = jnp.where(small_theta, 0.5 * E2, coef2)

    Phi = so3_hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (
        C[..., None, None] * eye
        + coef1[..., None, None] * Phi
        + coef2[..., None, None] * Phi2
    )


def sim3_exp(xi):
    """sim3 tangent [rho(3), phi(3), sigma(1)] (...,7) -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) -> tangent (...,7). rho recovered by solving W rho = t."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(a ∘ b): x -> sa Ra (sb Rb x + tb) + ta."""
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return s, R, t


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_apply(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t
