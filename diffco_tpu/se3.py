"""SE(3)/SO(3) exp/log maps and quaternion conversions (TPU-native).

Functional parity targets (reference:
/root/reference/diffco/collision_interfaces/se3_so3_util.py — Murray et al.
conventions):
  expMapso3/logMapSO3 (:157-198), expMapse3/logMapSE3 (:201-238),
  convertAxisAngleToQuaternion (:31), convertQuaternionToAxisAngle (:49),
  integrateAxisAngle (:15), computeAngularError (:23).

TPU-first design differences from the reference:

  * Everything is **batched** (leading dims broadcast) and jit/vmap-safe —
    no data-dependent branches; the small-angle and near-pi regimes use
    ``jnp.where``-selected Taylor series instead of Python ``if``.
  * ``log_so3`` routes through a branchless Shepperd matrix->quaternion
    conversion (always picks the largest quaternion component), which is
    stable at theta ~ pi where the reference's (R - R^T)/(2 sin theta)
    formula blows up.
  * Rotations are 3x3 matrices, tangents are plain 3-vectors (omega) and
    6-vectors (xi = [omega, v]); skew matrices only appear internally.

Quaternions are (x, y, z, w), matching the reference (:31-46).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(v, keepdims=False):
    """Differentiable ||v|| along the last axis: grad 0 (not NaN) at v=0.

    jnp.linalg.norm's VJP is v/||v|| — at zero rotation that is 0/0, and
    the double-where Taylor guards downstream cannot scrub it (0 * NaN =
    NaN), so every exp/log map here would inject NaN into gradients at
    identity (e.g. coincident trajectory waypoints through
    se3_interpolate)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=keepdims)
    zero = sq == 0.0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))


def skew(v):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix (ref
    getSkewSymMatFromVec3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def unskew(W):
    """[..., 3, 3] -> [..., 3] (ref getVec3FromSkewSymMat)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(theta):
    """sin(theta)/theta, stable at 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0,
                     jnp.sin(safe) / safe)


def _cosc(theta):
    """(1 - cos(theta))/theta^2, stable at 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 0.5 - theta * theta / 24.0,
                     (1.0 - jnp.cos(safe)) / (safe * safe))


def _sinc3(theta):
    """(theta - sin(theta))/theta^3, stable at 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 / 6.0 - theta * theta / 120.0,
                     (safe - jnp.sin(safe)) / (safe ** 3))


def exp_so3(omega):
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues;
    ref expMapso3 :180-194)."""
    theta = _safe_norm(omega)
    W = skew(omega)
    W2 = jnp.matmul(W, W, precision='highest')
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a * W + b * W2


def matrix_to_quaternion(R):
    """[..., 3, 3] -> quaternion [..., 4] (x, y, z, w), w >= 0.

    Branchless Shepperd: computes all four candidate decompositions and
    selects the one keyed by the largest quaternion component, so every
    rotation (including theta ~ pi) is numerically stable.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # 4 * (component)^2 for w, x, y, z — the selector
    fours = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                       1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
                      axis=-1)
    case = jnp.argmax(fours, axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(
        jnp.take_along_axis(fours, case[..., None], axis=-1)[..., 0], _EPS))

    def build(case_idx):
        if case_idx == 0:    # w largest
            return jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01),
                              s * s / 4.0], axis=-1) / s[..., None]
        if case_idx == 1:    # x largest
            return jnp.stack([s * s / 4.0, (m01 + m10), (m02 + m20),
                              (m21 - m12)], axis=-1) / s[..., None]
        if case_idx == 2:    # y largest
            return jnp.stack([(m01 + m10), s * s / 4.0, (m12 + m21),
                              (m02 - m20)], axis=-1) / s[..., None]
        return jnp.stack([(m02 + m20), (m12 + m21), s * s / 4.0,
                          (m10 - m01)], axis=-1) / s[..., None]

    cands = jnp.stack([build(i) for i in range(4)], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(
        cands, case[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical hemisphere: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quaternion_to_matrix(q):
    """[..., 4] (x, y, z, w) -> [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
                  axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
                  axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
                  axis=-1),
    ], axis=-2)


def axis_angle_to_quaternion(omega):
    """[..., 3] -> [..., 4] (x, y, z, w); ref
    convertAxisAngleToQuaternion (:31-46)."""
    theta = _safe_norm(omega, keepdims=True)
    half = theta / 2.0
    small = theta < 1e-6
    # sin(t/2)/t, stable at 0 (-> 1/2)
    k = jnp.where(small, 0.5 - theta * theta / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, theta))
    return jnp.concatenate([omega * k, jnp.cos(half)], axis=-1)


def quaternion_to_axis_angle(q):
    """[..., 4] (x, y, z, w) -> [..., 3]; ref
    convertQuaternionToAxisAngle (:49-59). Stable for theta -> 0 and
    theta -> pi; returns the in-[0, pi] representative."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    xyz = q[..., :3]
    w = q[..., 3]
    s = _safe_norm(xyz)
    theta = 2.0 * jnp.arctan2(s, w)
    small = s < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5),
                      theta / jnp.where(small, 1.0, s))
    return xyz * scale[..., None]


def log_so3(R):
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3]
    (ref logMapSO3 :157-176, which returns theta * omegahat; this returns
    the vector — apply ``skew`` for the matrix form)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def exp_se3(xi):
    """Twist [..., 6] (omega, v) -> homogeneous transform [..., 4, 4]
    (ref expMapse3 :221-238)."""
    omega, v = xi[..., :3], xi[..., 3:]
    theta = _safe_norm(omega)
    W = skew(omega)
    W2 = jnp.matmul(W, W, precision='highest')
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + _sinc(theta)[..., None, None] * W \
        + _cosc(theta)[..., None, None] * W2
    V = eye + _cosc(theta)[..., None, None] * W \
        + _sinc3(theta)[..., None, None] * W2
    p = jnp.matmul(V, v[..., None], precision='highest')[..., 0]
    top = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log_se3(T):
    """Homogeneous transform [..., 4, 4] -> twist [..., 6] (omega, v)
    (ref logMapSE3 :201-218, which returns the 4x4 kseehat; this returns
    the 6-vector)."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    omega = log_so3(R)
    theta = _safe_norm(omega)
    W = skew(omega)
    W2 = jnp.matmul(W, W, precision='highest')
    # V^{-1} = I - W/2 + c * W^2,
    # c = (1 - theta sin / (2 (1 - cos))) / theta^2, -> 1/12 at 0
    small = theta < 1e-4
    safe = jnp.where(small, 1.0, theta)
    c = jnp.where(small, 1.0 / 12.0 + theta * theta / 720.0,
                  (1.0 - safe * jnp.sin(safe)
                   / (2.0 * (1.0 - jnp.cos(safe)))) / (safe * safe))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + c[..., None, None] * W2
    v = jnp.matmul(Vinv, p[..., None], precision='highest')[..., 0]
    return jnp.concatenate([omega, v], axis=-1)


def se3_inverse(T):
    """[..., 4, 4] -> [..., 4, 4] (ref computeInverseHomogeneousTransformMatrix)."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    pinv = -jnp.matmul(Rt, p[..., None], precision='highest')
    top = jnp.concatenate([Rt, pinv], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_interpolate(T0, T1, t):
    """Geodesic SE(3) interpolation: T(t) = T0 exp(t log(T0^-1 T1)).

    t may be scalar or [..., K]; used for SE(3) path densification in
    trajectory optimization (replaces per-component euler interpolation).
    """
    delta = log_se3(jnp.matmul(se3_inverse(T0), T1, precision='highest'))
    t = jnp.asarray(t, delta.dtype)
    if t.ndim == 0:
        return jnp.matmul(T0, exp_se3(t * delta), precision='highest')
    # t [K] (or [..., K]) fans out to a NEW axis before the twist dim —
    # t[..., None] * delta would pair t[i] with waypoint i instead
    xi = t[..., :, None] * delta[..., None, :]        # [..., K, 6]
    return jnp.matmul(T0[..., None, :, :], exp_se3(xi),
                      precision='highest')


def integrate_axis_angle(axis_angle, omega, dt):
    """Integrate a body angular velocity (ref integrateAxisAngle :15-20)."""
    R_curr = exp_so3(axis_angle)
    R_delta = exp_so3(omega * dt)
    return log_so3(jnp.matmul(R_delta, R_curr, precision='highest'))


def angular_error(source_axis_angle, target_axis_angle):
    """Rotation from source to target as an axis-angle vector
    (ref computeAngularError :23-28)."""
    R_s = exp_so3(source_axis_angle)
    R_t = exp_so3(target_axis_angle)
    return log_so3(jnp.matmul(R_t, jnp.swapaxes(R_s, -1, -2),
                              precision='highest'))
