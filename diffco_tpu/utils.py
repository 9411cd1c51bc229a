"""Core math utilities (TPU-native, JAX).

Functional parity targets (reference: /root/reference/diffco/utils.py):
  wrap2pi (:51), rot_2d (:40), euler2mat (:15), rotz (:4), anglin (:60),
  DH2mat (:66), make_continue (:80), dense_path (:87), se2_wrap2pi (:54).

Design departures from the reference (torch) implementation:
  * everything is a pure function of jnp arrays, jit/vmap-safe;
  * ``dense_path`` produces a *fixed-length* output (static shapes are
    mandatory under jit) — the reference produces data-dependent lengths,
    which XLA cannot compile; we interpolate each segment with a constant
    number of sub-steps instead and return the per-point validity count.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def wrap2pi(theta):
    """Wrap angles to [-pi, pi). Ref: utils.py:51."""
    return (PI + theta) % (2 * PI) - PI


def se2_wrap2pi(x):
    """Wrap only the angular (3rd) component of SE(2) configurations."""
    return jnp.concatenate([x[..., :2], wrap2pi(x[..., 2:3])], axis=-1)


def rot_2d(phi):
    """Batched 2D rotation matrices: [..., 2, 2]. Ref: utils.py:40."""
    s, c = jnp.sin(phi), jnp.cos(phi)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotz(phi):
    """Batched 3D rotation about z: [..., 3, 3]. Ref: utils.py:4."""
    s, c = jnp.sin(phi), jnp.cos(phi)
    z = jnp.zeros_like(phi)
    o = jnp.ones_like(phi)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def roty(phi):
    s, c = jnp.sin(phi), jnp.cos(phi)
    z = jnp.zeros_like(phi)
    o = jnp.ones_like(phi)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ], axis=-2)


def rotx(phi):
    s, c = jnp.sin(phi), jnp.cos(phi)
    z = jnp.zeros_like(phi)
    o = jnp.ones_like(phi)
    return jnp.stack([
        jnp.stack([o, z, z], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
        jnp.stack([z, s, c], axis=-1),
    ], axis=-2)


def matmul_f32(a, b):
    """Full-precision matmul for small rotation/transform compositions.

    This JAX build defaults matmuls to bf16-equivalent precision (TPU MXU
    semantics); 3x3/4x4 chains accumulate visible error there, and they are
    a negligible share of FLOPs, so force the highest precision.
    """
    return jnp.matmul(a, b, precision='highest')


def euler2mat(phi):
    """Roll-pitch-yaw (x, y, z) Euler angles -> rotation matrices.

    phi: [..., 3]; returns [..., 3, 3] = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    Ref: utils.py:15-38.
    """
    return matmul_f32(matmul_f32(rotz(phi[..., 2]), roty(phi[..., 1])),
                      rotx(phi[..., 0]))


def axis_angle_mat(axis, angle):
    """Rodrigues rotation: rotation of ``angle`` about (unit) ``axis``.

    axis: [..., 3], angle: [...]; returns [..., 3, 3].

    The reference (rigid_body.py:102-108) only supports axis-aligned joint
    axes; this general form covers arbitrary URDF joint axes and reduces to
    the same matrices for (+-1, 0, 0)-style axes.
    """
    axis = jnp.asarray(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    s, c = jnp.sin(angle), jnp.cos(angle)
    C = 1.0 - c
    return jnp.stack([
        jnp.stack([x * x * C + c, x * y * C - z * s, x * z * C + y * s], axis=-1),
        jnp.stack([y * x * C + z * s, y * y * C + c, y * z * C - x * s], axis=-1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, z * z * C + c], axis=-1),
    ], axis=-2)


def DH2mat(q, a, d, s_alpha, c_alpha):
    """Batched standard-DH transform matrices.

    q: [..., dof] joint angles (theta), a/d/s_alpha/c_alpha: [dof].
    Returns [..., dof, 4, 4]. Ref: utils.py:66-75.
    """
    c_t, s_t = jnp.cos(q), jnp.sin(q)
    zeros = jnp.zeros_like(q)
    ones = jnp.ones_like(q)
    b = lambda v: jnp.broadcast_to(v, q.shape)
    row0 = jnp.stack([c_t, -s_t * c_alpha, s_t * s_alpha, a * c_t], axis=-1)
    row1 = jnp.stack([s_t, c_t * c_alpha, -c_t * s_alpha, a * s_t], axis=-1)
    row2 = jnp.stack([zeros, b(s_alpha), b(c_alpha), b(d)], axis=-1)
    row3 = jnp.stack([zeros, zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def anglin(q1, q2, num=50, endpoint=True):
    """Wrap-aware linspace between angle vectors. Ref: utils.py:60-64."""
    q1 = jnp.asarray(q1, dtype=jnp.float32)
    q2 = jnp.asarray(q2, dtype=jnp.float32)
    dq = jnp.linspace(jnp.zeros_like(q1), wrap2pi(q2 - q1), num, endpoint=endpoint)
    return wrap2pi(q1 + dq)


def make_continue(q, max_gap=PI):
    """Unwrap a path of joint angles so adjacent waypoints are numerically
    adjacent (for plotting). Ref: utils.py:80-85."""
    q = jnp.asarray(q)
    diff = q[1:] - q[:-1]
    sudden = jnp.where(jnp.abs(diff) > max_gap, jnp.sign(diff), 0.0)
    sudden = jnp.concatenate([jnp.zeros_like(q[:1]), sudden], axis=0)
    offset = -jnp.cumsum(sudden, axis=0) * 2 * PI
    return q + offset


def dense_path(q, num_sub: int) -> jnp.ndarray:
    """Fixed-shape path densification.

    Interpolates ``num_sub`` points per segment (endpoints of each segment
    included once), returning ``[(N-1) * num_sub + 1, dof]``.

    The reference (utils.py:87-101) emits a data-dependent number of points
    per segment based on ``max_step``; under jit that is a dynamic shape, so
    the TPU-native version uses a constant per-segment count. Choose
    ``num_sub >= ceil(max_segment_length / max_step)`` for an equivalent or
    finer discretization.
    """
    q = jnp.asarray(q)
    n_seg = q.shape[0] - 1
    # fractions [num_sub] in [0, 1)
    fr = jnp.arange(num_sub, dtype=q.dtype) / num_sub
    seg_start = q[:-1]                      # [n_seg, dof]
    delta = q[1:] - q[:-1]                  # [n_seg, dof]
    pts = seg_start[:, None, :] + fr[None, :, None] * delta[:, None, :]
    pts = pts.reshape(n_seg * num_sub, -1)
    return jnp.concatenate([pts, q[-1:]], axis=0)


def segment_violations(scores, n_segments: int, num_sub: int,
                       safety_margin=0.0, xp=jnp):
    """Per-segment summed collision violations — the trajopt constraint
    form shared by the AL core and the scipy parity optimizers (ref
    optim.py:199-206: each segment owns its start point plus the
    ``num_sub - 1`` interior points; the excluded global start becomes a
    zero entry so the reshape is exact).

    scores: ``dist_est`` output on ``dense_path(p, num_sub)[1:-1]`` —
    flat ``[(n_segments * num_sub) - 1]``, or multi-output ``[B, C]``
    (collapsed with max: the most violating class governs the
    constraint). ``xp`` selects jnp (traced) or np (host scipy loops).
    Returns ``[n_segments]``.
    """
    s = xp.asarray(scores)
    if s.ndim > 1:
        s = s.reshape(s.shape[0], -1).max(axis=-1)
    else:
        s = s.reshape(-1)
    viol = xp.maximum(s - safety_margin, 0.0)
    viol = xp.concatenate([xp.zeros(1, viol.dtype), viol])
    return viol.reshape(n_segments, num_sub).sum(axis=1)


def segment_max_scores(scores, n_segments: int, num_sub: int, xp=jnp):
    """Per-segment MAX score — the non-degenerate constraint form.

    Same segment ownership as :func:`segment_violations` (each segment
    owns its start point plus the ``num_sub - 1`` interior points; the
    excluded global start becomes a -inf entry so the reshape is exact).
    ``margin - segment_max_scores(...) >= 0`` describes the SAME feasible
    set as ``-segment_violations(...) >= 0`` but keeps a nonzero jacobian
    (the score gradient at the segment's argmax) on and inside the
    boundary, where the clamped-sum form is identically zero — the
    reference's formulation (ref optim.py:199-206) hands interior-point
    solvers a rank-deficient constraint there ("Singular Jacobian"
    warnings, xtol-only termination). Returns ``[n_segments]``.
    """
    s = xp.asarray(scores)
    if s.ndim > 1:
        s = s.reshape(s.shape[0], -1).max(axis=-1)
    else:
        s = s.reshape(-1)
    neg = xp.asarray(-xp.inf, s.dtype)
    s = xp.concatenate([neg[None], s])
    return s.reshape(n_segments, num_sub).max(axis=1)


def dense_path_params(q, max_step: float, max_dense_waypoints: int | None = None
                      ) -> int:
    """Host-side helper: pick the per-segment subdivision count that matches
    the reference's ``dense_path(q, max_step, max_step_num)`` semantics
    (utils.py:87-101) while keeping shapes static.

    Returns num_sub such that every sub-step is <= max_step (measured on the
    *current* q; calls with a changed q reuse compiled code because only the
    static count matters).
    """
    import numpy as np
    qn = np.asarray(q)
    seg_len = np.linalg.norm(qn[1:] - qn[:-1], axis=-1)
    if max_dense_waypoints is not None:
        tmp = float(seg_len.sum()) / max_dense_waypoints
        max_step = max(max_step, tmp)
    num_sub = int(np.ceil(seg_len.max() / max_step)) if len(seg_len) else 1
    return max(num_sub, 1)


def transform_points(rot, trans, points):
    """Apply rigid transform(s) to points: rot [...,3,3] @ p + trans [...,3].

    points: [..., M, 3] -> [..., M, 3].
    """
    return jnp.einsum('...ij,...mj->...mi', rot, points,
                      precision='highest') + trans[..., None, :]


def look_mat4(rot, trans):
    """Pack (rot [...,3,3], trans [...,3]) into a homogeneous [...,4,4]."""
    shape = rot.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), shape + (1, 4))
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
