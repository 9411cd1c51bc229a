"""Analytic (closed-form) robot models, batched and differentiable.

Functional parity targets (reference: /root/reference/diffco/model.py):
  Model (:9), RevolutePlanarRobot (:23), RigidPlanarBody (:78),
  RigidBody (:120), DHParameters (:173), BaxterLeftArmFK (:188),
  BaxterRightArmFK (:246), BaxterDualArmFK (:310), PandaFK (:390),
  DualPandaFK (:456), PointRobot1D (:505).

All ``fkine`` implementations are pure jnp functions of the batched
configuration ``q`` — jit/vmap/grad-safe, no state, no in-place updates.
The reference's per-robot ``update_polygons`` (FCL state mutation) is
replaced by the geometry module's batched on-device primitives; robots here
expose ``collision_segments``-style static descriptors instead.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import wrap2pi, rot_2d, euler2mat, DH2mat, matmul_f32
from .soa import (
    vec_add, transform_compose, dh_rot_trans, rot_from_static,
    stack_points)
from .fk_jvp import make_dh_fkine

PI = math.pi


class Model:
    """Base robot model. Ref: model.py:9-21."""
    dof: int
    limits: jnp.ndarray  # [dof, 2]

    def fkine(self, q):
        raise NotImplementedError

    def wrap(self, q):
        raise NotImplementedError

    def rand_configs(self, num_cfgs: int, key: jax.Array) -> jnp.ndarray:
        lo, hi = self.limits[:, 0], self.limits[:, 1]
        u = jax.random.uniform(key, (num_cfgs, self.dof), dtype=lo.dtype)
        return u * (hi - lo) + lo

    # alias matching URDFRobot naming (ref: urdf_interface.py:447)
    @property
    def joint_limits(self):
        return self.limits


class RevolutePlanarRobot(Model):
    """Planar serial arm with revolute joints; links along local +x.

    fkine returns joint positions [B, dof, 2] via the cumsum construction
    (ref: model.py:40-48). Collision geometry: each link is a
    width-``link_width`` rectangle between consecutive joints.
    """

    def __init__(self, link_length, link_width: float, dof: Optional[int] = None,
                 limits=None):
        if limits is None:
            limits = [-PI, PI]
        if isinstance(link_length, (int, float)):
            # scalar convenience needs an explicit dof (checked BEFORE the
            # len() probe, which would TypeError on a float)
            if dof is None:
                raise ValueError(
                    'dof is required when link_length is a scalar')
            link_length = [link_length] * dof
        elif dof is None:
            dof = len(link_length)
        if len(limits) == 2 and isinstance(limits[0], (int, float)):
            limits = [limits] * dof
        assert len(limits) == dof and len(link_length) == dof
        self.dof = dof
        self.link_width = float(link_width)
        self.link_length = jnp.asarray(link_length, dtype=jnp.float32)
        self.limits = jnp.asarray(limits, dtype=jnp.float32)

    def geom_static_key(self):
        """Hashable static-geometry key: lets compiled geometry programs
        (geometry2d._planar_sd_fns) be cached per distinct geometry instead
        of per instance, so robots constructed in loops don't each leak a
        compiled program into the process-lifetime jit cache."""
        # keyed on the TYPE object (not its name): same-named classes from
        # different modules must not share a compiled program if they
        # override link_segments
        return (type(self), self.dof, self.link_width,
                tuple(np.asarray(self.link_length, np.float64).tolist()))

    def fkine(self, q):
        q = jnp.reshape(q, (-1, self.dof))
        ang = jnp.cumsum(q, axis=1)
        x = jnp.cumsum(self.link_length * jnp.cos(ang), axis=1)
        y = jnp.cumsum(self.link_length * jnp.sin(ang), axis=1)
        return jnp.stack([x, y], axis=2)

    def link_segments(self, q):
        """Per-link segment endpoints [B, dof, 2, 2] (base joint included)."""
        joints = self.fkine(q)
        base = jnp.zeros_like(joints[:, :1])
        pts = jnp.concatenate([base, joints], axis=1)
        return jnp.stack([pts[:, :-1], pts[:, 1:]], axis=2)

    def wrap(self, q):
        return wrap2pi(q)


class RigidPlanarBody(Model):
    """SE(2) rigid body with keypoints. Ref: model.py:78-117.

    parts: [(type, (x, y) keypoint, (w, h) dims)] — matches the reference's
    part tuples; keypoints drive fkine, dims drive collision boxes.
    """

    def __init__(self, parts, limits=None):
        self.parts = parts
        self.dof = 3
        self.limits = jnp.asarray(
            limits if limits is not None else
            [[-10, 10], [-10, 10], [-PI, PI]], dtype=jnp.float32)
        self.keypoints = jnp.asarray([p[1] for p in parts],
                                     dtype=jnp.float32).T  # [2, M]

    def fkine(self, q):
        q = jnp.reshape(q, (-1, 3))
        pts = matmul_f32(rot_2d(q[:, 2]), self.keypoints) + q[:, :2, None]
        return jnp.transpose(pts, (0, 2, 1))

    def wrap(self, q):
        return jnp.concatenate([q[..., :2], wrap2pi(q[..., 2:])], axis=-1)


class RigidBody(Model):
    """SE(3) free-flying rigid body; configuration = (xyz, rpy).

    Ref: model.py:120-171. The reference derives keypoints from the mesh
    bounding box (normalized corners); here keypoints are passed directly
    (or derived by the caller from a mesh via diffco_tpu.geometry.mesh).
    """

    def __init__(self, keypoints, limits=None):
        self.dof = 6
        self.limits = jnp.asarray(
            limits if limits is not None else
            [[-10, 10]] * 3 + [[-PI, PI]] * 3, dtype=jnp.float32)
        kp = jnp.asarray(keypoints, dtype=jnp.float32)
        self.keypoints = kp.T if kp.shape[-1] == 3 else kp  # [3, M]

    @classmethod
    def from_vertices(cls, vertices: np.ndarray, limits=None, center=True):
        """Keypoints = normalized bbox corners (ref: model.py:149-151)."""
        v = np.asarray(vertices, np.float32)
        if center:
            v = v - v.mean(0)
        lo, hi = v.min(0), v.max(0)
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                           np.float32)
        corners = corners / np.linalg.norm(corners, axis=1).max()
        return cls(corners, limits=limits)

    def fkine(self, q):
        q = jnp.reshape(q, (-1, 6))
        pts = matmul_f32(euler2mat(q[:, 3:]), self.keypoints) + q[:, :3, None]
        return jnp.transpose(pts, (0, 2, 1))

    def wrap(self, q):
        return jnp.concatenate([q[..., :3], wrap2pi(q[..., 3:])], axis=-1)


class DHParameters:
    """Standard DH parameter pack. Ref: model.py:173-186."""

    def __init__(self, a=0, alpha=0, d=0, theta=0):
        self.a = jnp.asarray(a, dtype=jnp.float32)
        self.alpha = jnp.asarray(alpha, dtype=jnp.float32)
        self.d = jnp.asarray(d, dtype=jnp.float32)
        self.theta = jnp.asarray(theta, dtype=jnp.float32)
        self.s_alpha = jnp.sin(self.alpha)
        self.c_alpha = jnp.cos(self.alpha)


def _dh_consts_and_specs(dhparams, fk_mask):
    """Static per-joint DH constants + masked point specs — shared by
    DHChainRobot and the dual-arm assembly (one source of truth for the
    spec format)."""
    import numpy as _np
    consts = [(float(a), float(d), float(sa), float(ca), float(th))
              for a, d, sa, ca, th in zip(
                  _np.asarray(dhparams.a), _np.asarray(dhparams.d),
                  _np.asarray(dhparams.s_alpha),
                  _np.asarray(dhparams.c_alpha),
                  _np.asarray(dhparams.theta))]
    specs = tuple((i + 1, (0.0, 0.0, 0.0))
                  for i, masked in enumerate(fk_mask) if masked)
    return consts, specs


class DHChainRobot(Model):
    """Serial arm from standard DH parameters with an fk_mask selecting
    which cumulative frames become control points (ref: model.py:225-241).

    The cumulative transform chain is an unrolled compose of 4x4 matmuls —
    XLA maps the batch onto the MXU.
    """

    def __init__(self, dhparams: DHParameters, limits, fk_mask: Sequence[bool],
                 base: Optional[np.ndarray] = None):
        self.dhparams = dhparams
        self.limits = jnp.asarray(limits, dtype=jnp.float32)
        self.dof = self.limits.shape[0]
        self.fk_mask = list(fk_mask)
        self.base = None if base is None else np.asarray(base)  # [4, 4]
        # static per-joint DH constants for the SoA fast path
        self._dh_const, self._point_specs = _dh_consts_and_specs(
            dhparams, self.fk_mask)
        self._fkine_flat = make_dh_fkine(
            self._dh_const, self._point_specs, base=self._base_soa())

    def _base_soa(self):
        if self.base is None:
            return None
        return (rot_from_static(self.base[:3, :3]),
                tuple(float(v) for v in self.base[:3, 3]))

    def _fk_frames_soa(self, q):
        """Cumulative frames as SoA (rot 9-tuple, trans 3-tuple of [B])."""
        q = jnp.reshape(q, (-1, self.dof))
        frames = []
        r_acc = t_acc = None
        if self.base is not None:
            zb = jnp.zeros(q.shape[0], q.dtype)
            r_acc = tuple(zb + v for v in rot_from_static(self.base[:3, :3]))
            t_acc = tuple(zb + float(v) for v in self.base[:3, 3])
        for i, (a, d, sa, ca, th) in enumerate(self._dh_const):
            r_j, t_j = dh_rot_trans(q[:, i] + th, a, d, sa, ca)
            if r_acc is None:
                r_acc, t_acc = r_j, t_j
            else:
                r_acc, t_acc = transform_compose(r_acc, t_acc, r_j, t_j)
            frames.append((r_acc, t_acc))
        return frames

    def _cum_tfs(self, q):
        """All cumulative frames: [B, dof, 4, 4] (reference-layout path,
        kept for tests; hot paths use the SoA formulation)."""
        q = jnp.reshape(q, (-1, self.dof))
        angles = q + self.dhparams.theta
        tfs = DH2mat(angles, self.dhparams.a, self.dhparams.d,
                     self.dhparams.s_alpha, self.dhparams.c_alpha)
        cum = []
        base = (None if self.base is None
                else jnp.asarray(self.base, jnp.float32))
        tmp = tfs[:, 0] if base is None else matmul_f32(base, tfs[:, 0])
        cum.append(tmp)
        for i in range(1, self.dof):
            tmp = matmul_f32(tmp, tfs[:, i])
            cum.append(tmp)
        return jnp.stack(cum, axis=1)

    def fkine(self, q, flat: bool = False):
        q = jnp.reshape(q, (-1, self.dof))
        out = self._fkine_flat(q)
        if flat:
            return out
        return out.reshape(q.shape[0], -1, 3)

    def _fkine_soa_autodiff(self, q, flat: bool = False):
        """Plain-autodiff SoA FK (no analytic JVP) — the parity oracle for
        fk_jvp.make_dh_fkine in tests/test_robots.py."""
        frames = self._fk_frames_soa(q)
        pts = [t for i, (r, t) in enumerate(frames) if self.fk_mask[i]]
        return stack_points(pts, flat=flat)

    def wrap(self, q):
        return wrap2pi(q)


_BAXTER_LIMITS = [[-1.70167993878, 1.70167993878],
                  [-2.147, 1.047],
                  [-3.05417993878, 3.05417993878],
                  [-0.05, 2.618],
                  [-3.059, 3.059],
                  [-1.57079632679, 2.094],
                  [-3.059, 3.059]]
_BAXTER_L = np.array([270.35, 69, 364.35, 69, 374.29, 10, 387.35]) / 1000


def _baxter_dh():
    L = _BAXTER_L
    return DHParameters(
        a=[L[1], 0, L[3], 0, L[5], 0, 0],
        alpha=[-PI / 2, PI / 2, -PI / 2, PI / 2, -PI / 2, PI / 2, 0],
        d=[L[0], 0, L[2], 0, L[4], 0, L[6]],
        theta=[0, PI / 2, 0, 0, 0, 0, 0])


class BaxterLeftArmFK(DHChainRobot):
    """7-DOF Baxter left arm. Ref: model.py:188-244."""

    def __init__(self):
        super().__init__(_baxter_dh(), _BAXTER_LIMITS,
                         fk_mask=[True, False, True, False, True, False, True])


class BaxterRightArmFK(DHChainRobot):
    """7-DOF Baxter right arm (same DH as left in the reference after the
    urdf alignment note at model.py:273)."""

    def __init__(self):
        super().__init__(_baxter_dh(), _BAXTER_LIMITS,
                         fk_mask=[True, False, True, False, True, False, True])


BaxterFK = BaxterLeftArmFK


class BaxterDualArmFK(Model):
    """14-DOF dual-arm Baxter with torso-mounted arm bases.

    Ref: model.py:310-386. fkine returns [B, 2 * n_mask, 3] with per-arm
    control points interleaved as (left_i, right_i) pairs, matching the
    reference's stack order (model.py:375-382).
    """

    def __init__(self):
        self.limits = jnp.asarray(_BAXTER_LIMITS * 2, dtype=jnp.float32)
        self.dof = 14
        self.fk_mask = [True, False, True, False, True, False, True]
        self.dh = _baxter_dh()
        offsets = np.array([278, 64, 1104]) / 1000  # (L, h, H)
        from ..utils import rotz as _rotz
        left = np.zeros((4, 4), np.float32)
        left[:3, :3] = np.asarray(_rotz(jnp.asarray(-PI / 4)))
        left[:, 3] = [offsets[0], -offsets[1], offsets[2], 1]
        right = np.zeros((4, 4), np.float32)
        right[:3, :3] = np.asarray(_rotz(jnp.asarray(-3 * PI / 4)))
        right[:, 3] = [-offsets[0], -offsets[1], offsets[2], 1]
        self.arm_bases = jnp.asarray(np.stack([left, right]))  # [2, 4, 4]
        consts, specs = _dh_consts_and_specs(self.dh, self.fk_mask)
        bases = np.asarray(self.arm_bases)
        self._arm_fkine = [
            make_dh_fkine(consts, specs,
                          base=(rot_from_static(b[:3, :3]),
                                tuple(float(v) for v in b[:3, 3])))
            for b in bases]

    def fkine(self, q, flat: bool = False):
        q = jnp.reshape(q, (-1, self.dof))
        half = self.dof // 2
        B = q.shape[0]
        left = self._arm_fkine[0](q[:, :half]).reshape(B, -1, 3)
        right = self._arm_fkine[1](q[:, half:]).reshape(B, -1, 3)
        # interleave (left_i, right_i) per masked joint, matching the
        # reference's stack order (model.py:375-382)
        inter = jnp.stack([left, right], axis=2).reshape(B, -1, 3)
        if flat:
            return inter.reshape(B, -1)
        return inter

    def wrap(self, q):
        return wrap2pi(q)


_PANDA_LIMITS = [[-2.8973, 2.8973],
                 [-1.7628, 1.7628],
                 [-2.8973, 2.8973],
                 [-3.0718, -0.0698],
                 [-2.8973, 2.8973],
                 [-0.0175, 3.7525],
                 [-2.8973, 2.8973]]


class PandaFK(DHChainRobot):
    """7-DOF Franka Panda with two extra gripper-finger control points.

    Ref: model.py:390-453.
    """

    def __init__(self):
        L = np.array([0.3330, 0.3160, 0.0825, 0.3840, 0.0880, 0.1070 * 2])
        dh = DHParameters(
            a=[0, 0, L[2], -L[2], 0, L[4], 0],
            alpha=[-PI / 2, PI / 2, PI / 2, -PI / 2, PI / 2, PI / 2, 0],
            d=[L[0], 0, L[1], 0, L[3], 0, L[5]],
            theta=[0, 0, 0, 0, 0, 0, 0])
        super().__init__(dh, _PANDA_LIMITS,
                         fk_mask=[True, False, True, True, True, False, True])
        # two finger control points offset +-d[-1]/2 along ee-frame y
        fy = 0.5 * float(np.asarray(dh.d)[-1])
        n = len(self._dh_const)
        self._point_specs = self._point_specs + (
            (n, (0.0, fy, 0.0)), (n, (0.0, -fy, 0.0)))
        self._fkine_flat = make_dh_fkine(
            self._dh_const, self._point_specs, base=self._base_soa())

    def _fkine_soa_autodiff(self, q, flat: bool = False):
        frames = self._fk_frames_soa(q)
        pts = [t for i, (r, t) in enumerate(frames) if self.fk_mask[i]]
        r_ee, t_ee = frames[-1]
        fy = 0.5 * float(np.asarray(self.dhparams.d)[-1])
        y_col = (r_ee[1], r_ee[4], r_ee[7])  # ee-frame y axis in world
        left = vec_add(t_ee, tuple(c * fy for c in y_col))
        right = vec_add(t_ee, tuple(c * (-fy) for c in y_col))
        return stack_points(pts + [left, right], flat=flat)


class DualPandaFK(Model):
    """14-DOF dual Panda; q interleaves (right, left) per joint.

    Ref: model.py:456-502.
    """

    def __init__(self):
        self.left_panda = PandaFK()
        self.right_panda = PandaFK()
        lims = []
        for row in _PANDA_LIMITS:
            lims.append(row)
            lims.append(row)
        self.limits = jnp.asarray(lims, dtype=jnp.float32)
        self.dof = 14
        self.bases = jnp.asarray([[0.0, 0.84, 0.0], [0.0, 0.0, 0.0]],
                                 dtype=jnp.float32)  # (left, right)

    def fkine(self, q):
        q = jnp.reshape(q, (-1, 14))
        left_q = q[:, 1::2]
        right_q = q[:, 0::2]
        left_fk = self.left_panda.fkine(left_q) + self.bases[0]
        right_fk = self.right_panda.fkine(right_q) + self.bases[1]
        return jnp.concatenate([left_fk, right_fk], axis=1)

    def wrap(self, q):
        return wrap2pi(q)


class PointRobot1D(Model):
    """1-DOF point robot with time as extra dim, configs in [0, 1].

    Ref: model.py:505-523.
    """

    def __init__(self, limits):
        self.limits = jnp.asarray(limits, dtype=jnp.float32)  # [dof+1, 2]
        self.dof = 1

    def rand_configs(self, num_cfgs: int, key=None) -> jnp.ndarray:
        """Normalized space-time samples in [0, 1]^2 — this robot's
        configurations are (x, t) pairs in NORMALIZED coordinates. The
        inherited sampler would broadcast a [N, 1] draw against the
        [2, 2] raw limits into out-of-domain [N, 2] workspace values."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        return jax.random.uniform(key, (num_cfgs, self.limits.shape[0]))

    def fkine(self, q):
        q = jnp.reshape(q, (-1, self.dof))
        lo, hi = self.limits[:-1, 0], self.limits[:-1, 1]
        return q * (hi - lo) + lo

    def normalize(self, q):
        return (q - self.limits[:, 0]) / (self.limits[:, 1] - self.limits[:, 0])

    def unnormalize(self, q):
        return q * (self.limits[:, 1] - self.limits[:, 0]) + self.limits[:, 0]

    def wrap(self, q):
        return q
