"""Tutorial Panda environments implementing the CollisionEnv template.

Parity targets: /root/reference/diffco/envs/rtb/panda_envs.py:11-129
(PandaEnv, PandaSingleCylinderEnv, PandaThreeCylinderEnv,
PandaSingleCuboidEnv) — the reference drives roboticstoolbox + Swift;
here the same environments run on the self-contained URDF Panda + batched
geometric collision engine, so the notebook tutorial flow works without
any external simulator.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .collision_env import CollisionEnv
from .shape_env import ShapeEnv


def _T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


class PandaEnv(CollisionEnv):
    """Base: a Franka Panda + a ShapeEnv of obstacles."""

    def __init__(self, shapes: Optional[dict] = None, seed: int = 0,
                 **robot_kwargs):
        super().__init__()
        from ..robots.urdf import FrankaPanda
        robot_kwargs.setdefault('load_gripper', True)
        robot_kwargs.setdefault('link_spheres', 24)
        self.robot = FrankaPanda(**robot_kwargs)
        self.env = ShapeEnv(shapes or {})
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def is_collision(self, qs):
        """Robot-vs-environment collision only — the reference's
        `_single_collision` checks each object, never self-collision
        (panda_envs.py:63-65); use robot.self_collision separately if
        needed. Keeping both queries env-only also keeps is_collision
        and distance sign-consistent."""
        qs = jnp.atleast_2d(jnp.asarray(qs))
        env_sd, _ = self.robot.collision_signed_dist(qs, self.env)
        if env_sd.shape[-1] == 0:
            return [False] * int(qs.shape[0])
        return [bool(v) for v in np.asarray(jnp.any(env_sd > 0, axis=-1))]

    def distance(self, qs):
        """Separation distance per config — the REFERENCE convention
        (panda_envs.py:67-69 `_single_distance` = min over objects of
        closest-point distance): POSITIVE when free, negative when
        penetrating, robot-vs-environment only (no self-collision term).
        An obstacle-free environment returns +inf (nothing to collide
        with), not a zero-size-reduction crash."""
        qs = jnp.atleast_2d(jnp.asarray(qs))
        env_sd, _ = self.robot.collision_signed_dist(qs, self.env)
        if env_sd.shape[-1] == 0:
            return [float('inf')] * int(qs.shape[0])
        # env_sd is penetration-positive; the reference reports separation
        sep = -jnp.max(env_sd, axis=-1)
        return [float(v) for v in np.asarray(sep)]

    def sample_q(self):
        return self.robot.rand_configs(1, self._next_key())[0]

    def plot(self, qs):
        raise NotImplementedError('headless environment: no Swift viewer')


class PandaSingleCylinderEnv(PandaEnv):
    def __init__(self, **kwargs):
        super().__init__(shapes={
            'cylinder1': {'type': 'Cylinder',
                          'params': {'radius': 0.05, 'height': 0.8},
                          'transform': _T([0.5, 0.0, 0.4])},
        }, **kwargs)


class PandaThreeCylinderEnv(PandaEnv):
    def __init__(self, **kwargs):
        super().__init__(shapes={
            f'cylinder{i + 1}': {
                'type': 'Cylinder',
                'params': {'radius': 0.05, 'height': 0.8},
                'transform': _T(t)}
            # poses match the reference exactly (panda_envs.py:96-113)
            for i, t in enumerate([[0.3, -0.5, 0.4], [0.5, 0.0, 0.4],
                                   [0.3, 0.5, 0.4]])
        }, **kwargs)


class PandaSingleCuboidEnv(PandaEnv):
    def __init__(self, **kwargs):
        super().__init__(shapes={
            # 0.2^3 cube at (0.5, 0, 0.4), matching panda_envs.py:122-127
            'cuboid1': {'type': 'Box',
                        'params': {'extents': [0.2, 0.2, 0.2]},
                        'transform': _T([0.5, 0.0, 0.4])},
        }, **kwargs)
