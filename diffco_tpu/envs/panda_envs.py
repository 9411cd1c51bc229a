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
        qs = jnp.atleast_2d(jnp.asarray(qs))
        return [bool(v) for v in np.asarray(
            self.robot.collision(qs, other=self.env))]

    def distance(self, qs):
        qs = jnp.atleast_2d(jnp.asarray(qs))
        env_sd, self_sd = self.robot.collision_signed_dist(qs, self.env)
        sd = jnp.maximum(jnp.max(env_sd, axis=-1), self_sd)
        return [float(v) for v in np.asarray(sd)]

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
            for i, t in enumerate([[0.5, -0.25, 0.4], [0.5, 0.0, 0.4],
                                   [0.5, 0.25, 0.4]])
        }, **kwargs)


class PandaSingleCuboidEnv(PandaEnv):
    def __init__(self, **kwargs):
        super().__init__(shapes={
            'cuboid1': {'type': 'Box',
                        'params': {'extents': [0.3, 0.1, 0.5]},
                        'transform': _T([0.55, 0.0, 0.35])},
        }, **kwargs)
