"""Legacy obstacle-list API compatibility layer.

Parity targets: /root/reference/diffco/deprecated/ — Obstacles.py
(Obstacle :5-25, FCLObstacle :27-42, Simple1DDynamicObstacle :44-64),
FCLChecker.py (FCLChecker.predict :65-91, Simple1DDynamicChecker :93-116).
Several reference scripts still import these names (scripts/active.py:24,
speed_compare.py:18); this module provides the same surface backed by the
batched geometric engine instead of libfcl.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .geometry.geometry2d import (Obstacles2D, planar_robot_signed_dist,
                                  point_rect_sd)
from .dynamics import (ObstacleMotion, LinearMotion, SineMotion,
                       Dynamic1DChecker as _Dynamic1DChecker)


class Obstacle:
    """Point-robot obstacle (ref deprecated/Obstacles.py:5-25):
    kind in {'circle', 'rect'}; is_collision tests containment."""

    def __init__(self, kind, position, size, cost=np.inf):
        self.kind = kind
        if kind not in ('circle', 'rect'):
            raise NotImplementedError(f'obstacle kind {kind}')
        self.position = jnp.asarray(position, jnp.float32)
        self.size = (jnp.asarray(size, jnp.float32)
                     if not np.isscalar(size) else float(size))
        self.cost = cost

    def is_collision(self, point):
        point = jnp.atleast_2d(jnp.asarray(point))
        if self.kind == 'circle':
            d = jnp.sqrt(jnp.sum((point - self.position) ** 2, -1))
            # ref :18: norm < size/2 — size is the DIAMETER (the ref's
            # FCLObstacle treats it as radius; this class pins :5-25)
            return d < self.size / 2
        half = jnp.asarray(self.size).reshape(-1) / 2
        return point_rect_sd(point, self.position, half,
                             jnp.asarray(0.0)) < 0

    def get_cost(self):
        return self.cost


class FCLObstacle(Obstacle):
    """Name-compat alias (ref Obstacles.py:27-42 lifted 2D shapes into FCL
    prisms; the geometric engine needs no such lifting)."""

    def __init__(self, kind, position, size=None, category=0, **kwargs):
        super().__init__(kind, position, size)
        self.category = category


class FCLChecker:
    """Ground-truth checker over an obstacle list for a planar robot
    (ref deprecated/FCLChecker.py:65-91 semantics: labels in {-1, +1} and
    signed distances positive in collision), batched on device."""

    def __init__(self, obstacles: Sequence, robot=None,
                 label_type='binary', num_class=None):
        tuples = []
        for i, obs in enumerate(obstacles):
            if isinstance(obs, Obstacle):
                cat = getattr(obs, 'category', 0)
                size = (float(obs.size) if obs.kind == 'circle'
                        else tuple(np.asarray(obs.size)))
                tuples.append((obs.kind, tuple(np.asarray(obs.position)),
                               size, cat))
            else:
                tuples.append(tuple(obs))
        self.obstacles = Obstacles2D.from_obstacle_list(tuples)
        self.robot = robot
        self.label_type = label_type
        self.num_class = num_class or max(1, self.obstacles.num_class)

    def predict(self, X, distance=True):
        """labels [N, C] in {-1, +1}; dists [N, C] signed
        (ref FCLChecker.py:65-88)."""
        X = jnp.atleast_2d(jnp.asarray(X))
        sd = planar_robot_signed_dist(self.robot, self.obstacles, X)
        if self.label_type == 'binary':
            d = jnp.max(sd, axis=-1, keepdims=True)
        elif self.label_type == 'instance':
            d = sd
        else:  # class
            classes = self.obstacles.obstacle_classes
            d = jnp.stack([
                jnp.max(jnp.where(jnp.asarray(classes == c)[None, :], sd,
                                  -jnp.inf), axis=-1)
                for c in range(self.num_class)], axis=-1)
        labels = (d > 0) * 2 - 1
        if distance:
            return labels, d
        return labels

    def score(self, X):
        return self.predict(X, distance=True)[1]


class Simple1DDynamicObstacle:
    """Ref Obstacles.py:44-64: a moving interval obstacle."""

    def __init__(self, size, position_func: ObstacleMotion):
        self.size = float(size)
        self.position_func = position_func

    def is_collision(self, xt):
        xt = jnp.atleast_2d(jnp.asarray(xt))
        center = self.position_func(xt[:, 1])
        return jnp.abs(xt[:, 0] - center) <= self.size / 2


class Simple1DDynamicChecker(_Dynamic1DChecker):
    """Ref FCLChecker.py:93-116, backed by dynamics.Dynamic1DChecker.

    The reference signature takes ``(obstacles, robot)`` and its
    ``predict`` UNNORMALIZES X through the robot's limits first
    (FCLChecker.py:102) — scripts feed [0, 1]-normalized (x, t) configs.
    ``robot=None`` keeps raw-coordinate behavior."""

    def __init__(self, obstacles: Sequence[Simple1DDynamicObstacle],
                 robot=None):
        super().__init__([(o.position_func, o.size / 2) for o in obstacles])
        self.obstacle_objs = list(obstacles)
        self.robot = robot

    def predict(self, X, distance=True):
        X = jnp.atleast_2d(jnp.asarray(X))
        if self.robot is not None:
            X = self.robot.unnormalize(X)
        sd = self.signed_dist(X)
        d = jnp.max(sd, axis=-1, keepdims=True)
        labels = (d > 0) * 2 - 1
        return (labels, d) if distance else labels
