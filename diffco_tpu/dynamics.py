"""Temporal / dynamic-obstacle support.

Functional parity targets (reference: deprecated/Obstacles.py
ObstacleMotion/LinearMotion/SineMotion :66-89,
deprecated/FCLChecker.py Simple1DDynamicChecker :93-116, and
scripts/temporal1d_data_generation.py + simple_temporal_active.py).

Obstacle motions are pure functions of time; the dynamic ground truth
evaluates positions for a whole batch of (q, t) pairs in one shot.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class ObstacleMotion:
    """Base motion: position(t). Ref deprecated/Obstacles.py:66-72."""

    def position(self, t):
        raise NotImplementedError

    def __call__(self, t):
        return self.position(t)


class LinearMotion(ObstacleMotion):
    """x(t) = x0 + v * t. Ref :74-80."""

    def __init__(self, x0, velocity):
        self.x0 = jnp.asarray(x0, jnp.float32)
        self.velocity = jnp.asarray(velocity, jnp.float32)

    def position(self, t):
        t = jnp.asarray(t, jnp.float32)
        return self.x0 + self.velocity * t[..., None] \
            if self.x0.ndim else self.x0 + self.velocity * t


class SineMotion(ObstacleMotion):
    """x(t) = x0 + A * sin(w t + phi) * direction. Ref :82-89."""

    def __init__(self, x0, amplitude, omega, phase=0.0, direction=None):
        self.x0 = jnp.asarray(x0, jnp.float32)
        self.amplitude = float(amplitude)
        self.omega = float(omega)
        self.phase = float(phase)
        if direction is None:
            direction = np.ones(np.shape(x0)) if np.ndim(x0) else 1.0
        self.direction = jnp.asarray(direction, jnp.float32)

    def position(self, t):
        t = jnp.asarray(t, jnp.float32)
        s = self.amplitude * jnp.sin(self.omega * t + self.phase)
        if self.x0.ndim:
            return self.x0 + s[..., None] * self.direction
        return self.x0 + s * self.direction


class Dynamic1DChecker:
    """Ground truth for a 1-DOF point robot among moving interval
    obstacles (ref Simple1DDynamicChecker :93-116).

    obstacles: [(motion, half_width)]. Configurations are (x, t) pairs in
    *unnormalized* coordinates.
    """

    def __init__(self, obstacles: Sequence[Tuple[ObstacleMotion, float]]):
        self.obstacles = list(obstacles)

    def signed_dist(self, xt):
        """xt: [B, 2] (position, time) -> [B, n_obs]; >0 = inside."""
        xt = jnp.atleast_2d(jnp.asarray(xt))
        x, t = xt[:, 0], xt[:, 1]
        out = []
        for motion, half in self.obstacles:
            center = motion.position(t)
            out.append(half - jnp.abs(x - center))
        return jnp.stack(out, axis=-1)

    def predict(self, xt):
        """Labels in {-1, +1} like FCLChecker.predict."""
        return (jnp.max(self.signed_dist(xt), axis=-1) > 0) * 2 - 1

    def collision(self, xt):
        return jnp.max(self.signed_dist(xt), axis=-1) > 0


def temporal_dataset(checker: Dynamic1DChecker, limits, num_samples: int,
                     key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample (x, t) uniformly in limits [[x_lo, x_hi], [t_lo, t_hi]] and
    label with the dynamic ground truth
    (ref temporal1d_data_generation.py)."""
    limits = jnp.asarray(limits, jnp.float32)
    u = jax.random.uniform(key, (num_samples, 2))
    xt = u * (limits[:, 1] - limits[:, 0]) + limits[:, 0]
    sd = checker.signed_dist(xt)
    labels = (jnp.max(sd, -1) > 0) * 2.0 - 1.0
    return xt, labels, jnp.max(sd, -1)
