"""Temporal / dynamic-obstacle support.

Functional parity targets (reference: deprecated/Obstacles.py
ObstacleMotion/LinearMotion/SineMotion :66-89,
deprecated/FCLChecker.py Simple1DDynamicChecker :93-116, and
scripts/temporal1d_data_generation.py + simple_temporal_active.py).

Obstacle motions are pure functions of time with the REFERENCE
constructor signatures (``LinearMotion(A, B)`` -> A*t + B,
``SineMotion(A, alpha, beta, bias)`` -> A*sin(alpha*t + beta) + bias);
the dynamic ground truth evaluates a whole batch of (q, t) pairs in ONE
jitted program — motion parameters travel as arguments, so obstacle
motion never recompiles (the CLAUDE.md jit-boundary rule: eager
per-obstacle labeling pays one tunnel dispatch per op).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class ObstacleMotion:
    """Base motion: predict(t) -> position. Ref deprecated/Obstacles.py:66-72
    (the reference names the evaluator ``predict``; ``position`` is kept
    as an alias for earlier revisions of this package)."""

    def predict(self, t):
        raise NotImplementedError

    def position(self, t):
        return self.predict(t)

    def __call__(self, *args, **kwargs):
        return self.predict(*args, **kwargs)


class LinearMotion(ObstacleMotion):
    """x(t) = A * t + B. Ref :74-80 (A = velocity, B = start)."""

    def __init__(self, A, B):
        self.A = jnp.asarray(A, jnp.float32)
        self.B = jnp.asarray(B, jnp.float32)

    def predict(self, t):
        t = jnp.asarray(t, jnp.float32)
        if self.B.ndim:                      # vector-valued motion
            return self.A * t[..., None] + self.B
        return self.A * t + self.B

    def _unified_params(self):
        """(lin_A, lin_B, sin_A, alpha, beta) for the jitted checker."""
        if self.A.ndim or self.B.ndim:
            return None
        return (float(self.A), float(self.B), 0.0, 0.0, 0.0)


class SineMotion(ObstacleMotion):
    """x(t) = A * sin(alpha * t + beta) + bias. Ref :82-89."""

    def __init__(self, A, alpha, beta, bias):
        self.A = float(A)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.bias = jnp.asarray(bias, jnp.float32)

    def predict(self, t):
        t = jnp.asarray(t, jnp.float32)
        s = self.A * jnp.sin(self.alpha * t + self.beta)
        if self.bias.ndim:
            return s[..., None] + self.bias
        return s + self.bias

    def _unified_params(self):
        if self.bias.ndim:
            return None
        return (0.0, float(self.bias), self.A, self.alpha, self.beta)


@jax.jit
def _dynamic_sd(params, halfs, xt):
    """Signed distances for scalar motions in unified parameter form.

    params: [n_obs, 5] rows (lin_A, lin_B, sin_A, alpha, beta) so that
    center_i(t) = lin_A*t + lin_B + sin_A*sin(alpha*t + beta);
    halfs: [n_obs] interval half-widths; xt: [B, 2] -> [B, n_obs].
    One compiled program for ANY motion values — parameters are operands.
    """
    x, t = xt[:, 0], xt[:, 1]
    tb = t[:, None]
    centers = (params[None, :, 0] * tb + params[None, :, 1]
               + params[None, :, 2]
               * jnp.sin(params[None, :, 3] * tb + params[None, :, 4]))
    return halfs[None, :] - jnp.abs(x[:, None] - centers)


class Dynamic1DChecker:
    """Ground truth for a 1-DOF point robot among moving interval
    obstacles (ref Simple1DDynamicChecker :93-116).

    obstacles: [(motion, half_width)]. Configurations are (x, t) pairs in
    *unnormalized* coordinates.
    """

    def __init__(self, obstacles: Sequence[Tuple[ObstacleMotion, float]]):
        self.obstacles = list(obstacles)
        unified = [getattr(m, '_unified_params', lambda: None)()
                   for m, _ in obstacles]
        if obstacles and all(u is not None for u in unified):
            self._params = jnp.asarray(unified, jnp.float32)
            self._halfs = jnp.asarray([h for _, h in obstacles],
                                      jnp.float32)
        else:
            # custom ObstacleMotion subclass or vector-valued motion:
            # fall back to the eager per-obstacle loop
            self._params = None
            self._halfs = None

    def signed_dist(self, xt):
        """xt: [B, 2] (position, time) -> [B, n_obs]; >0 = inside."""
        xt = jnp.atleast_2d(jnp.asarray(xt, jnp.float32))
        if self._params is not None:
            return _dynamic_sd(self._params, self._halfs, xt)
        x, t = xt[:, 0], xt[:, 1]
        out = []
        for motion, half in self.obstacles:
            center = motion.predict(t)
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
