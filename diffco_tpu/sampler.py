"""Free-space escape sampling.

Functional parity targets (reference: /root/reference/scripts/escape.py
OptimSampler :19-38 and scripts/compare_sampling.py): gradient-descent
escape from a colliding configuration using the differentiable proxy
score, vs. plain resampling.

TPU-native design: the escape descent runs as one jitted ``lax.scan`` over
iterations, vmapped over a batch of colliding configurations — the
reference optimizes one configuration at a time with a host loop.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
import optax


class OptimSampler:
    """Escape a set of colliding configurations by descending the proxy
    collision score (ref escape.py:19-38)."""

    def __init__(self, robot, dist_est: Callable, lr: float = 0.05,
                 max_steps: int = 50, stop_bias: float = 0.0):
        self.robot = robot
        self.dist_est = dist_est
        self.lr = lr
        self.max_steps = max_steps
        self.stop_bias = stop_bias
        self._escape = self._build()

    def _build(self):
        dist_est = self.dist_est
        limits = self.robot.limits
        lr = self.lr
        stop_bias = self.stop_bias

        @jax.jit
        def escape(q0):
            opt = optax.adam(lr)

            def loss(q):
                return jnp.sum(jnp.maximum(
                    dist_est(q) + stop_bias, 0.0))

            def step(carry, _):
                q, opt_state = carry
                g = jax.grad(loss)(q)
                # freeze configurations that already escaped
                free = (dist_est(q).reshape(-1) + stop_bias <= 0)
                g = g * (1.0 - free.astype(q.dtype))[:, None]
                updates, opt_state = opt.update(g, opt_state, q)
                q = optax.apply_updates(q, updates)
                q = jnp.clip(q, limits[:, 0], limits[:, 1])
                return (q, opt_state), None

            (q, _), _ = lax.scan(step, (q0, opt.init(q0)), None,
                                 length=self.max_steps)
            return q

        return escape

    def optim_escape(self, q0):
        """q0 [B, dof] colliding configs -> escaped configs [B, dof] (some
        may remain in collision if max_steps is insufficient)."""
        q0 = jnp.atleast_2d(jnp.asarray(q0))
        return self._escape(q0)

    def resample_escape(self, q0, key, max_tries: int = 20):
        """Baseline: uniform resampling until free
        (ref compare_sampling.py). Returns (samples, n_checks)."""
        B = q0.shape[0]
        out = jnp.array(q0)
        free = self.dist_est(out).reshape(-1) + self.stop_bias <= 0
        checks = B
        for _ in range(max_tries):
            if bool(jnp.all(free)):
                break
            key, sub = jax.random.split(key)
            cand = self.robot.rand_configs(B, sub)
            cand_free = (self.dist_est(cand).reshape(-1)
                         + self.stop_bias <= 0)
            take = jnp.logical_and(~free, cand_free)
            out = jnp.where(take[:, None], cand, out)
            free = jnp.logical_or(free, cand_free)
            checks += B
        return out, checks
