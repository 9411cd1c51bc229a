"""Free-space escape sampling + FK-manifold uniform sampling.

Functional parity targets (reference: /root/reference/scripts/escape.py
OptimSampler :19-38, scripts/compare_sampling.py, and
collision_checkers.py:396-452 ``_uniform_sample_on_transformed_manifold``):
gradient-descent escape from a colliding configuration using the
differentiable proxy score, plain resampling, and Jacobian-determinant
rejection sampling that makes configuration draws uniform *on the
FK-transformed manifold* rather than in joint space.

TPU-native design: the escape descent runs as one jitted ``lax.scan`` over
iterations, vmapped over a batch of colliding configurations — the
reference optimizes one configuration at a time with a host loop. The
manifold sampler computes all batch Jacobians with ``vmap(jacfwd)`` in one
jitted call where the reference loops ``backward()`` per output dimension.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
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
                # freeze configurations that already escaped — the UPDATE
                # must be masked, not just the gradient: Adam's momentum
                # keeps emitting nonzero updates for steps after g goes to
                # zero, which let already-free configs drift back into
                # collision
                active = 1.0 - (dist_est(q).reshape(-1)
                                + stop_bias <= 0).astype(q.dtype)
                g = g * active[:, None]
                updates, opt_state = opt.update(g, opt_state, q)
                updates = jax.tree_util.tree_map(
                    lambda u: u * active[:, None], updates)
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


def manifold_jac_det(transform: Callable, q):
    """sqrt(det(J J^T)) of the FK transform at each configuration —
    the density correction factor for uniform-on-manifold sampling
    (ref collision_checkers.py:417-428). q: [B, dof] -> [B]."""
    def flat(qi):
        return transform(qi[None]).reshape(-1)

    jac = jax.vmap(jax.jacfwd(flat))(q)       # [B, out_dim, dof]
    if jac.shape[-2] < jac.shape[-1]:
        jac = jnp.swapaxes(jac, -1, -2)
    JtJ = jnp.matmul(jnp.swapaxes(jac, -1, -2), jac,
                     precision='highest')      # [B, dof, dof] (smaller side)
    JtJ = JtJ + 1e-4 * jnp.eye(JtJ.shape[-1], dtype=JtJ.dtype)
    return jnp.sqrt(jnp.maximum(jnp.linalg.det(JtJ), 0.0))


def uniform_sample_on_transformed_manifold(robot, transform: Callable,
                                           num_samples: int, key,
                                           max_rounds: int = 50):
    """Rejection-sample configurations uniformly w.r.t. the transformed
    (FK control-point) manifold measure (ref
    collision_checkers.py:396-452): accept q with probability
    sqrt(det(J J^T)) / max_det.

    Host loop over fixed-shape device rounds; ALWAYS returns
    [num_samples, dof] (the reference loops until filled,
    collision_checkers.py:430-446): if the acceptance rate is too low to
    fill within ``max_rounds`` — or the transform is everywhere singular
    (max_det ~ 0) — the remainder is topped up with plain joint-space
    uniform draws rather than silently returning a short batch (callers
    size fixed-shape training sets off this count).
    """
    _det = jax.jit(lambda qq: manifold_jac_det(transform, qq))
    key, sub = jax.random.split(key)
    q = robot.rand_configs(num_samples, sub)
    det = _det(q)
    max_det = 1.1 * float(det.max())

    accepted = []
    count = 0
    if max_det > 0.0:
        for _ in range(max_rounds):
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku, (q.shape[0],))
            mask = np.asarray(det > u * max_det)
            acc = np.asarray(q)[mask]
            accepted.append(acc)
            count += len(acc)
            if count >= num_samples:
                break
            key, sub = jax.random.split(key)
            q = robot.rand_configs(num_samples, sub)
            det = _det(q)
            # track the running max so late high-density draws stay valid
            max_det = max(max_det, 1.1 * float(det.max()))
    if count < num_samples:
        key, sub = jax.random.split(key)
        accepted.append(np.asarray(
            robot.rand_configs(num_samples - count, sub)))
    return jnp.asarray(np.concatenate(accepted, axis=0)[:num_samples])


def path_band_samples(paths, limits, rng, n_total=2048, num_sub=8,
                      scales=(0.05, 0.15, 0.35)):
    """Jittered bands around densified path(s): the corridor exploit set
    for path-targeted active learning (the paper's exploitation idea, ref
    collision_checkers.py:220-252, aimed at caller-provided paths instead
    of the support set).

    Multiple noise scales matter: the tightest band labels the corridor
    interior (mostly free — teaches the proxy the passage EXISTS), the
    wider bands straddle the walls (teaches where it ENDS). Uniform
    leftovers keep the total at exactly ``n_total``, so retrain programs
    keep a fixed shape (shape drift on TPU = ~1 min recompile per update).

    paths: iterable of [N_i, dof] waypoint arrays (N_i >= 2).
    limits: [dof, 2] joint limits. rng: host numpy RandomState/Generator.
    Returns [n_total, dof] float32, clipped to limits.
    """
    limits = np.asarray(limits, np.float64)
    bands = []
    for path in paths:
        p = np.asarray(path, np.float32)
        if p.ndim != 2 or p.shape[0] < 2:
            continue
        fr = (np.arange(num_sub, dtype=np.float32) / num_sub)[None, :, None]
        dense = (p[:-1][:, None, :]
                 + fr * (p[1:] - p[:-1])[:, None, :]).reshape(-1, p.shape[1])
        bands.append(dense)
    if not bands:
        raise ValueError('path_band_samples needs at least one path with '
                         '>= 2 waypoints')
    dense = np.concatenate(bands, axis=0)
    n_band = int(n_total * 0.9)
    per_scale = n_band // len(scales)
    out = []
    for s in scales:
        idx = rng.randint(0, dense.shape[0], per_scale) \
            if hasattr(rng, 'randint') \
            else rng.integers(0, dense.shape[0], per_scale)
        out.append(dense[idx] + rng.normal(size=(per_scale,
                                                 dense.shape[1])) * s)
    n_uniform = n_total - per_scale * len(scales)
    out.append(rng.uniform(limits[:, 0], limits[:, 1],
                           (n_uniform, dense.shape[1])))
    return np.clip(np.concatenate(out, axis=0),
                   limits[:, 0], limits[:, 1]).astype(np.float32)
