"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is strictly single-process / single-device (SURVEY §2.3);
this module is new TPU-native design surface. Three parallelism axes map
naturally onto DiffCo workloads:

  * **batch (dp)** — queries are embarrassingly parallel: dataset labeling,
    verification sweeps, C-space grids, and the per-waypoint score+grad of
    trajectory optimization shard over configurations with zero
    communication.
  * **support (tp)** — the score is ``k(x, S) @ w``: partitioning the
    support dimension across devices turns it into partial scores reduced
    by a ``psum`` over ICI (a 1-D tensor-parallel matvec). Useful when the
    support set is large or replicating it is undesirable.
  * **trial** — trajopt restarts shard like a data axis.

Everything uses GSPMD: pick a mesh, annotate in/out shardings, and let XLA
insert the collectives. ``shard_map`` is used only where the manual
collective (psum) is the point.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_mesh(axis_names: Sequence[str] = ('dp', 'tp'),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a device mesh. Default: all devices on the first axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f'mesh {shape} != {n} devices'
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(x, mesh: Mesh, axis: str = 'dp'):
    """Place an array with its leading dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def _pad_to_multiple(x, m, axis=0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


def sharded_score_sweep(score_fn: Callable, q, mesh: Mesh,
                        axis: str = 'dp'):
    """Evaluate ``score_fn`` over a huge batch of configurations with the
    batch dim sharded across devices (no communication).

    q: [B, dof]; returns score_fn's output with leading dim B.
    """
    n_dev = mesh.shape[axis]
    qp, B = _pad_to_multiple(jnp.asarray(q), n_dev)
    qp = shard_batch(qp, mesh, axis)
    out = jax.jit(score_fn)(qp)
    return out[:B]


def sharded_label_sweep(gt_fn: Callable, q, mesh: Mesh, axis: str = 'dp'):
    """Ground-truth labeling sharded over configurations — the TPU
    replacement for the reference's host-side FCL loop
    (urdf_interface.py:450-513)."""
    return sharded_score_sweep(gt_fn, q, mesh, axis)


def support_parallel_score_fn(supports, weights, valid_mask, mesh: Mesh,
                              axis: str = 'tp', epsilon: float = 1.0):
    """Polyharmonic score with the support dimension partitioned across
    devices; partial scores reduce with a psum over ICI.

    Returns a function q_flat [B, F] -> [B] usable under jit.
    """
    n_dev = mesh.shape[axis]
    w = weights.reshape(-1) * valid_mask.astype(weights.dtype) / epsilon
    sup, S = _pad_to_multiple(jnp.asarray(supports), n_dev)
    w, _ = _pad_to_multiple(w, n_dev)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis)),
        out_specs=P(None))
    def _score(x, sup_local, w_local):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        s2 = jnp.sum(sup_local * sup_local, axis=1, keepdims=True)
        xs = jnp.dot(x, sup_local.T, preferred_element_type=jnp.float32,
                     precision='highest')
        r = jnp.sqrt(jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0) + 1e-12)
        partial = jnp.sum(r * w_local[None, :], axis=1)
        return jax.lax.psum(partial, axis)

    def fn(x):
        return _score(x, sup, w)
    return fn


def sharded_gram(kernel_fn: Callable, X_transformed, mesh: Mesh,
                 axis: str = 'dp'):
    """Build the Gram matrix K = k(X, X) with rows sharded over devices.

    Each device computes its row block against the full (replicated) X —
    an all-gather-free construction whose output stays row-sharded for the
    training loop.
    """
    n_dev = mesh.shape[axis]
    Xp, N = _pad_to_multiple(jnp.asarray(X_transformed), n_dev)
    Xs = shard_batch(Xp, mesh, axis)
    Xr = replicate(Xp, mesh)
    K = jax.jit(lambda a, b: kernel_fn(a, b))(Xs, Xr)
    return K[:N, :N]


# ---------------------------------------------------------------------------
# composed distributed steps (used by __graft_entry__.dryrun_multichip and
# multi-chip benchmarks)


def distributed_fit_step(kernel_fn, X_transformed, y, mesh: Mesh,
                         n_iters: int = 32, beta: float = 1.0):
    """One jitted, sharded proxy-fit step: row-sharded Gram construction +
    a fixed number of perceptron iterations + the masked RBF solve.

    The greedy loop's argmin/gather/scatter run under GSPMD over the
    sharded Gram matrix; XLA inserts the collectives.
    """
    n_dev = mesh.shape['dp']
    Xp, N = _pad_to_multiple(jnp.asarray(X_transformed), n_dev)
    yp, _ = _pad_to_multiple(jnp.asarray(y).reshape(-1), n_dev)
    Xs = shard_batch(Xp, mesh)
    yr = replicate(yp, mesh)

    @jax.jit
    def step(Xs, yv):
        K = kernel_fn(Xs, Xs)
        target = jnp.where(yv > 0, beta, -1.0)
        diagK = jnp.diag(K)

        def body(carry, _):
            gains, hyp = carry
            margin = jnp.where(yv != 0, yv * hyp, jnp.inf)
            min_i = jnp.argmin(margin)
            take = margin[min_i] <= 0
            delta = jnp.where(
                take, (target[min_i] - hyp[min_i]) / diagK[min_i], 0.0)
            gains = gains.at[min_i].add(delta)
            hyp = hyp + delta * K[min_i]
            return (gains, hyp), None

        init = (jnp.zeros_like(yv), jnp.zeros_like(yv))
        (gains, hyp), _ = jax.lax.scan(body, init, None, length=n_iters)
        # masked RBF solve on the resulting weights
        m = (gains != 0).astype(K.dtype)
        A = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m) \
            + 1e-4 * jnp.eye(K.shape[0], dtype=K.dtype)
        nodes = jnp.linalg.solve(A, yv * m)
        return gains, hyp, nodes

    return step(Xs, yr)


def distributed_trajopt_step(robot_fkine, score_fn, inits, limits, mesh: Mesh,
                             lr: float = 0.5, safety_margin: float = 0.0,
                             max_speed: float = 1.5):
    """One Adam trajopt step vmapped over restarts, restarts sharded over
    the 'dp' mesh axis (each device optimizes its own restarts)."""
    import optax
    inits = shard_batch(jnp.asarray(inits), mesh)
    limits = replicate(jnp.asarray(limits), mesh)

    @jax.jit
    def step(paths, limits):
        def loss(p):
            scores = score_fn(p)
            collision = jnp.sum(jnp.maximum(scores - safety_margin, 0.0))
            cp = robot_fkine(p)
            seg = cp[1:] - cp[:-1]
            max_move = jnp.sum(jnp.maximum(
                jnp.sum(seg ** 2, axis=2) - max_speed ** 2, 0.0))
            jl = jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                         + jnp.maximum(p - limits[:, 1], 0.0))
            return jnp.sum(seg ** 2) + 10.0 * (collision + max_move + jl)

        def one(p):
            g = jax.grad(loss)(p)
            g = g.at[0].set(0.0).at[-1].set(0.0)
            return p - lr * g  # single SGD step stands in for Adam here

        return jax.vmap(one)(paths)

    return step(inits, limits)
