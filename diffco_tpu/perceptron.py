"""Kernel perceptrons — the learned collision proxy (TPU-native).

Functional parity targets (reference:
/root/reference/diffco/kernel_perceptrons.py):
  Perceptron (:12), DiffCo (:31) [train :56, train_perceptron :98,
  initialize :204, jump_start_initialize :222, fit_poly :271, poly_score
  :309, fit_full_poly :321, full_poly_score :343, score_original :362],
  DiffCoBeta (:373), MultiDiffCo (:543).

TPU-first design decisions (vs. the reference's CPU/torch implementation):

  * The greedy min-margin training loop (ref :114-133) is a
    ``lax.while_loop`` over a **fully precomputed Gram matrix**: one MXU
    matmul builds K up front, and each iteration is a single row gather +
    scatter-add + axpy — entirely on device, no host round trips. The
    reference computes Gram rows lazily as a CPU optimization; on TPU the
    dense precompute is faster than the bookkeeping — up to the HBM
    ceiling. Past ``lazy_gram_threshold`` rows (default 16384, ~1 GB of
    Gram) ``train`` switches to ``perceptron_train_loop_lazy`` /
    ``multiclass_train_loop_lazy``: the identical update sequence with the
    needed Gram row(s) recomputed per iteration as a [1, F] x [F, N] MXU
    matvec, extending on-device training to 65k+ rows in O(N) memory.

  * Support sets are **fixed-shape padded arrays** with a validity mask
    (the reference's optional ``max_num_supports`` mode, :159-196, becomes
    the only mode) so that every downstream consumer — scores, gradients,
    trajectory optimizers, active-learning updates — compiles once.

  * Warm starting (ref ``jump_start_initialize`` :222-269) recomputes the
    full Gram instead of stitching cached blocks (an O(N^2 F) matmul is
    cheap on the MXU) and seeds gains from the previous support set;
    ``hypothesis = K @ gains`` then holds exactly by construction.

  * The smooth-surrogate solve (``fit_poly``, ref :271-287) is a masked
    ``jnp.linalg.solve``: invalid rows/columns are replaced by identity so
    padding never perturbs the valid block.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import kernels as kernel_mod
from .kernels import KernelFunc, RQKernel, Polyharmonic


# ---------------------------------------------------------------------------
# pure jitted training / fitting functions


@functools.partial(jax.jit, static_argnames=('max_iteration',))
def perceptron_train_loop(K: jnp.ndarray, y: jnp.ndarray, beta: float,
                          max_iteration: int,
                          init_gains: Optional[jnp.ndarray] = None,
                          init_hypothesis: Optional[jnp.ndarray] = None,
                          valid_mask: Optional[jnp.ndarray] = None):
    """Greedy kernel-perceptron training (ref kernel_perceptrons.py:114-133).

    One while_loop iteration performs either a min-margin gain update or a
    redundant-support removal, folded into a single scatter-add + axpy:

        idx   = min-margin index if margin <= 0 else removal index
        delta = gain correction  if margin <= 0 else -gains[idx]
        gains[idx] += delta;  hypothesis += delta * K[idx]

    ``valid_mask`` (optional, bool [N]) marks real rows; padded rows are
    never selected for update or removal. Padding keeps shapes
    device-divisible when K is row-sharded over a mesh (parallel/sharding).

    Returns (gains, hypothesis, iterations).
    """
    N = y.shape[0]
    y = y.reshape(-1).astype(K.dtype)
    diagK = jnp.diag(K)
    # target = beta^((1+y)/2) * y: beta for y=+1, -1 for y=-1 (ref :121)
    target = jnp.where(y > 0, jnp.asarray(beta, K.dtype),
                       jnp.asarray(-1.0, K.dtype))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(jnp.logical_not(done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        margin = jnp.where(valid, y * hyp, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        delta_update = (target[min_i] - hyp[min_i]) / diagK[min_i]

        # removal step: support whose removal *increases* its own margin
        modified = y * (hyp - gains * diagK) * (gains != 0) * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(gains != 0) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update), removable)
        done = jnp.logical_and(jnp.logical_not(take_update),
                               jnp.logical_not(removable))

        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_update,
                          jnp.where(take_remove, -gains[max_i], 0.0))
        row = K[idx]
        gains = gains.at[idx].add(delta)
        hyp = hyp + delta * row
        return gains, hyp, it + 1, done

    gains0 = jnp.zeros(N, K.dtype) if init_gains is None else init_gains
    hyp0 = (jnp.zeros(N, K.dtype) if init_hypothesis is None
            else init_hypothesis)
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


@functools.partial(jax.jit,
                   static_argnames=('kernel_func', 'max_iteration'))
def perceptron_train_loop_lazy(Xt: jnp.ndarray, y: jnp.ndarray,
                               kernel_func, beta: float,
                               max_iteration: int,
                               init_gains: Optional[jnp.ndarray] = None,
                               init_hypothesis: Optional[jnp.ndarray] = None,
                               valid_mask: Optional[jnp.ndarray] = None):
    """Greedy perceptron training with **lazy kernel rows** — O(N) memory.

    Same update sequence as :func:`perceptron_train_loop` (bitwise: rows
    come from the identical ``pairwise_sqdist`` matmul expansion), but the
    [N, N] Gram matrix is never materialized: each while_loop iteration
    computes the single kernel row it needs, ``k(x_idx, X)``, as a
    [1, F] x [F, N] MXU matvec. This is the reference's lazy-row CPU
    strategy (kernel_perceptrons.py:117-119) turned into the TPU
    *large-N* path: the dense precompute wins below ~16k rows, while this
    trainer extends on-device training to the 65k+ sweep scale at
    O(N * F) per iteration.

    ``kernel_func`` must be hashable (KernelFunc instances hash by
    identity — pass the same instance across calls to reuse the compile).
    Returns (gains, hypothesis, iterations).
    """
    N = y.shape[0]
    Xt = Xt.reshape(N, -1)
    y = y.reshape(-1).astype(Xt.dtype)
    # diagonal of the Gram, computed row-free: k(x_i, x_i) per point
    diagK = jax.vmap(
        lambda r: kernel_func(r[None], r[None])[0, 0])(Xt)
    target = jnp.where(y > 0, jnp.asarray(beta, Xt.dtype),
                       jnp.asarray(-1.0, Xt.dtype))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(jnp.logical_not(done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        margin = jnp.where(valid, y * hyp, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        delta_update = (target[min_i] - hyp[min_i]) / diagK[min_i]

        modified = y * (hyp - gains * diagK) * (gains != 0) * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(gains != 0) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update), removable)
        done = jnp.logical_and(jnp.logical_not(take_update),
                               jnp.logical_not(removable))

        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_update,
                          jnp.where(take_remove, -gains[max_i], 0.0))
        row = kernel_func(Xt[idx][None], Xt)[0]     # lazy: one Gram row
        gains = gains.at[idx].add(delta)
        hyp = hyp + delta * row
        return gains, hyp, it + 1, done

    gains0 = jnp.zeros(N, Xt.dtype) if init_gains is None else init_gains
    hyp0 = (jnp.zeros(N, Xt.dtype) if init_hypothesis is None
            else init_hypothesis)
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


@functools.partial(jax.jit, static_argnames=('max_iteration', 'num_class'))
def multiclass_train_loop(K: jnp.ndarray, y: jnp.ndarray, beta: float,
                          max_iteration: int, num_class: int,
                          init_gains: Optional[jnp.ndarray] = None,
                          init_hypothesis: Optional[jnp.ndarray] = None,
                          valid_mask: Optional[jnp.ndarray] = None):
    """Per-class greedy updates over a shared Gram matrix
    (ref MultiDiffCo.train_perceptron :574-607). Classes update
    concurrently each iteration (vmapped single-class step).
    ``valid_mask`` marks real rows; padded rows (mesh-divisible padding)
    are never selected for update or removal."""
    N = y.shape[0]
    y = y.astype(K.dtype)           # [N, C]
    diagK = jnp.diag(K)
    target = jnp.where(y > 0, jnp.asarray(beta, K.dtype),
                       jnp.asarray(-1.0, K.dtype))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def class_step(gains_c, hyp_c, y_c, target_c):
        margin = jnp.where(valid, y_c * hyp_c, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        delta_update = (target_c[min_i] - hyp_c[min_i]) / diagK[min_i]
        modified = y_c * (hyp_c - gains_c * diagK) * (gains_c != 0) * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(gains_c != 0) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update), removable)
        done_c = jnp.logical_and(jnp.logical_not(take_update),
                                 jnp.logical_not(removable))
        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_update,
                          jnp.where(take_remove, -gains_c[max_i], 0.0))
        row = K[idx]
        gains_c = gains_c.at[idx].add(delta)
        hyp_c = hyp_c + delta * row
        return gains_c, hyp_c, done_c

    vstep = jax.vmap(class_step, in_axes=(1, 1, 1, 1), out_axes=(1, 1, 0))

    def cond(state):
        _, _, it, all_done = state
        return jnp.logical_and(jnp.logical_not(all_done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        gains, hyp, done = vstep(gains, hyp, y, target)
        return gains, hyp, it + 1, jnp.all(done)

    gains0 = (jnp.zeros((N, num_class), K.dtype) if init_gains is None
              else init_gains)
    hyp0 = (jnp.zeros((N, num_class), K.dtype) if init_hypothesis is None
            else init_hypothesis)
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


@functools.partial(jax.jit, static_argnames=('kernel_func', 'max_iteration',
                                             'num_class'))
def multiclass_train_loop_lazy(Xt: jnp.ndarray, y: jnp.ndarray,
                               kernel_func, beta: float,
                               max_iteration: int, num_class: int,
                               init_gains: Optional[jnp.ndarray] = None,
                               init_hypothesis: Optional[jnp.ndarray] = None,
                               valid_mask: Optional[jnp.ndarray] = None):
    """Lazy-row variant of :func:`multiclass_train_loop` — O(N * C) memory.

    Each iteration picks one (update-or-removal) index per class from the
    shared diagonal, then computes exactly the ``num_class`` Gram rows it
    needs as one [C, F] x [F, N] MXU matmul. Update sequence matches the
    dense loop (classes advance concurrently per iteration)."""
    N = y.shape[0]
    Xt = Xt.reshape(N, -1)
    y = y.astype(Xt.dtype)          # [N, C]
    diagK = jax.vmap(
        lambda r: kernel_func(r[None], r[None])[0, 0])(Xt)
    target = jnp.where(y > 0, jnp.asarray(beta, Xt.dtype),
                       jnp.asarray(-1.0, Xt.dtype))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def class_pick(gains_c, hyp_c, y_c, target_c):
        margin = jnp.where(valid, y_c * hyp_c, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        delta_update = (target_c[min_i] - hyp_c[min_i]) / diagK[min_i]
        modified = y_c * (hyp_c - gains_c * diagK) * (gains_c != 0) * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(gains_c != 0) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update), removable)
        done_c = jnp.logical_and(jnp.logical_not(take_update),
                                 jnp.logical_not(removable))
        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_update,
                          jnp.where(take_remove, -gains_c[max_i], 0.0))
        return idx, delta, done_c

    vpick = jax.vmap(class_pick, in_axes=(1, 1, 1, 1), out_axes=(0, 0, 0))

    def cond(state):
        _, _, it, all_done = state
        return jnp.logical_and(jnp.logical_not(all_done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        idxs, deltas, done = vpick(gains, hyp, y, target)      # [C] each
        rows = kernel_func(Xt[idxs], Xt)                       # [C, N] lazy
        gains = gains.at[idxs, jnp.arange(num_class)].add(deltas)
        hyp = hyp + rows.T * deltas[None, :]
        return gains, hyp, it + 1, jnp.all(done)

    gains0 = (jnp.zeros((N, num_class), Xt.dtype) if init_gains is None
              else init_gains)
    hyp0 = (jnp.zeros((N, num_class), Xt.dtype) if init_hypothesis is None
            else init_hypothesis)
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


def masked_rbf_solve(kmat: jnp.ndarray, y: jnp.ndarray,
                     valid_mask: jnp.ndarray, reg: float = 0.0) -> jnp.ndarray:
    """Solve K w = y restricted to ``valid_mask`` rows/cols of a padded
    system; invalid entries yield w = 0 (ref fit_poly :271-287 operates on
    the dynamically-sized valid block — here padding rows become identity).
    """
    m = valid_mask.astype(kmat.dtype)
    A = kmat * m[:, None] * m[None, :]
    A = A + jnp.diag(1.0 - m) + reg * jnp.eye(kmat.shape[0], dtype=kmat.dtype)
    if y.ndim == 1:
        b = y * m
    else:
        b = y * m[:, None]
    return jnp.linalg.solve(A, b)


@functools.partial(jax.jit, static_argnames=('S',))
def extract_supports(gains: jnp.ndarray, S: int):
    """Rank points by |gain| and build a fixed-size support selection.

    Returns (indices [S], valid_mask [S], num_valid). Keeps the largest
    |gain| points when more than S are nonzero. (The reference's padded
    mode keeps the *smallest* via ``topk(..., largest=False)``
    (:175) — that discards the most influential supports and appears to be
    a bug; we deliberately keep the largest.) At least 2 slots are marked
    valid so downstream polyharmonic solves stay nonsingular (ref
    :140-141 forces a second support for the same reason).
    """
    flat = jnp.abs(gains) if gains.ndim == 1 else jnp.abs(gains).sum(axis=1)
    count = jnp.sum(flat != 0)
    order = jnp.argsort(-flat)
    if S > order.shape[0]:
        # pad slots beyond the dataset (S can exceed N under pad-size
        # hysteresis); they are masked invalid below
        order = jnp.concatenate(
            [order, jnp.full(S - order.shape[0], order[-1], order.dtype)])
    idx = order[:S]
    num_valid = jnp.clip(count, 2, jnp.minimum(S, flat.shape[0]))
    valid = jnp.arange(S) < num_valid
    return idx, valid, num_valid


# ---------------------------------------------------------------------------
# perceptron classes (thin stateful wrappers over the pure functions)


class Perceptron:
    """Base class. Ref: kernel_perceptrons.py:12-27."""

    def __init__(self):
        self.support_points = None
        # a jax.sharding.Mesh scales training out over devices (subclasses
        # accept it as a constructor arg); the _mesh_* helpers below are
        # shared by every trainer (scalar, multi-class, vector-gain)
        self.mesh = None
        self._kernel_jit = None

    # -- mesh plumbing (shared by DiffCo/MultiDiffCo/MultiDimDiffCo) -------

    def _mesh_parts(self, Xt, y, want_replicated=True):
        """Pad (to the mesh's data-axis size) and place training arrays for
        a sharded run. Returns (Xt_sharded, Xt_replicated, y_padded, valid)
        with the padded row count a device multiple; the valid mask keeps
        padded rows out of the greedy selection. ``want_replicated=False``
        returns ``Xt_replicated=None`` — the lazy path only needs the
        sharded rows, and pinning a full [N, F] copy in every device's HBM
        at exactly the large-N scale the lazy trainer targets would defeat
        its O(N) memory contract."""
        from .parallel.sharding import (_pad_to_multiple, shard_batch,
                                        replicate, data_axis)
        ax = data_axis(self.mesh)
        n_dev = self.mesh.shape[ax]
        N = Xt.shape[0]
        Xtp, _ = _pad_to_multiple(Xt, n_dev)
        yp, _ = _pad_to_multiple(y, n_dev)
        valid = jnp.arange(Xtp.shape[0]) < N
        Xr = replicate(Xtp, self.mesh) if want_replicated else None
        return shard_batch(Xtp, self.mesh, ax), Xr, yp, valid, ax

    def _mesh_train_inputs(self, Xt, y, lazy):
        """Resolve (K, Xt_train, y_train, valid) for train(): row-sharded
        Gram on the dense path, sharded feature rows on the lazy path,
        plain Gram/rows without a mesh. Shared by DiffCo.train,
        MultiDiffCo.train and MultiDimDiffCo.train (identical semantics,
        one copy)."""
        if self.mesh is None:
            K = None if lazy else self.kernel_func(Xt, Xt)
            return K, Xt, y, None
        from .parallel.sharding import shard_batch
        Xs, Xr, yp, valid_full, ax = self._mesh_parts(
            Xt, y, want_replicated=not lazy)
        if lazy:
            return (None, Xs, shard_batch(yp, self.mesh, ax),
                    shard_batch(valid_full, self.mesh, ax))
        if self._kernel_jit is None:
            self._kernel_jit = jax.jit(self.kernel_func)
        K = self._kernel_jit(Xs, Xr)     # row-sharded Gram
        return K, Xt, yp, valid_full

    def _mesh_pack_warmstart(self, init_gains, init_hyp, lazy):
        """Pad + place warm-start vectors for a sharded run: lazy shards
        both along the row axis; dense replicates the gains (the Gram is
        already the padded length, so init_hyp needs no extra padding)."""
        if self.mesh is None:
            return init_gains, init_hyp
        from .parallel.sharding import (_pad_to_multiple, shard_batch,
                                        replicate, data_axis)
        ax = data_axis(self.mesh)
        n_dev = self.mesh.shape[ax]
        init_gains, _ = _pad_to_multiple(init_gains, n_dev)
        if lazy:
            init_hyp, _ = _pad_to_multiple(init_hyp, n_dev)
            return (shard_batch(init_gains, self.mesh, ax),
                    shard_batch(init_hyp, self.mesh, ax))
        return replicate(init_gains, self.mesh), init_hyp

    def score(self, point):
        raise NotImplementedError

    def is_collision(self, point):
        return self.score(point) > 0

    def line_predict(self, start, target, res=50):
        ts = jnp.linspace(0.0, 1.0, res)
        pts = start[None] + ts[:, None] * (target - start)[None]
        return bool(jnp.any(self.score(pts) > 0))

    def __call__(self, *args, **kwargs):
        return self.predict(*args, **kwargs)


class DiffCo(Perceptron):
    """Binary kernel-perceptron collision proxy.

    State is a pytree of fixed-shape padded arrays (see module docstring).
    ``train`` / ``fit_poly`` populate it; ``score_original`` /
    ``poly_score`` are jit-compiled pure functions of (state, query).
    """

    def __init__(self, kernel_func='rq', gamma=1, beta=1,
                 transform: Optional[Callable] = None,
                 max_batch_size=None, max_num_supports: Optional[int] = None,
                 mesh=None):
        super().__init__()
        self.kernel_func = (RQKernel(gamma) if kernel_func == 'rq'
                            else kernel_func)
        self.beta = float(beta)
        self.transform = transform
        self.max_num_supports = max_num_supports  # None -> auto (pow2 pad)
        # rows above which train() switches from the dense-Gram trainer to
        # the O(N)-memory lazy-row trainer (perceptron_train_loop_lazy)
        self.lazy_gram_threshold = 16384
        # a jax.sharding.Mesh scales training out over devices: the Gram
        # build / lazy feature rows are sharded over the mesh's first axis
        # and the SAME greedy train loop runs under GSPMD (no reference
        # counterpart — the reference is single-device, SURVEY §2.3)
        self.mesh = mesh
        self._kernel_jit = None  # per-instance jitted kernel (sharded Gram)

        self.support_points = None       # [S, dof]
        self.support_transformed = None  # [S, ...]
        self.gains = None                # [S]
        self.hypothesis = None           # [S]
        self.y = None                    # [S]
        self.distance = None             # [S] or None
        self.kernel_matrix = None        # [S, S]
        self.rbf_nodes = None            # [S]
        self.valid_mask = None           # bool [S]
        self.num_valid = 0
        self.rbf_kernel = None
        self.train_iterations = None

    # -- helpers ----------------------------------------------------------

    def _apply_transform(self, X):
        Xt = X if self.transform is None else self.transform(X)
        return Xt.reshape(Xt.shape[0], -1)

    def _pad_size(self, count: int) -> int:
        if self.max_num_supports is not None:
            return self.max_num_supports
        # auto: next multiple of 128 (MXU lane width) >= count, with
        # HYSTERESIS — never shrink below a previously used pad size.
        # Active-learning support counts hover around pad boundaries; a
        # shrink-regrow cycle would recompile every S-shaped program
        # (solve, scores, trajopt) per flip, measured at 12-80 s spikes
        size = max(128, int(np.ceil(count / 128.0)) * 128)
        prev = (0 if self.support_points is None
                else self.support_points.shape[0])
        return max(size, prev)

    @property
    def valid_supports(self):
        return self.num_valid

    # -- training ---------------------------------------------------------

    def train(self, X, y, update=False, exist_mask=None, max_iteration=1000,
              method='original', distance=None, verbose=False):
        """Train the perceptron (ref :56-76). ``update=True`` warm-starts
        from the current support set; ``exist_mask`` marks rows of X that
        are the previous supports (ref :222-269).

        With ``self.mesh`` set the dataset is padded to a device multiple
        and the SAME jitted programs run under GSPMD: the Gram build is
        row-sharded (dense path) or the feature rows are sharded (lazy
        path); results are numerically identical to the single-device run
        (tests/test_parallel.py parity suite)."""
        del method
        X = jnp.asarray(X)
        y = jnp.asarray(y).reshape(-1)
        N = X.shape[0]
        # past ~16k rows the dense [N, N] Gram precompute (the TPU-side win
        # over the reference's lazy rows at typical 5-10k scales) stops
        # paying for its O(N^2) HBM footprint; switch to the lazy-row
        # trainer (O(N) memory, identical update sequence)
        lazy = N > self.lazy_gram_threshold
        Xt = self._apply_transform(X)

        K, Xt_train, y_train, valid = self._mesh_train_inputs(Xt, y, lazy)

        init_gains = init_hyp = None
        if update and self.gains is not None:
            assert exist_mask is not None, 'update=True requires exist_mask'
            # seed gains at previous supports (HOST-side scatter: the index
            # count tracks num_valid which changes every update — on-device
            # it would recompile a tiny program per update);
            # hypothesis = K @ gains exactly
            em = np.asarray(exist_mask)
            exist_idx = np.where(em)[0]
            vg = np.asarray(self.gains) * np.asarray(self.valid_mask)
            prev = np.zeros(N, np.float32)
            prev[exist_idx] = vg[:len(exist_idx)]
            init_gains = jnp.asarray(prev)
            if lazy:
                # K @ prev with prev supported on the previous supports
                # only: an [N, S] cross-Gram suffices. Use the FULL padded
                # support buffer (static shape across updates; padded rows
                # carry zero gain) so this compiles once.
                init_hyp = jnp.matmul(
                    self.kernel_func(Xt, self.support_transformed),
                    jnp.asarray(vg), precision='highest')
            else:
                init_hyp = jnp.matmul(K[:, :N] if self.mesh is not None
                                      else K, init_gains,
                                      precision='highest')
            init_gains, init_hyp = self._mesh_pack_warmstart(
                init_gains, init_hyp, lazy)

        if lazy:
            gains, hyp, it = perceptron_train_loop_lazy(
                Xt_train, y_train, self.kernel_func, self.beta,
                int(max_iteration),
                init_gains=init_gains, init_hypothesis=init_hyp,
                valid_mask=valid)
        else:
            gains, hyp, it = perceptron_train_loop(
                K, y_train, self.beta, int(max_iteration),
                init_gains=init_gains, init_hypothesis=init_hyp,
                valid_mask=valid)
        if self.mesh is not None:
            gains, hyp = gains[:N], hyp[:N]
            K = None   # support Gram is recomputed from the kept rows
        self.train_iterations = int(it)
        if verbose:
            acc = float(jnp.mean((hyp > 0) == (y > 0)))
            print(f'DiffCo training ended at iteration {it}, ACC {acc:.4f}')

        dist = (jnp.asarray(distance).reshape(-1)
                if distance is not None else None)
        self._select_supports(X, Xt, gains, hyp, y, dist, K)

    def _select_supports(self, X, Xt, gains, hyp, y, dist, K):
        """Compact to the fixed-size padded support set. ``K`` may be None
        (lazy-row training) — the [S, S] support Gram is then recomputed
        from the kept rows, which yields the identical entries."""
        # count support ROWS — multi-class [N, C] gains would otherwise
        # inflate the pad size by up to a factor of C (and hysteresis
        # would make that permanent)
        count = int(jnp.sum(gains != 0) if gains.ndim == 1
                    else jnp.sum(jnp.any(gains != 0, axis=-1)))
        S = self._pad_size(max(count, 2))
        idx, valid, num_valid = extract_supports(gains, S)
        vf = valid.astype(Xt.dtype)
        take = lambda a: jnp.take(a, idx, axis=0) * vf.reshape(
            (S,) + (1,) * (a.ndim - 1)).astype(a.dtype)
        self.support_points = take(X)
        self.support_transformed = take(Xt)
        self.gains = take(gains)
        self.hypothesis = take(hyp)
        self.y = take(y.astype(Xt.dtype))
        self.distance = take(dist) if dist is not None else None
        if K is None:
            km = self.kernel_func(self.support_transformed,
                                  self.support_transformed)
        else:
            km = jnp.take(jnp.take(K, idx, axis=0), idx, axis=1)
        self.kernel_matrix = km * vf[:, None] * vf[None, :]
        self.valid_mask = valid
        self.num_valid = int(num_valid)
        self.rbf_nodes = jnp.zeros(S, Xt.dtype)
        if count > S:
            # more nonzero gains than slots: the top-S truncation breaks
            # the hypothesis == K @ gains invariant the warm-start update
            # path relies on (ref asserts it, kernel_perceptrons.py:196) —
            # recompute it over the kept supports
            self.hypothesis = jnp.matmul(self.kernel_matrix, self.gains,
                                         precision='highest')

    # -- smooth surrogate ---------------------------------------------------

    def fit_poly(self, kernel_func: Optional[KernelFunc] = None,
                 target='hypo', reg: float = 0.0):
        """Fit the smooth RBF surrogate over the supports (ref :271-287)."""
        self.rbf_kernel = (Polyharmonic(k=1, epsilon=1)
                           if kernel_func is None else kernel_func)
        if target == 'hypo':
            yv = self.hypothesis
        elif 'dist' in target:
            yv = self.distance
        elif 'label' in target:
            yv = self.y
        else:
            raise ValueError(f'unknown target {target}')
        kmat = self.rbf_kernel(self.support_transformed,
                               self.support_transformed)
        self.rbf_nodes = masked_rbf_solve(kmat, yv, self.valid_mask, reg=reg)

    def fit_full_poly(self, epsilon=1, k=2, lmbd=0, target='hypo'):
        """Polyharmonic + linear-tail interpolation (ref :321-341; the
        multi-class variant :694-717 is the same system with a
        multi-column RHS — handled here generically, so MultiDiffCo
        inherits per-class full-poly fits).

        Solves [[Phi, X, 1], [X^T, 0, 0], [1^T, 0, 0]] nodes = [y, 0, 0]
        over the valid supports.
        """
        self.poly_kernel = Polyharmonic(k=k, epsilon=epsilon)
        X = self.support_transformed
        S, F = X.shape
        m = self.valid_mask.astype(X.dtype)
        phi = self.poly_kernel(X, X) * m[:, None] * m[None, :]
        phi = phi + jnp.diag(lmbd * m + (1.0 - m))
        Xm = X * m[:, None]
        ones = m.reshape(-1, 1)
        l1 = jnp.concatenate([phi, Xm, ones], axis=1)
        l2 = jnp.concatenate(
            [Xm.T, jnp.zeros((F, F + 1), X.dtype)], axis=1)
        l3 = jnp.concatenate(
            [ones.T, jnp.zeros((1, F + 1), X.dtype)], axis=1)
        L = jnp.concatenate([l1, l2, l3], axis=0)
        # regularize the (singular-prone) tail block minimally
        L = L + 1e-8 * jnp.eye(L.shape[0], dtype=X.dtype)
        if target == 'hypo':
            yv = self.hypothesis
        elif 'dist' in target:
            yv = self.distance
        else:
            yv = self.y
        if yv.ndim == 1:
            b = jnp.concatenate([yv * m, jnp.zeros(F + 1, X.dtype)])
        else:  # [S, C] multi-class targets (ref :711-717)
            b = jnp.concatenate(
                [yv * m[:, None],
                 jnp.zeros((F + 1, yv.shape[1]), X.dtype)], axis=0)
        self.poly_nodes = jnp.linalg.solve(L, b)

    # -- inference ----------------------------------------------------------

    def poly_score(self, point=None, transformed_point=None):
        """Smooth surrogate score (ref :309-319). Returns [B, 1].

        Differentiation contract: gradients w.r.t. the QUERY point only.
        At batch >= ops.fk_score._FK_FUSED_MIN_BATCH on TPU this routes
        through fused custom-VJP kernels that treat the trained state
        (support_transformed / rbf_nodes) as constants — their cotangents
        are zero and forward mode raises there. Below the gate the XLA
        route is twice-differentiable in every argument; code needing
        d(score)/d(trained state) must keep batches under the gate."""
        is_poly1 = (isinstance(self.rbf_kernel, Polyharmonic)
                    and self.rbf_kernel.k == 1)
        if transformed_point is None:
            point = jnp.atleast_2d(jnp.asarray(point))
            if is_poly1:
                # FK-transformed checker on a DH robot: one Pallas kernel
                # does FK + score + config-gradient per batch tile
                robot = getattr(self.transform, '__self__', None)
                if (robot is not None
                        and getattr(robot, 'fkine', None) == self.transform):
                    from .ops.fk_score import fk_polyharmonic_score_auto
                    return fk_polyharmonic_score_auto(
                        point, robot, self.support_transformed,
                        self.rbf_nodes, self.valid_mask,
                        epsilon=self.rbf_kernel.epsilon)
            pt = self._apply_transform(point)
        else:
            tp = jnp.asarray(transformed_point)
            pt = tp.reshape(tp.shape[0], -1)
        if is_poly1:
            # the serving default (linear polyharmonic): route through the
            # fused-capable op — picks the Pallas kernel at large batch
            from .ops.fused_score import polyharmonic_score
            return polyharmonic_score(pt, self.support_transformed,
                                      self.rbf_nodes, self.valid_mask,
                                      epsilon=self.rbf_kernel.epsilon)
        kv = self.rbf_kernel(pt, self.support_transformed)
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :]
        return jnp.matmul(kv, self.rbf_nodes.reshape(-1, 1),
                          precision='highest')

    def full_poly_score(self, point):
        """[B, 1] for DiffCo; [B, C] for MultiDiffCo (ref :343-354 /
        :712-730)."""
        point = jnp.atleast_2d(jnp.asarray(point))
        pt = self._apply_transform(point)
        m = self.valid_mask.astype(pt.dtype)
        phi = self.poly_kernel(pt, self.support_transformed) * m[None, :]
        phi_x = jnp.concatenate(
            [phi, pt, jnp.ones((pt.shape[0], 1), pt.dtype)], axis=1)
        nodes = (self.poly_nodes.reshape(-1, 1)
                 if self.poly_nodes.ndim == 1 else self.poly_nodes)
        return jnp.matmul(phi_x, nodes, precision='highest')

    def score_original(self, point):
        """Raw perceptron score k(phi(q), supports) @ gains (ref :362-370)."""
        point = jnp.atleast_2d(jnp.asarray(point))
        pt = self._apply_transform(point)
        kv = self.kernel_func(pt, self.support_transformed)
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :]
        return jnp.matmul(kv, self.gains, precision='highest')

    def score(self, point):
        return self.score_original(point)

    def predict(self, point):
        return (self.score(point) > 0) * 2 - 1


class DiffCoBeta(DiffCo):
    """Distance-regressing variant: perceptron for the support set, then a
    regularized RBF solve of the signed distance (ref :373-540)."""

    def __init__(self, kernel_func='rq', rbf_kernel=None, gamma=1, beta=1,
                 transform=None, max_num_supports=None, mesh=None):
        super().__init__(kernel_func=kernel_func, gamma=gamma, beta=beta,
                         transform=transform,
                         max_num_supports=max_num_supports, mesh=mesh)
        self.rbf_kernel = (Polyharmonic(k=1, epsilon=1)
                           if rbf_kernel is None else rbf_kernel)

    def train(self, X, d, max_iteration=1000, n_left_out_points=100,
              dtol=1e-4, keep_all=False, verbose=False):
        """Ref :382-403: train labels on X[:-n], then regress distances over
        [supports + X[-n:]]."""
        X = jnp.asarray(X)
        d = jnp.asarray(d).reshape(-1)
        # clamp so small datasets keep at least 2 perceptron training rows
        n_left_out_points = int(min(n_left_out_points, max(len(X) - 2, 0)))
        if n_left_out_points == 0:
            raise ValueError(
                f'DiffCoBeta.train needs > 2 samples, got {len(X)}')
        X_head, d_head = X[:-n_left_out_points], d[:-n_left_out_points]
        labels = (d_head >= 0) * 2.0 - 1.0
        super().train(X_head, labels, max_iteration=max_iteration,
                      distance=d_head, verbose=verbose)
        # distance regression set: valid supports + left-out points
        nv = self.num_valid
        Xr = jnp.concatenate(
            [self.support_points[:nv], X[-n_left_out_points:]], axis=0)
        dr = jnp.concatenate(
            [self.distance[:nv], d[-n_left_out_points:]], axis=0)
        self.train_distance(Xr, dr)

    def train_distance(self, X, d):
        """Solve (K + 0.1 I) alpha = d over the regression set
        (ref :405-421)."""
        Xt = self._apply_transform(X)
        n = X.shape[0]
        S = self._pad_size(n)
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((S - n,) + a.shape[1:], a.dtype)], axis=0)
        self.support_points = pad(X)
        self.support_transformed = pad(Xt)
        self.distance = pad(d)
        self.valid_mask = jnp.arange(S) < n
        self.num_valid = int(n)
        kmat = self.rbf_kernel(self.support_transformed,
                               self.support_transformed)
        self.kernel_matrix = kmat
        self.gains = masked_rbf_solve(kmat, self.distance, self.valid_mask,
                                      reg=0.1)
        self.rbf_nodes = self.gains
        self.hypothesis = self.rbf_score(self.support_points[:n]).reshape(-1)
        self.hypothesis = pad(self.hypothesis)
        self.y = jnp.sign(self.distance)

    def rbf_score(self, point):
        point = jnp.atleast_2d(jnp.asarray(point))
        pt = self._apply_transform(point)
        kv = self.rbf_kernel(pt, self.support_transformed)
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :]
        return jnp.matmul(kv, self.rbf_nodes.reshape(-1, 1),
                          precision='highest')


class MultiDiffCo(DiffCo):
    """Multi-class perceptron: per-class gains over a shared support set
    (ref :543-730)."""

    def __init__(self, kernel_func='rq', gamma=1, beta=1, transform=None,
                 max_num_supports=None, mesh=None):
        super().__init__(kernel_func=kernel_func, gamma=gamma, beta=beta,
                         transform=transform,
                         max_num_supports=max_num_supports, mesh=mesh)
        self.num_class = None

    def train(self, X, y, update=False, exist_mask=None, max_iteration=1000,
              method='original', distance=None, verbose=False):
        del method
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        assert y.ndim == 2, 'MultiDiffCo expects labels [N, num_class]'
        self.num_class = y.shape[1]
        N = X.shape[0]
        lazy = N > self.lazy_gram_threshold
        Xt = self._apply_transform(X)

        K, Xt_train, y_train, valid = self._mesh_train_inputs(Xt, y, lazy)

        init_gains = init_hyp = None
        if update and self.gains is not None:
            assert exist_mask is not None
            # host-side scatter; see DiffCo.train
            em = np.asarray(exist_mask)
            exist_idx = np.where(em)[0]
            vg = (np.asarray(self.gains)
                  * np.asarray(self.valid_mask)[:, None])
            prev = np.zeros((N, self.num_class), np.float32)
            prev[exist_idx] = vg[:len(exist_idx)]
            init_gains = jnp.asarray(prev)
            if lazy:
                init_hyp = jnp.matmul(
                    self.kernel_func(Xt, self.support_transformed),
                    jnp.asarray(vg), precision='highest')
            else:
                init_hyp = jnp.matmul(K[:, :N] if self.mesh is not None
                                      else K, init_gains,
                                      precision='highest')
            init_gains, init_hyp = self._mesh_pack_warmstart(
                init_gains, init_hyp, lazy)

        if lazy:
            gains, hyp, it = multiclass_train_loop_lazy(
                Xt_train, y_train, self.kernel_func, self.beta,
                int(max_iteration), self.num_class,
                init_gains=init_gains, init_hypothesis=init_hyp,
                valid_mask=valid)
        else:
            gains, hyp, it = multiclass_train_loop(
                K, y_train, self.beta, int(max_iteration), self.num_class,
                init_gains=init_gains, init_hypothesis=init_hyp,
                valid_mask=valid)
        if self.mesh is not None:
            gains, hyp = gains[:N], hyp[:N]
            K = None   # support Gram is recomputed from the kept rows
        self.train_iterations = int(it)
        if verbose:
            acc = float(jnp.mean((hyp > 0) == (y > 0)))
            print(f'MultiDiffCo ended at iteration {it}, ACC {acc:.4f}')
        dist = jnp.asarray(distance) if distance is not None else None
        self._select_supports(X, Xt, gains, hyp, y, dist, K)

    def fit_poly(self, kernel_func=None, target='hypo', reg: float = 0.0):
        """Per-class masked solve with cross-class kernel zeroing
        (ref :648-677): entries pairing a class's support with a
        non-support are zeroed before the solve, then non-support nodes
        are zeroed after."""
        self.rbf_kernel = (kernel_mod.MultiQuadratic(1)
                           if kernel_func is None else kernel_func)
        if target == 'hypo':
            yv = self.hypothesis
        elif 'dist' in target:
            yv = self.distance
        else:
            yv = self.y
        kmat = self.rbf_kernel(self.support_transformed,
                               self.support_transformed)
        nodes = []
        for c in range(self.num_class):
            mask_c = jnp.logical_and(self.gains[:, c] != 0, self.valid_mask)
            nodes.append(masked_rbf_solve(kmat, yv[:, c], mask_c, reg=reg))
        self.rbf_nodes = jnp.stack(nodes, axis=1)  # [S, C]

    def poly_score(self, point=None, transformed_point=None):
        """[B, C] per-class surrogate scores (ref :679-692). Same
        differentiation contract as DiffCo.poly_score: at batch >=
        ops.fk_score._FK_FUSED_MIN_BATCH on TPU, FK-transformed DH-robot
        checkers route through ONE fused Pallas kernel that shares the
        FK forward and the [S, TB] distance/rsqrt sweep across all
        classes (custom_vjp — q-gradients only, forward mode raises);
        below the gate the XLA route is twice-differentiable."""
        is_poly1 = (isinstance(self.rbf_kernel, Polyharmonic)
                    and self.rbf_kernel.k == 1)
        if transformed_point is None:
            point = jnp.atleast_2d(jnp.asarray(point))
            if is_poly1:
                robot = getattr(self.transform, '__self__', None)
                if (robot is not None
                        and getattr(robot, 'fkine', None) == self.transform):
                    from .ops.fk_score import (
                        fk_polyharmonic_multi_score_auto)
                    return fk_polyharmonic_multi_score_auto(
                        point, robot, self.support_transformed,
                        self.rbf_nodes, self.valid_mask,
                        epsilon=self.rbf_kernel.epsilon)
            pt = self._apply_transform(point)
        else:
            tp = jnp.asarray(transformed_point)
            pt = tp.reshape(tp.shape[0], -1)
        kv = self.rbf_kernel(pt, self.support_transformed)
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :]
        return jnp.matmul(kv, self.rbf_nodes, precision='highest')

    rbf_score = poly_score

    def score(self, points):
        points = jnp.atleast_2d(jnp.asarray(points))
        pt = self._apply_transform(points)
        kv = self.kernel_func(pt, self.support_transformed)
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :]
        return jnp.matmul(kv, self.gains, precision='highest')

    def predict(self, point):
        return (self.score(point) > 0) * 2 - 1


@functools.partial(jax.jit, static_argnames=('max_iteration',))
def multidim_train_loop(K: jnp.ndarray, y: jnp.ndarray, beta: float,
                        max_iteration: int,
                        init_gains: Optional[jnp.ndarray] = None,
                        init_hypothesis: Optional[jnp.ndarray] = None,
                        valid_mask: Optional[jnp.ndarray] = None):
    """Vector-gain greedy training (ref MultiDimDiffCo.train_perceptron,
    kernel_perceptrons.py:976-1096).

    K: [N, N, C] vector-valued Gram tensor (per-control-point kernels);
    gains: [N, C]; hypothesis h_i = sum_j K[i, j] . g_j. The min-margin
    update uses the rank-1 pseudo-inverse of the diagonal kernel vector:
    delta = (target - h_i) * K_ii / ||K_ii||^2 (ref :1004-1006).
    ``valid_mask`` (optional, bool [N]) marks real rows; padded rows are
    never selected (used when K is row-sharded over a mesh).
    """
    N, _, C = K.shape
    y = y.reshape(-1).astype(K.dtype)
    diagK = K[jnp.arange(N), jnp.arange(N)]          # [N, C]
    target = jnp.where(y > 0, jnp.asarray(beta, K.dtype),
                       jnp.asarray(-1.0, K.dtype))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(jnp.logical_not(done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        margin = jnp.where(valid, y * hyp, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        k_ii = diagK[min_i]
        inv_k = k_ii / jnp.maximum(jnp.sum(k_ii ** 2), 1e-12)
        delta_vec = (target[min_i] - hyp[min_i]) * inv_k    # [C]

        # removal step (ref :1021-1031)
        delta_h = jnp.sum(diagK * gains, axis=-1)           # [N]
        nonzero = jnp.any(gains != 0, axis=-1)
        modified = y * (hyp - delta_h) * nonzero * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(nonzero) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update),
                                      removable)
        done = jnp.logical_and(jnp.logical_not(take_update),
                               jnp.logical_not(removable))

        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_vec,
                          jnp.where(take_remove, -gains[max_i],
                                    jnp.zeros(C, K.dtype)))
        gains = gains.at[idx].add(delta)
        hyp = hyp + K[idx] @ delta                          # [N]
        return gains, hyp, it + 1, done

    gains0 = (jnp.zeros((N, C), K.dtype) if init_gains is None
              else init_gains)
    hyp0 = jnp.zeros(N, K.dtype) if init_hypothesis is None \
        else init_hypothesis
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


@functools.partial(jax.jit,
                   static_argnames=('kernel_func', 'max_iteration'))
def multidim_train_loop_lazy(Xt: jnp.ndarray, y: jnp.ndarray,
                             kernel_func, beta: float,
                             max_iteration: int,
                             init_gains: Optional[jnp.ndarray] = None,
                             init_hypothesis: Optional[jnp.ndarray] = None,
                             valid_mask: Optional[jnp.ndarray] = None):
    """Lazy-row variant of :func:`multidim_train_loop` — O(N * C) memory.

    The [N, N, C] vector-valued Gram tensor is never materialized: the
    per-point diagonal K_ii [N, C] is precomputed row-free, and each
    while_loop iteration computes the single vector-valued Gram row it
    needs, ``k(x_idx, X) [N, C]``. Update sequence matches the dense loop.
    This is the large-N path for MultiDimDiffCo (the dense tensor is C
    times an ordinary Gram, so it hits the HBM ceiling C times sooner).

    Xt: [N, M, d] per-control-point features; kernel_func must be hashable
    and map ([1, M, d], [N, M, d]) -> [1, N, C].
    """
    N = y.shape[0]
    y = y.reshape(-1).astype(jnp.float32)
    diagK = jax.vmap(
        lambda r: kernel_func(r[None], r[None])[0, 0])(Xt)    # [N, C]
    C = diagK.shape[-1]
    target = jnp.where(y > 0, jnp.asarray(beta, jnp.float32),
                       jnp.asarray(-1.0, jnp.float32))
    valid = (jnp.ones(N, bool) if valid_mask is None
             else valid_mask.reshape(-1))

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(jnp.logical_not(done), it < max_iteration)

    def body(state):
        gains, hyp, it, _ = state
        margin = jnp.where(valid, y * hyp, jnp.inf)
        min_i = jnp.argmin(margin)
        take_update = margin[min_i] <= 0
        k_ii = diagK[min_i]
        inv_k = k_ii / jnp.maximum(jnp.sum(k_ii ** 2), 1e-12)
        delta_vec = (target[min_i] - hyp[min_i]) * inv_k    # [C]

        delta_h = jnp.sum(diagK * gains, axis=-1)           # [N]
        nonzero = jnp.any(gains != 0, axis=-1)
        modified = y * (hyp - delta_h) * nonzero * valid
        max_i = jnp.argmax(modified)
        removable = jnp.logical_and(modified[max_i] > 0,
                                    jnp.sum(nonzero) > 1)
        take_remove = jnp.logical_and(jnp.logical_not(take_update),
                                      removable)
        done = jnp.logical_and(jnp.logical_not(take_update),
                               jnp.logical_not(removable))

        idx = jnp.where(take_update, min_i, max_i)
        delta = jnp.where(take_update, delta_vec,
                          jnp.where(take_remove, -gains[max_i],
                                    jnp.zeros(C, jnp.float32)))
        row = kernel_func(Xt[idx][None], Xt)[0]             # [N, C] lazy
        gains = gains.at[idx].add(delta)
        hyp = hyp + row @ delta
        return gains, hyp, it + 1, done

    gains0 = (jnp.zeros((N, C), jnp.float32) if init_gains is None
              else init_gains)
    hyp0 = (jnp.zeros(N, jnp.float32) if init_hypothesis is None
            else init_hypothesis)
    gains, hyp, it, _ = lax.while_loop(
        cond, body, (gains0, hyp0, jnp.asarray(0), jnp.asarray(False)))
    return gains, hyp, it


class MultiDimDiffCo(Perceptron):
    """Vector-gain perceptron: the kernel returns per-control-point values
    and each support carries a gain per control point
    (ref kernel_perceptrons.py:909-1301).

    The Gram tensor is [N, N, C] — C times an ordinary Gram — so past
    ``lazy_gram_threshold`` rows (default 4096) ``train`` switches to
    :func:`multidim_train_loop_lazy`, which recomputes the single vector
    Gram row it needs per iteration in O(N * C) memory.
    """

    def __init__(self, kernel_func=None, gamma=1, beta=1, transform=None,
                 max_batch_size=None, max_num_supports=None, mesh=None):
        super().__init__()
        # mesh-sharded training mirrors DiffCo's: the vector-valued Gram
        # build is row-sharded (dense path) / feature rows are sharded
        # (lazy path) and the SAME jitted while_loop runs under GSPMD
        # (parity: tests/test_parallel.py::test_multidim_mesh_fit_parity)
        self.mesh = mesh
        from .kernels import MultiDimRQKernel
        self.kernel_func = (MultiDimRQKernel(gamma) if kernel_func is None
                            or kernel_func == 'multi_dim_rq'
                            else kernel_func)
        self.beta = float(beta)
        self.transform = transform
        self.max_num_supports = max_num_supports
        # rows above which train() switches to the O(N*C)-memory lazy-row
        # trainer; the dense [N, N, C] tensor is C times an ordinary Gram
        self.lazy_gram_threshold = 4096
        self.support_points = None
        self.support_transformed = None
        self.gains = None
        self.hypothesis = None
        self.y = None
        self.distance = None
        self.kernel_matrix = None
        self.rbf_nodes = None
        self.valid_mask = None
        self.num_valid = 0
        self.rbf_kernel = None

    def _apply_transform(self, X):
        """Keeps the per-control-point structure: [N, M, d]."""
        if self.transform is None:
            Xt = jnp.asarray(X)
            return Xt[:, :, None] if Xt.ndim == 2 else Xt
        return self.transform(X)

    def _pad_size(self, count):
        if self.max_num_supports is not None:
            return self.max_num_supports
        # same hysteresis as DiffCo._pad_size: active-learning support
        # counts hovering around a 64-multiple boundary must not shrink
        # and regrow the pad (each flip recompiles every S-shaped program)
        size = max(64, int(np.ceil(count / 64.0)) * 64)
        prev = (0 if self.support_points is None
                else self.support_points.shape[0])
        return max(size, prev)

    @property
    def valid_supports(self):
        return self.num_valid

    def train(self, X, y, update=False, exist_mask=None, max_iteration=1000,
              method='original', distance=None, verbose=False):
        del method
        X = jnp.asarray(X)
        y = jnp.asarray(y).reshape(-1)
        N = X.shape[0]
        Xt = self._apply_transform(X)                 # [N, M, d]
        lazy = X.shape[0] > self.lazy_gram_threshold
        # K: [N, N, C] dense (row-sharded over the mesh when set), or None
        # on the lazy path; Xt_train/y_train carry the (padded, sharded)
        # loop inputs and valid keeps padded rows unselected
        K, Xt_train, y_train, valid = self._mesh_train_inputs(Xt, y, lazy)

        init_gains = init_hyp = None
        if update and self.gains is not None:
            # warm start like DiffCo.train(update=True): seed the vector
            # gains at the previous-support rows; hypothesis follows as
            # h_i = sum_j K[i, j, :] . g_j exactly by construction
            assert exist_mask is not None, 'update=True requires exist_mask'
            # host-side scatter; see DiffCo.train
            em = np.asarray(exist_mask)
            exist_idx = np.where(em)[0]
            C = self.gains.shape[1]
            vg = (np.asarray(self.gains)
                  * np.asarray(self.valid_mask)[:, None])
            prev = np.zeros((X.shape[0], C), np.float32)
            prev[exist_idx] = vg[:len(exist_idx)]
            init_gains = jnp.asarray(prev)
            if lazy:
                # cross Gram vs the (padded, static-shape) support buffer:
                # h_i = sum_s k(x_i, sup_s) . g_s, padded rows carry 0 gain
                kx = self.kernel_func(Xt, self.support_transformed)
                init_hyp = jnp.einsum('nsc,sc->n', kx, jnp.asarray(vg),
                                      precision='highest')
            else:
                # K[:, :N] covers both cases: without a mesh K is exactly
                # [N, N, C]; with one it is the row-sharded padded Gram and
                # the padded columns must not contribute to h
                init_hyp = jnp.einsum('nsc,sc->n', K[:, :N], init_gains,
                                      precision='highest')
            init_gains, init_hyp = self._mesh_pack_warmstart(
                init_gains, init_hyp, lazy)
        elif update:
            raise ValueError('update=True requires a previously trained '
                             'MultiDimDiffCo (no gains present)')

        if lazy:
            gains, hyp, it = multidim_train_loop_lazy(
                Xt_train, y_train, self.kernel_func, self.beta,
                int(max_iteration), init_gains=init_gains,
                init_hypothesis=init_hyp, valid_mask=valid)
        else:
            gains, hyp, it = multidim_train_loop(K, y_train, self.beta,
                                                 int(max_iteration),
                                                 init_gains=init_gains,
                                                 init_hypothesis=init_hyp,
                                                 valid_mask=valid)
        if self.mesh is not None:
            gains, hyp = gains[:N], hyp[:N]
            K = None   # support Gram is recomputed from the kept rows
        if verbose:
            acc = float(jnp.mean((hyp > 0) == (y > 0)))
            print(f'MultiDimDiffCo ended at iteration {it}, ACC {acc:.4f}')

        count = int(jnp.sum(jnp.any(gains != 0, axis=-1)))
        S = self._pad_size(max(count, 2))
        idx, valid, num_valid = extract_supports(gains, S)
        vf = valid.astype(jnp.float32)
        take = lambda a: jnp.take(a, idx, axis=0) * vf.reshape(
            (S,) + (1,) * (a.ndim - 1)).astype(a.dtype)
        self.support_points = take(X)
        self.support_transformed = take(Xt)
        self.gains = take(gains)
        self.hypothesis = take(hyp)
        self.y = take(y.astype(jnp.float32))
        self.distance = (take(jnp.asarray(distance).reshape(-1))
                         if distance is not None else None)
        if K is None:   # lazy: recompute the [S, S, C] support Gram
            km = self.kernel_func(self.support_transformed,
                                  self.support_transformed)
        else:
            km = jnp.take(jnp.take(K, idx, axis=0), idx, axis=1)
        self.kernel_matrix = km * vf[:, None, None] * vf[None, :, None]
        self.valid_mask = valid
        self.num_valid = int(num_valid)
        self.rbf_nodes = jnp.zeros_like(self.gains)
        if count > S:
            # top-S truncation breaks h_i = sum_j K[i, j, :].g_j (the
            # warm-start invariant); recompute over the kept supports,
            # mirroring DiffCo._select_supports
            self.hypothesis = jnp.einsum(
                'ijc,jc->i', self.kernel_matrix, self.gains,
                precision='highest')

    def fit_poly(self, kernel_func=None, target='hypo'):
        """Least-squares fit over the flattened vector kernel
        (ref :1172-1215 uses lstsq on kmat [S, S*C])."""
        from .kernels import MultiDimRQKernel
        self.rbf_kernel = (MultiDimRQKernel(1.0) if kernel_func is None
                           else kernel_func)
        if target == 'hypo':
            yv = self.hypothesis
        elif 'dist' in target:
            yv = self.distance
        else:
            yv = self.y
        kmat = self.rbf_kernel(self.support_transformed,
                               self.support_transformed)  # [S, S, C]
        S = kmat.shape[0]
        m = self.valid_mask.astype(kmat.dtype)
        kflat = (kmat * m[:, None, None] * m[None, :, None]).reshape(S, -1)
        sol, _, _, _ = jnp.linalg.lstsq(kflat, (yv * m)[:, None],
                                        rcond=1e-6)
        self.rbf_nodes = sol.reshape(S, -1) * m[:, None]

    def poly_score(self, point=None, transformed_point=None):
        if transformed_point is None:
            point = jnp.atleast_2d(jnp.asarray(point))
            pt = self._apply_transform(point)
        else:
            pt = jnp.asarray(transformed_point)
        kv = self.rbf_kernel(pt, self.support_transformed)  # [B, S, C]
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :, None]
        return jnp.matmul(kv.reshape(kv.shape[0], -1),
                          self.rbf_nodes.reshape(-1, 1),
                          precision='highest')

    def score_original(self, point):
        point = jnp.atleast_2d(jnp.asarray(point))
        pt = self._apply_transform(point)
        kv = self.kernel_func(pt, self.support_transformed)  # [B, S, C]
        kv = kv * self.valid_mask.astype(kv.dtype)[None, :, None]
        return jnp.einsum('bsc,sc->b', kv, self.gains,
                          precision='highest')

    def score(self, point):
        return self.score_original(point)

    def predict(self, point):
        return (self.score(point) > 0) * 2 - 1
