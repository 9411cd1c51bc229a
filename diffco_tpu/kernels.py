"""Kernel functions between (transformed) configurations.

Functional parity targets (reference: /root/reference/diffco/kernel.py):
  RQKernel (:12), CauchyKernel (:31), MultiQuadratic (:45), Polyharmonic
  (:59), WeightedKernel (:100), TangentKernel (:116), TemporalFKKernel
  (:145), LineKernel (:170), LineFKKernel (:186).

TPU-native design: every kernel reduces to a pairwise-squared-distance (or
inner-product) computed with a single MXU matmul via the
``|x|^2 + |y|^2 - 2 x.y`` expansion, followed by cheap VPU elementwise math
that XLA fuses into the matmul epilogue. All kernels are pure functions of
jnp arrays; the classes only hold static hyper-parameters so they are safe
to close over under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten2(x):
    """[N, ...] -> [N, F] (1-D inputs become [1, F])."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[None, :]
    return x.reshape(x.shape[0], -1)


def pairwise_sqdist(x, y):
    """Squared euclidean distances between rows: [N, F] x [M, F] -> [N, M].

    Uses the matmul expansion so the O(N*M*F) work lands on the MXU; the
    clamp guards tiny negative values from cancellation.
    """
    x = _flatten2(x)
    y = _flatten2(y)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # [N, 1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T        # [1, M]
    # follow a float64 input (the scipy optimizers' scoped-x64 host
    # re-trace) instead of truncating the accumulation back to f32
    pet = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    xy = jnp.dot(x, y.T, preferred_element_type=pet,
                 precision='highest')
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def pairwise_dist(x, y, eps: float = 1e-12):
    """Euclidean distances with a grad-safe sqrt (finite gradient at 0)."""
    return jnp.sqrt(pairwise_sqdist(x, y) + eps)


class KernelFunc:
    def __call__(self, xs, x_primes):
        raise NotImplementedError


class RQKernel(KernelFunc):
    """Rational-quadratic kernel: 1 / (1 + gamma/p * ||x-x'||^2)^p.

    Ref: kernel.py:12-29.
    """

    def __init__(self, gamma: float, p: int = 2):
        self.gamma = float(gamma)
        self.p = p

    def __call__(self, xs, x_primes):
        d2 = pairwise_sqdist(xs, x_primes)
        return (1.0 + (self.gamma / self.p) * d2) ** (-self.p)


class CauchyKernel(KernelFunc):
    """c / (||x-x'||^2 + c). Ref: kernel.py:31-43."""

    def __init__(self, c: float):
        self.c = float(c)

    def __call__(self, xs, x_primes):
        d2 = pairwise_sqdist(xs, x_primes)
        return self.c / (d2 + self.c)


class MultiQuadratic(KernelFunc):
    """sqrt(||x-x'||^2 / eps^2 + 1). Ref: kernel.py:45-57."""

    def __init__(self, epsilon: float):
        self.epsilon = float(epsilon)

    def __call__(self, xs, x_primes):
        d2 = pairwise_sqdist(xs, x_primes)
        return jnp.sqrt(d2 / self.epsilon ** 2 + 1.0)


class Polyharmonic(KernelFunc):
    """Polyharmonic spline kernel.

    k odd: r^k / eps; k even: r^k * log(r) / eps (0 at r=0).
    Ref: kernel.py:59-79.
    """

    def __init__(self, k: int, epsilon: float):
        self.k = int(k)
        self.epsilon = float(epsilon)

    def __call__(self, xs, x_primes):
        if self.k % 2 == 0:
            # r^k log r, with the r->0 limit patched to 0 (ref zeroes NaNs).
            # Exact broadcast-subtract distance: the matmul expansion's
            # cancellation noise (~1e-5) would be amplified by log(r) near
            # the diagonal. Even kernels only ever see small support sets
            # (fit_full_poly), so the O(N*M*F) VPU cost is irrelevant.
            a, b = _flatten2(xs), _flatten2(x_primes)
            d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
            r = jnp.sqrt(jnp.maximum(d2, 1e-20))
            val = r ** self.k * jnp.log(r)
            val = jnp.where(d2 <= 1e-20, 0.0, val)
        else:
            r = pairwise_dist(xs, x_primes)
            val = r if self.k == 1 else r ** self.k
        return val / self.epsilon


class WeightedKernel(KernelFunc):
    """RQ kernel with per-feature weights. Ref: kernel.py:100-114."""

    def __init__(self, gamma: float, w, p: int = 2):
        self.gamma = float(gamma)
        self.p = p
        self.w = jnp.asarray(w).reshape(1, -1)

    def __call__(self, xs, x_primes):
        xs = _flatten2(xs) * self.w
        x_primes = _flatten2(x_primes) * self.w
        d2 = pairwise_sqdist(xs, x_primes)
        return (1.0 + (self.gamma / self.p) * d2) ** (-self.p)


class TangentKernel(KernelFunc):
    """tanh(a * <x, x'> + c). Ref: kernel.py:116-129."""

    def __init__(self, a: float, c: float):
        self.a = float(a)
        self.c = float(c)

    def __call__(self, xs, x_primes):
        xs = _flatten2(xs)
        x_primes = _flatten2(x_primes)
        prod = jnp.dot(
            xs, x_primes.T,
            preferred_element_type=(jnp.float64
                                    if xs.dtype == jnp.float64
                                    else jnp.float32),
            precision='highest')
        return jnp.tanh(self.a * prod + self.c)


class FKKernel(KernelFunc):
    """Kernel over forward-kinematics transformed configurations.

    The new-style API passes ``transform`` to the perceptron instead (ref
    deprecates this at kernel.py:131-143), but SE2/SE3 scripts still build
    it explicitly (manual_trajopt_se3.py:16), so it is supported.
    """

    def __init__(self, fkine, base_kernel: KernelFunc):
        self.fkine = fkine
        self.base_kernel = base_kernel

    def __call__(self, xs, x_primes=None, x_primes_controls=None):
        xs = jnp.atleast_2d(jnp.asarray(xs))
        xs_controls = self.fkine(xs).reshape(xs.shape[0], -1)
        if x_primes_controls is None:
            x_primes = jnp.atleast_2d(jnp.asarray(x_primes))
            x_primes_controls = self.fkine(x_primes).reshape(x_primes.shape[0], -1)
        return self.base_kernel(xs_controls, x_primes_controls)


class TemporalFKKernel(KernelFunc):
    """Space-time product kernel for dynamic environments.

    k((x1,t1),(x2,t2)) = k_fk(x1,x2) * k_t(t1,t2)^alpha, where t is the last
    feature of each extended configuration. Ref: kernel.py:145-168.
    """

    def __init__(self, fkine, rqkernel: KernelFunc, t_rqkernel: KernelFunc,
                 alpha: float = 0.5):
        self.fkine = fkine
        self.rqkernel = rqkernel
        self.t_rqkernel = t_rqkernel
        self.alpha = float(alpha)

    def __call__(self, xs, x_primes):
        xs = jnp.atleast_2d(jnp.asarray(xs))
        x_primes = jnp.atleast_2d(jnp.asarray(x_primes))
        xs, ts = xs[:, :-1], xs[:, -1:]
        x_primes, t_primes = x_primes[:, :-1], x_primes[:, -1:]
        xs_controls = self.fkine(xs).reshape(xs.shape[0], -1)
        xp_controls = self.fkine(x_primes).reshape(x_primes.shape[0], -1)
        return (self.rqkernel(xs_controls, xp_controls)
                * self.t_rqkernel(ts, t_primes) ** self.alpha)


class LineKernel(KernelFunc):
    """Kernel between motion segments (stacked endpoint configs).

    Average of the point kernel on the two endpoints. Ref: kernel.py:170-184.
    """

    def __init__(self, point_kernel: KernelFunc):
        self.point_kernel = point_kernel

    def __call__(self, xs, x_primes):
        xs = jnp.atleast_2d(jnp.asarray(xs))
        x_primes = jnp.atleast_2d(jnp.asarray(x_primes))
        # fail fast like the reference (kernel.py:180-183): an odd width
        # would silently split endpoints across the wrong boundary
        if xs.shape[1] % 2 != 0 or x_primes.shape[1] != xs.shape[1]:
            raise ValueError(
                f'segment features must stack two equal-width endpoint '
                f'configs, got widths {xs.shape[1]} / {x_primes.shape[1]}')
        dof = xs.shape[1] // 2
        return 0.5 * (self.point_kernel(xs[:, :dof], x_primes[:, :dof])
                      + self.point_kernel(xs[:, dof:], x_primes[:, dof:]))


class LineFKKernel(KernelFunc):
    """FK kernel over motion segments. Ref: kernel.py:186-202."""

    def __init__(self, fkine, base_kernel: KernelFunc):
        self.fkine = fkine
        self.base_kernel = base_kernel

    def __call__(self, xs, x_primes):
        xs = jnp.atleast_2d(jnp.asarray(xs))
        x_primes = jnp.atleast_2d(jnp.asarray(x_primes))
        if xs.shape[1] % 2 != 0 or x_primes.shape[1] != xs.shape[1]:
            # ref kernel.py:197-199 asserts the same
            raise ValueError(
                f'segment features must stack two equal-width endpoint '
                f'configs, got widths {xs.shape[1]} / {x_primes.shape[1]}')
        dof = xs.shape[1] // 2
        xs_controls = self.fkine(xs.reshape(-1, dof)).reshape(xs.shape[0], -1)
        xp_controls = self.fkine(
            x_primes.reshape(-1, dof)).reshape(x_primes.shape[0], -1)
        return self.base_kernel(xs_controls, xp_controls)


class MultiDimRQKernel(KernelFunc):
    """Per-control-point rational-quadratic kernel: vector-valued
    k(x, x')[c] = RQ(x_c, x'_c) over each control point c separately.

    The reference's MultiDimDiffCo names ``kernel.MultiDimRQKernel`` as
    its default (kernel_perceptrons.py:914) but never implements it —
    default construction there fails. This is the natural definition:
    inputs [N, M, d] of per-control-point features; output [N, N', M].
    """

    def __init__(self, gamma: float, p: int = 2):
        self.gamma = float(gamma)
        self.p = p

    def __call__(self, xs, x_primes):
        xs = jnp.asarray(xs)
        x_primes = jnp.asarray(x_primes)
        if xs.ndim == 2:
            xs = xs[None]
        if x_primes.ndim == 2:
            x_primes = x_primes[None]
        # [N, 1, M, d] - [1, N', M, d] -> d2 [N, N', M]
        d2 = jnp.sum((xs[:, None] - x_primes[None]) ** 2, axis=-1)
        return (1.0 + (self.gamma / self.p) * d2) ** (-self.p)
