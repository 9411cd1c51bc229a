"""Fused Pallas TPU kernel for the DiffCo score evaluation.

The inference hot path (SURVEY call stack 3.2; ref
kernel_perceptrons.py:309-319) is::

    score(x) = k(x, S) @ w,   k = polyharmonic r  or  rational quadratic

evaluated for thousands of query points per optimizer step. Computed
naively this materializes the [B, S] kernel matrix in HBM between two
matmuls (XLA does not fuse across dots). The Pallas kernel tiles the batch,
keeps the [TB, S] distance block in VMEM, and emits only the [TB, 1]
scores — one HBM read of the queries, one of the (small) support set, one
write of the result. A custom VJP computes the query gradient with the
same fused structure:

    d score / d x_i = sum_j w_j (x_i - s_j) / r_ij          (polyharmonic)
                    = x_i * rowsum(u) - u @ S,  u = w / r

All accumulation is fp32 on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_TB = 256  # query tile (sublane-aligned multiple of 8)


def fused_score_available() -> bool:
    """Pallas kernels are opt-in (DIFFCO_USE_PALLAS=1): on the current
    v5e toolchain the XLA formulation of score+grad is ~4x faster than
    the hand-fused kernel at DiffCo's problem sizes (the [B, S]
    intermediates are small enough that XLA's pipelining wins), so the
    kernels are kept as an alternative path and for larger-S regimes."""
    import os
    return (_HAS_PALLAS and jax.default_backend() == 'tpu'
            and os.environ.get('DIFFCO_USE_PALLAS', '0') == '1')


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# polyharmonic (k=1): score = r @ w


def _poly_fwd_kernel(x_ref, s_ref, w_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)            # [TB, F]
    s = s_ref[:].astype(jnp.float32)            # [S, F]
    w = w_ref[:].astype(jnp.float32)            # [S, 1]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # [TB, 1]
    s2 = jnp.sum(s * s, axis=1, keepdims=True)  # [S, 1]
    xs = jax.lax.dot_general(
        x, s, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)     # [TB, S]
    d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
    r = jnp.sqrt(d2 + 1e-12)
    # final contraction against w is a matvec: a [TB, S] * [1, S] row
    # reduction on the VPU beats a 1-column MXU matmul
    out_ref[:] = jnp.sum(r * w.T, axis=1, keepdims=True)


def _poly_bwd_kernel(x_ref, s_ref, w_ref, g_ref, dx_ref):
    x = x_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)            # [S, 1]
    g = g_ref[:].astype(jnp.float32)            # [TB, 1]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    xs = jax.lax.dot_general(
        x, s, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
    r = jnp.sqrt(d2 + 1e-12)
    u = w.T / r                                  # [TB, S]
    rowsum = jnp.sum(u, axis=1, keepdims=True)   # [TB, 1]
    us = jnp.dot(u, s, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # [TB, F]
    dx_ref[:] = g * (x * rowsum - us)


def _poly_pallas_call(kernel, x, s, w, extra=None, out_cols=None):
    B, F = x.shape
    S = s.shape[0]
    Bp = _round_up(max(B, 8), _TB)
    xp = jnp.zeros((Bp, F), x.dtype).at[:B].set(x)
    grid = (Bp // _TB,)
    in_specs = [
        pl.BlockSpec((_TB, F), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xp, s, w.reshape(S, 1)]
    if extra is not None:
        ep = jnp.zeros((Bp, extra.shape[1]), extra.dtype).at[:B].set(extra)
        in_specs.append(pl.BlockSpec((_TB, extra.shape[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(ep)
    out_cols = out_cols if out_cols is not None else 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, out_cols), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TB, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*args)
    return out[:B]


@jax.custom_vjp
def _poly_score_pallas(x, s, w):
    return _poly_pallas_call(_poly_fwd_kernel, x, s, w)


def _poly_score_fwd(x, s, w):
    return _poly_score_pallas(x, s, w), (x, s, w)


def _poly_score_bwd(res, g):
    x, s, w = res
    dx = _poly_pallas_call(_poly_bwd_kernel, x, s, w, extra=g,
                           out_cols=x.shape[1])
    # supports / weights are trained constants on this path
    return dx, jnp.zeros_like(s), jnp.zeros_like(w)


_poly_score_pallas.defvjp(_poly_score_fwd, _poly_score_bwd)


def _poly_score_xla(x, s, w, valid_mask=None):
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    xs = jnp.dot(x, s.T, preferred_element_type=jnp.float32,
                 precision='highest')
    r = jnp.sqrt(jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0) + 1e-12)
    if valid_mask is not None:
        r = r * valid_mask[None, :]
    return jnp.dot(r, w.reshape(-1, 1), preferred_element_type=jnp.float32,
                   precision='highest')


def polyharmonic_score(x, supports, weights, valid_mask=None,
                       epsilon: float = 1.0):
    """score(x) = sum_j w_j ||x - s_j|| / epsilon, fused on TPU.

    x: [B, F]; supports: [S, F]; weights: [S]. ``valid_mask`` folds into
    the weights (padded supports carry zero weight anyway). Falls back to
    a pure-XLA formulation off-TPU.
    """
    w = weights.reshape(-1)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    if epsilon != 1.0:
        w = w / epsilon
    if fused_score_available() and x.shape[0] >= 8:
        return _poly_score_pallas(x, supports, w)
    return _poly_score_xla(x, supports, w)


# ---------------------------------------------------------------------------
# rational quadratic: score = (1 + gamma/p * d2)^-p @ w


def _make_rq_fwd_kernel(gamma, p):
    def kernel(x_ref, s_ref, w_ref, out_ref):
        x = x_ref[:].astype(jnp.float32)
        s = s_ref[:].astype(jnp.float32)
        w = w_ref[:].astype(jnp.float32)
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        s2 = jnp.sum(s * s, axis=1, keepdims=True)
        xs = jax.lax.dot_general(
            x, s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
        k = (1.0 + (gamma / p) * d2) ** (-p)
        out_ref[:] = jnp.sum(k * w.T, axis=1, keepdims=True)
    return kernel


def rq_score(x, supports, weights, gamma: float = 10.0, p: int = 2,
             valid_mask=None):
    """Rational-quadratic perceptron score (ref score_original :362-370),
    fused on TPU; autodiff handled by XLA fallback when grads are needed
    through non-TPU paths."""
    w = weights.reshape(-1)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    if fused_score_available() and x.shape[0] >= 8:
        kern = _make_rq_fwd_kernel(float(gamma), int(p))
        return _poly_pallas_call(kern, x, supports, w)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(supports * supports, axis=1, keepdims=True)
    xs = jnp.dot(x, supports.T, preferred_element_type=jnp.float32,
                 precision='highest')
    d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
    k = (1.0 + (gamma / p) * d2) ** (-p)
    return jnp.dot(k, w.reshape(-1, 1), preferred_element_type=jnp.float32,
                   precision='highest')


# ---------------------------------------------------------------------------
# fused score + gradient: one pass computes both (the autodiff path runs
# the distance matmul twice — fwd and bwd — and round-trips the [B, S]
# matrix through HBM; this kernel emits score [B, 1] and dscore/dx [B, F]
# from a single VMEM-resident tile).


def _poly_fwdgrad_kernel(x_ref, s_ref, w_ref, out_ref, dx_ref):
    x = x_ref[:].astype(jnp.float32)            # [TB, F]
    s = s_ref[:].astype(jnp.float32)            # [S, F]
    w = w_ref[:].astype(jnp.float32)            # [S, 1]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    xs = jax.lax.dot_general(
        x, s, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
    r = jnp.sqrt(d2 + 1e-12)
    out_ref[:] = jnp.sum(r * w.T, axis=1, keepdims=True)
    u = w.T / r                                  # [TB, S]
    rowsum = jnp.sum(u, axis=1, keepdims=True)
    us = jnp.dot(u, s, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dx_ref[:] = x * rowsum - us


def _poly_score_grad_pallas(x, s, w):
    B, F = x.shape
    S = s.shape[0]
    Bp = _round_up(max(B, 8), _TB)
    xp = x if Bp == B else jnp.zeros((Bp, F), x.dtype).at[:B].set(x)
    score, dx = pl.pallas_call(
        _poly_fwdgrad_kernel,
        out_shape=(jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, F), jnp.float32)),
        grid=(Bp // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_TB, F), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
    )(xp, s, w.reshape(S, 1))
    return score[:B], dx[:B]


@jax.custom_vjp
def polyharmonic_score_fused(x, s, w):
    """Polyharmonic score whose VJP reuses the gradient computed in the
    SAME fused kernel pass (saved as a residual — dx is only [B, F])."""
    score, _ = _poly_score_grad_pallas(x, s, w)
    return score


def _psf_fwd(x, s, w):
    score, dx = _poly_score_grad_pallas(x, s, w)
    return score, (dx, s, w)


def _psf_bwd(res, g):
    dx, s, w = res
    return g * dx, jnp.zeros_like(s), jnp.zeros_like(w)


polyharmonic_score_fused.defvjp(_psf_fwd, _psf_bwd)
