"""Fused Pallas TPU kernel for the DiffCo score+gradient evaluation.

The inference hot path (SURVEY call stack 3.2; ref
kernel_perceptrons.py:309-319) is::

    score(x) = k(x, S) @ w,   k = polyharmonic r  or  rational quadratic

evaluated for thousands of query points per optimizer step. Computed
naively this materializes the [B, S] kernel matrix in HBM between two
matmuls (XLA does not fuse across dots). The fused kernel tiles the batch,
keeps the [S, TB] distance block in VMEM, and emits only the scores and
the query gradient — one HBM read of the queries, one of the (small)
support set, one write of the results:

    d score / d x_i = sum_j w_j (x_i - s_j) / r_ij          (polyharmonic)
                    = x_i * rowsum(u) - S^T u,  u = w / r

Design decisions, all measured on v5e (benchmarks/fused_ab.json +
benchmarks/RESULTS.md):

  * **Transposed (component-major) layout.** Queries enter the kernel as
    x^T [F, B] and tiles are [F, TB]. The batch-major [B, F] layout forced
    XLA to materialize the FK producer's per-component stack through a
    21-way concatenate of lane-padded [B, 1] columns before the custom
    call — a relayout that cost 5x the kernel itself (3.7 -> 20.8
    ms/step at B=65k). Component-major matches the SoA FK output and
    removes it.
  * **bf16 MXU inputs, fp32 accumulation** for the three contractions
    (distance cross-term, score reduction, gradient back-projection):
    halves MXU input bandwidth; measured score relative error 4e-3,
    negligible against DiffCo margins and the /3 safety-bias rule.
  * **Score/rowsum reductions as MXU matvecs** ([1, S] @ [S, TB]) instead
    of VPU cross-lane reductions.
  * **One pass computes score AND gradient**; the custom VJP reuses the
    saved [F, B] gradient, so the backward is a broadcast multiply.

With these, the fused kernel beats XLA autodiff (itself with the bf16
distance matmul) by ~18% at the bench shape (B=65536, S=512, interleaved
in-context measurement: 2.47 vs 2.92 ms/step) and the round-1 fp32 XLA
formulation by ~40%. At small batch (B <= ~8k) per-call overhead dominates
and plain XLA wins — ``polyharmonic_score`` gates on batch size.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# below this batch size the per-call dispatch outweighs the HBM savings
# (measured: old-layout kernel lost 3x at B=8192; crossover ~16-32k)
_FUSED_MIN_BATCH = 16384


def fused_score_available() -> bool:
    """Whether the fused Pallas path may be used (TPU backend, not
    disabled). Callers additionally gate on batch size. Set
    DIFFCO_USE_PALLAS=0 to force the XLA formulation everywhere."""
    return (_HAS_PALLAS and jax.default_backend() == 'tpu'
            and os.environ.get('DIFFCO_USE_PALLAS', '1') == '1')


def _interpret() -> bool:
    """Run kernels through the Pallas interpreter (CPU parity tests)."""
    return os.environ.get('DIFFCO_PALLAS_INTERPRET', '0') == '1'


def _round_up(x, m):
    return (x + m - 1) // m * m


def _tile_b(S: int) -> int:
    """Lane-tile (query) size — ONE policy for both fused kernels (this
    module and ops/fk_score.py import it): the [S, TB] fp32 distance
    block + bf16 copies (+ fk_score's [F_pad, TB] point/gradient blocks)
    must fit VMEM (~16 MB/core), so keep S * TB around 2^20 elements
    (4 MB fp32). The roofline tile sweeps (benchmarks/roofline.json)
    measured 0.40-0.46 / 0.28-0.29 ms per step at TB=256/512 against
    0.19-0.21 at TB=1024 and 0.21-0.22 at TB=2048 (S=512) — past 1024
    the larger VMEM working set costs more than the amortization buys,
    so cap at 1024. Floor to a multiple of 256: TB is the lane dimension
    of every BlockSpec, and non-128-aligned tiles (e.g. 2^20//1152 = 910
    for a 1152-support pad) would hit untested Mosaic lowerings."""
    tb = (1 << 20) // max(S, 1)
    return int(min(1024, max(256, (tb // 256) * 256)))


# ---------------------------------------------------------------------------
# transposed fused score + gradient kernel


def _make_fwdgrad_kernel(use_bf16: bool):
    dt = jnp.bfloat16 if use_bf16 else jnp.float32

    def kernel(xT_ref, s_ref, w_ref, out_ref, dxT_ref):
        xT = xT_ref[:].astype(jnp.float32)            # [F, TB]
        s = s_ref[:].astype(jnp.float32)              # [S, F]
        wv = w_ref[:].astype(jnp.float32)             # [S, 1]
        x2 = jnp.sum(xT * xT, axis=0, keepdims=True)  # [1, TB]
        s2 = jnp.sum(s * s, axis=1, keepdims=True)    # [S, 1]
        sx = jax.lax.dot_general(
            s.astype(dt), xT.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [S, TB]
        d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
        # ONE transcendental pass: rinv = 1/r; then r = d2 * rinv and
        # u = w / r = w * rinv are multiplies. (sqrt + divide cost 2x —
        # 2*S*TB transcendentals dominated the kernel at bench shapes.)
        rinv = jax.lax.rsqrt(d2)                      # [S, TB]
        r = d2 * rinv                                 # [S, TB], = sqrt(d2)
        # score = w . r over S as an MXU matvec (beats a VPU lane-reduce)
        out_ref[:] = jax.lax.dot_general(
            wv.astype(dt).T, r.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [1, TB]
        # rowsum(u) = w^T rinv and S^T u = (s*w)^T rinv: rinv feeds both
        # matvecs directly, u is never materialized
        rowsum = jax.lax.dot_general(
            wv.astype(dt).T, rinv.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [1, TB]
        su = jax.lax.dot_general(
            (s * wv).astype(dt), rinv.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [F, TB]
        dxT_ref[:] = xT * rowsum - su

    return kernel


def _poly_score_grad_pallas(x, s, w, use_bf16: bool = True):
    """Fused score + gradient: x [B, F] -> (score [B], dscore/dx [B, F]).

    Internally component-major: the [B, F] -> [F, B] transpose at the
    boundary is cheap; the kernel operand layout then matches the SoA FK
    producer (see module docstring)."""
    B, F = x.shape
    S = s.shape[0]
    TB = _tile_b(S)
    Bp = _round_up(max(B, 128), TB)
    xT = x.T
    xp = xT if Bp == B else jnp.zeros((F, Bp), x.dtype).at[:, :B].set(xT)
    score, dxT = pl.pallas_call(
        _make_fwdgrad_kernel(use_bf16),
        out_shape=(jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((F, Bp), jnp.float32)),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((F, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((F, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * S * F,
            bytes_accessed=Bp * F * 8 + S * F * 4,
            transcendentals=Bp * S),
        interpret=_interpret(),
    )(xp, s, w.reshape(S, 1))
    return score[0, :B], dxT[:, :B].T


@jax.custom_vjp
def polyharmonic_score_fused(x, s, w):
    """Polyharmonic score [B, 1] whose VJP reuses the gradient computed in
    the SAME fused kernel pass (saved as a residual — dx is only [B, F])."""
    score, _ = _poly_score_grad_pallas(x, s, w)
    return score[:, None]


def _psf_fwd(x, s, w):
    score, dx = _poly_score_grad_pallas(x, s, w)
    return score[:, None], (dx, s, w)


def _psf_bwd(res, g):
    dx, s, w = res
    # supports / weights are trained constants on this path
    return g * dx, jnp.zeros_like(s), jnp.zeros_like(w)


polyharmonic_score_fused.defvjp(_psf_fwd, _psf_bwd)


# ---------------------------------------------------------------------------
# XLA formulations (small-batch path, CPU fallback, parity oracle)


def _poly_score_xla(x, s, w, valid_mask=None, bf16: bool = False):
    """score = ||x - s|| @ w via the expanded-square distance matmul.
    ``bf16`` uses bfloat16 MXU inputs with fp32 accumulation (measured
    1.3-2.7x faster across bench shapes, rel err ~4e-3)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    # a float64 query (the scipy optimizers' scoped-x64 host re-trace)
    # keeps float64 accumulation instead of truncating back to f32
    pet = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    if bf16:
        xs = jnp.dot(x.astype(jnp.bfloat16), s.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    else:
        xs = jnp.dot(x, s.T, preferred_element_type=pet,
                     precision='highest')
    r = jnp.sqrt(jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0) + 1e-12)
    if valid_mask is not None:
        r = r * valid_mask[None, :]
    if bf16:
        return jnp.dot(r.astype(jnp.bfloat16),
                       w.reshape(-1, 1).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(r, w.reshape(-1, 1), preferred_element_type=pet,
                   precision='highest')


def polyharmonic_score(x, supports, weights, valid_mask=None,
                       epsilon: float = 1.0):
    """score(x) = sum_j w_j ||x - s_j|| / epsilon  [B, 1].

    x: [B, F]; supports: [S, F]; weights: [S]. ``valid_mask`` folds into
    the weights (padded supports carry zero weight anyway). Routes to the
    fused Pallas kernel on TPU at large batch, XLA otherwise."""
    w = weights.reshape(-1)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    if epsilon != 1.0:
        w = w / epsilon
    if fused_score_available() and x.shape[0] >= _FUSED_MIN_BATCH:
        return polyharmonic_score_fused(x, supports, w)
    return _poly_score_xla(x, supports, w)


def rq_score(x, supports, weights, gamma: float = 10.0, p: int = 2,
             valid_mask=None):
    """Rational-quadratic perceptron score (ref score_original :362-370).

    XLA-only: the RQ kernel appears on the training path (Gram build)
    where the full matrix is needed anyway; a fused variant measured no
    win (benchmarks/fused_ab.json covers the polyharmonic case that
    dominates serving)."""
    w = weights.reshape(-1)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    s2 = jnp.sum(supports * supports, axis=1, keepdims=True)
    xs = jnp.dot(x, supports.T,
                 preferred_element_type=(jnp.float64
                                         if x.dtype == jnp.float64
                                         else jnp.float32),
                 precision='highest')
    d2 = jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0)
    k = (1.0 + (gamma / p) * d2) ** (-p)
    return jnp.dot(k, w.reshape(-1, 1), preferred_element_type=jnp.float32,
                   precision='highest')
