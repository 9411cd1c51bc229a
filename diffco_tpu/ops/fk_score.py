"""Fully-fused Pallas kernel: DH-chain FK + polyharmonic score + gradient.

The trajopt inner loop (SURVEY call stack 3.2; ref optim.py:86-127 runs it
from host Python) evaluates ``score(fkine(q))`` and its configuration
gradient for tens of thousands of configurations per step. Even with the
fused score kernel (ops/fused_score.py) and the analytic FK JVP
(robots/fk_jvp.py), the XLA FK graph is ~300 tiny [B]-shaped elementwise
ops whose HBM round-trips and per-op overhead cost more than the entire
score kernel (measured 0.21 ms fwd + ~0.4 ms bwd vs 0.29 ms score at
B=65536 on a v5e).

This kernel moves the whole evaluation into one Pallas program per batch
tile:

  1. **FK forward** on [1, TB] component vectors held in VMEM/registers:
     per joint sin/cos + the 27-FMA SoA compose (robots/soa.py math,
     DH constants baked in as compile-time floats).
  2. **Score + point-gradient** exactly as ops/fused_score.py: expanded-
     square distance via a bf16 MXU matmul with fp32 accumulation, one
     rsqrt pass, score/rowsum/back-projection as MXU matvecs.
  3. **FK backward** via the geometric Jacobian (robots/fk_jvp.py
     docstring): suffix sums of (g_p, p x g_p) over control points, then
     ``dq_j = z_j . (sm - o_j x sg)`` per joint — ~60 more vector ops,
     no rotation cotangents.

Inputs/outputs are component-major ([J, B] configurations in, [1, B]
scores + [J, B] gradients out) so the only XLA-side work is two cheap
2-D transposes at the API boundary.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .fused_score import (_HAS_PALLAS, _interpret, _round_up,
                          _tile_b as _fused_tile_b,
                          fused_score_available, polyharmonic_score)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_ZERO3 = (0.0, 0.0, 0.0)


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dh_chain_tile(q_rows, dh_const, point_specs, base):
    """SoA FK over [1, TB] joint-angle rows; returns per-joint
    (axis, origin) and world control points (tuples of [1, TB] or
    compile-time floats)."""
    if base is None:
        r_acc = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        t_acc = _ZERO3
    else:
        r_acc, t_acc = base
    axes, frames = [], []
    for i, (a, d, sa, ca, th) in enumerate(dh_const):
        axes.append(((r_acc[2], r_acc[5], r_acc[8]), t_acc))
        ang = q_rows[i] + th if th else q_rows[i]
        ct, st = jnp.cos(ang), jnp.sin(ang)
        # dh rot/trans (soa.dh_rot_trans with float DH constants)
        r_j = (ct, -st * ca, st * sa, st, ct * ca, -ct * sa,
               0.0, sa, ca)
        t_j = (a * ct, a * st, d)
        # transform_compose inline (floats broadcast)
        a00, a01, a02, a10, a11, a12, a20, a21, a22 = r_acc
        b00, b01, b02, b10, b11, b12, b20, b21, b22 = r_j
        r_acc = (a00 * b00 + a01 * b10 + a02 * b20,
                 a00 * b01 + a01 * b11 + a02 * b21,
                 a00 * b02 + a01 * b12 + a02 * b22,
                 a10 * b00 + a11 * b10 + a12 * b20,
                 a10 * b01 + a11 * b11 + a12 * b21,
                 a10 * b02 + a11 * b12 + a12 * b22,
                 a20 * b00 + a21 * b10 + a22 * b20,
                 a20 * b01 + a21 * b11 + a22 * b21,
                 a20 * b02 + a21 * b12 + a22 * b22)
        tx, ty, tz = t_j
        t_acc = (t_acc[0] + a00 * tx + a01 * ty + a02 * tz,
                 t_acc[1] + a10 * tx + a11 * ty + a12 * tz,
                 t_acc[2] + a20 * tx + a21 * ty + a22 * tz)
        frames.append((r_acc, t_acc))
    pts = []
    for fi, (ox, oy, oz) in point_specs:
        r, t = frames[fi - 1]
        if (ox, oy, oz) == _ZERO3:
            pts.append(t)
        else:
            pts.append((t[0] + r[0] * ox + r[1] * oy + r[2] * oz,
                        t[1] + r[3] * ox + r[4] * oy + r[5] * oz,
                        t[2] + r[6] * ox + r[7] * oy + r[8] * oz))
    return axes, pts


def _score_grad_block(pts, s_ref, w_ref, score_ref, f_pad, dt):
    """Shared kernel block: component-major points -> polyharmonic score
    (written to score_ref) and a per-row point-gradient accessor."""
    comps = []
    for p in pts:
        comps.extend(p)
    zero_row = jnp.zeros_like(comps[0])
    comps.extend([zero_row] * (f_pad - len(comps)))
    xT = jnp.concatenate(comps, axis=0)            # [F_pad, TB]
    s = s_ref[:].astype(jnp.float32)               # [S, F_pad]
    wv = w_ref[:].astype(jnp.float32)              # [S, 1]
    x2 = jnp.sum(xT * xT, axis=0, keepdims=True)   # [1, TB]
    s2 = jnp.sum(s * s, axis=1, keepdims=True)     # [S, 1]
    sx = jax.lax.dot_general(
        s.astype(dt), xT.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [S, TB]
    d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
    rinv = jax.lax.rsqrt(d2)
    r = d2 * rinv                                  # sqrt(d2)
    score_ref[:] = jax.lax.dot_general(
        wv.astype(dt).T, r.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [1, TB]
    # rowsum (w^T rinv) rides as an extra column of the su matmul — one
    # [S, F+1]^T x [S, TB] MXU op over the shared rinv cast instead of two
    rinv_dt = rinv.astype(dt)
    su_row = jax.lax.dot_general(
        jnp.concatenate([s * wv, wv], axis=1).astype(dt), rinv_dt,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [F_pad + 1, TB]
    su = su_row[:-1]
    rowsum = su_row[-1:]

    def g_comp(row):
        # dscore/dpoint, per point k: rows 3k..3k+2 of xT*rowsum - su
        return xT[row:row + 1, :] * rowsum - su[row:row + 1, :]

    return g_comp


def _make_dh_score_kernel(dh_const, point_specs, base, n_joints, n_pts,
                          f_pad, use_bf16: bool):
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    frame_ids = [fi for fi, _ in point_specs]

    def kernel(qT_ref, s_ref, w_ref, score_ref, dqT_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        axes, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        g_comp = _score_grad_block(pts, s_ref, w_ref, score_ref, f_pad, dt)
        # FK backward: suffix sums over points in reverse chain order
        zero_row = jnp.zeros_like(score_ref[:])
        sg = [zero_row for _ in range(3)]
        sm = [zero_row for _ in range(3)]
        k = n_pts - 1
        for j in range(n_joints, 0, -1):
            while k >= 0 and frame_ids[k] >= j:
                g = (g_comp(3 * k), g_comp(3 * k + 1), g_comp(3 * k + 2))
                p = pts[k]
                cx, cy, cz = _cross(p, g)
                sm = [sm[0] + cx, sm[1] + cy, sm[2] + cz]
                sg = [sg[0] + g[0], sg[1] + g[1], sg[2] + g[2]]
                k -= 1
            z, o = axes[j - 1]
            ox_, oy_, oz_ = _cross(o, sg)
            dqT_ref[j - 1:j, :] = (z[0] * (sm[0] - ox_)
                                   + z[1] * (sm[1] - oy_)
                                   + z[2] * (sm[2] - oz_))

    return kernel


# ONE tile policy for both fused kernels — the measured roofline version
# lives in fused_score (see its docstring for the sweep numbers)
_tile_b = _fused_tile_b


def _make_dh_multi_score_kernel(dh_const, point_specs, base, n_joints,
                                n_pts, f_pad, n_class, use_bf16: bool):
    """Multi-class variant of _make_dh_score_kernel (ref MultiDiffCo
    rbf_score, kernel_perceptrons.py:679-692): per-class gain columns
    over a SHARED support set. The FK forward, the [S, TB] distance
    block, and the single rsqrt sweep — the VPU-bound majority of the
    kernel (benchmarks/roofline.json) — are computed once and shared by
    all classes; per-class work is one widened MXU matmul (the C score
    rows ride the same r cast, the C su/rowsum blocks ride one
    [S, C*(F+1)] x [S, TB] matmul over the shared rinv cast) plus C
    suffix-sum backwards."""
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    frame_ids = [fi for fi, _ in point_specs]
    fp1 = f_pad + 1

    def kernel(qT_ref, s_ref, w_ref, score_ref, dqT_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        axes, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        comps = []
        for p in pts:
            comps.extend(p)
        zero_row = jnp.zeros_like(comps[0])
        comps.extend([zero_row] * (f_pad - len(comps)))
        xT = jnp.concatenate(comps, axis=0)            # [F_pad, TB]
        s = s_ref[:].astype(jnp.float32)               # [S, F_pad]
        W = w_ref[:].astype(jnp.float32)               # [S, C]
        x2 = jnp.sum(xT * xT, axis=0, keepdims=True)   # [1, TB]
        s2 = jnp.sum(s * s, axis=1, keepdims=True)     # [S, 1]
        sx = jax.lax.dot_general(
            s.astype(dt), xT.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, TB]
        d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
        rinv = jax.lax.rsqrt(d2)
        r = d2 * rinv
        score_ref[:] = jax.lax.dot_general(
            W.astype(dt), r.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [C, TB]
        rinv_dt = rinv.astype(dt)
        swv = jnp.concatenate(
            [jnp.concatenate([s * W[:, c:c + 1], W[:, c:c + 1]], axis=1)
             for c in range(n_class)], axis=1)         # [S, C*(F_pad+1)]
        su_all = jax.lax.dot_general(
            swv.astype(dt), rinv_dt,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [C*(F_pad+1), TB]
        for c in range(n_class):
            su = su_all[c * fp1:c * fp1 + f_pad]
            rowsum = su_all[c * fp1 + f_pad:c * fp1 + fp1]

            def g_comp(row, su=su, rowsum=rowsum):
                return xT[row:row + 1, :] * rowsum - su[row:row + 1, :]

            sg = [zero_row for _ in range(3)]
            sm = [zero_row for _ in range(3)]
            k = n_pts - 1
            for j in range(n_joints, 0, -1):
                while k >= 0 and frame_ids[k] >= j:
                    g = (g_comp(3 * k), g_comp(3 * k + 1),
                         g_comp(3 * k + 2))
                    p = pts[k]
                    cx, cy, cz = _cross(p, g)
                    sm = [sm[0] + cx, sm[1] + cy, sm[2] + cz]
                    sg = [sg[0] + g[0], sg[1] + g[1], sg[2] + g[2]]
                    k -= 1
                z, o = axes[j - 1]
                ox_, oy_, oz_ = _cross(o, sg)
                dqT_ref[c * n_joints + j - 1:c * n_joints + j, :] = (
                    z[0] * (sm[0] - ox_) + z[1] * (sm[1] - oy_)
                    + z[2] * (sm[2] - oz_))

    return kernel


@functools.partial(jax.jit, static_argnames=('spec', 'use_bf16'))
def _dh_multi_score_grad_pallas(q, s, W, spec, use_bf16=True):
    """q [B, J], W [S, C] -> (score [B, C], dscore_c/dq [C, B, J])
    through the fused multi-class FK+score+grad kernel."""
    dh_const, point_specs, base = spec
    n_joints = len(dh_const)
    n_pts = len(point_specs)
    F = 3 * n_pts
    f_pad = _round_up(F, 8)
    B = q.shape[0]
    S = s.shape[0]
    C = W.shape[1]
    TB = _tile_b(S)
    Bp = _round_up(max(B, 128), TB)
    qT = q.T
    if Bp != B:
        qT = jnp.zeros((n_joints, Bp), q.dtype).at[:, :B].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    kernel = _make_dh_multi_score_kernel(dh_const, point_specs, base,
                                         n_joints, n_pts, f_pad, C,
                                         use_bf16)
    score, dqT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((C, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((C * n_joints, Bp), jnp.float32)),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((n_joints, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((C, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((C * n_joints, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=(4 + 2 * C) * Bp * S * f_pad + 500 * C * Bp,
            bytes_accessed=Bp * (n_joints * 8 + 4 * C) + S * f_pad * 4,
            transcendentals=Bp * S + 2 * n_joints * Bp),
        interpret=_interpret(),
    )(qT, sp, W)
    return (score[:, :B].T,
            dqT.reshape(C, n_joints, Bp)[:, :, :B].transpose(0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dh_polyharmonic_multi_score(q, supports, W, spec):
    """Per-class polyharmonic DiffCo scores through DH-chain FK, [B, C]
    (ref MultiDiffCo.rbf_score, kernel_perceptrons.py:679-692); one
    fused kernel computes all class scores and their configuration
    gradients (the VJP residual) in a single pass over the shared
    support tile.

    DIFFERENTIATION CONTRACT: same as dh_polyharmonic_score —
    differentiable w.r.t. ``q`` only; supports/W are trained constants
    (zero cotangents) and forward mode raises."""
    score, _ = _dh_multi_score_grad_pallas(q, supports, W, spec)
    return score


def _dhpms_fwd(q, supports, W, spec):
    score, dq = _dh_multi_score_grad_pallas(q, supports, W, spec)
    return score, (dq, supports, W)


def _dhpms_bwd(spec, res, g):
    dq, supports, W = res                       # dq [C, B, J], g [B, C]
    dq_out = jnp.einsum('bc,cbj->bj', g, dq)
    return (dq_out, jnp.zeros_like(supports), jnp.zeros_like(W))


dh_polyharmonic_multi_score.defvjp(_dhpms_fwd, _dhpms_bwd)


def _make_chain_multi_score_kernel(cs, n_dofs, f_pad, n_class,
                                   use_bf16: bool):
    """General ChainSpec variant of the multi-class kernel: shared chain
    FK + distance/rsqrt sweep, per-class score/su rows, per-class
    moving-ancestor backward (trees don't admit the DH suffix-sum
    ordering — same as _make_chain_score_kernel)."""
    from ..robots.fk_jvp import eval_chain, _REVOLUTE
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    fp1 = f_pad + 1

    def kernel(qT_ref, s_ref, w_ref, score_ref, dqT_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_dofs)]
        zb = jnp.zeros_like(q_rows[0])
        joints, pts = eval_chain(cs, q_rows, zb)
        comps = []
        for p in pts:
            comps.extend(p)
        zero_row = jnp.zeros_like(comps[0])
        comps.extend([zero_row] * (f_pad - len(comps)))
        xT = jnp.concatenate(comps, axis=0)
        s = s_ref[:].astype(jnp.float32)
        W = w_ref[:].astype(jnp.float32)
        x2 = jnp.sum(xT * xT, axis=0, keepdims=True)
        s2 = jnp.sum(s * s, axis=1, keepdims=True)
        sx = jax.lax.dot_general(
            s.astype(dt), xT.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
        rinv = jax.lax.rsqrt(d2)
        r = d2 * rinv
        score_ref[:] = jax.lax.dot_general(
            W.astype(dt), r.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rinv_dt = rinv.astype(dt)
        swv = jnp.concatenate(
            [jnp.concatenate([s * W[:, c:c + 1], W[:, c:c + 1]], axis=1)
             for c in range(n_class)], axis=1)
        su_all = jax.lax.dot_general(
            swv.astype(dt), rinv_dt,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for c in range(n_class):
            su = su_all[c * fp1:c * fp1 + f_pad]
            rowsum = su_all[c * fp1 + f_pad:c * fp1 + fp1]

            def g_comp(row, su=su, rowsum=rowsum):
                return xT[row:row + 1, :] * rowsum - su[row:row + 1, :]

            dq_acc = [jnp.zeros_like(rowsum) for _ in range(n_dofs)]
            for k, chain in enumerate(cs.point_chains):
                g = (g_comp(3 * k), g_comp(3 * k + 1), g_comp(3 * k + 2))
                p = pts[k]
                for i in chain:
                    z, o = joints[i]
                    if cs.jtype[i] == _REVOLUTE:
                        rx = (p[0] - o[0], p[1] - o[1], p[2] - o[2])
                        cx, cy, cz = _cross(z, rx)
                        val = cx * g[0] + cy * g[1] + cz * g[2]
                    else:  # PRISMATIC
                        val = z[0] * g[0] + z[1] * g[1] + z[2] * g[2]
                    d = cs.dof_idx[i]
                    dq_acc[d] = dq_acc[d] + cs.m_mult[i] * val
            for d in range(n_dofs):
                dqT_ref[c * n_dofs + d:c * n_dofs + d + 1, :] = dq_acc[d]

    return kernel


@functools.partial(jax.jit, static_argnames=('cs', 'use_bf16'))
def _chain_multi_score_grad_pallas(q, s, W, cs, use_bf16=True):
    """q [B, D], W [S, C] -> (score [B, C], dscore_c/dq [C, B, D])."""
    n_dofs = cs.n_dofs
    F = 3 * len(cs.point_specs)
    f_pad = _round_up(F, 8)
    B = q.shape[0]
    S = s.shape[0]
    C = W.shape[1]
    TB = _tile_b(S)
    Bp = _round_up(max(B, 128), TB)
    qT = q.T
    if Bp != B:
        qT = jnp.zeros((n_dofs, Bp), q.dtype).at[:, :B].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    kernel = _make_chain_multi_score_kernel(cs, n_dofs, f_pad, C, use_bf16)
    score, dqT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((C, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((C * n_dofs, Bp), jnp.float32)),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((n_dofs, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((C, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((C * n_dofs, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=(4 + 2 * C) * Bp * S * f_pad + 2000 * C * Bp,
            bytes_accessed=Bp * (n_dofs * 8 + 4 * C) + S * f_pad * 4,
            transcendentals=Bp * S + 2 * n_dofs * Bp),
        interpret=_interpret(),
    )(qT, sp, W)
    return (score[:, :B].T,
            dqT.reshape(C, n_dofs, Bp)[:, :, :B].transpose(0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chain_polyharmonic_multi_score(q, supports, W, cs):
    """URDF-chain counterpart of dh_polyharmonic_multi_score, [B, C].
    Same differentiation contract: ``q`` only, forward mode raises."""
    score, _ = _chain_multi_score_grad_pallas(q, supports, W, cs)
    return score


def _cpms_fwd(q, supports, W, cs):
    score, dq = _chain_multi_score_grad_pallas(q, supports, W, cs)
    return score, (dq, supports, W)


def _cpms_bwd(cs, res, g):
    dq, supports, W = res
    return (jnp.einsum('bc,cbj->bj', g, dq),
            jnp.zeros_like(supports), jnp.zeros_like(W))


chain_polyharmonic_multi_score.defvjp(_cpms_fwd, _cpms_bwd)


def fk_polyharmonic_multi_score_auto(q, robot, supports, W,
                                     valid_mask=None,
                                     epsilon: float = 1.0):
    """Multi-class counterpart of fk_polyharmonic_score_auto: route
    ``scores(fkine(q)) [B, C]`` through the fused multi-class kernel
    when available (DH or URDF chain), else FK + the XLA kernel-matvec
    formulation."""
    if valid_mask is not None:
        W = W * valid_mask.astype(W.dtype)[:, None]
    if epsilon != 1.0:
        W = W / epsilon
    if dh_score_grad_available(robot, q.shape[0]):
        spec = getattr(robot, '_dh_spec_cache', None)
        if spec is None:
            spec = robot_spec(robot)
            robot._dh_spec_cache = spec
        return dh_polyharmonic_multi_score(q, supports, W, spec)
    if chain_score_grad_available(robot, q.shape[0]):
        cs = getattr(robot, '_chain_statics_cache', None)
        if cs is None:
            cs = robot_chain_statics(robot)
            robot._chain_statics_cache = cs
        return chain_polyharmonic_multi_score(q, supports, W, cs)
    pts = robot.fkine(q)
    pts = pts.reshape(q.shape[0], -1)
    d2 = (jnp.sum(pts * pts, axis=1, keepdims=True)
          + jnp.sum(supports * supports, axis=1)[None, :]
          - 2.0 * jnp.matmul(pts, supports.T, precision='highest'))
    r = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
    return jnp.matmul(r, W, precision='highest')


@functools.partial(jax.jit, static_argnames=('spec', 'use_bf16'))
def _dh_score_grad_pallas(q, s, w, spec, use_bf16=True):
    """q [B, J] -> (score [B], dscore/dq [B, J]) through the fused
    FK+score+grad kernel. ``spec`` = (dh_const, point_specs, base) as
    nested float tuples (hashable, baked into the kernel)."""
    dh_const, point_specs, base = spec
    n_joints = len(dh_const)
    n_pts = len(point_specs)
    F = 3 * n_pts
    f_pad = _round_up(F, 8)
    B = q.shape[0]
    S = s.shape[0]
    TB = _tile_b(S)
    Bp = _round_up(max(B, 128), TB)
    qT = q.T
    if Bp != B:
        qT = jnp.zeros((n_joints, Bp), q.dtype).at[:, :B].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    kernel = _make_dh_score_kernel(dh_const, point_specs, base,
                                   n_joints, n_pts, f_pad, use_bf16)
    score, dqT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n_joints, Bp), jnp.float32)),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((n_joints, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_joints, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * S * f_pad + 500 * Bp,
            bytes_accessed=Bp * (n_joints * 8 + 4) + S * f_pad * 4,
            transcendentals=Bp * S + 2 * n_joints * Bp),
        interpret=_interpret(),
    )(qT, sp, w.reshape(S, 1))
    return score[0, :B], dqT[:, :B].T


def _make_chain_score_kernel(cs, n_dofs, f_pad, use_bf16: bool):
    """General ChainSpec variant of the DH kernel: the tile FK is the
    shared SoA evaluator (robots/fk_jvp.eval_chain) on [1, TB] rows; the
    backward accumulates per-dof via the per-point moving-ancestor sets
    (trees don't admit the DH suffix-sum ordering)."""
    from ..robots.fk_jvp import eval_chain, _REVOLUTE
    dt = jnp.bfloat16 if use_bf16 else jnp.float32

    def kernel(qT_ref, s_ref, w_ref, score_ref, dqT_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_dofs)]
        zb = jnp.zeros_like(q_rows[0])
        joints, pts = eval_chain(cs, q_rows, zb)
        g_comp = _score_grad_block(pts, s_ref, w_ref, score_ref, f_pad, dt)
        dq_acc = [jnp.zeros_like(score_ref[:]) for _ in range(n_dofs)]
        for k, chain in enumerate(cs.point_chains):
            g = (g_comp(3 * k), g_comp(3 * k + 1), g_comp(3 * k + 2))
            p = pts[k]
            for i in chain:
                z, o = joints[i]
                if cs.jtype[i] == _REVOLUTE:
                    rx = (p[0] - o[0], p[1] - o[1], p[2] - o[2])
                    cx, cy, cz = _cross(z, rx)
                    val = cx * g[0] + cy * g[1] + cz * g[2]
                else:  # PRISMATIC
                    val = z[0] * g[0] + z[1] * g[1] + z[2] * g[2]
                d = cs.dof_idx[i]
                dq_acc[d] = dq_acc[d] + cs.m_mult[i] * val
        for d in range(n_dofs):
            dqT_ref[d:d + 1, :] = dq_acc[d]

    return kernel


@functools.partial(jax.jit, static_argnames=('cs', 'use_bf16'))
def _chain_score_grad_pallas(q, s, w, cs, use_bf16=True):
    """q [B, D] -> (score [B], dscore/dq [B, D]) through the fused
    chain-FK+score+grad kernel. ``cs`` is a ChainStatics (hashable)."""
    n_dofs = cs.n_dofs
    F = 3 * len(cs.point_specs)
    f_pad = _round_up(F, 8)
    B = q.shape[0]
    S = s.shape[0]
    TB = _tile_b(S)
    Bp = _round_up(max(B, 128), TB)
    qT = q.T
    if Bp != B:
        qT = jnp.zeros((n_dofs, Bp), q.dtype).at[:, :B].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    kernel = _make_chain_score_kernel(cs, n_dofs, f_pad, use_bf16)
    score, dqT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n_dofs, Bp), jnp.float32)),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((n_dofs, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_dofs, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * S * f_pad + 2000 * Bp,
            bytes_accessed=Bp * (n_dofs * 8 + 4) + S * f_pad * 4,
            transcendentals=Bp * S + 2 * n_dofs * Bp),
        interpret=_interpret(),
    )(qT, sp, w.reshape(S, 1))
    return score[0, :B], dqT[:, :B].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chain_polyharmonic_score(q, supports, weights, cs):
    """URDF-chain counterpart of dh_polyharmonic_score, [B, 1].

    DIFFERENTIATION CONTRACT: same as dh_polyharmonic_score — ``q`` only;
    supports/weights are constants (zero cotangents), forward mode raises.
    """
    score, _ = _chain_score_grad_pallas(q, supports, weights, cs)
    return score[:, None]


def _cps_fwd(q, supports, weights, cs):
    score, dq = _chain_score_grad_pallas(q, supports, weights, cs)
    return score[:, None], (dq, supports, weights)


def _cps_bwd(cs, res, g):
    dq, supports, weights = res
    return (g * dq, jnp.zeros_like(supports), jnp.zeros_like(weights))


chain_polyharmonic_score.defvjp(_cps_fwd, _cps_bwd)


def robot_chain_statics(robot):
    """ChainStatics for a URDFRobot's control-point fkine, or None if the
    robot has no unique-position links."""
    from ..robots.fk_jvp import chain_statics
    sel = [robot.spec.link_index(n)
           for n in robot.spec.unique_position_link_names]
    if not sel:
        return None
    base = (None if robot.base_rot is None
            else (robot.base_rot, robot.base_trans))
    return chain_statics(robot.spec,
                         tuple((li, (0.0, 0.0, 0.0)) for li in sel),
                         base=base)


def robot_spec(robot) -> Tuple:
    """Hashable (dh_const, point_specs, base) spec for a DHChainRobot."""
    dh_const = tuple(tuple(float(v) for v in row)
                     for row in robot._dh_const)
    point_specs = tuple((int(fi), tuple(float(v) for v in off))
                        for fi, off in robot._point_specs)
    # the fused kernel's suffix-sum backward (_make_dh_score_kernel)
    # requires non-decreasing frame ids, same as make_dh_fkine
    # (fk_jvp.py asserts it); a subclass violating it would get silently
    # wrong gradients from the Pallas route while the XLA route stays right
    frame_ids = [fi for fi, _ in point_specs]
    if not all(a <= b for a, b in zip(frame_ids, frame_ids[1:])):
        # hard error (not assert: python -O must not strip a guard whose
        # failure mode is silently wrong gradients)
        raise ValueError(
            'point_specs frame indices must be non-decreasing for the '
            f'fused DH score kernel backward pass, got {frame_ids}')
    base = robot._base_soa()
    if base is not None:
        base = (tuple(base[0]), tuple(base[1]))
    return (dh_const, point_specs, base)


# In compiled (scan/jit) contexts the fused q-kernel wins at EVERY batch
# size measured (3.2x at B=1024, 2.4x at 65536 — benchmarks/RESULTS.md);
# eager single dispatches are tunnel-latency-bound either way. The gate
# exists for a different reason: dh_polyharmonic_score is custom_vjp
# (one fused pass computes the VJP residual), which forbids forward-mode
# — jax.hessian through a >= 4096-point score batch does not occur in
# this codebase (trust-constr Hessians run on ~100-point dense paths),
# so 4096 keeps those paths on the twice-differentiable XLA route.
_FK_FUSED_MIN_BATCH = 4096


def dh_score_grad_available(robot, batch: int) -> bool:
    from ..robots.analytic import DHChainRobot
    return (fused_score_available() and isinstance(robot, DHChainRobot)
            and batch >= _FK_FUSED_MIN_BATCH)


def chain_score_grad_available(robot, batch: int) -> bool:
    from ..robots.urdf import URDFRobot
    return (fused_score_available() and isinstance(robot, URDFRobot)
            and batch >= _FK_FUSED_MIN_BATCH
            and getattr(robot, '_fkine_sel', None) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dh_polyharmonic_score(q, supports, weights, spec):
    """Polyharmonic DiffCo score through DH-chain FK, [B, 1]; one fused
    kernel computes the score and its configuration gradient (the VJP
    residual) in a single pass.

    DIFFERENTIATION CONTRACT: differentiable w.r.t. ``q`` ONLY.
    ``supports``/``weights`` are treated as trained constants — their
    cotangents are defined as zero (the fused backward never computes
    them), and forward mode (jvp/jacfwd/hessian) raises because this is a
    custom_vjp. Callers that need d(score)/d(supports or weights), or any
    forward-mode derivative, must stay on the small-batch XLA route
    (fused_score.polyharmonic_score below _FK_FUSED_MIN_BATCH), which is
    twice-differentiable in every argument.
    """
    score, _ = _dh_score_grad_pallas(q, supports, weights, spec)
    return score[:, None]


def _dhps_fwd(q, supports, weights, spec):
    score, dq = _dh_score_grad_pallas(q, supports, weights, spec)
    return score[:, None], (dq, supports, weights)


def _dhps_bwd(spec, res, g):
    dq, supports, weights = res
    return (g * dq, jnp.zeros_like(supports), jnp.zeros_like(weights))


dh_polyharmonic_score.defvjp(_dhps_fwd, _dhps_bwd)


def fk_polyharmonic_score_auto(q, robot, supports, weights,
                               valid_mask=None, epsilon: float = 1.0):
    """Route ``score(fkine(q))`` through the fully-fused kernel when
    available (DH or URDF chain), else FK + the fused/XLA score op."""
    w = weights.reshape(-1)
    if valid_mask is not None:
        w = w * valid_mask.astype(w.dtype)
    if epsilon != 1.0:
        w = w / epsilon
    from ..robots.analytic import DHChainRobot
    if dh_score_grad_available(robot, q.shape[0]):
        spec = getattr(robot, '_dh_spec_cache', None)
        if spec is None:
            spec = robot_spec(robot)
            robot._dh_spec_cache = spec
        return dh_polyharmonic_score(q, supports, w, spec)
    if chain_score_grad_available(robot, q.shape[0]):
        cs = getattr(robot, '_chain_statics_cache', None)
        if cs is None:
            cs = robot_chain_statics(robot)
            robot._chain_statics_cache = cs
        return chain_polyharmonic_score(q, supports, w, cs)
    if isinstance(robot, DHChainRobot):
        pts = robot.fkine(q, flat=True)        # skips the [B, P, 3] reshape
    else:
        pts = robot.fkine(q) if hasattr(robot, 'fkine') else robot(q)
    return polyharmonic_score(pts.reshape(q.shape[0], -1), supports, w)


# name kept from before the URDF-chain generalization
dh_polyharmonic_score_auto = fk_polyharmonic_score_auto
