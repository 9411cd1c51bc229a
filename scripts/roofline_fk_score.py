#!/usr/bin/env python
"""Roofline analysis of the fused FK+score+grad Pallas kernel.

Times ablated variants of the flagship kernel (ops/fk_score.py,
B=65536 x S=512 Panda shapes — the bench.py headline) to attribute the
step time to MXU matmuls vs the [S, TB] VPU elementwise/rsqrt sweep vs
the FK forward/backward chains, and sweeps the batch-tile size.

Measurement method: each variant runs inside a lax.scan whose carry
depends on the variant's output, timed at two scan lengths; the per-step
time is the difference quotient. A single dispatch over the remote
tunnel costs ~30 ms — more than 80 kernel invocations — so naive
one-call timing measures the tunnel, not the kernel.

Writes benchmarks/roofline.json. Run on the real TPU:
    python scripts/roofline_fk_score.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from diffco_tpu.ops import fk_score as fks
from diffco_tpu.ops.fk_score import (_dh_chain_tile, _score_grad_block,
                                     _round_up, robot_spec)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 65536
S = 512
N_SHORT, N_LONG = 20, 120
REPS = 6


def _setup():
    from __graft_entry__ import _flagship_score_setup
    robot, sup, w = _flagship_score_setup(n_supports=S)
    q = robot.rand_configs(B, jax.random.PRNGKey(0))
    return robot, sup, w, q


def _best(fn, *args):
    jax.block_until_ready(fn(*args))    # compile
    best = float('inf')
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_step_ms(step_fn, q):
    """step_fn: q -> q' (carry-dependent). Per-step time from the scan
    length difference, cancelling the constant dispatch overhead."""
    def scanned(n):
        @jax.jit
        def run(qq):
            return jax.lax.scan(lambda c, _: (step_fn(c), None), qq,
                                None, length=n)[0]
        return run

    t_short = _best(scanned(N_SHORT), q)
    t_long = _best(scanned(N_LONG), q)
    return (t_long - t_short) / (N_LONG - N_SHORT) * 1e3


def _ablation_call(kernel, n_joints, f_pad, TB, q, s, w):
    """pallas_call plumbing shared by the ablated kernels (mirrors
    _dh_score_grad_pallas but with a single [1, B] output)."""
    Bp = _round_up(max(q.shape[0], 128), TB)
    qT = q.T
    if Bp != q.shape[0]:
        qT = jnp.zeros((n_joints, Bp), q.dtype).at[:, :q.shape[0]].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((n_joints, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(qT, sp, w.reshape(S, 1))


def make_ablations(robot):
    """Ablated kernels over the same inputs: fk_only, mxu (FK + main
    matmul), mxu_rsqrt (+ d2 + rsqrt sweep), fwd (FK + the full score
    block with the backward-projection matmuls dead-code-eliminated)."""
    spec = robot_spec(robot)
    dh_const, point_specs, base = spec
    n_joints = len(dh_const)
    n_pts = len(point_specs)
    f_pad = _round_up(3 * n_pts, 8)
    dt = jnp.bfloat16

    def fk_only(qT_ref, s_ref, w_ref, out_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        _, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        acc = jnp.zeros_like(qT_ref[0:1, :])
        for p in pts:
            acc = acc + p[0] + p[1] + p[2]
        out_ref[:] = acc

    def _common(qT_ref, s_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        _, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        comps = []
        for p in pts:
            comps.extend(p)
        zero_row = jnp.zeros_like(comps[0])
        comps.extend([zero_row] * (f_pad - len(comps)))
        xT = jnp.concatenate(comps, axis=0)
        s = s_ref[:].astype(jnp.float32)
        sx = jax.lax.dot_general(
            s.astype(dt), xT.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return xT, s, sx

    def mxu(qT_ref, s_ref, w_ref, out_ref):
        xT, s, sx = _common(qT_ref, s_ref)
        out_ref[:] = jnp.sum(sx, axis=0, keepdims=True)

    def mxu_rsqrt(qT_ref, s_ref, w_ref, out_ref):
        xT, s, sx = _common(qT_ref, s_ref)
        x2 = jnp.sum(xT * xT, axis=0, keepdims=True)
        s2 = jnp.sum(s * s, axis=1, keepdims=True)
        d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
        rinv = jax.lax.rsqrt(d2)
        r = d2 * rinv
        out_ref[:] = (jnp.sum(r, axis=0, keepdims=True)
                      + jnp.sum(rinv, axis=0, keepdims=True))

    def fwd(qT_ref, s_ref, w_ref, out_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        _, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        g_comp = _score_grad_block(pts, s_ref, w_ref, out_ref, f_pad, dt)
        del g_comp           # score written; backward matmuls are dead

    return {'fk_only': fk_only, 'mxu': mxu, 'mxu_rsqrt': mxu_rsqrt,
            'fwd': fwd}, n_joints, f_pad


def make_mv_full(robot, mv_f32):
    """Candidate optimization A/B: keep the big [S,F]x[F,TB] distance
    matmul in bf16; run the score/rowsum/su matvecs either in f32
    (mv_f32=True — skips the bf16 casts of the full [S, TB] r/rinv
    arrays, the roofline's residual VPU cost) or bf16 (production
    math, identical plumbing — the fair baseline). Full kernel incl.
    FK backward, single combined output for timing."""
    spec = robot_spec(robot)
    dh_const, point_specs, base = spec
    n_joints = len(dh_const)
    n_pts = len(point_specs)
    f_pad = _round_up(3 * n_pts, 8)
    frame_ids = [fi for fi, _ in point_specs]

    def kernel(qT_ref, s_ref, w_ref, out_ref):
        q_rows = [qT_ref[i:i + 1, :] for i in range(n_joints)]
        axes, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
        comps = []
        for p in pts:
            comps.extend(p)
        zero_row = jnp.zeros_like(comps[0])
        comps.extend([zero_row] * (f_pad - len(comps)))
        xT = jnp.concatenate(comps, axis=0)
        s = s_ref[:].astype(jnp.float32)
        wv = w_ref[:].astype(jnp.float32)
        x2 = jnp.sum(xT * xT, axis=0, keepdims=True)
        s2 = jnp.sum(s * s, axis=1, keepdims=True)
        sx = jax.lax.dot_general(
            s.astype(jnp.bfloat16), xT.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
        rinv = jax.lax.rsqrt(d2)
        r = d2 * rinv
        mdt = jnp.float32 if mv_f32 else jnp.bfloat16
        score = jax.lax.dot_general(
            wv.astype(mdt).T, r.astype(mdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        su_row = jax.lax.dot_general(
            jnp.concatenate([s * wv, wv], axis=1).astype(mdt),
            rinv.astype(mdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        su = su_row[:-1]
        rowsum = su_row[-1:]

        def g_comp(row):
            return xT[row:row + 1, :] * rowsum - su[row:row + 1, :]

        acc = score
        sg = [jnp.zeros_like(score) for _ in range(3)]
        sm = [jnp.zeros_like(score) for _ in range(3)]
        k = n_pts - 1
        from diffco_tpu.ops.fk_score import _cross
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
            acc = acc + (z[0] * (sm[0] - ox_) + z[1] * (sm[1] - oy_)
                         + z[2] * (sm[2] - oz_))
        out_ref[:] = acc

    return kernel, n_joints, f_pad


def main():
    assert jax.default_backend() != 'cpu', 'roofline needs the TPU'
    robot, sup, w, q = _setup()
    spec = robot_spec(robot)
    results = {'B': B, 'S': S, 'backend': jax.default_backend(),
               'method': f'scan differencing ({N_SHORT} vs {N_LONG})'}

    # --- the bench-loop step: full kernel + value_and_grad + axpy --------
    def total(qq):
        return fks.fk_polyharmonic_score_auto(qq, robot, sup, w).sum()

    def bench_step(qq):
        _, g = jax.value_and_grad(total)(qq)
        return qq - 1e-4 * g

    results['bench_step_ms'] = _per_step_ms(bench_step, q)

    # --- full fused kernel alone (score + dq, no outer axpy) -------------
    def full_step(qq):
        score, dq = fks._dh_score_grad_pallas(qq, sup, w, spec)
        return qq - 1e-6 * dq + 1e-9 * score[0]

    results['full_kernel_ms'] = _per_step_ms(full_step, q)

    # --- ablations at the default tile ----------------------------------
    TB0 = fks._tile_b(S)
    results['tile_default'] = TB0
    kernels, n_joints, f_pad = make_ablations(robot)

    def make_step(kern, TB):
        def step(qq):
            out = _ablation_call(kern, n_joints, f_pad, TB, qq, sup, w)
            return qq + 1e-9 * out[0, :B, None]
        return step

    for name, kern in kernels.items():
        results[f'{name}_ms'] = _per_step_ms(make_step(kern, TB0), q)

    # --- candidate: f32 matvecs (skip r/rinv bf16 casts) vs bf16 twin ----
    for label, mvf in (('mv_bf16_full', False), ('mv_f32_full', True)):
        kern, nj, fp = make_mv_full(robot, mvf)
        results[f'{label}_ms'] = _per_step_ms(
            make_step(kern, TB0), q)

    # --- tile-size sweep on the full kernel ------------------------------
    orig_tile_b = fks._tile_b
    sweep = {}
    try:
        for tb in (256, 512, 1024, 2048):
            fks._tile_b = lambda s, _tb=tb: _tb
            fks._dh_score_grad_pallas.clear_cache()
            try:
                sweep[str(tb)] = _per_step_ms(full_step, q)
            except Exception as e:          # VMEM overflow etc.
                sweep[str(tb)] = f'failed: {type(e).__name__}'
    finally:
        fks._tile_b = orig_tile_b
        fks._dh_score_grad_pallas.clear_cache()
    results['tile_sweep_full_ms'] = sweep

    # --- derived roofline numbers ----------------------------------------
    t_full = results['full_kernel_ms'] / 1e3
    flops = 3 * 2 * B * S * f_pad            # three [*,S]x[S,TB] matmuls
    results['f_pad'] = f_pad
    results['mxu_flops_per_call'] = flops
    results['evals_per_sec_full'] = B / t_full
    results['implied_tflops_full'] = flops / t_full / 1e12
    el_ops = B * S                           # rsqrt count
    results['rsqrt_per_call'] = el_ops
    results['rsqrt_rate_G_per_s_if_bound'] = el_ops / t_full / 1e9

    os.makedirs('benchmarks', exist_ok=True)
    with open('benchmarks/roofline.json', 'w') as f:
        json.dump(results, f, indent=1)
    for k, v in results.items():
        print(f'{k}: {v}')


if __name__ == '__main__':
    main()
