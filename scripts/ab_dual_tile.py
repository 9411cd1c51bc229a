"""A/B: dual-half-tile MXU/VPU software pipelining in the fused DH kernel.

Roofline (benchmarks/roofline.json): at B=65536, S=512, TB=1024 the full
kernel runs 0.21 ms/step of which ~0.06 ms is MXU and ~0.15 ms VPU
(FK fwd + rsqrt + backward). Perfect MXU/VPU overlap would approach
max(VPU, MXU) ~= 0.15 ms (~1.4x). Mosaic schedules statically within the
kernel; splitting each batch tile into two halves and interleaving their
stages in program order gives the scheduler an MXU op to issue during
every VPU stage. This script measures:

  prod        — production kernel (TB = 1024)
  dual_seq    — two 512 halves processed fully sequentially (control:
                separates "smaller matmuls" from "interleaving")
  dual_pipe   — staged interleave (software pipeline)

Timing: fori_loop scan differencing (20 vs 120 trips), min over reps —
same method as bench.py.
"""
import functools
import json
import sys
import time

sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_score_setup
from diffco_tpu.ops.fk_score import (_dh_chain_tile, _cross, robot_spec,
                                     _dh_score_grad_pallas)
from diffco_tpu.ops.fused_score import _round_up

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16


def _half_stage1(q_rows, dh_const, point_specs, base, f_pad):
    """FK fwd + xT build + x2 (VPU)."""
    axes, pts = _dh_chain_tile(q_rows, dh_const, point_specs, base)
    comps = []
    for p in pts:
        comps.extend(p)
    zero_row = jnp.zeros_like(comps[0])
    comps.extend([zero_row] * (f_pad - len(comps)))
    xT = jnp.concatenate(comps, axis=0)            # [F_pad, HB]
    x2 = jnp.sum(xT * xT, axis=0, keepdims=True)   # [1, HB]
    return axes, pts, xT, x2


def _half_stage2(s_dt, xT):
    return jax.lax.dot_general(
        s_dt, xT.astype(DT),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [S, HB]


def _half_stage3(x2, s2, sx):
    d2 = jnp.maximum(x2 + s2 - 2.0 * sx, 0.0) + 1e-12
    rinv = jax.lax.rsqrt(d2)
    r = d2 * rinv
    return rinv, r


def _half_stage4(wv_dt_T, swv_dt, r, rinv):
    score = jax.lax.dot_general(
        wv_dt_T, r.astype(DT),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [1, HB]
    su_row = jax.lax.dot_general(
        swv_dt, rinv.astype(DT),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [F_pad+1, HB]
    return score, su_row


def _half_stage5(axes, pts, xT, su_row, n_joints, n_pts, frame_ids):
    su = su_row[:-1]
    rowsum = su_row[-1:]

    def g_comp(row):
        return xT[row:row + 1, :] * rowsum - su[row:row + 1, :]

    zero_row = jnp.zeros_like(rowsum)
    sg = [zero_row for _ in range(3)]
    sm = [zero_row for _ in range(3)]
    dq_rows = [None] * n_joints
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
        dq_rows[j - 1] = (z[0] * (sm[0] - ox_) + z[1] * (sm[1] - oy_)
                          + z[2] * (sm[2] - oz_))
    return dq_rows


def make_dual_kernel(dh_const, point_specs, base, n_joints, n_pts, f_pad,
                     hb, pipelined):
    frame_ids = [fi for fi, _ in point_specs]

    def kernel(qT_ref, s_ref, w_ref, score_ref, dqT_ref):
        s = s_ref[:].astype(jnp.float32)
        wv = w_ref[:].astype(jnp.float32)
        s2 = jnp.sum(s * s, axis=1, keepdims=True)
        s_dt = s.astype(DT)
        wv_dt_T = wv.astype(DT).T
        swv_dt = jnp.concatenate([s * wv, wv], axis=1).astype(DT)

        def rows(h):
            return [qT_ref[i:i + 1, h * hb:(h + 1) * hb]
                    for i in range(n_joints)]

        if not pipelined:
            for h in range(2):
                axes, pts, xT, x2 = _half_stage1(
                    rows(h), dh_const, point_specs, base, f_pad)
                sx = _half_stage2(s_dt, xT)
                rinv, r = _half_stage3(x2, s2, sx)
                score, su_row = _half_stage4(wv_dt_T, swv_dt, r, rinv)
                dq = _half_stage5(axes, pts, xT, su_row, n_joints, n_pts,
                                  frame_ids)
                score_ref[:, h * hb:(h + 1) * hb] = score
                for j in range(n_joints):
                    dqT_ref[j:j + 1, h * hb:(h + 1) * hb] = dq[j]
        else:
            # software pipeline: each MXU stage of one half is issued
            # while the other half has VPU work outstanding
            a1 = _half_stage1(rows(0), dh_const, point_specs, base, f_pad)
            sxA = _half_stage2(s_dt, a1[2])                  # MXU A
            b1 = _half_stage1(rows(1), dh_const, point_specs, base, f_pad)
            rinvA, rA = _half_stage3(a1[3], s2, sxA)         # VPU A
            sxB = _half_stage2(s_dt, b1[2])                  # MXU B
            scoreA, suA = _half_stage4(wv_dt_T, swv_dt, rA, rinvA)  # MXU A
            rinvB, rB = _half_stage3(b1[3], s2, sxB)         # VPU B
            dqA = _half_stage5(a1[0], a1[1], a1[2], suA, n_joints,
                               n_pts, frame_ids)             # VPU A
            scoreB, suB = _half_stage4(wv_dt_T, swv_dt, rB, rinvB)  # MXU B
            dqB = _half_stage5(b1[0], b1[1], b1[2], suB, n_joints,
                               n_pts, frame_ids)             # VPU B
            score_ref[:, :hb] = scoreA
            score_ref[:, hb:] = scoreB
            for j in range(n_joints):
                dqT_ref[j:j + 1, :hb] = dqA[j]
                dqT_ref[j:j + 1, hb:] = dqB[j]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('spec', 'tb', 'pipelined'))
def dual_score_grad(q, s, w, spec, tb=1024, pipelined=True):
    dh_const, point_specs, base = spec
    n_joints = len(dh_const)
    n_pts = len(point_specs)
    f_pad = _round_up(3 * n_pts, 8)
    B = q.shape[0]
    S = s.shape[0]
    Bp = _round_up(max(B, 128), tb)
    qT = q.T
    if Bp != B:
        qT = jnp.zeros((n_joints, Bp), q.dtype).at[:, :B].set(qT)
    sp = s if s.shape[1] == f_pad else jnp.concatenate(
        [s, jnp.zeros((S, f_pad - s.shape[1]), s.dtype)], axis=1)
    kernel = make_dual_kernel(dh_const, point_specs, base, n_joints,
                              n_pts, f_pad, tb // 2, pipelined)
    score, dqT = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n_joints, Bp), jnp.float32)),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((n_joints, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_joints, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * S * f_pad + 500 * Bp,
            bytes_accessed=Bp * (n_joints * 8 + 4) + S * f_pad * 4,
            transcendentals=Bp * S + 2 * n_joints * Bp),
    )(qT, sp, w.reshape(S, 1))
    return score[0, :B], dqT[:, :B].T


def time_variant(fn, q, n_short=20, n_long=120, reps=6):
    @jax.jit
    def loop(qq, n):
        def step(_, x):
            sc, dq = fn(x)
            return x - 1e-4 * dq
        return jax.lax.fori_loop(0, n, step, qq)

    ns, nl = jnp.asarray(n_short), jnp.asarray(n_long)
    jax.block_until_ready(loop(q, ns))
    ts = tl = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(q, ns))
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(q, nl))
        tl = min(tl, time.perf_counter() - t0)
    return (tl - ts) / (n_long - n_short)


def main():
    B, S = 65536, 512
    robot, sup, w = _flagship_score_setup(n_supports=S)
    spec = robot_spec(robot)
    q = robot.rand_configs(B, jax.random.PRNGKey(0))

    # correctness first (vs production kernel)
    sc0, dq0 = _dh_score_grad_pallas(q[:4096], sup, w, spec)
    out = {'B': B, 'S': S, 'backend': jax.default_backend()}
    variants = {}
    for name, tb, pipe in [('dual_seq_1024', 1024, False),
                           ('dual_pipe_1024', 1024, True),
                           ('dual_pipe_2048', 2048, True)]:
        sc1, dq1 = dual_score_grad(q[:4096], sup, w, spec, tb=tb,
                                   pipelined=pipe)
        err_s = float(jnp.max(jnp.abs(sc1 - sc0)))
        err_g = float(jnp.max(jnp.abs(dq1 - dq0)))
        rel = err_g / float(jnp.max(jnp.abs(dq0)))
        variants[name] = {'max_abs_score_err_vs_prod': err_s,
                          'rel_grad_err_vs_prod': rel}
        print(name, 'score err', err_s, 'grad rel err', rel, flush=True)

    t_prod = time_variant(
        lambda x: _dh_score_grad_pallas(x, sup, w, spec), q)
    out['prod_ms'] = t_prod * 1e3
    print('prod', t_prod * 1e3, 'ms/step', flush=True)
    for name, tb, pipe in [('dual_seq_1024', 1024, False),
                           ('dual_pipe_1024', 1024, True),
                           ('dual_pipe_2048', 2048, True)]:
        t = time_variant(
            lambda x, tb=tb, pipe=pipe: dual_score_grad(
                x, sup, w, spec, tb=tb, pipelined=pipe), q)
        variants[name]['ms_per_step'] = t * 1e3
        variants[name]['speedup_vs_prod'] = t_prod / t
        print(name, t * 1e3, 'ms/step', t_prod / t, 'x', flush=True)
    out['variants'] = variants
    with open('benchmarks/roofline_dual_tile.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
