"""A/B benchmark: XLA vs fused-Pallas polyharmonic score+grad on TPU.

Settles the fused-kernel question with data (the decision record lives in
benchmarks/fused_ab.json + benchmarks/RESULTS.md): at each bench shape
(B x S, F = 27 Panda control-point features) we time the trajopt
inner-loop primitive — a lax.scan of score+grad steps through 7-DOF FK —
for four formulations:

  xla          _poly_score_xla + JAX autodiff (round-1 default)
  xla_bf16     same, but the [B,S] distance matmul takes bf16 inputs with
               fp32 accumulation (halves MXU input bandwidth)
  pallas_fused polyharmonic_score_fused: ONE kernel pass emits score and
               dscore/dx; the VJP reuses the saved [B,F] gradient
  pallas_fk    dh_polyharmonic_score: the FK chain itself moves into the
               kernel (ops/fk_score.py) — FK forward, score, point
               gradient AND the geometric-Jacobian configuration
               gradient per batch tile; q [B, 7] in, dq [B, 7] out

Usage: python scripts/bench_fused_ab.py [--quick]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='single shape, fewer reps')
    ap.add_argument('--out', default='benchmarks/fused_ab.json')
    args = ap.parse_args()

    os.environ['DIFFCO_USE_PALLAS'] = '1'  # allow the pallas path
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_score_setup
    from diffco_tpu.ops import fused_score as fs

    backend = jax.default_backend()
    n_inner = 20
    reps = 2 if args.quick else 3
    shapes = ([(8192, 512)] if args.quick
              else [(8192, 512), (65536, 512), (8192, 4096), (65536, 4096)])

    results = []
    for B, S in shapes:
        robot, sup, w = _flagship_score_setup(n_supports=S)
        sup_bf16 = sup.astype(jnp.bfloat16)
        q0 = robot.rand_configs(B, jax.random.PRNGKey(0))

        def xla_score(pts):
            return fs._poly_score_xla(pts, sup, w)

        def xla_bf16_score(pts):
            x16 = pts.astype(jnp.bfloat16)
            x2 = jnp.sum(pts * pts, axis=1, keepdims=True)
            s2 = jnp.sum(sup * sup, axis=1, keepdims=True)
            xs = jnp.dot(x16, sup_bf16.T,
                         preferred_element_type=jnp.float32)
            r = jnp.sqrt(jnp.maximum(x2 + s2.T - 2.0 * xs, 0.0) + 1e-12)
            return jnp.dot(r, w.reshape(-1, 1),
                           preferred_element_type=jnp.float32)

        def pallas_fused_score(pts):
            return fs.polyharmonic_score_fused(pts, sup, w)

        from diffco_tpu.ops import fk_score as fks
        spec = fks.robot_spec(robot)

        def pallas_fk_score_q(qq):
            return fks.dh_polyharmonic_score(qq, sup, w, spec)

        variants = {'xla': xla_score, 'xla_bf16': xla_bf16_score}
        if backend == 'tpu':
            variants['pallas_fused'] = pallas_fused_score
            variants['pallas_fk'] = pallas_fk_score_q

        for name, score_fn in variants.items():
            takes_q = name == 'pallas_fk'

            @jax.jit
            def loop(q, _fn=score_fn, _takes_q=takes_q):
                def total(qq):
                    if _takes_q:
                        return _fn(qq).sum()
                    pts = robot.fkine(qq, flat=True)
                    return _fn(pts).sum()

                def step(qq, _):
                    v, g = jax.value_and_grad(total)(qq)
                    return qq - 1e-4 * g, v

                return jax.lax.scan(step, q, None, length=n_inner)

            try:
                jax.block_until_ready(loop(q0))  # compile
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = loop(q0)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps
                tput = B * n_inner / dt
                rec = {'B': B, 'S': S, 'variant': name,
                       'evals_per_sec': round(tput, 1),
                       'ms_per_step': round(dt / n_inner * 1e3, 3)}
            except Exception as e:  # record failures instead of dying
                rec = {'B': B, 'S': S, 'variant': name,
                       'error': f'{type(e).__name__}: {e}'[:300]}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = {'backend': backend, 'n_inner': n_inner, 'reps': reps,
           'feature_dim': 27, 'results': results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
