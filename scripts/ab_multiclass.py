"""A/B: fused multi-class FK+score+grad kernel vs alternatives.

Variants at B=65536, S=512, C in {2, 3, 5} (Panda FK, polyharmonic k=1):
  fused_multi — ONE kernel, shared FK + distance/rsqrt sweep, per-class
                score/su rows (ops/fk_score.dh_polyharmonic_multi_score)
  fused_xC    — C calls of the scalar fused kernel (shares nothing)
  xla         — FK + cdist-expansion + [B,S]x[S,C] matvec (the previous
                MultiDiffCo.poly_score route), f32 'highest' matmuls

Timed as value+grad steps (sum over a fixed class mix) by fori_loop scan
differencing, min over reps — bench.py's method.
"""
import json
import sys
import time

sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_score_setup
from diffco_tpu.ops import fk_score


def time_fn(grad_fn, q, n_short=20, n_long=120, reps=6):
    @jax.jit
    def loop(qq, n):
        def step(_, x):
            return x - 1e-4 * grad_fn(x)
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
    spec = fk_score.robot_spec(robot)
    q = robot.rand_configs(B, jax.random.PRNGKey(0))
    out = {'B': B, 'S': S, 'backend': jax.default_backend(),
           'variants': {}}
    for C in (2, 3, 5):
        key = jax.random.PRNGKey(C)
        W = jax.random.normal(key, (S, C)) * 0.05
        mix = jnp.linspace(0.5, 1.5, C)

        def total_multi(qq):
            return (fk_score.dh_polyharmonic_multi_score(qq, sup, W, spec)
                    * mix[None, :]).sum()

        def total_xc(qq):
            return sum(
                (fk_score.dh_polyharmonic_score(qq, sup, W[:, c], spec)
                 * mix[c]).sum() for c in range(C))

        def total_xla(qq):
            pts = robot.fkine(qq, flat=True)
            d2 = (jnp.sum(pts * pts, axis=1, keepdims=True)
                  + jnp.sum(sup * sup, axis=1)[None, :]
                  - 2.0 * jnp.matmul(pts, sup.T, precision='highest'))
            r = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
            return (jnp.matmul(r, W, precision='highest')
                    * mix[None, :]).sum()

        # parity check at production precision
        v_m = float(total_multi(q[:8192]))
        v_x = float(total_xla(q[:8192]))
        rel = abs(v_m - v_x) / (abs(v_x) + 1e-9)
        row = {'value_rel_err_vs_xla': rel}
        for name, fn in [('fused_multi', total_multi),
                         ('fused_xC', total_xc), ('xla', total_xla)]:
            t = time_fn(jax.grad(fn), q)
            row[f'{name}_ms'] = t * 1e3
            print(f'C={C} {name}: {t*1e3:.4f} ms/step', flush=True)
        row['speedup_vs_xla'] = row['xla_ms'] / row['fused_multi_ms']
        row['speedup_vs_xC'] = row['fused_xC_ms'] / row['fused_multi_ms']
        out['variants'][f'C{C}'] = row
    with open('benchmarks/fused_multi_ab.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
