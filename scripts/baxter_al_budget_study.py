#!/usr/bin/env python
"""Diagnose baxter_default/aldiffco strict 0.6 (round-4 matrix): the only
AL cell below 1.0 on an open env while adamdiffco holds 1.0/1.0.

Hypothesis (VERDICT round 4, weak #7): the AL core's fixed success
tolerance (max violation <= 1e-4, optim.py:_al_traj_core) against the
meter-scale margin (-0.05 m). The failing problems end at max_violation
6-14 mm — tiny relative to the 5 cm margin (the paths are GT-valid),
but 60-140x the absolute tolerance that radian/link-scale planar envs
do reach within the default budget (outer 10 x inner 20).

This study sweeps the AL budget on the two failing staged problems
(1 and 3): if doubling outer multiplier updates / inner steps drives the
violation under 1e-4, it is a budget artifact, not a tolerance-scaling
bug; if violations plateau at mm scale, the honest fix is reporting
violation relative to the margin scale rather than loosening the gate.

Writes benchmarks/baxter_al_budget.json. Run on the quiet host:
  python scripts/run_cpu.py scripts/baxter_al_budget_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import optim
from speed_compare import build_env_bundle, load_test_configs, validate_gt

OUT = 'benchmarks/baxter_al_budget.json'
SEED = 1917  # the matrix run's --seed default


class A:
    num_train = 6000
    seed = 1917
    fit_target = 'dist'
    link_length = 3.5
    safety_margin = -0.3   # planar default; baxter bundle overrides


def main():
    b = build_env_bundle('baxter_default', 7, A)
    robot, checker = b['robot'], b['checker']
    fns = b['score_fns'](checker)
    pairs = load_test_configs('benchmarks/test_configs',
                              'baxter_default', 7, 5)
    if pairs is None:
        # replicate speed_compare.main's fallback pair generation
        # bit-exactly (same key offset, same free-filtered indexing) so
        # the study diagnoses the SAME problems the matrix row ran
        key = jax.random.PRNGKey(SEED + 7)
        q = b['robot'].rand_configs(512, key)
        free = ~np.asarray(b['gt_col'](q))
        idx = np.where(free)[0]
        assert len(idx) >= 10
        pairs = [(q[idx[2 * i]], q[idx[-1 - 2 * i]]) for i in range(5)]
    out = {'env': 'baxter_default', 'margin': float(b['margin']),
           'tolerance': 1e-4, 'problems': [1, 3], 'sweeps': {}}
    if os.path.exists(OUT):
        out = json.load(open(OUT))
        out.setdefault('sweeps', {})
    # (outer, MAXITER, restore_iters): the budget rows sweep the AL loop
    # alone (restore 0); the restore rows measure the feasibility-
    # restoration epilogue (optim._al_traj_core) closing the plateau at
    # the DEFAULT budget
    for outer, maxiter, restore in (
            (10, 200, 0), (20, 200, 0), (10, 400, 0), (20, 400, 0),
            (40, 800, 0), (10, 200, 100), (10, 200, 400)):
        key = f'outer{outer}_iter{maxiter}'
        if restore:
            key += f'_restore{restore}'
        if key in out['sweeps']:
            print(f'{key}: cached, skipping', flush=True)
            continue
        recs = []
        for pi in (1, 3):
            s, t = pairs[pi]
            o = {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': 5, 'MAXITER': maxiter,
                 'safety_margin': b['margin'], 'dense_sub': 3,
                 'max_speed': 2.0, 'seed': SEED, 'outer_iters': outer,
                 'restore_iters': restore}
            t0 = time.time()
            r = optim.al_traj_optimize(robot, fns['proxy_dist'],
                                       jnp.asarray(s), jnp.asarray(t), o)
            wall = time.time() - t0
            v = validate_gt(b['gt_col'], np.asarray(r['solution']))
            recs.append({'p': pi, 'success': bool(r['success']),
                         'max_violation': float(r['max_violation']),
                         'violation_over_margin': round(
                             float(r['max_violation'])
                             / abs(float(b['margin'])), 4),
                         'valid': bool(v), 'time': round(r['time'], 2),
                         'wall': round(wall, 1)})
            print(f"{key} p{pi}: success {r['success']} viol "
                  f"{r['max_violation']:.5f} valid {v} "
                  f"t={r['time']:.1f}s", flush=True)
        out['sweeps'][key] = recs
        json.dump(out, open(OUT, 'w'), indent=1)
    print('wrote', OUT)


if __name__ == '__main__':
    main()
