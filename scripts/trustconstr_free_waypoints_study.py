#!/usr/bin/env python
"""Measure options['free_waypoints'] on trustconstr's slowest cells.

Round-3 verdict weak #4: trustconstr at 20 waypoints (126 free vars on a
7-DOF env) spends 75-143 s/problem in the dense constraint Hessian and
scipy's interior-point algebra, both superlinear in n_free; reduced
free-waypoint counts were never tried. This study runs the SAME staged
problems (benchmarks/test_configs) at K in {20 (full), 12, 8} control
waypoints — feasibility is still enforced on the full densified
20-waypoint interpolation, so GT validation is apples-to-apples — and
records time/strict/feasible/GT-valid per K.

Usage (CPU-forced so a TPU job can run alongside):
    python scripts/run_cpu.py scripts/trustconstr_free_waypoints_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax.numpy as jnp

from diffco_tpu import optim, utils


def main():
    # reuse the benchmark harness's env bundles + staged problems so the
    # numbers are directly comparable to speed_compare_matrix.json cells
    sys.path.insert(0, os.path.dirname(__file__))
    from speed_compare import build_env_bundle, load_test_configs, \
        validate_gt

    class A:  # the bundle only reads these fields
        num_train = 6000
        seed = 1917
        fit_target = 'dist'
        link_length = 3.5
        safety_margin = -0.3

    env_name, dof = '3circle_7d', 7
    bundle = build_env_bundle(env_name, dof, A)
    robot, checker = bundle['robot'], bundle['checker']
    fns = bundle['score_fns'](checker)
    gt_col = bundle['gt_col']
    pairs = load_test_configs('benchmarks/test_configs', env_name, dof, 5)
    assert pairs, 'staged configs required for comparability'

    out = {'env': env_name, 'dof': dof, 'n_problems': len(pairs),
           'variants': {}}
    for k_ctrl in (20, 12, 8):
        recs = []
        for pi, (s, t) in enumerate(pairs):
            opts = {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': 5, 'MAXITER': 200,
                    'safety_margin': bundle['margin'], 'dense_sub': 3,
                    'max_speed': 2.0, 'seed': 1917 + pi,
                    'free_waypoints': k_ctrl}
            t0 = time.time()
            rec = optim.trustconstr_traj_optimize(
                robot, fns['proxy_dist'], s, t, opts)
            rec['wall'] = time.time() - t0
            rec['valid'] = validate_gt(gt_col, np.asarray(rec['solution']))
            recs.append({k: rec[k] for k in
                         ('wall', 'time', 'success', 'feasible', 'valid',
                          'cost', 'cnt_check')})
            print(f'K={k_ctrl} p{pi}: {rec["time"]:.1f}s strict '
                  f'{rec["success"]} feas {rec["feasible"]} '
                  f'valid {rec["valid"]}', flush=True)
        out['variants'][str(k_ctrl)] = {
            'mean_time': float(np.mean([r['time'] for r in recs])),
            'success_rate': float(np.mean([r['success'] for r in recs])),
            'feasible_rate': float(np.mean([r['feasible'] for r in recs])),
            'valid_rate': float(np.mean([r['valid'] for r in recs])),
            'records': recs,
        }
        with open('benchmarks/trustconstr_free_waypoints.json', 'w') as f:
            json.dump(out, f, indent=1)
    print('written benchmarks/trustconstr_free_waypoints.json')


if __name__ == '__main__':
    main()
