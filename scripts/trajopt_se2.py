#!/usr/bin/env python
"""SE(2) rigid-body dataset generation + multi-class trajopt.

Parity targets: /root/reference/scripts/generate_batch_data_se2.py and
scripts/manual_trajopt_se2.py — a planar rigid body (set of rectangles)
moving among multi-class obstacles; DiffCoBeta distance training; Adam
trajectory optimization with wrap-aware SE(2) configurations.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import kernels, optim, utils
from diffco_tpu.perceptron import DiffCo, DiffCoBeta
from diffco_tpu.geometry import Obstacles2D, rigid_body_signed_dist
from diffco_tpu.robots import RigidPlanarBody


BODY = [((0.0, 0.0), (1.0, 0.25)), ((0.75, 0.0), (0.25, 0.75))]  # L-shape


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--num-samples', type=int, default=6000)
    p.add_argument('--use-beta', action='store_true',
                   help='DiffCoBeta distance regression '
                        '(ref manual_trajopt_se2 DiffCoBeta path)')
    p.add_argument('--waypoints', type=int, default=20)
    p.add_argument('--maxiter', type=int, default=300)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    parts = [(p_[0], p_[1]) for p_ in BODY]
    robot = RigidPlanarBody([('rect', c, (h[0] * 2, h[1] * 2))
                             for c, h in BODY],
                            limits=[[-8, 8], [-8, 8], [-np.pi, np.pi]])
    obs = Obstacles2D.from_obstacle_list([
        ('rect', (4, 4), (3, 3), 0),
        ('circle', (-4, -4), 2.0, 1),
        ('rect', (-4, 4), (2, 4), 1),
    ])

    @jax.jit
    def gt_signed(q):
        # jitted: eager GT labeling pays one tunnel dispatch PER OP
        # (CLAUDE.md jit-boundary rule, 0.7 s vs 0.07 s per 1024 configs)
        return jnp.max(rigid_body_signed_dist(parts, obs, q), axis=-1)

    key = jax.random.PRNGKey(args.seed)
    q = robot.rand_configs(args.num_samples, key)
    dist = gt_signed(q)
    labels = (dist > 0) * 2.0 - 1.0
    print(f'dataset: {args.num_samples} samples, '
          f'{float(jnp.mean(labels > 0)):.2%} in collision')

    t0 = time.time()
    if args.use_beta:
        clf = DiffCoBeta(kernel_func=kernels.RQKernel(1.0),
                         rbf_kernel=kernels.Polyharmonic(1, 1))
        clf.train(q, dist, max_iteration=3 * args.num_samples,
                  n_left_out_points=300)
        dist_est = lambda p: clf.rbf_score(p).reshape(-1)
    else:
        clf = DiffCo(kernel_func=kernels.RQKernel(1.0))
        clf.train(q, labels, max_iteration=3 * args.num_samples, distance=dist)
        clf.fit_poly(kernels.Polyharmonic(1, 1), target='dist')
        dist_est = lambda p: clf.poly_score(p).reshape(-1)
    print(f'train: {time.time() - t0:.2f}s, supports {clf.num_valid}')

    # accuracy check
    k2 = jax.random.split(key)[0]
    qt = robot.rand_configs(2000, k2)
    st = np.asarray(dist_est(qt))
    dt = np.asarray(gt_signed(qt))
    acc = float(((st > 0) == (dt > 0)).mean())
    corr = float(np.corrcoef(st, dt)[0, 1])
    print(f'proxy: acc={acc:.3f} corr={corr:.3f}')

    # find free start/target and optimize
    free = np.where(dt <= 0)[0]
    start, target = qt[free[0]], qt[free[-1]]
    options = {'N_WAYPOINTS': args.waypoints, 'NUM_RE_TRIALS': 8,
               'MAXITER': args.maxiter, 'history': False,
               'safety_margin': -0.2, 'max_speed': 2.0,
               'seed': args.seed, 'dense_sub': 4}
    rec = optim.adam_traj_optimize(robot, dist_est, start, target, options)
    sol = jnp.asarray(rec['solution'], jnp.float32)
    dense = utils.dense_path(sol, 8)
    gt_valid = not bool(jnp.any(gt_signed(dense) > 0))
    print(f"trajopt: success={rec['success']} cost={rec['cost']:.3f} "
          f"time={rec['time']:.3f}s GT-valid={gt_valid}")
    result = {'acc': acc, 'corr': corr, 'success': rec['success'],
              'gt_valid': gt_valid, 'cost': rec['cost'],
              'time': rec['time']}
    if args.output:
        json.dump({'summary': result, 'rec': rec}, open(args.output, 'w'),
                  indent=1)
    return result


if __name__ == '__main__':
    main()
