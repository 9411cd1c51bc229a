#!/usr/bin/env python
"""Moving-obstacle active learning (Experiment D).

Parity targets: /root/reference/scripts/active.py:641-765 — T timesteps of
obstacle motion; per step: exploit samples around supports + explore
samples + previous supports, warm-start retrain, surrogate re-fit,
replanning, and timing of update vs plan. The 10k-config score sweeps run
batched on device.
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
from diffco_tpu.checkers import RBFDiffCo
from diffco_tpu.geometry import (Obstacles2D, planar_robot_signed_dist,
                                 planar_robot_collision)
from diffco_tpu.robots import RevolutePlanarRobot


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--timesteps', type=int, default=11)
    p.add_argument('--num-init', type=int, default=3000)
    p.add_argument('--num-update', type=int, default=300)
    p.add_argument('--sweep-size', type=int, default=10000,
                   help='batched score sweep per step (ref active.py:650)')
    p.add_argument('--seed', type=int, default=1917)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    robot = RevolutePlanarRobot(args.link_length, link_width=0.3,
                                dof=args.dof)

    # obstacle trajectory: a box sliding across the workspace
    def obstacles_at(t):
        x = -7.0 + 14.0 * t / max(args.timesteps - 1, 1)
        return Obstacles2D.from_obstacle_list([
            ('rect', (x, 3.0), (2.0, 2.0)),
            ('circle', (0.0, -4.0), 1.5),
        ])

    state = {'obs': obstacles_at(0)}

    def gt(q):
        return planar_robot_collision(robot, state['obs'], q)

    checker = RBFDiffCo(robot=robot, gt_check_func=gt, seed=args.seed)
    t0 = time.time()
    acc0, tpr0, tnr0 = checker.fit(num_samples=args.num_init, verbose=False)
    print(f't=0 initial fit: {time.time() - t0:.2f}s acc={acc0:.3f} '
          f'tpr={tpr0:.3f} tnr={tnr0:.3f}')

    key = jax.random.PRNGKey(args.seed)
    q_sweep = robot.rand_configs(args.sweep_size, key)
    log = []
    for t in range(1, args.timesteps):
        state['obs'] = obstacles_at(t)
        t0 = time.time()
        acc, tpr, tnr = checker.update(num_samples=args.num_update,
                                       verify=0.2)
        update_time = time.time() - t0
        # batched 10k-config sweep with the updated proxy
        t0 = time.time()
        scores = checker.collision_score(q_sweep)
        jax.block_until_ready(scores)
        sweep_time = time.time() - t0
        gt_labels = np.asarray(gt(q_sweep))
        preds = np.asarray(scores).reshape(-1) > 0
        # a timestep with zero true positives (obstacle out of reach) has
        # no TPR — record 1.0 (vacuously true) instead of NaN-in-JSON
        sweep_tpr = (float((preds[gt_labels]).mean())
                     if gt_labels.any() else 1.0)
        rec = {'t': t, 'update_time': round(update_time, 3),
               'sweep_time': round(sweep_time, 4),
               'verify_acc': acc, 'verify_tpr': tpr, 'verify_tnr': tnr,
               'sweep_tpr': round(sweep_tpr, 4),
               'supports': checker.perceptron.num_valid}
        log.append(rec)
        print(rec)

    if args.output:
        with open(args.output, 'w') as f:
            json.dump(log, f, indent=1)


if __name__ == '__main__':
    main()
