#!/usr/bin/env python
"""Headline target: sub-second collision-free Baxter trajectory on 1 TPU.

Parity targets: the reference's Baxter experiment (scripts/3d_trajopt.py,
7-DOF arm + scene obstacles + DiffCo trajopt) re-created self-contained:
analytic Baxter FK (model.py:188-244 math), a capsule-chain collision
model vs a 3D primitive scene, FK-DiffCo proxy, and the fully compiled
Adam trajectory optimizer. Reports time-to-collision-free-path (compiled,
excluding one-time jit) and validates every path against the exact
geometric checker (the speed_compare validate stage, :431-454).
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

import diffco_tpu as dc
from diffco_tpu import kernels, optim, utils
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.robots import BaxterLeftArmFK
from diffco_tpu.robots.capsule_chain import CapsuleChainCollision
from diffco_tpu.envs import ShapeEnv


def T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--num-samples', type=int, default=5000)
    p.add_argument('--num-problems', type=int, default=5)
    p.add_argument('--waypoints', type=int, default=20)
    p.add_argument('--maxiter', type=int, default=200)
    p.add_argument('--trials', type=int, default=8)
    p.add_argument('--dense-sub', type=int, default=3)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    robot = BaxterLeftArmFK()
    env = ShapeEnv(shapes={
        'table': {'type': 'Box', 'params': {'extents': [0.8, 0.8, 0.05]},
                  'transform': T([0.7, 0.0, -0.1])},
        'pole': {'type': 'Cylinder',
                 'params': {'radius': 0.1, 'height': 1.2},
                 'transform': T([0.6, 0.3, 0.5])},
        'ball': {'type': 'Sphere', 'params': {'radius': 0.15},
                 'transform': T([0.4, -0.35, 0.3])},
    })
    gt = CapsuleChainCollision(robot, link_radius=0.07, per_seg=4)
    gt_fn = gt.checker_fn(env)

    # --- offline: fit the proxy -------------------------------------------
    checker = dc.ForwardKinematicsDiffCo(
        robot=robot, gt_check_func=gt_fn, seed=args.seed)
    t0 = time.time()
    acc, tpr, tnr = checker.fit(num_samples=args.num_samples)
    fit_time = time.time() - t0
    print(f'fit: {fit_time:.1f}s acc={acc:.3f} tpr={tpr:.3f} tnr={tnr:.3f} '
          f'supports={checker.perceptron.num_valid}')

    dist_est = checker.score_fn(bias=0.0)
    margin = -checker.safety_bias

    # --- problems ----------------------------------------------------------
    key = jax.random.PRNGKey(args.seed + 7)
    q = robot.rand_configs(512, key)
    free = ~np.asarray(gt_fn(q))
    idx = np.where(free)[0]
    pairs = [(q[idx[2 * i]], q[idx[-1 - 2 * i]])
             for i in range(args.num_problems)]

    options = {'N_WAYPOINTS': args.waypoints, 'NUM_RE_TRIALS': args.trials,
               'MAXITER': args.maxiter, 'history': False,
               'safety_margin': margin, 'max_speed': 2.0,
               'seed': args.seed, 'dense_sub': args.dense_sub}


    # exact signed distance is ALSO differentiable here (the geometric
    # engine is JAX) — the repair stage optimizes directly against it,
    # initialized from the proxy solution (cf. speed_compare.py:477-497)
    def gt_dist(q):
        return gt.signed_dist(q, env)

    # repair must sample at least as densely as validation, with margin
    repair_opts = {**options, 'NUM_RE_TRIALS': 1, 'MAXITER': 200,
                   'safety_margin': -0.03, 'dense_sub': 8}

    def run_problem(pi, s, t, warm=False):
        t0 = time.time()
        rec = optim.adam_traj_optimize(robot, dist_est, s, t,
                                       {**options, 'seed': pi})
        sol = jnp.asarray(rec['solution'], jnp.float32)
        gt_valid = not bool(np.asarray(
            gt_fn(utils.dense_path(sol, 8)[1:-1])).any())
        repaired = False
        if not gt_valid:
            rec2 = optim.adam_traj_optimize(
                robot, gt_dist, s, t,
                {**repair_opts, 'seed': pi, 'init_solution': sol})
            sol2 = jnp.asarray(rec2['solution'], jnp.float32)
            gt_valid = not bool(np.asarray(
                gt_fn(utils.dense_path(sol2, 8)[1:-1])).any())
            repaired = True
            rec = rec2
        wall = time.time() - t0
        return {'problem': pi, 'wall_s': round(wall, 3),
                'success_flag': rec['success'], 'gt_valid': gt_valid,
                'repaired': repaired, 'cost': round(rec['cost'], 3)}

    # warm-up compiles (proxy path + repair path + validation)
    run_problem(0, pairs[0][0], pairs[0][1], warm=True)
    sol0 = jnp.linspace(pairs[0][0], pairs[0][1], args.waypoints)
    optim.adam_traj_optimize(robot, gt_dist, pairs[0][0], pairs[0][1],
                             {**repair_opts, 'init_solution': sol0})

    records = []
    for pi, (s, t) in enumerate(pairs):
        records.append(run_problem(pi, s, t))
        print(records[-1])

    valid = [r for r in records if r['gt_valid']]
    result = {
        'backend': jax.default_backend(),
        'fit_time_s': round(fit_time, 1),
        'gt_valid_rate': len(valid) / len(records),
        'mean_wall_s': round(float(np.mean([r['wall_s']
                                            for r in records])), 3),
        'sub_second': bool(valid) and all(
            r['wall_s'] < 1.0 for r in valid),
        'records': records,
    }
    print(json.dumps({k: v for k, v in result.items() if k != 'records'}))
    if args.output:
        json.dump(result, open(args.output, 'w'), indent=1)
    return result


if __name__ == '__main__':
    main()
