#!/usr/bin/env python
"""Bulk trajectory-optimization throughput: P Baxter problems in ONE
compiled program (optim.adam_traj_optimize_batch), validated against the
exact geometric checker, failures repaired in a second batched program
against the differentiable ground truth.

No reference counterpart — /root/reference/scripts/speed_compare.py loops
problems on the host, one scipy/torch optimization at a time. Here the
problem axis is just more batch for the same fused score kernel, so the
per-problem cost collapses as P grows; this is the serving-shaped number
(bulk planning queries per second on one chip).
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
from diffco_tpu import optim, utils
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
    p.add_argument('--num-problems', type=int, default=64)
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

    checker = dc.ForwardKinematicsDiffCo(
        robot=robot, gt_check_func=gt_fn, seed=args.seed)
    t0 = time.time()
    acc, tpr, tnr = checker.fit(num_samples=args.num_samples)
    fit_time = time.time() - t0
    print(f'fit: {fit_time:.1f}s acc={acc:.3f} tpr={tpr:.3f} tnr={tnr:.3f}')

    dist_est = checker.score_fn(bias=0.0)
    margin = -checker.safety_bias

    # P collision-free (start, target) pairs
    key = jax.random.PRNGKey(args.seed + 7)
    q = robot.rand_configs(max(4096, 8 * args.num_problems), key)
    free = ~np.asarray(gt_fn(q))
    idx = np.where(free)[0]
    assert len(idx) >= 2 * args.num_problems
    P = args.num_problems
    starts = np.stack([np.asarray(q[idx[2 * i]]) for i in range(P)])
    targets = np.stack([np.asarray(q[idx[-1 - 2 * i]]) for i in range(P)])

    options = {'N_WAYPOINTS': args.waypoints, 'NUM_RE_TRIALS': args.trials,
               'MAXITER': args.maxiter, 'safety_margin': margin,
               'max_speed': 2.0, 'seed': args.seed,
               'dense_sub': args.dense_sub}

    def gt_dist(qq):
        return gt.signed_dist(qq, env)

    @jax.jit
    def validate_batch(sols):
        dense = jax.vmap(lambda s: utils.dense_path(s, 8))(sols)  # [P,M,D]
        hits = jax.vmap(lambda d: gt_fn(d[1:-1]))(dense)
        return ~jnp.any(hits, axis=tuple(range(1, hits.ndim)))

    repair_base = {**options, 'NUM_RE_TRIALS': 1, 'MAXITER': 200,
                   'safety_margin': -0.03, 'dense_sub': 8}

    # warm-up compile (excluded from the throughput number, like the
    # sequential benchmark's warm-up — serving reuses the compiled
    # programs; the repair program is kept at fixed shape [P] so one
    # compile covers every failure count)
    straight = np.stack([np.linspace(starts[i], targets[i], args.waypoints)
                         for i in range(P)]).astype(np.float32)
    _ = optim.adam_traj_optimize_batch(robot, dist_est, starts, targets,
                                       options)
    _ = optim.adam_traj_optimize_batch(
        robot, gt_dist, starts, targets,
        {**repair_base, 'init_solutions': straight})
    _ = np.asarray(validate_batch(jnp.asarray(straight)))

    t0 = time.time()
    recs = optim.adam_traj_optimize_batch(robot, dist_est, starts, targets,
                                          options)
    sols = jnp.asarray([r['solution'] for r in recs], jnp.float32)
    valid = np.asarray(validate_batch(sols))
    proxy_time = time.time() - t0
    print(f'batch solve+validate: {proxy_time:.3f}s for {P} problems '
          f'({valid.mean():.2%} GT-valid pre-repair)')

    # batched repair of the failures against the differentiable ground
    # truth, warm-started from the proxy solutions (repair semantics of
    # speed_compare.py repair(); here it is ONE more compiled program)
    repair_time = 0.0
    if not valid.all():
        bad = np.where(~valid)[0]
        # fixed shape [P]: already-valid problems are warm-started from
        # their own (valid) solutions, so repairing them is a no-op cost
        # that keeps the program compiled once
        t0 = time.time()
        fixed = optim.adam_traj_optimize_batch(
            robot, gt_dist, starts, targets,
            {**repair_base, 'init_solutions': np.asarray(sols)})
        fsols = np.asarray([r['solution'] for r in fixed],
                           dtype=np.float32)
        sols = np.array(sols)
        sols[bad] = fsols[bad]
        valid = np.asarray(validate_batch(jnp.asarray(sols)))
        repair_time = time.time() - t0
        print(f'batch repair: {repair_time:.3f}s ({len(bad)} failed) '
              f'-> {valid.mean():.2%} GT-valid')

    total = proxy_time + repair_time
    result = {
        'backend': jax.default_backend(),
        'num_problems': P,
        'fit_time_s': round(fit_time, 1),
        'batch_solve_s': round(proxy_time, 3),
        'repair_s': round(repair_time, 3),
        'total_s': round(total, 3),
        'problems_per_sec': round(P / total, 2),
        'per_problem_ms': round(1000.0 * total / P, 1),
        'gt_valid_rate': float(valid.mean()),
        'success_rate': float(np.mean([r['success'] for r in recs])),
    }
    print(json.dumps(result))
    if args.output:
        json.dump(result, open(args.output, 'w'), indent=1)


if __name__ == '__main__':
    main()
