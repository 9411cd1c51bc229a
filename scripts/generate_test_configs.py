#!/usr/bin/env python
"""Generate start/target configuration pairs for benchmark problems.

Parity target: /root/reference/scripts/generate_test_configs.py — emits
JSON {env_name, start_cfgs, target_cfgs} consumed by speed_compare
(speed_compare.py:355-359). Pairs are sampled collision-free under the
geometric ground truth.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax

from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.envs.presets2d import get_env


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='1rect_1circle')
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5,
                   help='same knob as speed_compare.py: per-link length '
                        'is link_length * 2 / dof (constant total reach '
                        'across dof)')
    p.add_argument('--num-pairs', type=int, default=10)
    p.add_argument('--min-dist', type=float, default=1.5,
                   help='min configuration-space distance between pairs')
    p.add_argument('--plan-iters', type=int, default=300,
                   help='RRT-Connect budget for the feasibility oracle; '
                        'raise for narrow-passage envs where connected '
                        'pairs need long plans to certify')
    p.add_argument('--certify', choices=['rrt', 'walk'], default='rrt',
                   help="feasibility oracle: 'rrt' certifies sampled "
                        "pairs with RRT-Connect (the reference's design); "
                        "'walk' BUILDS the target by a collision-checked "
                        "random walk from the start, so connectivity holds "
                        "by construction — use for narrow-passage envs "
                        "where RRT certification is intractable")
    p.add_argument('--walk-steps', type=int, default=400)
    p.add_argument('--walk-step-size', type=float, default=0.15)
    p.add_argument('--seed', type=int, default=1917)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    # MUST match speed_compare.build_world's derivation exactly — the
    # feasibility oracle below certifies pairs for THIS geometry, and a
    # different robot in the benchmark would make certified-free pairs
    # start in collision (speed_compare.py:197)
    robot = RevolutePlanarRobot(args.link_length * 2 / args.dof,
                                link_width=0.3, dof=args.dof)
    obs = Obstacles2D.from_obstacle_list(get_env(args.env))
    key = jax.random.PRNGKey(args.seed)
    q = robot.rand_configs(4096, key)
    free = np.asarray(q)[~np.asarray(planar_robot_collision(robot, obs, q))]

    # feasibility oracle: only emit pairs a ground-truth RRT-Connect can
    # actually join — free C-space components can be DISCONNECTED (a
    # planar arm cannot pass through a wall), and an unreachable pair
    # makes every optimizer in the benchmark fail for reasons that have
    # nothing to do with the optimizer
    from diffco_tpu.planning import MotionPlanner
    planner = MotionPlanner(
        robot, lambda qq: planar_robot_collision(robot, obs, qq),
        seed=args.seed)

    rng = np.random.RandomState(args.seed)
    starts, targets = [], []
    attempts, draws = 0, 0
    if args.certify == 'walk':
        # connectivity by construction: every accepted step's MOTION is
        # collision-checked, so the walk itself is the feasibility
        # certificate (narrow-passage components where RRT certification
        # exhausts its budget are exactly where this matters)
        limits = np.asarray(robot.limits)
        while len(starts) < args.num_pairs and attempts < 200:
            attempts += 1
            q = free[rng.randint(len(free))].copy()
            start = q.copy()
            for _ in range(args.walk_steps):
                cand = q[None] + rng.normal(
                    scale=args.walk_step_size, size=(16, args.dof))
                cand = np.clip(cand, limits[:, 0], limits[:, 1])
                ok = planner._motions_valid_batch(
                    np.repeat(q[None], len(cand), 0), cand)
                hits = np.where(ok)[0]
                if len(hits):
                    q = cand[hits[0]]
            if np.linalg.norm(start - q) < args.min_dist:
                continue
            starts.append(start.tolist())
            targets.append(q.tolist())
    else:
        # min-dist rejections are cheap draws and must not eat the
        # (expensive) feasibility-oracle budget — a strict --min-dist
        # would otherwise exhaust the budget before the planner ever runs
        # and the script would wrongly report infeasibility
        while (len(starts) < args.num_pairs and attempts < 200
               and draws < 20000):
            draws += 1
            i, j = rng.randint(len(free)), rng.randint(len(free))
            if np.linalg.norm(free[i] - free[j]) < args.min_dist:
                continue
            attempts += 1
            if planner.plan(free[i], free[j],
                            max_iters=args.plan_iters) is None:
                continue
            starts.append(free[i].tolist())
            targets.append(free[j].tolist())
    out = {'env_name': args.env, 'start_cfgs': starts,
           'target_cfgs': targets}
    path = args.output or f'test_configs_{args.env}_{args.dof}d.json'
    if len(starts) < args.num_pairs:
        # a silent shortfall would make per-env benchmark results
        # incomparable (fewer problems than every other env)
        raise SystemExit(
            f'only {len(starts)}/{args.num_pairs} feasible pairs after '
            f'{attempts} planner attempts ({draws} draws) — nothing '
            f'written; loosen --min-dist, lower --num-pairs, or pick a '
            f'less constrained --env')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(f'{args.num_pairs} pairs written to {path}')


if __name__ == '__main__':
    main()
