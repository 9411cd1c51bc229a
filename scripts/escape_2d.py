#!/usr/bin/env python
"""Free-space escape comparison: gradient escape vs resampling.

Parity targets: /root/reference/scripts/escape.py, scripts/2d_escape.py
and scripts/compare_sampling.py — escape a batch of colliding
configurations via proxy-score gradient descent and compare wall time /
check counts against uniform resampling.
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

from diffco_tpu import kernels
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.sampler import OptimSampler
from diffco_tpu.geometry import (Obstacles2D, planar_robot_signed_dist,
                                 planar_robot_collision)
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.envs.presets2d import get_env


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='1rect_1circle')
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--num-escape', type=int, default=256)
    p.add_argument('--num-train', type=int, default=4000)
    p.add_argument('--stop-bias', type=float, default=1.0,
                   help='keep descending until proxy score <= -stop_bias: '
                        'escaped configs land this far PAST the proxy '
                        'boundary. The proxy boundary itself is only '
                        '~70%% GT-free (measured sweep: 0.0 -> 0.707, '
                        '0.6 -> 0.957, 1.0 -> 1.0 on 1rect_1circle)')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    robot = RevolutePlanarRobot(args.link_length, link_width=0.3,
                                dof=args.dof)
    obs = Obstacles2D.from_obstacle_list(get_env(args.env))
    key = jax.random.PRNGKey(args.seed)
    q = robot.rand_configs(args.num_train, key)
    sd = planar_robot_signed_dist(robot, obs, q)
    labels = (jnp.max(sd, -1) > 0) * 2.0 - 1.0
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    # 3N cap (CLAUDE.md: N is not enough to converge at N >= 5000)
    clf.train(q, labels, max_iteration=3 * args.num_train)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')

    def dist_est(qq):
        return clf.poly_score(qq).reshape(-1)

    # colliding starting points
    key2 = jax.random.split(key)[0]
    pool = robot.rand_configs(args.num_escape * 10, key2)
    hits = np.asarray(planar_robot_collision(robot, obs, pool))
    q0 = pool[np.where(hits)[0][:args.num_escape]]

    max_steps = 60
    sampler = OptimSampler(robot, dist_est, lr=0.1, max_steps=max_steps,
                           stop_bias=args.stop_bias)
    # warm up with the FULL batch shape: jit retraces per shape, and a
    # small warm-up would leave the timed call paying the compile
    sampler.optim_escape(q0)
    t0 = time.time()
    q_escaped = sampler.optim_escape(q0)
    jax.block_until_ready(q_escaped)
    t_optim = time.time() - t0
    gt_free = 1 - float(jnp.mean(planar_robot_collision(robot, obs,
                                                        q_escaped)))

    t0 = time.time()
    q_res, checks = sampler.resample_escape(q0, jax.random.PRNGKey(1))
    t_resample = time.time() - t0
    gt_free_res = 1 - float(jnp.mean(planar_robot_collision(robot, obs,
                                                            q_res)))
    result = {
        'n': int(q0.shape[0]),
        # 2 dist_est sweeps per step (grad + freeze mask)
        'optim_escape': {'time_s': round(t_optim, 4),
                         'checks': int(q0.shape[0]) * max_steps * 2,
                         'gt_free_rate': round(gt_free, 4)},
        'resample': {'time_s': round(t_resample, 4),
                     'checks': int(checks),
                     'gt_free_rate': round(gt_free_res, 4)},
    }
    print(json.dumps(result, indent=1))


if __name__ == '__main__':
    main()
