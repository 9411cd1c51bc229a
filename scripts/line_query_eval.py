#!/usr/bin/env python
"""Line-segment (motion) collision datasets and LineKernel evaluation.

Parity targets: /root/reference/scripts/2d_line_data_generation.py
(segment datasets: a motion collides iff any interpolated configuration
collides) and scripts/line_query_eval.py (accuracy of LineKernel /
LineFKKernel DiffCo variants on whole-motion queries vs per-point
checking).
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
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.envs.presets2d import get_env


def motion_labels(robot, obs, starts, ends, res=16):
    """A motion collides iff any interpolated configuration does
    (ref 2d_line_data_generation.py)."""
    ts = jnp.linspace(0.0, 1.0, res)
    pts = starts[:, None, :] + ts[None, :, None] * (ends - starts)[:, None]
    flat = pts.reshape(-1, starts.shape[-1])
    hits = planar_robot_collision(robot, obs, flat).reshape(
        starts.shape[0], res)
    return jnp.any(hits, axis=1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='1rect_1circle')
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--num-train', type=int, default=4000)
    p.add_argument('--num-test', type=int, default=1000)
    p.add_argument('--max-motion', type=float, default=1.5)
    p.add_argument('--use-fk', action='store_true',
                   help='LineFKKernel instead of LineKernel')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    robot = RevolutePlanarRobot(args.link_length, link_width=0.3,
                                dof=args.dof)
    obs = Obstacles2D.from_obstacle_list(get_env(args.env))
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_total = args.num_train + args.num_test
    starts = robot.rand_configs(n_total, k1)
    deltas = jax.random.normal(k2, starts.shape) * (args.max_motion / 2)
    # --max-motion is a BOUND: rescale over-length deltas onto the cap
    # (per-dim gaussians routinely exceed it otherwise)
    norms = jnp.linalg.norm(deltas, axis=-1, keepdims=True)
    deltas = deltas * jnp.minimum(1.0, args.max_motion
                                  / jnp.maximum(norms, 1e-9))
    lims = robot.limits
    ends = jnp.clip(starts + deltas, lims[:, 0], lims[:, 1])
    labels = motion_labels(robot, obs, starts, ends) * 2.0 - 1.0
    print(f'motion dataset: {float(jnp.mean(labels > 0)):.2%} colliding')

    X = jnp.concatenate([starts, ends], axis=1)  # [N, 2 * dof]
    if args.use_fk:
        kern = kernels.LineFKKernel(
            lambda q: robot.fkine(q), kernels.RQKernel(10.0))
    else:
        kern = kernels.LineKernel(kernels.RQKernel(10.0))
    clf = DiffCo(kernel_func=kern)
    t0 = time.time()
    clf.train(X[:args.num_train], labels[:args.num_train],
              max_iteration=3 * args.num_train)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    train_time = time.time() - t0

    Xt, yt = X[args.num_train:], np.asarray(labels[args.num_train:])
    scores = np.asarray(clf.poly_score(Xt)).reshape(-1)
    preds = (scores > 0) * 2 - 1
    result = {
        'kernel': 'LineFKKernel' if args.use_fk else 'LineKernel',
        'acc': float((preds == yt).mean()),
        'tpr': float((preds[yt == 1] == 1).mean()),
        'tnr': float((preds[yt == -1] == -1).mean()),
        'supports': clf.num_valid,
        'train_time_s': round(train_time, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    main()
