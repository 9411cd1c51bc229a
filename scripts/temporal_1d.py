#!/usr/bin/env python
"""Temporal DiffCo on a 1-DOF dynamic environment.

Parity targets: /root/reference/scripts/temporal1d_data_generation.py and
scripts/simple_temporal_active.py:391-398 — a MultiDiffCo/DiffCo with a
TemporalFKKernel (space kernel x time kernel^alpha) trained on (x, t)
samples of moving interval obstacles; reports proxy accuracy over a
space-time grid.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import kernels
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.dynamics import (LinearMotion, SineMotion, Dynamic1DChecker,
                                 temporal_dataset)
from diffco_tpu.robots import PointRobot1D


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--num-samples', type=int, default=4000)
    p.add_argument('--alpha', type=float, default=3.0)
    p.add_argument('--gamma-x', type=float, default=100.0)
    p.add_argument('--gamma-t', type=float, default=100.0)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--plot', default=None)
    args = p.parse_args()

    limits = [[0.0, 10.0], [0.0, 10.0]]  # x, t
    # reference signatures: LinearMotion(A, B) = A*t + B;
    # SineMotion(A, alpha, beta, bias) = A*sin(alpha*t + beta) + bias
    gt = Dynamic1DChecker([
        (LinearMotion(0.5, 2.0), 0.6),
        (SineMotion(2.0, 0.8, 0.0, 7.0), 0.5),
    ])
    robot = PointRobot1D(limits)
    key = jax.random.PRNGKey(args.seed)
    xt, labels, dists = temporal_dataset(gt, limits, args.num_samples, key)
    xt_n = robot.normalize(xt)  # train in normalized [0, 1] coords

    # temporal product kernel: identity "FK" over the spatial coordinate
    kern = kernels.TemporalFKKernel(
        fkine=lambda x: x, rqkernel=kernels.RQKernel(args.gamma_x),
        t_rqkernel=kernels.RQKernel(args.gamma_t), alpha=args.alpha)
    clf = DiffCo(kernel_func=kern)
    clf.train(xt_n, labels, max_iteration=3 * args.num_samples, distance=dists)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')

    key2 = jax.random.split(key)[0]
    xt_test, y_test, _ = temporal_dataset(gt, limits, 2000, key2)
    scores = np.asarray(clf.poly_score(robot.normalize(xt_test))).reshape(-1)
    preds = (scores > 0) * 2 - 1
    y = np.asarray(y_test)
    result = {'acc': float((preds == y).mean()),
              'tpr': float((preds[y == 1] == 1).mean()),
              'tnr': float((preds[y == -1] == -1).mean()),
              'supports': clf.num_valid}
    print(json.dumps(result))

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        n = 200
        xs = np.linspace(0, 10, n)
        ts = np.linspace(0, 10, n)
        grid = np.stack(np.meshgrid(xs, ts), axis=2).reshape(-1, 2)
        s = np.asarray(clf.poly_score(robot.normalize(
            jnp.asarray(grid, jnp.float32)))).reshape(n, n)
        gt_grid = np.asarray(gt.collision(
            jnp.asarray(grid, jnp.float32))).reshape(n, n)
        fig, axes = plt.subplots(1, 2, figsize=(11, 5))
        axes[0].pcolormesh(ts, xs, gt_grid.T, cmap='gray_r')
        axes[0].set_title('ground truth (x vs t)')
        m = np.abs(s).max()
        axes[1].pcolormesh(ts, xs, s.T, cmap='RdBu_r', vmin=-m, vmax=m)
        axes[1].contour(ts, xs, (s > 0).T.astype(float), levels=[0.5],
                        colors='k')
        axes[1].set_title('temporal DiffCo score')
        for ax in axes:
            ax.set_xlabel('t')
            ax.set_ylabel('x')
        fig.savefig(args.plot, dpi=110, bbox_inches='tight')
    return result


if __name__ == '__main__':
    main()
