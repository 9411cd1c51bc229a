#!/usr/bin/env python
"""Experiment A: DiffCo-vs-ground-truth score correlation and accuracy.

Parity targets: /root/reference/scripts/test_correlation.py —
``correlation`` (:261-291) computes the scatter of proxy scores vs exact
signed distances on a test set; ``test_error`` (:294-304) reports
ACC/TPR/TNR. This is the fidelity gate named in BASELINE.json
("test_correlation parity").
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

from diffco_tpu import kernels, routines
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
from diffco_tpu.envs.presets2d import get_env


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='1rect_1circle')
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--num-train', type=int, default=6000)
    p.add_argument('--num-test', type=int, default=2000)
    p.add_argument('--fit-target', default='label',
                   choices=['label', 'dist', 'hypo'])
    p.add_argument('--seed', type=int, default=2021)
    p.add_argument('--plot', default=None)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    obstacles = get_env(args.env)
    dataset = routines.autogenerate_2d_dataset(
        num_init_points=args.num_train + args.num_test, dof=args.dof,
        link_length=args.link_length, link_width=0.3, obstacles=obstacles,
        label_type='binary', seed=args.seed)
    cfgs, labels, dists, _, robot = routines.unpack_dataset(dataset)
    labels, dists = labels[:, 0], dists[:, 0]
    train_mask, test_mask = routines.train_test_split(
        len(cfgs), args.num_train, seed=args.seed)

    checker = DiffCo(kernel_func=kernels.RQKernel(10.0))
    t0 = time.time()
    checker.train(cfgs[train_mask], labels[train_mask],
                  max_iteration=3 * args.num_train,
                  distance=dists[train_mask])
    train_time = time.time() - t0
    checker.fit_poly(kernels.Polyharmonic(1, 1), target=args.fit_target)

    scores = np.asarray(checker.poly_score(cfgs[test_mask])).reshape(-1)
    gt_dist = np.asarray(dists[test_mask])
    gt_labels = np.asarray(labels[test_mask])

    corr = float(np.corrcoef(scores, gt_dist)[0, 1])
    # Spearman (rank) correlation without scipy dependency on hot path
    r1 = np.argsort(np.argsort(scores)).astype(np.float64)
    r2 = np.argsort(np.argsort(gt_dist)).astype(np.float64)
    spearman = float(np.corrcoef(r1, r2)[0, 1])
    preds = (scores > 0) * 2 - 1
    acc = float((preds == gt_labels).mean())
    tpr = float((preds[gt_labels == 1] == 1).mean())
    tnr = float((preds[gt_labels == -1] == -1).mean())
    result = {'env': args.env, 'dof': args.dof,
              'pearson_corr': round(corr, 4),
              'spearman_corr': round(spearman, 4),
              'acc': round(acc, 4), 'tpr': round(tpr, 4),
              'tnr': round(tnr, 4),
              'n_supports': checker.num_valid,
              'train_time_s': round(train_time, 3)}
    print(json.dumps(result))

    if args.output:
        with open(args.output, 'w') as f:
            json.dump(result, f, indent=1)
    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(gt_dist, scores, s=2, alpha=0.3)
        ax.axhline(0, color='k', lw=0.5)
        ax.axvline(0, color='k', lw=0.5)
        ax.set_xlabel('ground-truth signed distance')
        ax.set_ylabel('DiffCo score')
        ax.set_title(f'{args.env}: r={corr:.3f}, ACC={acc:.3f}')
        fig.savefig(args.plot, dpi=110, bbox_inches='tight')
    return result


if __name__ == '__main__':
    main()
