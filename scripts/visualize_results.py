#!/usr/bin/env python
"""Plot benchmark / trajectory results.

Parity targets: /root/reference/scripts/collision_landscape.py (C-space
score landscape), visualize_trajectory_2d.py (workspace sweep),
speed_compare_plot.py and compare_plot_planning.py (method comparison
bars from the speed_compare result JSON). Headless (Agg), saves PNGs.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt


def plot_speed_compare(result_json: str, out: str):
    """Grouped bars: success/valid rate, mean time, mean checks per
    env/method (ref speed_compare_plot.py)."""
    results = json.load(open(result_json))
    tags = sorted(results)
    metrics = ['success_rate', 'valid_rate', 'mean_time', 'mean_cnt_check']
    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4))
    x = np.arange(len(tags))
    for ax, m in zip(axes, metrics):
        vals = [results[t][m] for t in tags]
        ax.bar(x, vals, color='tab:blue')
        ax.set_xticks(x)
        ax.set_xticklabels(tags, rotation=45, ha='right', fontsize=7)
        ax.set_title(m)
        if 'time' in m or 'check' in m:
            ax.set_yscale('log')
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f'saved {out}')


def plot_landscape(env_name: str, out: str, dof: int = 2,
                   link_length: float = 3.5, num_train: int = 4000,
                   seed: int = 0):
    """C-space collision landscape: ground truth vs proxy score
    (ref collision_landscape.py)."""
    import jax
    import jax.numpy as jnp
    from diffco_tpu import kernels, routines
    from diffco_tpu.perceptron import DiffCo
    from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
    from diffco_tpu.envs.presets2d import get_env

    obstacles = get_env(env_name)
    dataset = routines.autogenerate_2d_dataset(
        num_init_points=num_train, dof=dof, link_length=link_length,
        link_width=0.3, obstacles=obstacles, label_type='binary', seed=seed)
    cfgs, labels, dists, _, robot = routines.unpack_dataset(dataset)
    obs = Obstacles2D.from_obstacle_list(obstacles)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(cfgs, labels[:, 0], max_iteration=3 * num_train)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')

    n = 200
    grid = routines.generate_unified_grid(n, n)
    gt = np.asarray(planar_robot_signed_dist(
        robot, obs, grid).max(-1)).reshape(n, n)
    proxy = np.asarray(clf.poly_score(grid)).reshape(n, n)
    xs = np.asarray(grid[:, 0]).reshape(n, n)
    ys = np.asarray(grid[:, 1]).reshape(n, n)

    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    for ax, field, title in [(axes[0], gt, 'ground-truth signed distance'),
                             (axes[1], proxy, 'DiffCo score')]:
        m = np.abs(field).max()
        ax.pcolormesh(xs, ys, field, cmap='RdBu_r', vmin=-m, vmax=m)
        ax.contour(xs, ys, (field > 0).astype(float), levels=[0.5],
                   colors='k')
        ax.set_title(title)
        ax.set_xlabel('q1')
        ax.set_ylabel('q2')
    sp = np.asarray(clf.support_points[:clf.num_valid])
    axes[1].scatter(sp[:, 0], sp[:, 1], s=2, c='k')
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f'saved {out}')


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    ps = sub.add_parser('speed_compare')
    ps.add_argument('result_json')
    ps.add_argument('--out', default='speed_compare.png')
    pl = sub.add_parser('landscape')
    pl.add_argument('--env', default='1rect_1circle')
    pl.add_argument('--out', default='landscape.png')
    args = p.parse_args()
    if args.cmd == 'speed_compare':
        plot_speed_compare(args.result_json, args.out)
    else:
        plot_landscape(args.env, args.out)


if __name__ == '__main__':
    main()
