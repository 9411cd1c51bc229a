#!/usr/bin/env python
"""2D dataset factory CLI.

Parity targets: /root/reference/scripts/2d_data_generation.py:91-149 and
scripts/generate_batch_data_2d.py — generate planar-arm datasets over
predefined or random obstacle layouts with binary/instance/class labels,
labeled by the batched geometric ground truth (no per-config FCL loop).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from diffco_tpu import routines
from diffco_tpu.envs.presets2d import get_env


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='1rect_1circle',
                   help='preset name (see diffco_tpu.envs.presets2d) or '
                        '"random"')
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--link-width', type=float, default=0.3)
    p.add_argument('--label-type', default='binary',
                   choices=['binary', 'instance', 'class'])
    p.add_argument('--num-init-points', type=int, default=8000)
    p.add_argument('--seed', type=int, default=2021)
    p.add_argument('--num-obstacles', type=int, default=5)
    p.add_argument('--output-dir', default='data/2d')
    args = p.parse_args()

    if args.env == 'random':
        obstacles = get_env('random', num_obstacles=args.num_obstacles,
                            seed=args.seed)
    else:
        obstacles = get_env(args.env)

    dataset = routines.autogenerate_2d_dataset(
        num_init_points=args.num_init_points, dof=args.dof,
        link_length=args.link_length, link_width=args.link_width,
        obstacles=obstacles, label_type=args.label_type,
        # random layouts get a seed/count-qualified id so two runs
        # cannot silently overwrite each other's datasets
        env_id=(f'random_s{args.seed}_o{args.num_obstacles}'
                if args.env == 'random' else args.env),
        seed=args.seed, save_dir=args.output_dir)
    n_col = int((dataset['label'].reshape(len(dataset['data']), -1)
                 .max(1) > 0).sum())
    print(f"env={args.env} dof={args.dof}: {len(dataset['data'])} configs, "
          f"{n_col} in collision "
          f"({100 * n_col / len(dataset['data']):.1f}%), saved to "
          f"{args.output_dir}")


if __name__ == '__main__':
    main()
