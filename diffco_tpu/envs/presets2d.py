"""Predefined 2D experiment environments.

Parity targets: the obstacle layouts of
/root/reference/scripts/2d_data_generation.py:9-89 ('1rect', '3circle',
'1rect_1circle', '2class_1', '2class_2', '1rect_active', '7d_narrow', ...)
expressed as obstacle tuple lists for Obstacles2D. Coordinates follow the
reference's [-8, 8]^2 workspace for planar arms.
"""
from __future__ import annotations

import numpy as np

# (kind, position, size[, class[, angle]])
ENVS = {
    '1rect': [('rect', (2, 2), (2, 2))],
    '3circle': [('circle', (0, 2), 1.5),
                ('circle', (-2, -1), 1.0),
                ('circle', (-2, 3), 1.0)],
    '1rect_1circle': [('rect', (4, 3), (2, 2)),
                      ('circle', (-4, -3), 1.0)],
    '1rect_active': [('rect', (-7, 3), (2, 2))],
    '2rect': [('rect', (4, 3), (2, 2)),
              ('rect', (-4, -3), (2, 2))],
    '1rect_1circle_7d': [('rect', (4, 3), (2, 2)),
                         ('circle', (-4, -3), 1.0)],
    '2class_1': [('rect', (5, 0), (2, 2), 0),
                 ('circle', (-3, 6), 1.0, 1),
                 ('rect', (-5, 2), (2, 1.5), 1),
                 ('circle', (-5, -6), 1.0, 1),
                 ('rect', (0, -7), (7, 1), 1)],
    '2class_2': [('circle', (-2, 3), 1.0, 0),
                 ('circle', (-3, -4), 1.0, 1)],
    '3circle_7d': [('circle', (0, 2), 1.5),
                   ('circle', (-2, -1), 1.0),
                   ('circle', (-2, 3), 1.0)],
}


def narrow_env(num_boxes=300, seed=1917, box_size=1.0, gap=1.5):
    """'7d_narrow': a wall of random boxes with a narrow free gap
    (ref 2d_data_generation.py:55-89)."""
    rng = np.random.RandomState(seed)
    obstacles = []
    for _ in range(num_boxes):
        x = rng.uniform(-8, 8)
        y = rng.choice([-1, 1]) * rng.uniform(gap / 2, 8)
        obstacles.append(('rect', (x, y),
                          (box_size * rng.uniform(0.5, 1.5),
                           box_size * rng.uniform(0.5, 1.5))))
    return obstacles


def random_env(num_obstacles=5, seed=0, kinds=('rect', 'circle'),
               workspace=8.0, min_size=0.5, max_size=2.0, num_class=1):
    """Random obstacle layout (ref generate_batch_data_2d.py random mode)."""
    rng = np.random.RandomState(seed)
    obstacles = []
    for i in range(num_obstacles):
        kind = kinds[rng.randint(len(kinds))]
        pos = tuple(rng.uniform(-workspace, workspace, 2))
        label = i % num_class
        if kind == 'circle':
            obstacles.append(('circle', pos,
                              rng.uniform(min_size, max_size), label))
        else:
            obstacles.append(('rect', pos,
                              (rng.uniform(min_size, max_size),
                               rng.uniform(min_size, max_size)), label))
    return obstacles


def get_env(name: str, **kwargs):
    if name == '7d_narrow':
        return narrow_env(**kwargs)
    if name.startswith('random'):
        return random_env(**kwargs)
    return ENVS[name]
