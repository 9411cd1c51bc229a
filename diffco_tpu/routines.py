"""Convenience routines: dataset generation/IO, checker train/fit/test.

Functional parity targets (reference: /root/reference/diffco/routines.py):
  autogenerate_2d_dataset (:12), unpack_dataset (:56), train_test_split
  (:109), generate_unified_grid (:126), load_pretrained_checker (:143),
  train_checker (:158), fit_checker (:195), get_estimator (:229),
  test_checker (:248), save_ompl_path (utils.py:302).

Datasets are dicts {'data', 'label', 'dist', 'obs', 'robot', 'rparam'}
(ref routines.py:56-78), stored as .npz instead of torch .pt.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels as kernel
from .perceptron import DiffCo
from .robots.analytic import RevolutePlanarRobot, RigidPlanarBody
from .geometry.geometry2d import Obstacles2D, planar_robot_signed_dist


def autogenerate_2d_dataset(num_init_points=8000, dof=2, link_length=1.0,
                            link_width=0.3, obstacles=None, label_type='binary',
                            env_id='auto', seed=0, save_dir=None):
    """Generate a 2D planar-arm dataset labeled by the geometric ground
    truth (ref routines.py:12-53 + generate_batch_data_2d.py:88-177).

    label_type: 'binary' | 'instance' | 'class'. Returns the dataset dict.
    """
    if obstacles is None:
        obstacles = [('circle', (1.5, 1.5), 0.6, 0),
                     ('rect', (-1.5, -1.5), (1.5, 1.5), 1)]
    robot = RevolutePlanarRobot(link_length, link_width=link_width, dof=dof)
    obs = Obstacles2D.from_obstacle_list(obstacles)
    key = jax.random.PRNGKey(seed)
    q = robot.rand_configs(num_init_points, key)
    sd = planar_robot_signed_dist(robot, obs, q)  # [N, n_obs]

    if label_type == 'binary':
        dist = jnp.max(sd, axis=-1, keepdims=True)
        label = (dist > 0) * 2.0 - 1.0
    elif label_type == 'instance':
        dist = sd
        label = (sd > 0) * 2.0 - 1.0
    elif label_type == 'class':
        classes = obs.obstacle_classes
        n_class = obs.num_class
        dist = jnp.stack([
            jnp.max(jnp.where(jnp.asarray(classes == c)[None, :], sd,
                              -jnp.inf), axis=-1)
            for c in range(n_class)], axis=-1)
        label = (dist > 0) * 2.0 - 1.0
    else:
        raise ValueError(f'unknown label_type {label_type}')

    dataset = {
        'data': np.asarray(q),
        'label': np.asarray(label),
        'dist': np.asarray(dist),
        'obs': obstacles,
        'robot': 'RevolutePlanarRobot',
        'rparam': [link_length, link_width, dof],
        'label_type': label_type,
    }
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(
            save_dir, f'2d_{dof}dof_{env_id}_{label_type}.npz')
        save_dataset(dataset, path)
    return dataset


def save_dataset(dataset: Dict, path: str):
    meta = {k: v for k, v in dataset.items()
            if not isinstance(v, np.ndarray)}
    arrays = {k: v for k, v in dataset.items() if isinstance(v, np.ndarray)}
    np.savez(path, __meta__=np.frombuffer(pickle.dumps(meta), np.uint8),
             **arrays)


def load_dataset(path: str) -> Dict:
    z = np.load(path, allow_pickle=False)
    out = {k: z[k] for k in z.files if k != '__meta__'}
    if '__meta__' in z.files:
        out.update(pickle.loads(z['__meta__'].tobytes()))
    return out


def unpack_dataset(dataset):
    """Dataset dict (or path) -> (cfgs, labels, dists, obstacles, robot)
    (ref routines.py:56-78)."""
    if isinstance(dataset, str):
        dataset = load_dataset(dataset)
    cfgs = jnp.asarray(dataset['data'], jnp.float32)
    labels = jnp.asarray(dataset['label'], jnp.float32)
    dists = jnp.asarray(dataset['dist'], jnp.float32)
    obstacles = dataset.get('obs')
    robot_name = dataset.get('robot')
    rparam = dataset.get('rparam', [])
    if robot_name == 'RevolutePlanarRobot':
        robot = RevolutePlanarRobot(rparam[0], link_width=rparam[1],
                                    dof=int(rparam[2]))
    elif robot_name == 'RigidPlanarBody':
        robot = RigidPlanarBody(rparam[0])
    else:
        robot = None
    return cfgs, labels, dists, obstacles, robot


def train_test_split(n_total, n_train, seed=0):
    """Random index split (ref routines.py:109-123)."""
    perm = np.random.RandomState(seed).permutation(n_total)
    train_mask = np.zeros(n_total, bool)
    train_mask[perm[:n_train]] = True
    return jnp.asarray(train_mask), jnp.asarray(~train_mask)


def generate_unified_grid(size_x=400, size_y=400, lo=-np.pi, hi=np.pi):
    """Dense C-space grid [size_x * size_y, 2] (ref routines.py:126-141)."""
    yy, xx = jnp.meshgrid(jnp.linspace(lo, hi, size_y),
                          jnp.linspace(lo, hi, size_x), indexing='ij')
    return jnp.stack([xx, yy], axis=2).reshape(-1, 2)


def train_checker(checker, cfgs, labels, dists=None, fkine=None,
                  max_iteration=None, verbose=False):
    """Train a raw perceptron on a provided dataset
    (ref routines.py:158-193)."""
    del fkine
    max_iteration = max_iteration or 3 * cfgs.shape[0]
    labels = jnp.asarray(labels)
    checker.train(cfgs, labels, max_iteration=max_iteration,
                  distance=dists, verbose=verbose)
    return checker


def fit_checker(checker, fitting_target='label', fitting_epsilon=1.0,
                kernel_func=None):
    """Fit the smooth surrogate (ref routines.py:195-227)."""
    if kernel_func is None:
        kernel_func = kernel.Polyharmonic(k=1, epsilon=fitting_epsilon)
    checker.fit_poly(kernel_func=kernel_func, target=fitting_target)
    return checker


def get_estimator(checker, method='rbf'):
    """Score function by name (ref routines.py:229-246)."""
    if method == 'rbf':
        fn = getattr(checker, 'rbf_score', None) or checker.poly_score
    elif method == 'poly':
        fn = checker.poly_score
    elif method == 'original':
        fn = checker.score_original
    elif method == 'fullpoly':
        fn = checker.full_poly_score
    else:
        raise ValueError(f'unknown method {method}')
    return fn


def test_checker(checker, score_fn, cfgs, labels, num_test=None,
                 safety_margin=0.0, verbose=True):
    """ACC/TPR/TNR of a fitted checker on a labeled set
    (ref routines.py:248-271). ``safety_margin`` follows the reference's
    sign convention — prediction is ``score - safety_margin > 0``, so the
    conventional NEGATIVE margins (e.g. -0.3 throughout the reference
    scripts) shift predictions toward 'collision' (conservative). This is
    the OPPOSITE sign of the checkers' additive ``safety_bias``."""
    if num_test is not None:
        cfgs, labels = cfgs[:num_test], labels[:num_test]
    scores = score_fn(cfgs) - safety_margin
    preds = (jnp.asarray(scores).reshape(labels.shape) > 0) * 2 - 1
    labels = jnp.asarray(labels)
    n_pos = jnp.maximum(jnp.sum(labels == 1), 1)
    n_neg = jnp.maximum(jnp.sum(labels == -1), 1)
    acc = jnp.mean((preds == labels).astype(jnp.float32))
    tpr = jnp.sum((preds == 1) & (labels == 1)) / n_pos
    tnr = jnp.sum((preds == -1) & (labels == -1)) / n_neg
    if verbose:
        print(f'Test acc: {acc:.4f}, TPR {tpr:.4f}, TNR {tnr:.4f}')
    return float(acc), float(tpr), float(tnr)


_CHECKER_STATE_KEYS = ('support_points', 'support_transformed', 'gains',
                       'hypothesis', 'y', 'kernel_matrix', 'rbf_nodes',
                       'valid_mask', 'distance')


def save_pretrained_checker(checker, path: str):
    """Serialize checker state (arrays + hyperparams) — the reference
    pickles the whole object (routines.py:187-192); arrays-only npz is
    robust across versions.

    None-valued attributes are SKIPPED, not stored: a trained-but-
    unfitted checker has rbf_nodes=None (and a lazy-trained one no
    kernel_matrix) — np.asarray(None) would pickle an object array that
    np.load(allow_pickle=False) can never read back, making the save
    succeed and every restore fail."""
    state = {k: np.asarray(getattr(checker, k))
             for k in _CHECKER_STATE_KEYS
             if getattr(checker, k, None) is not None}
    state['num_valid'] = checker.num_valid
    np.savez(path, **state)


def load_pretrained_checker(checker, path: str):
    """Restore checker state saved by save_pretrained_checker
    (ref routines.py:143-156). Keys absent from the file (saved as None)
    are left at the checker's current value."""
    z = np.load(path)
    for k in _CHECKER_STATE_KEYS:
        if k in z.files:
            setattr(checker, k, jnp.asarray(z[k]))
    checker.num_valid = int(z['num_valid'])
    return checker


def _checker_state_pytree(checker):
    # None-valued attributes are skipped (same contract as
    # save_pretrained_checker): orbax stores arrays, not None leaves
    state = {k: getattr(checker, k) for k in _CHECKER_STATE_KEYS
             if getattr(checker, k, None) is not None}
    state['num_valid'] = np.asarray(checker.num_valid)
    return state


def save_checker_orbax(checker, path: str):
    """Orbax checkpoint of the checker state — the TPU-idiomatic
    alternative to npz (save_pretrained_checker): async-capable, sharded
    restore under a mesh, versioned directories. State is the same
    arrays-only pytree."""
    import orbax.checkpoint as ocp
    import os
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), _checker_state_pytree(checker))


def load_checker_orbax(checker, path: str):
    """Restore checker state written by :func:`save_checker_orbax`."""
    import orbax.checkpoint as ocp
    import os
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path))
    for k, v in state.items():
        if k == 'num_valid':
            checker.num_valid = int(v)
        else:
            setattr(checker, k, jnp.asarray(v))
    return checker


def save_ompl_path(path_file: str, path, times=None):
    """Write a path as whitespace-separated rows (ref utils.py:302-311)."""
    arr = np.asarray(path)
    with open(path_file, 'w') as f:
        for i, row in enumerate(arr):
            cols = list(row)
            if times is not None:
                cols = [times[i]] + cols
            f.write(' '.join(f'{v:.8f}' for v in cols) + '\n')


def view_se3_path(path, keypoints=None, save_to=None):
    """3D visualization of an SE(3) trajectory (ref routines.py:285-300
    opens a trimesh viewer; headless here: matplotlib 3D saved to file)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    arr = np.asarray(path)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection='3d')
    ax.plot(arr[:, 0], arr[:, 1], arr[:, 2], '-o', ms=2)
    ax.scatter(*arr[0, :3], c='g', s=40, label='start')
    ax.scatter(*arr[-1, :3], c='r', s=40, label='goal')
    if keypoints is not None:
        from .utils import euler2mat
        import jax.numpy as _jnp
        kp = _jnp.asarray(keypoints)
        for i in range(0, len(arr), max(1, len(arr) // 8)):
            R = np.asarray(euler2mat(_jnp.asarray(arr[i, 3:6])))
            pts = np.asarray(kp) @ R.T + arr[i, :3]
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=4, alpha=0.4)
    ax.legend()
    if save_to:
        fig.savefig(save_to, dpi=110)
    return fig
