"""Batched multi-problem trajopt: P problems in one compiled program must
match P independent ``adam_traj_optimize`` calls (same per-problem seeds),
with and without a problem-axis mesh sharding.

No reference counterpart — /root/reference/diffco/optim.py:13-163 is
single-problem; its harness loops on the host
(scripts/speed_compare.py:500-511)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diffco_tpu import kernels, optim
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.geometry import (
    Obstacles2D, planar_robot_signed_dist, planar_robot_collision)
from diffco_tpu.robots import RevolutePlanarRobot


@pytest.fixture(scope='module')
def world():
    robot = RevolutePlanarRobot(1.0, link_width=0.3, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.7, 1.2), 0.6),
        ('rect', (-1.2, -1.2), (1.0, 1.0)),
    ])
    key = jax.random.PRNGKey(42)
    q = robot.rand_configs(1500, key)
    sd = planar_robot_signed_dist(robot, obs, q)
    labels = (jnp.max(sd, axis=-1) > 0) * 2.0 - 1.0
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(q, labels, max_iteration=3000)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')

    def dist_est(p):
        return clf.poly_score(p).reshape(-1)

    return robot, obs, dist_est


def _free_pairs(robot, obs, n, key):
    q = robot.rand_configs(128, key)
    free = ~np.asarray(planar_robot_collision(robot, obs, q))
    idx = np.where(free)[0]
    assert len(idx) >= 2 * n
    starts = np.stack([np.asarray(q[idx[2 * i]]) for i in range(n)])
    targets = np.stack([np.asarray(q[idx[-1 - 2 * i]]) for i in range(n)])
    return starts, targets


OPTIONS = {
    'N_WAYPOINTS': 12,
    'NUM_RE_TRIALS': 3,
    'MAXITER': 60,
    'safety_margin': -0.1,
    'dense_sub': 3,
    'max_speed': 2.0,
    'seed': 1234,
}


def test_batch_matches_sequential(world):
    robot, obs, dist_est = world
    starts, targets = _free_pairs(robot, obs, 3, jax.random.PRNGKey(5))

    recs = optim.adam_traj_optimize_batch(
        robot, dist_est, starts, targets, OPTIONS)
    assert len(recs) == 3
    for i, rec in enumerate(recs):
        single = optim.adam_traj_optimize(
            robot, dist_est, starts[i], targets[i],
            {**OPTIONS, 'seed': OPTIONS['seed'] + i})
        assert rec['success'] == single['success']
        np.testing.assert_allclose(rec['cost'], single['cost'],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rec['solution']),
                                   np.asarray(single['solution']),
                                   rtol=1e-3, atol=1e-3)


def test_batch_sharded_matches_unsharded(world):
    robot, obs, dist_est = world
    starts, targets = _free_pairs(robot, obs, 5, jax.random.PRNGKey(9))
    mesh = Mesh(np.array(jax.devices()), ('dp',))

    base = optim.adam_traj_optimize_batch(
        robot, dist_est, starts, targets, OPTIONS)
    # P=5 rounds up to 8 on the mesh; only 5 records come back, matching
    sharded = optim.adam_traj_optimize_batch(
        robot, dist_est, starts, targets, {**OPTIONS, 'mesh': mesh})
    assert len(sharded) == 5
    for b, s in zip(base, sharded):
        assert b['success'] == s['success']
        np.testing.assert_allclose(b['cost'], s['cost'],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b['solution']),
                                   np.asarray(s['solution']),
                                   rtol=1e-3, atol=1e-3)


def test_batch_endpoints_pinned_and_valid_rate(world):
    robot, obs, dist_est = world
    starts, targets = _free_pairs(robot, obs, 4, jax.random.PRNGKey(11))
    recs = optim.adam_traj_optimize_batch(
        robot, dist_est, starts, targets, OPTIONS)
    for i, rec in enumerate(recs):
        sol = np.asarray(rec['solution'])
        np.testing.assert_allclose(sol[0], starts[i], atol=1e-6)
        np.testing.assert_allclose(sol[-1], targets[i], atol=1e-6)
