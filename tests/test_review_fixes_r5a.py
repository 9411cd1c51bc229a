"""Round-5 regression tests: corridor-AL product API, f64 interpolation
matrix, givengrad density visibility."""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu import optim
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision


@pytest.mark.smoke
def test_checker_update_exploit_paths():
    """update(exploit_paths=...) — the corridor-AL surface promoted from
    the speed_compare harness — retrains around caller-provided paths."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.6, 1.0), 0.7), ('rect', (-1.2, -1.0), (1.2, 1.2))])

    def gt(q):
        return planar_robot_collision(robot, obs, q)

    checker = dc.RBFDiffCo(robot=robot, gt_check_func=gt)
    checker.fit(num_samples=1200)
    # a failed trajectory + a planner path, exactly the harness's inputs
    failed = np.linspace([-2.0, 0.3], [2.0, -0.3], 9)
    plan = np.asarray([[-2.0, 0.3], [0.5, 1.2], [2.0, -0.3]])
    acc, tpr, tnr = checker.update(
        exploit_paths=[plan, failed], num_exploit_samples=256,
        num_explore_samples=64, verify=True)
    assert np.isfinite(acc) and acc >= 0.7
    # the updated proxy still scores batches (shape/compile stability)
    q = robot.rand_configs(32, jax.random.PRNGKey(1))
    s = np.asarray(checker.collision_score(q)).reshape(-1)
    assert s.shape == (32,) and np.all(np.isfinite(s))
    # and the classic support-centered update still works afterwards
    acc2, _, _ = checker.update(num_samples=64, verify=True)
    assert np.isfinite(acc2)


@pytest.mark.smoke
def test_trustconstr_free_waypoints_interp_stays_f64():
    """The control-point interpolation matrix must be converted at trace
    time (inside the f64 scipy backend's x64 scope) — converting at build
    time truncated it to f32 with a UserWarning on every call."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)

    def dist_est(q):
        return jnp.sum(q * q, axis=-1) - 100.0  # always free

    with warnings.catch_warnings(record=True) as rec_w:
        warnings.simplefilter('always')
        rec = optim.trustconstr_traj_optimize(
            robot, dist_est, jnp.zeros(2), jnp.ones(2),
            {'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 1, 'MAXITER': 3,
             'safety_margin': 0.0, 'max_speed': 2.0, 'seed': 0,
             'free_waypoints': 4})
    assert not any('truncated' in str(w.message) for w in rec_w), \
        'interpolation matrix was built outside the x64 scope'
    assert np.asarray(rec['solution']).shape == (8, 2)


@pytest.mark.smoke
def test_givengrad_records_num_sub():
    """givengrad computes its constraint density once from the straight
    line (a documented parity approximation); the chosen value must be
    visible in the returned record."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)

    def dist_est(q):
        return jnp.sum(q * q, axis=-1) - 100.0

    rec = optim.givengrad_traj_optimize(
        robot, dist_est, jnp.zeros(2), jnp.ones(2),
        {'N_WAYPOINTS': 6, 'NUM_RE_TRIALS': 1, 'MAXITER': 3,
         'safety_margin': 0.0, 'max_speed': 2.0, 'seed': 0})
    assert isinstance(rec['num_sub'], int) and rec['num_sub'] >= 1
