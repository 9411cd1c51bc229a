"""End-to-end slice: 2-link planar robot + obstacles -> DiffCo fit ->
trajectory optimization -> ground-truth validation (the reference's
scripts/2d_trajopt.py pipeline, fully on device)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import kernels
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.geometry import (
    Obstacles2D, planar_robot_signed_dist, planar_robot_collision)
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu import optim, utils


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

    return robot, obs, clf, dist_est


def _find_free_pair(robot, obs, key):
    """A (start, target) pair of collision-free configurations."""
    q = robot.rand_configs(64, key)
    free = ~np.asarray(planar_robot_collision(robot, obs, q))
    idx = np.where(free)[0]
    assert len(idx) >= 2
    return q[idx[0]], q[idx[-1]]


def _validate(robot, obs, path, num_sub=8):
    dense = utils.dense_path(jnp.asarray(path, jnp.float32), num_sub)
    return not bool(jnp.any(planar_robot_collision(robot, obs, dense)))


def test_adam_traj_optimize(world):
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(7))
    options = {
        'N_WAYPOINTS': 20,
        'NUM_RE_TRIALS': 5,
        'MAXITER': 150,
        'history': False,
        'safety_margin': -0.3,
        'max_speed': 1.5,
        'seed': 0,
    }
    rec = optim.adam_traj_optimize(robot, dist_est, start, target, options)
    sol = np.asarray(rec['solution'])
    assert sol.shape == (20, 2)
    assert np.allclose(sol[0], np.asarray(start), atol=1e-4)
    assert np.allclose(sol[-1], np.asarray(target), atol=1e-4)
    assert rec['success']
    # validate against the geometric ground truth (reference validates with
    # FCL, speed_compare.py:444-454)
    assert _validate(robot, obs, sol)


def test_adam_traj_optimize_with_init(world):
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(3))
    init = np.linspace(np.asarray(start), np.asarray(target), 20)
    options = {
        'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': 3, 'MAXITER': 100,
        'history': False, 'safety_margin': -0.3, 'max_speed': 1.5,
        'seed': 1, 'init_solution': init,
    }
    rec = optim.adam_traj_optimize(robot, dist_est, start, target, options)
    assert np.asarray(rec['solution']).shape == (20, 2)


def test_al_traj_optimize(world):
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(11))
    options = {
        'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 4, 'MAXITER': 200,
        'safety_margin': -0.3, 'max_speed': 1.5, 'seed': 0,
        'outer_iters': 8, 'inner_iters': 40, 'num_sub': 3,
    }
    rec = optim.al_traj_optimize(robot, dist_est, start, target, options)
    sol = np.asarray(rec['solution'])
    assert sol.shape == (12, 2)
    assert np.allclose(sol[0], np.asarray(start), atol=1e-4)
    assert np.allclose(sol[-1], np.asarray(target), atol=1e-4)
    assert rec['success']
    assert _validate(robot, obs, sol)


def test_givengrad_traj_optimize(world):
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(5))
    options = {
        'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 2, 'MAXITER': 100,
        'safety_margin': -0.3, 'max_speed': 1.5, 'seed': 0, 'num_sub': 3,
    }
    rec = optim.givengrad_traj_optimize(robot, dist_est, start, target,
                                        options)
    sol = np.asarray(rec['solution'])
    assert sol.shape == (12, 2)
    assert np.allclose(sol[0], np.asarray(start), atol=1e-5)


def test_weighted_stepper(world):
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(13))
    stepper = optim.Weighted(robot, clf, {
        'n_waypoints': 10, 'maxiter': 50, 'history': False,
        'max_move_weight': 10.0, 'collision_weight': 10.0,
        'joint_limit_weight': 10.0, 'safety_bias': 0.0, 'max_speed': 1.5,
        'optimizer_params': {'lr': 0.1}, 'dense_check': False,
    })
    p0 = jnp.linspace(start, target, 10)
    res = stepper.step(p0)
    assert res.x.shape == (10, 2)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_trustconstr_traj_optimize(world):
    """The gradient+Hessian trust-constr path (ref optim.py:324-516) —
    must be a distinct implementation from gradient_free (it consumes
    analytic jacobians and the constraint Hessian) and succeed on the
    2-link world at least as reliably."""
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(7))
    options = {
        'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 2, 'MAXITER': 150,
        'safety_margin': -0.3, 'max_speed': 1.5, 'seed': 0, 'num_sub': 3,
    }
    rec = optim.trustconstr_traj_optimize(robot, dist_est, start, target,
                                          options)
    sol = np.asarray(rec['solution'])
    assert sol.shape == (12, 2)
    assert np.allclose(sol[0], np.asarray(start), atol=1e-5)
    assert np.allclose(sol[-1], np.asarray(target), atol=1e-5)
    assert rec['cnt_check'] > 0
    assert optim.trustconstr_traj_optimize is not \
        optim.gradient_free_traj_optimize


def test_explicit_init_keeps_straight_line_trial(world):
    """An explicit init_solution must not COST the straight-line seed
    (optim.py trial 1 pinning): with a deliberately jagged init, free
    space everywhere, and effectively zero optimization steps, the
    returned solution is the straight line — the selection can only find
    it if it is still in the trial bank. Regression for the repair-stage
    failures this caused (speed_compare 2class_1 repair study, round 3)."""
    robot, _, _, _ = world
    start = jnp.asarray([0.2, 0.3], jnp.float32)
    target = jnp.asarray([-0.4, 0.9], jnp.float32)
    free_everywhere = lambda p: jnp.full((p.shape[0],), -1.0, jnp.float32)
    jagged = np.array(jnp.linspace(start, target, 8))
    jagged[1:-1] += np.asarray([[1.5, -2.0]] * 6) * np.asarray(
        [[1], [-1], [1], [-1], [1], [-1]], np.float64)
    rec = optim.adam_traj_optimize(
        robot, free_everywhere, start, target,
        {'N_WAYPOINTS': 10, 'NUM_RE_TRIALS': 3, 'MAXITER': 1,
         'lr': 1e-7, 'safety_margin': 0.0, 'seed': 3,
         'init_solution': jagged})
    sol = np.asarray(rec['solution'])
    straight = np.asarray(jnp.linspace(start, target, 10))
    assert np.allclose(sol, straight, atol=1e-3), (
        'straight-line trial lost when init_solution is explicit')


def test_scipy_paths_resample_init_and_report_feasible(world):
    """Every scipy-loop optimizer must (a) accept an init_solution whose
    waypoint count differs from N_WAYPOINTS — RRT plans come with their
    own length; the raw path would silently mismatch the constraint
    dimensions — and (b) report 'feasible' (constraint satisfaction at
    the returned solution) separately from scipy's convergence flag,
    which with float32 derivatives almost always terminates on maxiter
    even on fully feasible paths (benchmarks/RESULTS.md termination
    study, round 3)."""
    robot, obs, clf, dist_est = world
    start, target = _find_free_pair(robot, obs, jax.random.PRNGKey(5))
    # an RRT-like init: 7 waypoints, N_WAYPOINTS says 12
    init = np.linspace(np.asarray(start), np.asarray(target), 7)
    options = {'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 1, 'MAXITER': 10,
               'history': False, 'safety_margin': -0.3, 'max_speed': 1.5,
               'seed': 2, 'num_sub': 3, 'init_solution': init}

    for opt_fn, score in [
            (optim.givengrad_traj_optimize, dist_est),
            (optim.trustconstr_traj_optimize, dist_est),
            (optim.gradient_free_traj_optimize,
             lambda q: (dist_est(q) > 0).astype(jnp.float32))]:
        rec = opt_fn(robot, score, start, target, dict(options))
        sol = np.asarray(rec['solution'])
        assert sol.shape == (12, 2), opt_fn.__name__
        assert np.allclose(sol[0], np.asarray(start), atol=1e-5)
        assert np.allclose(sol[-1], np.asarray(target), atol=1e-5)
        assert isinstance(rec['feasible'], bool), opt_fn.__name__
        assert isinstance(rec['success'], bool), opt_fn.__name__


def test_resample_init_preserves_endpoints():
    """_resample_init keeps the exact endpoints and hits the requested
    count for both up- and down-sampling."""
    path = np.array([[0.0, 0.0], [1.0, 3.0], [2.0, 0.0]], np.float32)
    for n in (2, 3, 5, 20):
        out = np.asarray(optim._resample_init(path, n))
        assert out.shape == (n, 2)
        assert np.allclose(out[0], path[0], atol=1e-6)
        assert np.allclose(out[-1], path[-1], atol=1e-6)
    with pytest.raises(ValueError):
        optim._resample_init(path[:1], 5)
