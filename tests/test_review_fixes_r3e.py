"""Regression tests for the perceptron/optim review pass: row-based
support counting, pad hysteresis on MultiDimDiffCo, caller-owned
init_solution, multi-output constraint collapse, and the Weighted
stepper's compiled-program reuse."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu import kernels, optim, utils
from diffco_tpu.perceptron import DiffCo, MultiDiffCo, MultiDimDiffCo
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision


def _xor_data(n, key, classes=1):
    X = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    y = jnp.where(X[:, 0] * X[:, 1] > 0, 1.0, -1.0)
    if classes > 1:
        y = jnp.stack([y] + [-y] * (classes - 1), axis=1)
    return X, y


def test_multiclass_pad_counts_rows_not_entries(key):
    """A [N, C] gains matrix must size the support pad by nonzero ROWS —
    counting entries inflated S by up to a factor of C (and hysteresis
    made it permanent)."""
    X, y = _xor_data(256, key, classes=3)
    perc = MultiDiffCo(kernel_func=kernels.RQKernel(10))
    perc.train(X, y, max_iteration=3 * 256)
    rows = int(jnp.sum(jnp.any(perc.gains != 0, axis=-1)))
    S = perc.support_points.shape[0]
    # pad is the next 128-multiple of the ROW count, not of rows * C
    assert S == max(128, int(np.ceil(max(rows, 2) / 128.0)) * 128), (
        rows, S)


def test_multidim_pad_hysteresis():
    """MultiDimDiffCo's pad must never shrink across retrains (shape
    flips recompile every S-shaped program)."""
    perc = MultiDimDiffCo(kernel_func=kernels.MultiDimRQKernel(1.0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    X1, y1 = _xor_data(300, k1)
    perc.train(X1, y1.reshape(-1), max_iteration=900)
    S1 = perc.support_points.shape[0]
    X2, y2 = _xor_data(40, k2)          # tiny second fit
    perc.train(X2, y2.reshape(-1), max_iteration=120)
    assert perc.support_points.shape[0] >= S1


def test_init_solution_not_mutated():
    """The scipy-path optimizers must not overwrite the caller's
    init_solution rows in place (np.asarray aliases float64 arrays)."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.2, 0.8), 0.4)])

    def score(qq):
        # smooth proxy stand-in: distance-like score, negative = free
        return (0.3 - jnp.linalg.norm(
            jnp.asarray(qq) - jnp.asarray([0.9, 0.9]), axis=-1)).reshape(
            -1, 1)

    init = np.linspace([-1.0, -1.0], [1.0, 1.0], 6)
    init_copy = init.copy()
    start, target = np.asarray([-1.5, 0.2]), np.asarray([1.3, 0.4])
    optim.givengrad_traj_optimize(
        robot, score, start, target,
        {'N_WAYPOINTS': 6, 'NUM_RE_TRIALS': 1, 'MAXITER': 5,
         'init_solution': init, 'seed': 0})
    assert np.array_equal(init, init_copy), 'init_solution was mutated'
    del obs


def test_adam_short_init_raises():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    with pytest.raises(ValueError, match='init_solution'):
        optim.adam_traj_optimize(
            robot, lambda q: jnp.zeros(q.shape[0]),
            jnp.zeros(2), jnp.ones(2),
            {'N_WAYPOINTS': 6, 'NUM_RE_TRIALS': 1, 'MAXITER': 2,
             'init_solution': np.zeros((1, 2))})


def test_segment_violations_multi_output():
    """[B, C] scores collapse with max (most violating class governs);
    flat and [B, 1] inputs match the historical behavior."""
    n_seg, num_sub = 3, 4
    B = n_seg * num_sub - 1
    flat = jnp.arange(B, dtype=jnp.float32) / 10 - 0.4
    ref = utils.segment_violations(flat, n_seg, num_sub, 0.0)
    as_2d = utils.segment_violations(flat[:, None], n_seg, num_sub, 0.0)
    assert np.allclose(np.asarray(ref), np.asarray(as_2d))
    multi = jnp.stack([flat - 1.0, flat, flat - 2.0], axis=1)   # [B, 3]
    got = utils.segment_violations(multi, n_seg, num_sub, 0.0)
    assert np.allclose(np.asarray(got), np.asarray(ref))        # max wins
    # numpy twin agrees
    got_np = utils.segment_violations(np.asarray(multi), n_seg, num_sub,
                                      0.0, xp=np)
    assert np.allclose(got_np, np.asarray(ref))


def test_default_dense_sub_is_three():
    """CLAUDE.md invariant: trajopt densifies by default (dense_sub >= 3);
    undensified optimizers thread between waypoints."""
    o = optim._default_options(None)
    assert o['dense_sub'] == 3
    o2 = optim._default_options({'dense_sub': 1})
    assert o2['dense_sub'] == 1           # explicit override respected


def test_weighted_step_reuses_compiled_grad(key):
    """Weighted.step must reuse its compiled grad program across calls
    (an MPC loop would otherwise recompile per cycle) and rebuild it when
    the checker is refit."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.2, 0.8), 0.4)])

    def gt(qq):
        return planar_robot_collision(robot, obs, qq)

    ck = dc.RBFDiffCo(robot=robot, gt_check_func=gt, seed=1)
    ck.fit(num_samples=128, verify_ratio=0.25)

    w = optim.Weighted(robot, ck.perceptron, {
        'n_waypoints': 6, 'maxiter': 3, 'max_move_weight': 1.0,
        'collision_weight': 1.0, 'joint_limit_weight': 1.0,
        'safety_bias': 0.0, 'max_speed': 1.5})
    p0 = jnp.linspace(jnp.zeros(2), jnp.ones(2), 6)
    w.step(w.normalizer(p0), maxiter=2)
    fn1 = w._grad_fn_cache[1]
    w.step(w.normalizer(p0), maxiter=2)
    assert w._grad_fn_cache[1] is fn1          # reused

    ck.update(num_samples=16)                  # refit -> new arrays
    w.step(w.normalizer(p0), maxiter=2)
    assert w._grad_fn_cache[1] is not fn1      # invalidated
