"""Regression tests for the planner/sampler/routines review pass:
escape freezing must stop Adam momentum, the manifold sampler must always
fill its batch, planner device calls must use bucketed shapes, RRT* must
account the final goal edge and propagate rewire improvements, and
checker save/restore must survive None-valued state."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import routines
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.planning import MotionPlanner, RRTStar, _bucket_rows
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.sampler import (OptimSampler,
                                uniform_sample_on_transformed_manifold)


class _Box2:
    """2-dof box robot stub for the samplers/planners."""
    limits = np.asarray([[-3.0, 3.0], [-3.0, 3.0]])
    joint_limits = limits
    dof = 2

    def rand_configs(self, n, key):
        u = jax.random.uniform(key, (n, 2))
        lo, hi = self.limits[:, 0], self.limits[:, 1]
        return lo + u * (hi - lo)


def test_escape_freezes_momentum_in_thin_band():
    """A config escaping into a thin free band must STOP there: masking
    only the gradient left Adam's momentum pushing frozen configs across
    the band and back into collision."""
    robot = _Box2()

    def dist_est(q):
        # free band 0.8 < q0 < 1.2 (score <= 0 inside), collision outside
        return (jnp.abs(q[:, 0] - 1.0) - 0.2).reshape(-1, 1)

    s = OptimSampler(robot, dist_est, lr=0.05, max_steps=60)
    q0 = jnp.asarray([[0.0, 0.0], [0.3, -1.0]])
    out = np.asarray(s.optim_escape(q0))
    final_scores = np.asarray(dist_est(jnp.asarray(out))).reshape(-1)
    assert (final_scores <= 1e-6).all(), (out, final_scores)


def test_manifold_sampler_always_fills():
    """The sampler must return exactly [num_samples, dof] even when the
    rejection rounds cannot fill the batch (short/empty returns broke the
    fixed-shape training-set sizing downstream)."""
    robot = _Box2()

    def transform(q):
        return q * jnp.asarray([1.0, 0.001])

    out = uniform_sample_on_transformed_manifold(
        robot, transform, 64, jax.random.PRNGKey(0), max_rounds=0)
    assert out.shape == (64, 2)
    lo, hi = robot.limits[:, 0], robot.limits[:, 1]
    assert (np.asarray(out) >= lo - 1e-6).all()
    assert (np.asarray(out) <= hi + 1e-6).all()


def _planar_world():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.4, 1.4), 0.45)])

    def gt(qq):
        return planar_robot_collision(robot, obs, qq)

    return robot, gt


def test_planner_device_calls_are_bucketed():
    """Every collision_fn batch from the planners must land on a
    power-of-two row count: tree sizes drift every round, and un-bucketed
    shapes would recompile the jitted checker once per round on TPU."""
    robot, gt = _planar_world()
    shapes = []

    def recording(qq):
        shapes.append(int(qq.shape[0]))
        return gt(qq)

    planner = MotionPlanner(robot, recording, seed=0)
    path = planner.plan(np.asarray([-1.5, 0.0]), np.asarray([1.2, 0.6]),
                        max_iters=600)
    assert path is not None
    assert shapes, 'no device calls recorded'
    assert all(s & (s - 1) == 0 for s in shapes), sorted(set(shapes))

    shapes.clear()
    rrt = RRTStar(robot, recording, seed=0)
    p2 = rrt.plan(np.asarray([-1.5, 0.0]), np.asarray([1.2, 0.6]),
                  max_iters=250)
    assert all(s & (s - 1) == 0 for s in shapes), sorted(set(shapes))
    if p2 is not None:
        assert np.allclose(p2[0], [-1.5, 0.0])
        assert np.allclose(p2[-1], [1.2, 0.6])


def test_rrtstar_free_space_near_straight():
    """In empty space RRT* (with rewiring + full goal-edge accounting)
    must return a path close to the straight line."""
    robot = _Box2()

    def free(qq):
        return jnp.zeros(qq.shape[0], bool)

    rrt = RRTStar(robot, free, step_size=0.5, radius=1.0, seed=3)
    start, goal = np.asarray([-2.0, -2.0]), np.asarray([2.0, 2.0])
    path = rrt.plan(start, goal, max_iters=400, goal_tol=0.5)
    assert path is not None
    assert np.allclose(path[0], start) and np.allclose(path[-1], goal)
    length = np.linalg.norm(np.diff(path, axis=0), axis=1).sum()
    straight = np.linalg.norm(goal - start)
    assert length <= 1.35 * straight, (length, straight)


def test_bucket_rows_powers_of_two():
    assert _bucket_rows(1) == 64
    assert _bucket_rows(64) == 64
    assert _bucket_rows(65) == 128
    assert _bucket_rows(1000) == 1024


def test_save_load_checker_with_none_state(tmp_path):
    """None-valued state attributes (e.g. an untrained checker, or a
    trained one with distance=None) must round-trip through npz save/load
    — np.asarray(None) used to pickle an object array the
    allow_pickle=False loader could never read back."""
    from diffco_tpu.perceptron import DiffCo
    from diffco_tpu import kernels

    # untrained: every array attribute is still None — save must not
    # poison the file, load must leave the Nones in place
    perc0 = DiffCo(kernel_func=kernels.RQKernel(10))
    p0 = str(tmp_path / 'untrained.npz')
    routines.save_pretrained_checker(perc0, p0)
    perc0b = DiffCo(kernel_func=kernels.RQKernel(10))
    routines.load_pretrained_checker(perc0b, p0)
    assert perc0b.rbf_nodes is None and perc0b.kernel_matrix is None

    # trained (distance stays None): real state round-trips by value
    perc = DiffCo(kernel_func=kernels.RQKernel(10))
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (64, 2), minval=-2, maxval=2)
    y = jnp.where(X[:, 0] * X[:, 1] > 0, 1.0, -1.0)
    perc.train(X, y, max_iteration=192)
    assert perc.distance is None

    path = str(tmp_path / 'ck.npz')
    routines.save_pretrained_checker(perc, path)
    perc2 = DiffCo(kernel_func=kernels.RQKernel(10))
    routines.load_pretrained_checker(perc2, path)
    assert perc2.distance is None
    assert perc2.num_valid == perc.num_valid
    assert np.allclose(np.asarray(perc2.support_points),
                       np.asarray(perc.support_points))
    assert np.allclose(np.asarray(perc2.hypothesis),
                       np.asarray(perc.hypothesis))


def test_test_checker_margin_sign_matches_reference():
    """routines.test_checker follows the reference's ``score -
    safety_margin`` convention: a NEGATIVE margin must be conservative
    (more collision predictions -> TPR up, TNR down)."""
    cfgs = jnp.linspace(-1, 1, 101).reshape(-1, 1)
    labels = jnp.where(cfgs.reshape(-1) > 0.1, 1, -1)

    def score_fn(x):
        return x.reshape(-1)            # proxy: score == coordinate

    acc0, tpr0, tnr0 = routines.test_checker(None, score_fn, cfgs, labels,
                                             verbose=False)
    accm, tprm, tnrm = routines.test_checker(None, score_fn, cfgs, labels,
                                             safety_margin=-0.3,
                                             verbose=False)
    assert tprm >= tpr0 and tnrm < tnr0
    assert tprm == 1.0                  # every true collision now flagged
